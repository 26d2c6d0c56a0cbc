package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Supervised probe TRAINING as a deterministic relational plan — the
  * missing third of the classifier story ([[TextOps.hashClassifierScore]]
  * applies a trained model, [[Similarity.kmeansStep]] is the unsupervised
  * step; this is the supervised one): one full-batch gradient-descent
  * step of a linear probe predicting English membership from integer
  * text features, the fastText-style quality/language filter a curation
  * pipeline trains before the big filtering pass.
  *
  * Determinism is the whole design: the label and every feature are
  * INTEGERS (language flag, stopword hit counts, token count), the
  * weights and learning rate are exact DECIMAL constants, and the
  * arithmetic never divides — so residuals, gradient sums (decimal
  * aggregation is order-independent, unlike double), and the updated
  * weights are mathematically exact and reproduce bit-identically in any
  * engine; only the OUTPUT casts to double. Precisions are chosen so no
  * intermediate exceeds decimal(38): gradient sums re-cast to
  * decimal(24,6) (|g| < 1e18 by construction) before the learning-rate
  * product, keeping lr*g at precision 35.
  *
  * Scale shape: ONE map-side-combinable hash aggregate over the corpus —
  * a gradient step at 100 TB is a single scan, which is why full-batch
  * linear probes are the curation-filter workhorse.
  */
object Probe {

  /** Fixed probe constants (documented in the oracle SQL too): bias,
    * en-stopword, fr-stopword, and token-count weights; lr = 1e-9.
    */
  private val W0 = Seq("0.010000", "0.020000", "-0.010000", "0.000100")
  private val Lr = "0.000000001"

  private def dec6(s: String): Column =
    lit(new java.math.BigDecimal(s)).cast(DecimalType(12, 6))

  /** (k, w_before, grad, w_after) for one gradient step of
    * w ← w − lr · Σ_docs (x·w − y) x   over x = [1, en_hits, fr_hits,
    * n_tokens], y = [lang == 'en'].
    */
  def linearProbeStep(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), " ")
    def hitCount(stops: Seq[String]): Column =
      size(filter(toks, w => w.isin(stops: _*)))
    val f = docs.select(
      when(col("lang") === "en", 1).otherwise(0).as("y"),
      hitCount(TextOps.StopEn).as("x1"),
      hitCount(TextOps.StopFr).as("x2"),
      size(toks).as("x3"))
    val w = W0.map(dec6)
    val lr = lit(new java.math.BigDecimal(Lr)).cast(DecimalType(10, 9))
    val res = (w(0) + w(1) * col("x1") + w(2) * col("x2") + w(3) * col("x3")
      - col("y")).as("res")
    val g = f.select(res, col("x1"), col("x2"), col("x3"))
      .agg(
        sum(col("res")).cast(DecimalType(24, 6)).as("g0"),
        sum(col("res") * col("x1")).cast(DecimalType(24, 6)).as("g1"),
        sum(col("res") * col("x2")).cast(DecimalType(24, 6)).as("g2"),
        sum(col("res") * col("x3")).cast(DecimalType(24, 6)).as("g3"))
    val rows = (0 to 3).map { k =>
      val gk = col(s"g$k")
      struct(
        lit(k).as("k"),
        w(k).cast("double").as("w_before"),
        gk.cast("double").as("grad"),
        (w(k) - lr * gk).cast("double").as("w_after"))
    }
    g.select(inline(array(rows: _*)))
  }
}
