package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-state streaming sketches over the corpus — the two estimator
  * families a 100 TB pipeline runs where exact aggregation is a
  * vocabulary- or corpus-sized table it cannot afford to keep per node:
  *
  * - Count-Min (Cormode/Muthukrishnan 2005): frequency estimation in a
  *   fixed depth×width counter grid. Per-executor partial-aggregate
  *   state is exactly depth·width cells no matter how large the
  *   vocabulary grows — the property that lets a heavy-hitter pass run
  *   as ONE map-side-combined aggregate on an unbounded token stream.
  * - HyperLogLog (Flajolet et al. 2007): per-group cardinality in 2^p
  *   max-registers, mergeable across groups/shards by register-wise MAX
  *   — the shape production pipelines checkpoint and union, where the
  *   KMV sketch ([[Dedup.corpusOverlapSketch]]) answers pairwise
  *   OVERLAP between two fixed sets instead.
  *
  * Both cards keep every emitted value an integer (counts, registers,
  * and a 2^50-scaled harmonic numerator) so an independent engine
  * replays them bit-for-bit; the float-only final HLL constant
  * (alpha_m · m²) is left to the reader, the cleared-denominator
  * convention of the surprisal family.
  */
object Sketches {

  /** Count-Min sketch heavy-hitter card: estimate the counts of the
    * exact top-`topK` tokens from a `depth`×`width` CMS and report the
    * guaranteed-non-negative overcount against truth.
    *
    * Scale shape: the sketch is ONE map-side-combinable depth×width
    * aggregate (4096 cells at the defaults) whose state is independent
    * of vocabulary size — row r's bucket is (a1 + r·a2) mod width from
    * the two 56-bit halves of a single md5(token), the minhash two-hash
    * family, so the grid costs one digest per distinct token. Because
    * the cell sum is associative over pre-counted (token, n) pairs, the
    * sketch here rides the token-count relation the evaluation half
    * (the exact top-K: one vocabulary-sized aggregate + TakeOrdered)
    * already builds; a production pass without the evaluation half runs
    * the identical grid aggregate directly on the raw stream. Estimates
    * are a topK·depth-row broadcast lookup against the grid. Returns
    * (token, n_exact, cms_est, overcount) with cms_est >= n_exact by
    * construction.
    */
  def cmsHeavyHitters(docs: DataFrame, depth: Int = 4, width: Int = 1024,
      topK: Int = 20): DataFrame = {
    require(depth > 0 && width > 0 && topK > 0, "depth/width/topK must be positive")
    // depth <= 4 keeps a1 + r*a2 < 2^58 (both halves are 56-bit).
    require(depth <= 4, "depth must be <= 4 (two-hash family bound)")
    // The grid is broadcast to the probe join below — bound its SIZE,
    // not just its depth, so a caller-supplied width can't turn
    // broadcast(cells) into a broadcast-limit blowout (mirrors hllCard's
    // p-range guard; 1M cells ≈ 24 MB of (r, b, c) rows, far under the
    // broadcast cap but far over any useful sketch resolution).
    require(depth.toLong * width <= (1L << 20),
      "depth*width must be <= 2^20 cells (the grid is broadcast)")
    val toks = docs
      .filter(col("text").isNotNull && length(col("text")) > 0)
      .select(explode(split(col("text"), " ")).as("token"))
      .filter(col("token") =!= "")
    // Both halves of the card consume tc; its exchange subtree is
    // IDENTICAL in both branches, so Spark's ReusedExchange shares the
    // shuffle output — no persist needed (measured: a persist here
    // only adds the InMemoryRelation materialization barrier).
    val tc = toks.groupBy(col("token"))
      .agg(count(lit(1)).cast("long").as("n_exact"))
    // Row r's bucket comes from the two-hash family (a1 + r*a2) mod w —
    // the minhash convention — so the whole grid costs ONE md5 per
    // distinct token, not one per (occurrence, row). a1/a2 land on the
    // vocabulary relation BEFORE the top-k so the sort-limit keeps its
    // TakeOrdered shape (a projection wedged between sort and limit
    // degrades it to a global range sort).
    val hx = tc
      .withColumn("__d", md5(col("token")))
      .withColumn("__a1", conv(substring(col("__d"), 1, 14), 16, 10).cast("long"))
      .withColumn("__a2", conv(substring(col("__d"), 17, 14), 16, 10).cast("long"))
      .drop("__d")
    def buckets(df: DataFrame): DataFrame = df
      .withColumn("r", explode(array((0 until depth).map(r => lit(r)): _*)))
      .withColumn("b", (col("__a1") + col("r") * col("__a2")) % width)
    // The sketch aggregate is associative over pre-counted (token, n)
    // pairs, so it rides the SAME token-count relation the evaluation
    // half builds — a production pass without the exact half runs the
    // identical depth×width map-side-combined aggregate directly on the
    // raw stream; state is the 4096-cell grid either way.
    val cells = buckets(hx)
      .groupBy(col("r"), col("b"))
      .agg(sum(col("n_exact")).cast("long").as("c"))
    val top = hx.orderBy(col("n_exact").desc, col("token")).limit(topK)
    // Estimate = min over the depth rows of the token's bucket counter.
    // Both sides of this lookup are tiny (topK·depth probes vs the
    // depth·width grid) — broadcast keeps it exchange-free.
    buckets(top)
      .join(broadcast(cells), Seq("r", "b"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("c")).cast("long").as("cms_est"))
      .select(col("token"), col("n_exact"), col("cms_est"),
        (col("cms_est") - col("n_exact")).cast("long").as("overcount"))
  }

  /** HyperLogLog per-source cardinality card with a register-merged
    * union row — distinct-text estimates from 2^p max-registers per
    * source, plus the exact counts the card is judged against.
    *
    * h56(text) splits into idx (top p bits) and a (56-p)-bit remainder;
    * rho = leading-zeros(remainder)+1 = (57-p) - bitlength(remainder).
    * Registers are MAX(rho) per (source, idx) — a map-side-combinable
    * aggregate whose state is bounded by #sources·2^p, never corpus
    * rows — and the `*ALL*` row MAXes the per-source registers again,
    * demonstrating the sketch-union law (registers of a union = the
    * register-wise max) on the sources-sized relation. The harmonic
    * numerator is exact: harm_num = Σ_j 2^(50-M[j]) with absent
    * registers contributing 2^50, so est = alpha_m·m²·2^50/harm_num is
    * one reader-side float op away. exact_distinct (the evaluation
    * half) counts the distinct 56-bit content hashes the registers
    * consume — the full-fidelity table the 256-long sketch replaces —
    * and rides the same single distinct-pair scan. Returns
    * (source, nonzero_regs, harm_num, exact_distinct).
    */
  def hllCard(docs: DataFrame, p: Int = 8): DataFrame = {
    // Lower bound 7: the 2^50 harmonic scale needs reg <= 50, and the
    // max register is restBits+1 = 57-p.
    require(p >= 7 && p <= 16, "p must be in [7, 16]")
    val m = 1 << p
    val restBits = 56 - p
    // ONE corpus scan: the distinct (source, h) aggregate — map-side
    // combined — is the only pass over text. Registers, per-source
    // exact distincts (exact on the same 56-bit content hash the
    // registers consume) and the '*ALL*' row all derive from this
    // distinct-pair relation, bounded by Σ per-source distinct counts,
    // never corpus rows. All three consumers share the distinct's
    // identical exchange subtree via ReusedExchange — no persist
    // (measured: persisting only adds a materialization barrier).
    val dh = docs
      .filter(col("text").isNotNull && col("source").isNotNull)
      .select(col("source"), Sampling.h56(col("text")).as("h"))
      .distinct()
    // rho = (restBits + 1) - bit_length(rest) in ONE codegen'd
    // leading-zeros instruction ([[graft.functions.BitLength]]); the
    // composed length(bin(rest)) form allocated a binary string per
    // distinct row just to count its characters, and bit_length(0) = 0
    // folds the rest-of-zeros case into the same formula.
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val base = dh
      .select(col("source"),
        shiftright(col("h"), restBits).as("idx"),
        (col("h").bitwiseAND(lit((1L << restBits) - 1))).as("rest"))
      .select(col("source"), col("idx"),
        (lit(restBits + 1) - expr("bit_length_long(rest)"))
          .cast("int").as("rho"))
    val regs = base.groupBy(col("source"), col("idx"))
      .agg(max(col("rho")).as("reg"))
    // 2^(50-reg) stays integral (reg <= 57-p <= 50 by the p >= 7 bound)
    // and the total is bounded by m·2^50 = 2^58 at the defaults — no
    // overflow anywhere near int64.
    def card(grouped: DataFrame): DataFrame = grouped
      .groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("nonzero_regs"),
        sum(expr("shiftleft(cast(1 as bigint), cast(50 - reg as int))"))
          .cast("long").as("present_num"))
      .select(col("source"), col("nonzero_regs"),
        (col("present_num") + (lit(m.toLong) - col("nonzero_regs"))
          * (1L << 50)).cast("long").as("harm_num"))
    val perSource = card(regs)
    val union = card(
      regs.groupBy(col("idx")).agg(max(col("reg")).as("reg"))
        .select(lit("*ALL*").as("source"), col("idx"), col("reg")))
    val exactSrc = dh.groupBy(col("source"))
      .agg(count(lit(1)).cast("long").as("exact_distinct"))
    val exactAll = dh
      .agg(countDistinct(col("h")).cast("long").as("exact_distinct"))
      .select(lit("*ALL*").as("source"), col("exact_distinct"))
    perSource.unionByName(union)
      .join(exactSrc.unionByName(exactAll), "source")
      .select(col("source"), col("nonzero_regs"), col("harm_num"),
        col("exact_distinct"))
  }
}
