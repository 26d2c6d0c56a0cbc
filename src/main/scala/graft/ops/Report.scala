package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus data-card report — the per-source summary table a dataset
  * release publishes (doc counts, exact-duplicate rate, token/char
  * volume, dominant language): the last step of a curation pipeline and
  * the first thing its consumers read.
  *
  * Determinism: every column is an integer aggregate or a deterministic
  * argmax (dominant language = highest doc count, ties to the
  * lexicographically smallest code, via one min_by over (-count, lang)).
  * Ratios are deliberately NOT emitted — a division's rounding is the
  * only thing that could diverge across engines, and the consumer can
  * divide the exact totals themselves.
  *
  * Scale shape: two hash aggregates keyed by source (one with the
  * per-language sub-key), both map-side combinable, joined on the
  * handful of source rows — a 100 TB corpus reports in two scans with no
  * wide state anywhere.
  */
object Report {

  /** ANALYZE-style column profile: per listed column, (col_name, n_rows,
    * n_nulls, n_distinct), as one single-column aggregate per column
    * unioned together. Against a COLUMNAR source this is the minimal-I/O
    * shape: each per-column scan prunes to exactly that column, so the C
    * scans together read every profiled byte once — same bytes as a
    * single stacked scan — while each aggregate stays on the
    * one-distinct two-phase path (partial by value, map-side combined;
    * no multi-distinct Expand) over NATIVE values. The previously-used
    * stacked map-explode form reads the same bytes but multiplies the
    * row stream by C and boxes every value into a string before the
    * shuffle — a pure constant-factor tax that measured 13x against the
    * per-column engine baseline at the 10x slice.
    *
    * Callers pass integer/string/date-like columns only: for those types
    * the native distinct count equals the string-cast distinct count the
    * oracle states (the cast is injective), so no stringification is
    * needed anywhere. Floats are excluded by contract —
    * shortest-round-trip float formatting is an engine implementation
    * detail, so a float's stringified distinct count is not portable.
    * The contract is ENFORCED here, not just documented: a float-typed
    * column (including one nested in an array/struct/map) fails loudly
    * instead of returning silently-portable-looking numbers that would
    * hash-mismatch on another engine, and an unknown column name gets a
    * precise error rather than an analysis exception downstream.
    */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types._
    require(cols.nonEmpty, "profile needs at least one column")
    require(cols.distinct == cols, "duplicate column in profile list")
    def hasFloat(dt: DataType): Boolean = dt match {
      case FloatType | DoubleType => true
      case ArrayType(et, _) => hasFloat(et)
      case MapType(kt, vt, _) => hasFloat(kt) || hasFloat(vt)
      case StructType(fields) => fields.exists(f => hasFloat(f.dataType))
      case _ => false
    }
    cols.foreach { c =>
      val field = df.schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(
          s"profile: unknown column '$c' (table has: " +
            df.schema.fieldNames.mkString(", ") + ")"))
      if (hasFloat(field.dataType)) throw new IllegalArgumentException(
        s"profile: column '$c' is ${field.dataType.simpleString} — float " +
          "columns are excluded by contract (shortest-round-trip float " +
          "formatting is engine-specific, so a stringified distinct count " +
          "would not be portable); cast to decimal or exclude the column")
    }
    // A global aggregate emits its one row even over an empty table
    // (count 0, null sum coalesced to 0), so the empty-table contract —
    // one all-zero row per column, what per-column COUNT(*) SQL yields —
    // holds with no join.
    cols.map { c =>
      df.select(col(c).as("v"))
        .agg(
          count(lit(1)).as("n_rows"),
          coalesce(sum(when(col("v").isNull, 1L).otherwise(0L)), lit(0L))
            .cast("long").as("n_nulls"),
          countDistinct(col("v")).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
    }.reduce(_ union _)
  }

  /** (source, n_docs, n_distinct_texts, n_ws_tokens, n_chars, top_lang):
    * exact-dup rate = 1 - n_distinct_texts/n_docs, left to the reader.
    */
  def corpusReport(docs: DataFrame): DataFrame = {
    val totals = docs.groupBy(col("source")).agg(
      count(lit(1)).as("n_docs"),
      countDistinct(md5(col("text"))).as("n_distinct_texts"),
      sum(size(split(col("text"), " "))).cast("long").as("n_ws_tokens"),
      sum(length(col("text"))).cast("long").as("n_chars"))
    val topLang = docs.groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("ln"))
      .groupBy(col("source"))
      .agg(min_by(col("lang"), struct((-col("ln")).as("neg"), col("lang"))).as("top_lang"))
    totals.join(topLang, "source")
      .select(col("source"), col("n_docs"), col("n_distinct_texts"),
        col("n_ws_tokens"), col("n_chars"), col("top_lang"))
  }

  /** Referential-integrity card between the text corpus and its
    * embedding table — the audit a multimodal/paired dataset runs before
    * training (a doc without its vector silently drops from contrastive
    * batches; a vector without its doc is leaked compute; duplicate ids
    * corrupt joins downstream). Six integers in one row.
    *
    * Scale shape: two id-keyed anti-joins (equi-joins on the id — AQE
    * broadcasts the smaller side when it fits, hash-shuffles otherwise)
    * plus two duplicate checks that are each ONE map-side-combinable
    * aggregate; the six scalars then cross-join as 1-row relations.
    */
  def integrityCard(docs: DataFrame, emb: DataFrame): DataFrame = {
    // Per-id counts from each side overlaid with ONE full-outer join:
    // all six integers are aggregates of the (id, nd, ne) relation, so
    // each table is scanned once and the join rides the groupBy's id
    // partitioning with no extra exchange (r17; was six independent
    // count/anti-join/dup branches — eight scans per action). coalesce
    // keeps the sums 0 (not NULL) on an empty overlay, matching the old
    // count-based form.
    val d = docs.select(col("doc_id")).groupBy(col("doc_id"))
      .agg(count(lit(1)).as("nd"))
    val v = emb.select(col("vec_id")).groupBy(col("vec_id"))
      .agg(count(lit(1)).as("ne"))
    d.join(v, d("doc_id") === v("vec_id"), "full_outer")
      .agg(
        coalesce(sum(coalesce(col("nd"), lit(0L))), lit(0L))
          .cast("long").as("n_docs"),
        coalesce(sum(coalesce(col("ne"), lit(0L))), lit(0L))
          .cast("long").as("n_vecs"),
        coalesce(sum(when(col("ne").isNull, col("nd")).otherwise(lit(0L))),
          lit(0L)).cast("long").as("docs_without_vec"),
        coalesce(sum(when(col("nd").isNull, col("ne")).otherwise(lit(0L))),
          lit(0L)).cast("long").as("vecs_without_doc"),
        count(when(col("nd") > 1, 1)).cast("long").as("dup_doc_ids"),
        count(when(col("ne") > 1, 1)).cast("long").as("dup_vec_ids"))
  }

  /** Classifier CALIBRATION card — the reliability-diagram table an eval
    * pass derives before trusting a quality filter's scores as
    * probabilities (Guo et al. 2017's ECE input): the corpus bucketed by
    * the hash classifier's score ([[TextOps.hashClassifierScore]]'s
    * wsum / n_tokens), with each bucket's observed positive rate against
    * a deterministic reference label (lang = 'en' here; a pipeline
    * substitutes its labeled eval slice). A well-calibrated filter shows
    * the rate rising monotonically with the bin.
    *
    * Integer-exact end to end: the bin is
    * least((wsum + 6·n)·bins div (12·n), bins−1) — the score's [−6, 6]
    * range shifted non-negative BEFORE the division, so Spark's
    * truncating `div` and DuckDB's flooring `//` agree (they diverge on
    * negative quotients) — and the rate is the cleared-denominator
    * integer (n_pos << 20) div n. Scale shape: one row-local projection
    * + ONE map-side-combinable aggregate keyed by the (≤ bins) bin ids —
    * scan speed at any corpus size.
    *
    * Returns (bin, n_docs, n_pos, pos_rate_q20, sum_wsum, sum_tokens).
    */
  def calibrationCard(docs: DataFrame, dim: Int = 1024, bins: Int = 8): DataFrame = {
    require(bins > 0, "bins must be positive")
    val scored = TextOps.hashClassifierScore(docs, dim)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .filter(col("n_tokens") > 0)
      .select(
        least(
          expr(s"(wsum + 6 * n_tokens) * $bins div (12 * n_tokens)"),
          lit(bins - 1).cast("long")).as("bin"),
        when(col("lang") === "en", 1L).otherwise(0L).as("pos"),
        col("wsum"), col("n_tokens"))
    scored
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).cast("long").as("n_docs"),
        sum(col("pos")).cast("long").as("n_pos"),
        sum(col("wsum")).cast("long").as("sum_wsum"),
        sum(col("n_tokens")).cast("long").as("sum_tokens"))
      .select(col("bin"), col("n_docs"), col("n_pos"),
        expr("CAST((n_pos * 1048576) DIV n_docs AS BIGINT)").as("pos_rate_q20"),
        col("sum_wsum"), col("sum_tokens"))
  }

  /** Zipf-law card — the rank-frequency power-law check a corpus health
    * pass runs on the vocabulary (natural text follows freq ∝ rank^(−s)
    * with s ≈ 1; heavy template/boilerplate contamination or synthetic
    * text bends the curve): the least-squares slope of floor(log2 tf)
    * against floor(log2 rank), with the regression emitted as its EXACT
    * integer numerator/denominator (n·Σxy − Σx·Σy, n·Σx² − (Σx)²) so any
    * engine reproduces it bit-for-bit, plus the one-IEEE-division slope.
    * The final products are computed in DECIMAL(38,0) (DuckDB: HUGEINT):
    * n·Σxy grows like n²·log²(n) and leaves int64 already at a ~5·10⁷
    * term vocabulary — a size real web corpora exceed. The num/den
    * columns are EMITTED as strings on both engines (the snapshot-id
    * stringification precedent, reference backend/main.py:489-490):
    * pandas loads Spark DECIMAL as object and DuckDB HUGEINT as float64,
    * so a numeric emission is dtype-unstable at dtype-sensitive readers
    * while the decimal string is exact and identical from both.
    *
    * Scale shape: one token explode into a vocabulary-bounded (word, tf)
    * aggregate; the rank comes from [[GlobalRank.rowNumber]] under
    * (−tf, word) — range exchange + partition offsets, no single-reducer
    * window even at a billion-term vocabulary; the regression sums are
    * ONE map-side-combinable aggregate over bit lengths. Returns one row
    * (n_terms, zipf_num, zipf_den, slope).
    */
  def zipfCard(docs: DataFrame): DataFrame = {
    val tf = docs
      .select(explode(split(lower(col("text")), " ")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("tf"))
    val ranked = GlobalRank.rowNumber(tf, Seq(-col("tf"), col("word")), "rank")
    ranked
      .select(
        (length(bin(col("rank"))) - 1).cast("long").as("x"),
        (length(bin(col("tf"))) - 1).cast("long").as("y"))
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(col("n"), col("sx").cast(Dec).as("sx"), col("sy").cast(Dec).as("sy"),
        col("sxy").cast(Dec).as("sxy"), col("sxx").cast(Dec).as("sxx"))
      .select(
        col("n").as("n_terms"),
        (col("n").cast(Dec) * col("sxy") - col("sx") * col("sy")).cast(Dec).as("zipf_num"),
        (col("n").cast(Dec) * col("sxx") - col("sx") * col("sx")).cast(Dec).as("zipf_den"))
      .select(col("n_terms"),
        col("zipf_num").cast("string").as("zipf_num"),
        col("zipf_den").cast("string").as("zipf_den"),
        (col("zipf_num").cast("double") / col("zipf_den").cast("double")).as("slope"))
  }

  private val Dec = "decimal(38,0)"
}
