package graft.queries

import graft.Tables.t
import graft.ops.{Boilerplate, Dedup, Multimodal, ProductQuant, Quantiles, Similarity, TextOps}
import org.apache.spark.sql.functions.col

/** Corpus entries for the training-data pipeline operators (dedup,
  * similarity search, text analysis, multimodal) with DuckDB oracle SQL
  * reproducing each computation exactly — the md5-derived hashing and
  * fixed-order double arithmetic in graft.ops are chosen precisely so an
  * independent engine can replay them bit-for-bit.
  */
object PipelineOps {

  // ---- shared oracle fragments -------------------------------------------

  /** Rewrite every CTE in a DuckDB oracle to `AS MATERIALIZED` — the
    * fastest honest DuckDB form for oracles whose CTE chains are
    * referenced from several consumers (DuckDB re-inlines shared CTEs,
    * re-running the whole upstream chain per reference; the PQ-training
    * oracles were 6× slower un-materialized, and the p124 chain OOM'd
    * at 100×). Applied ONLY where an A/B showed a win that HOLDS AT
    * SCALE — the substring/winnow family is FASTER un-materialized, and
    * materializing a RECURSIVE CTE chain (p26/p118's transitive
    * closure) is catastrophic at 10× (65 GB single-threaded vs ~5 min
    * un-materialized) despite a small sf0.1 win. Sweep recorded in
    * BASELINE.md r13; per-query, never blanket.
    */
  private def matCtes(sql: String, names: String*): String =
    names.foldLeft(sql) { (s, n) =>
      // Quote the name (a future CTE named e.g. `a$1` must not become a
      // regex) and tolerate whitespace/case drift around AS — but keep
      // the loud require: a silent miss would quietly revert the oracle
      // to the re-inlined form measured 6× slower (and OOM-prone at
      // 100×).
      val pat = ("(?i)\\b" + java.util.regex.Pattern.quote(n) + "\\s+AS\\s+\\(")
        .r.unanchored
      val out = pat.replaceFirstIn(s, java.util.regex.Matcher
        .quoteReplacement(s"$n AS MATERIALIZED ("))
      require(out != s, s"matCtes: CTE '$n' not found in oracle SQL")
      out
    }

  /** Winnowing-anchor candidate chain (co..a2) shared by the p82
    * exact-substring pair oracle and the p125 leakage card: per-doc
    * char-20-gram anchors (one per 8-window, positions carried),
    * df-capped to 2..10 docs. Ends at `a2(doc_id, hash, gram)`.
    */
  private val winnowAnchorCtes: String =
    """co AS (SELECT [783945459, 799482117, 864499429, 447241920, 853136842, 188810867,
      |    522219709, 274910315, 718545499, 281243405, 621975598, 891031477, 512613922,
      |    887503681, 28629151, 923521, 29791, 961, 31, 1] AS c),
      |cps AS (SELECT doc_id, text, length(text) AS n,
      |    list_transform(generate_series(1, length(text)),
      |      i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS cp
      |  FROM documents),
      |h AS (SELECT doc_id, text,
      |  CASE WHEN n >= 20 THEN list_transform(generate_series(1, n - 19),
      |      i -> CAST((cp[i+0]*783945459 + cp[i+1]*799482117 + cp[i+2]*864499429
      |        + cp[i+3]*447241920 + cp[i+4]*853136842 + cp[i+5]*188810867
      |        + cp[i+6]*522219709 + cp[i+7]*274910315 + cp[i+8]*718545499
      |        + cp[i+9]*281243405 + cp[i+10]*621975598 + cp[i+11]*891031477
      |        + cp[i+12]*512613922 + cp[i+13]*887503681 + cp[i+14]*28629151
      |        + cp[i+15]*923521 + cp[i+16]*29791 + cp[i+17]*961 + cp[i+18]*31
      |        + cp[i+19]) % 1000000007 AS BIGINT))
      |  ELSE [CAST(coalesce(list_sum(list_transform(generate_series(1, n),
      |    j -> cp[j] * c[20 - n + j])), 0) % 1000000007 AS BIGINT)] END AS h
      |  FROM cps CROSS JOIN co),
      |mnl AS (SELECT doc_id, text, h, list_transform(generate_series(1, greatest(len(h) - 7, 1)),
      |    i -> list_min(h[(i):(i+7)])) AS mins FROM h),
      |aw AS (SELECT doc_id, text, unnest(list_transform(generate_series(1, len(mins)),
      |    i -> mins[i] * 4294967296 + i + list_indexof(h[(i):(i+7)], mins[i]) - 1)) AS fp
      |  FROM mnl),
      |anch AS (SELECT DISTINCT doc_id, fp // 4294967296 AS hash,
      |    substr(text, CAST(fp % 4294967296 AS INT), 20) AS gram FROM aw),
      |rare AS (SELECT hash FROM (
      |    SELECT hash, COUNT(DISTINCT doc_id) AS nd FROM anch GROUP BY 1) z
      |  WHERE nd BETWEEN 2 AND 10),
      |a2 AS (SELECT anch.* FROM anch JOIN rare USING (hash))""".stripMargin


  private val shingleCtes =
    """ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
      |sh AS (SELECT DISTINCT doc_id, shingle FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 2),
      |    i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])) AS shingle
      |  FROM ws WHERE len(w) >= 3) x)""".stripMargin

  private val minhashCtes: String = {
    val sigCols = (0 until 8).map(s => s"MIN(a1 + $s * a2) AS h$s").mkString(", ")
    val bandSel = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS b, CAST(h${2 * b} AS VARCHAR) || '|' || CAST(h${2 * b + 1} AS VARCHAR) AS v FROM sig")
      .mkString(" UNION ALL ")
    s"""$shingleCtes,
       |hsh AS (SELECT doc_id,
       |  CAST('0x' || substr(d, 1, 14) AS BIGINT) AS a1,
       |  CAST('0x' || substr(d, 17, 14) AS BIGINT) AS a2
       |  FROM (SELECT doc_id, md5(shingle) AS d FROM sh) z),
       |sig AS (SELECT doc_id, $sigCols FROM hsh GROUP BY doc_id),
       |band AS ($bandSel)""".stripMargin
  }

  /** Parameterized minhash signature + band CTEs over a `<prefix>_sh`
    * (doc_id, shingle) CTE — the two-relation analog of [[minhashCtes]]
    * for the incremental-dedup oracle (existing vs incoming sides).
    */
  private def minhashCtesFor(prefix: String): String = {
    val sigCols = (0 until 8).map(s => s"MIN(a1 + $s * a2) AS h$s").mkString(", ")
    val bandSel = (0 until 4)
      .map(b => s"SELECT doc_id, $b AS b, CAST(h${2 * b} AS VARCHAR) || '|' || " +
        s"CAST(h${2 * b + 1} AS VARCHAR) AS v FROM ${prefix}_sig")
      .mkString(" UNION ALL ")
    s"""${prefix}_hsh AS (SELECT doc_id,
       |  CAST('0x' || substr(d, 1, 14) AS BIGINT) AS a1,
       |  CAST('0x' || substr(d, 17, 14) AS BIGINT) AS a2
       |  FROM (SELECT doc_id, md5(shingle) AS d FROM ${prefix}_sh) z),
       |${prefix}_sig AS (SELECT doc_id, $sigCols FROM ${prefix}_hsh GROUP BY doc_id),
       |${prefix}_band AS ($bandSel)""".stripMargin
  }

  private val simhashCtes: String = {
    val sums = (0 until 32)
      .map(b => s"SUM(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS s$b")
      .mkString(", ")
    val bits = (0 until 32)
      .map(b => s"(CASE WHEN s$b > 0 THEN ${1L << b} ELSE 0 END)")
      .mkString(" + ")
    s"""wrd AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents WHERE length(text) > 0),
       |wh AS (SELECT doc_id, CAST('0x' || substr(md5(word), 1, 8) AS BIGINT) AS h FROM wrd),
       |sm AS (SELECT doc_id, $sums FROM wh GROUP BY doc_id),
       |sig AS (SELECT doc_id, CAST($bits AS BIGINT) AS simhash FROM sm)""".stripMargin
  }

  /** Parameterized n-gram shingle CTE over any relation (3-gram fixed
    * form above predates it; kept for the queries already written on it).
    */
  private def shingleCteN(n: Int, table: String, cte: String): String = {
    val concat = (0 until n).map(k => s"w[i+$k]").mkString(" || ' ' || ")
    s"""${cte}_ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM $table),
       |$cte AS (SELECT DISTINCT doc_id, shingle FROM (
       |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - ${n - 1}),
       |    i -> $concat)) AS shingle
       |  FROM ${cte}_ws WHERE len(w) >= $n) x)""".stripMargin
  }

  /** PQ subvector + TRAINED codebook CTEs (over an `e(vec_id, v)` CTE):
    * 16 subspaces of 4 dims; the seed codebook (`cb0` = the first 64
    * vectors' subvectors) is refined by one unrolled Lloyd iteration —
    * nearest-centroid assignment (`a0`), then per-dimension means summed
    * in vec_id order (`mean0`/`cbm`), empty cells keeping their seed via
    * the left join — mirroring [[graft.ops.ProductQuant]]'s trained
    * codebook stage by stage (the p62 BPE-merge unrolling technique).
    */
  private val pqSubCtes =
    """sub AS (SELECT vec_id, u.s.sub AS sub, u.s.sv AS sv FROM (
      |  SELECT vec_id, unnest(list_transform(generate_series(0, 15),
      |    s -> struct_pack(sub := s, sv := v[(s*4+1):(s*4+4)]))) AS s FROM e) u(vec_id, s)),
      |cb0 AS (SELECT sub AS cs, vec_id AS j, sv AS cv FROM sub WHERE vec_id < 64),
      |d0 AS (SELECT sub.vec_id, sub.sub, cb0.j, sub.sv,
      |  list_sum(list_transform(generate_series(1, 4), k -> (sv[k]-cv[k])*(sv[k]-cv[k]))) AS d2
      |  FROM sub JOIN cb0 ON sub.sub = cb0.cs),
      |a0 AS (SELECT vec_id, sub, j, sv FROM (
      |  SELECT vec_id, sub, j, sv, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn
      |  FROM d0) x WHERE rn = 1),
      |dim0 AS (SELECT sub, j, ks.k, sv[ks.k] AS x, vec_id, vec_id >> 8 AS bkt
      |  FROM a0, (SELECT unnest(generate_series(1, 4)) AS k) ks),
      |bsb0 AS (SELECT sub, j, k, bkt, list_sum(list(x ORDER BY vec_id)) AS bs,
      |  CAST(COUNT(*) AS BIGINT) AS cnt FROM dim0 GROUP BY 1, 2, 3, 4),
      |mean0 AS (SELECT sub, j, k, list_sum(list(bs ORDER BY bkt)) / CAST(SUM(cnt) AS BIGINT) AS c
      |  FROM bsb0 GROUP BY 1, 2, 3),
      |cbm AS (SELECT sub AS cs, j, list(c ORDER BY k) AS cv FROM mean0 GROUP BY 1, 2),
      |cb AS (SELECT cb0.cs, cb0.j, COALESCE(cbm.cv, cb0.cv) AS cv
      |  FROM cb0 LEFT JOIN cbm ON cb0.cs = cbm.cs AND cb0.j = cbm.j)""".stripMargin

  /** BPE training CTE chain (shared by p62 merges + p70 encode): corpus →
    * (word, freq) vocabulary, char-level framed segmentation (each piece
    * as chr(31) piece chr(30), so a framed-pair replace() is exactly
    * BPE's left-to-right non-overlapping merge scan), then 3 unrolled
    * greedy iterations — pairsN counts over the current segmentation,
    * topN the (count desc, pair asc) winner, segN the re-segmentation.
    */
  private val bpeTrainCtes: String =
    ("""vocab AS (
      |  SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM (
      |    SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
      |  WHERE length(word) >= 2 GROUP BY 1),
      |seg0 AS (SELECT freq, array_to_string(list_transform(generate_series(1, length(word)),
      |    i -> chr(31) || substr(word, i, 1) || chr(30)), '') AS enc FROM vocab),
      |""" + (1 to 3).map { n =>
      s"""pairs$n AS (
      |  SELECT p.p1 AS p1, p.p2 AS p2, CAST(SUM(freq) AS BIGINT) AS cnt FROM (
      |    SELECT freq, unnest(list_transform(generate_series(1, len(pcs) - 1),
      |      i -> {'p1': pcs[i], 'p2': pcs[i+1]})) AS p
      |    FROM (SELECT freq, string_split(substr(enc, 2, length(enc) - 2),
      |        chr(30) || chr(31)) AS pcs FROM seg${n - 1})
      |  ) GROUP BY 1, 2),
      |top$n AS (SELECT p1, p2, cnt FROM pairs$n ORDER BY cnt DESC, p1, p2 LIMIT 1),
      |seg$n AS (SELECT freq, replace(enc,
      |    (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top$n),
      |    (SELECT chr(31) || p1 || p2 || chr(30) FROM top$n)) AS enc FROM seg${n - 1})"""
    }.mkString(",\n")).stripMargin

  /** Shared CTE chain for the exact-substring span family (p85/p87):
    * winnowed position-carrying anchors, df-capped candidate pairs, text
    * fetch, and the binary-lifting left/right extension (el/er) around
    * each anchor — everything up to the per-query policy tail.
    */
  private val substringSpanCtes: String =
    """co AS (SELECT [783945459, 799482117, 864499429, 447241920, 853136842, 188810867,
        |    522219709, 274910315, 718545499, 281243405, 621975598, 891031477, 512613922,
        |    887503681, 28629151, 923521, 29791, 961, 31, 1] AS c),
        |cps AS (SELECT doc_id, text, length(text) AS n,
        |    list_transform(generate_series(1, length(text)),
        |      i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS cp
        |  FROM documents),
        |h AS (SELECT doc_id, text,
        |  CASE WHEN n >= 20 THEN list_transform(generate_series(1, n - 19),
        |      i -> CAST((cp[i+0]*783945459 + cp[i+1]*799482117 + cp[i+2]*864499429
        |        + cp[i+3]*447241920 + cp[i+4]*853136842 + cp[i+5]*188810867
        |        + cp[i+6]*522219709 + cp[i+7]*274910315 + cp[i+8]*718545499
        |        + cp[i+9]*281243405 + cp[i+10]*621975598 + cp[i+11]*891031477
        |        + cp[i+12]*512613922 + cp[i+13]*887503681 + cp[i+14]*28629151
        |        + cp[i+15]*923521 + cp[i+16]*29791 + cp[i+17]*961 + cp[i+18]*31
        |        + cp[i+19]) % 1000000007 AS BIGINT))
        |  ELSE [CAST(coalesce(list_sum(list_transform(generate_series(1, n),
        |    j -> cp[j] * c[20 - n + j])), 0) % 1000000007 AS BIGINT)] END AS h
        |  FROM cps CROSS JOIN co),
        |mnl AS (SELECT doc_id, text, h, list_transform(generate_series(1, greatest(len(h) - 7, 1)),
        |    i -> list_min(h[(i):(i+7)])) AS mins FROM h),
        |aw AS (SELECT doc_id, text, unnest(list_transform(generate_series(1, len(mins)),
        |    i -> mins[i] * 4294967296 + i + list_indexof(h[(i):(i+7)], mins[i]) - 1)) AS fp
        |  FROM mnl),
        |anch0 AS (SELECT DISTINCT doc_id, fp // 4294967296 AS hash,
        |    CAST(fp % 4294967296 AS BIGINT) AS pos,
        |    substr(text, CAST(fp % 4294967296 AS INT), 20) AS gram FROM aw),
        |anch AS (SELECT doc_id, hash, gram, MIN(pos) AS pos
        |  FROM anch0 GROUP BY 1, 2, 3),
        |rare AS (SELECT hash FROM (
        |    SELECT hash, COUNT(DISTINCT doc_id) AS nd FROM anch GROUP BY 1) z
        |  WHERE nd BETWEEN 2 AND 10),
        |a2 AS (SELECT anch.* FROM anch JOIN rare USING (hash)),
        |pr AS (SELECT x.hash, x.doc_id AS doc_a, x.pos AS pa, y.doc_id AS doc_b, y.pos AS pb
        |  FROM a2 x JOIN a2 y ON x.hash = y.hash AND x.gram = y.gram AND x.doc_id < y.doc_id),
        |tx AS (SELECT pr.*, da.text AS ta, db.text AS tb
        |  FROM pr JOIN documents da ON da.doc_id = pr.doc_a
        |  JOIN documents db ON db.doc_id = pr.doc_b),
        |x0 AS (SELECT doc_a, doc_b, hash, ta, tb, pa, pb,
        |  greatest(least(60, pa - 1, pb - 1), 0) AS ml,
        |  greatest(least(60, length(ta) - (pa + 19), length(tb) - (pb + 19)), 0) AS mr,
        |  0 AS el, 0 AS er FROM tx),
        |x1 AS (SELECT doc_a, doc_b, hash, ta, tb, pa, pb, ml, mr,
        |  el + CASE WHEN el + 32 <= ml AND substr(ta, CAST(pa - el - 32 AS INT), el + 32) = substr(tb, CAST(pb - el - 32 AS INT), el + 32) THEN 32 ELSE 0 END AS el,
        |  er + CASE WHEN er + 32 <= mr AND substr(ta, CAST(pa + 20 AS INT), er + 32) = substr(tb, CAST(pb + 20 AS INT), er + 32) THEN 32 ELSE 0 END AS er
        |  FROM x0),
        |x2 AS (SELECT doc_a, doc_b, hash, ta, tb, pa, pb, ml, mr,
        |  el + CASE WHEN el + 16 <= ml AND substr(ta, CAST(pa - el - 16 AS INT), el + 16) = substr(tb, CAST(pb - el - 16 AS INT), el + 16) THEN 16 ELSE 0 END AS el,
        |  er + CASE WHEN er + 16 <= mr AND substr(ta, CAST(pa + 20 AS INT), er + 16) = substr(tb, CAST(pb + 20 AS INT), er + 16) THEN 16 ELSE 0 END AS er
        |  FROM x1),
        |x3 AS (SELECT doc_a, doc_b, hash, ta, tb, pa, pb, ml, mr,
        |  el + CASE WHEN el + 8 <= ml AND substr(ta, CAST(pa - el - 8 AS INT), el + 8) = substr(tb, CAST(pb - el - 8 AS INT), el + 8) THEN 8 ELSE 0 END AS el,
        |  er + CASE WHEN er + 8 <= mr AND substr(ta, CAST(pa + 20 AS INT), er + 8) = substr(tb, CAST(pb + 20 AS INT), er + 8) THEN 8 ELSE 0 END AS er
        |  FROM x2),
        |x4 AS (SELECT doc_a, doc_b, hash, ta, tb, pa, pb, ml, mr,
        |  el + CASE WHEN el + 4 <= ml AND substr(ta, CAST(pa - el - 4 AS INT), el + 4) = substr(tb, CAST(pb - el - 4 AS INT), el + 4) THEN 4 ELSE 0 END AS el,
        |  er + CASE WHEN er + 4 <= mr AND substr(ta, CAST(pa + 20 AS INT), er + 4) = substr(tb, CAST(pb + 20 AS INT), er + 4) THEN 4 ELSE 0 END AS er
        |  FROM x3),
        |x5 AS (SELECT doc_a, doc_b, hash, ta, tb, pa, pb, ml, mr,
        |  el + CASE WHEN el + 2 <= ml AND substr(ta, CAST(pa - el - 2 AS INT), el + 2) = substr(tb, CAST(pb - el - 2 AS INT), el + 2) THEN 2 ELSE 0 END AS el,
        |  er + CASE WHEN er + 2 <= mr AND substr(ta, CAST(pa + 20 AS INT), er + 2) = substr(tb, CAST(pb + 20 AS INT), er + 2) THEN 2 ELSE 0 END AS er
        |  FROM x4),
        |x6 AS MATERIALIZED (SELECT doc_a, doc_b, hash, ta, tb, pa, pb, ml, mr,
        |  el + CASE WHEN el + 1 <= ml AND substr(ta, CAST(pa - el - 1 AS INT), el + 1) = substr(tb, CAST(pb - el - 1 AS INT), el + 1) THEN 1 ELSE 0 END AS el,
        |  er + CASE WHEN er + 1 <= mr AND substr(ta, CAST(pa + 20 AS INT), er + 1) = substr(tb, CAST(pb + 20 AS INT), er + 1) THEN 1 ELSE 0 END AS er
        |  FROM x5)""".stripMargin


  private val embCtes =
    """e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
      |n AS (SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e)""".stripMargin

  /** Hyperplane-sign bucket as CTEs over an `e(vec_id, v)` relation. The
    * plane weights live in an 8-row `pl` table joined to the vectors —
    * inlining each 64-element literal into the per-row lambda (the
    * previous form) makes DuckDB rebuild the list per element: 19.5 s vs
    * 0.06 s at sf0.1, identical buckets (the per-plane dot is the same
    * list_sum fold, and the 2^p bucket sum is integer).
    */
  private val lshBucketCtes: String = {
    val rows = Similarity.planes(8, 64).zipWithIndex.map { case (w, p) =>
      val arr = w.map(x => if (x > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
      s"SELECT $p AS p, CAST($arr AS DOUBLE[]) AS pw"
    }.mkString(" UNION ALL ")
    s"""pl AS ($rows),
       |dotp AS (SELECT vec_id, p,
       |  list_sum(list_transform(generate_series(1, 64), k -> v[k] * pw[k])) AS d
       |  FROM e CROSS JOIN pl),
       |bk AS (SELECT vec_id,
       |  CAST(SUM(CASE WHEN d > 0 THEN (CAST(1 AS BIGINT) << p) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM dotp GROUP BY vec_id)""".stripMargin
  }

  // ---- entries -----------------------------------------------------------

  val all: Seq[Q] = Seq(

    Q.df(
      "p01_dedup_exact_stats",
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS n_dups
        |FROM documents GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.exactStats(t(s, dir, "documents"))
    },

    Q.df(
      "p02_dedup_exact_keep",
      """SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)""") { (s, dir) =>
      Dedup.exactKeep(t(s, dir, "documents"))
    },

    Q.df(
      "p03_dedup_ngram_jaccard",
      s"""WITH $shingleCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pair AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT i, j, jac FROM (
         |  SELECT i, j, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jac
         |  FROM pair JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j) p
         |WHERE jac >= 0.8""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairs(t(s, dir, "documents"), 3, 0.8)
    },

    Q.df(
      "p04_dedup_minhash_lsh",
      s"""WITH $minhashCtes
         |SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
         |FROM band a JOIN band c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id""".stripMargin) {
      (s, dir) => Dedup.minhashLshCandidates(t(s, dir, "documents"))
    },

    Q.df(
      "p05_simhash",
      s"""WITH $simhashCtes
         |SELECT doc_id, simhash FROM sig""".stripMargin) { (s, dir) =>
      Dedup.simhash(t(s, dir, "documents"))
    },

    Q.df(
      "p06_simhash_pairs",
      matCtes(s"""WITH $simhashCtes
         |SELECT i, j, dist FROM (
         |  SELECT a.doc_id AS i, c.doc_id AS j,
         |    CAST(bit_count(xor(a.simhash, c.simhash)) AS INT) AS dist
         |  FROM sig a JOIN sig c ON a.doc_id < c.doc_id) p
         |WHERE dist <= 6""".stripMargin, "sig")) { (s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), 6)
    },

    Q.df(
      "p07_simhash_banded",
      s"""WITH $simhashCtes,
         |ch AS (SELECT doc_id, simhash, c, (simhash >> (8 * c)) & 255 AS v
         |  FROM sig, (SELECT unnest([0, 1, 2, 3]) AS c) cs)
         |SELECT DISTINCT i, j, dist FROM (
         |  SELECT a.doc_id AS i, b.doc_id AS j,
         |    CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS dist
         |  FROM ch a JOIN ch b ON a.c = b.c AND a.v = b.v AND a.doc_id < b.doc_id) p
         |WHERE dist <= 3""".stripMargin) { (s, dir) =>
      Dedup.simhashBandedCandidates(t(s, dir, "documents"), 3)
    },

    Q.df(
      "p08_embed_neardup",
      s"""WITH $embCtes
         |SELECT i, j, cos FROM (
         |  SELECT a.vec_id AS i, b.vec_id AS j,
         |    list_sum(list_transform(generate_series(1, len(a.v)), k -> a.v[k] * b.v[k])) / (a.nrm * b.nrm) AS cos
         |  FROM n a JOIN n b ON a.vec_id < b.vec_id) p
         |WHERE cos >= 0.4""".stripMargin) { (s, dir) =>
      Similarity.nearDupPairs(t(s, dir, "embeddings"), 0.4)
    },

    Q.df(
      "p09_ann_topk",
      s"""WITH $embCtes,
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
         |scored AS (SELECT q.q_id, n.vec_id AS n_id,
         |  list_sum(list_transform(generate_series(1, len(qv)), k -> qv[k] * v[k])) / (qn * nrm) AS cos
         |  FROM n JOIN q ON n.vec_id <> q.q_id)
         |SELECT q_id, n_id, rnk, cos FROM (
         |  SELECT q_id, n_id, cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
         |  FROM scored) r
         |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(emb, emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    },

    Q.df(
      "p10_ann_lsh_buckets",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |$lshBucketCtes
         |SELECT vec_id, bucket FROM bk""".stripMargin) {
      (s, dir) => Similarity.lshBuckets(t(s, dir, "embeddings"))
    },

    Q.df(
      "p11_ann_lsh_candidates",
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |$lshBucketCtes
         |SELECT a.vec_id AS i, c.vec_id AS j, a.bucket AS bucket
         |FROM bk a JOIN bk c ON a.bucket = c.bucket AND a.vec_id < c.vec_id""".stripMargin) {
      (s, dir) => Similarity.lshCandidates(t(s, dir, "embeddings"))
    },

    Q.df(
      "p12_langid",
      """WITH b AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
        |  CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the','a','of','and','to'))) AS DOUBLE) AS en_h,
        |  CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('le','la','les','de','et'))) AS DOUBLE) AS fr_h,
        |  CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('el','los','las','y','en'))) AS DOUBLE) AS es_h,
        |  CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('der','die','das','und','ist'))) AS DOUBLE) AS de_h,
        |  CASE WHEN octet_length(encode(text)) > length(text) THEN 1.0 ELSE 0.0 END AS zh
        |  FROM documents)
        |SELECT doc_id,
        |  en_h / n_words AS en_ratio, fr_h / n_words AS fr_ratio,
        |  es_h / n_words AS es_ratio, de_h / n_words AS de_ratio,
        |  CASE WHEN zh > 0 THEN 'zh'
        |       WHEN en_h / n_words >= fr_h / n_words AND en_h / n_words >= es_h / n_words AND en_h / n_words >= de_h / n_words THEN 'en'
        |       WHEN fr_h / n_words >= es_h / n_words AND fr_h / n_words >= de_h / n_words THEN 'fr'
        |       WHEN es_h / n_words >= de_h / n_words THEN 'es'
        |       ELSE 'de' END AS pred_lang
        |FROM b""".stripMargin) { (s, dir) =>
      TextOps.langId(t(s, dir, "documents"))
    },

    Q.df(
      "p13_quality_score",
      """WITH b AS (SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
        |  CAST(length(text) AS DOUBLE) AS n_chars,
        |  CAST(length(replace(text, ' ', '')) AS DOUBLE) AS no_space,
        |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS punct,
        |  CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the','a','of','and','to'))) AS DOUBLE) AS stop_hits
        |  FROM documents)
        |SELECT doc_id, n_words,
        |  no_space / n_words AS avg_wlen,
        |  punct / n_chars AS punct_ratio,
        |  stop_hits / n_words AS stop_ratio,
        |  LEAST(n_words / 100.0, 1.0) * 0.25
        |    + (stop_hits / n_words) * 0.25
        |    + (1.0 - punct / n_chars) * 0.25
        |    + (CASE WHEN no_space / n_words BETWEEN 3.0 AND 8.0 THEN 0.25 ELSE 0.0 END) AS quality
        |FROM b""".stripMargin) { (s, dir) =>
      TextOps.qualityScore(t(s, dir, "documents"))
    },

    Q.df(
      "p14_token_counts",
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
        |  CAST(length(text) AS BIGINT) AS n_chars_obs
        |FROM documents""".stripMargin) { (s, dir) =>
      TextOps.tokenCounts(t(s, dir, "documents"))
    },

    Q.df(
      "p15_fingerprint",
      """SELECT doc_id,
        |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (a, c) -> (a * 31 + c) % 1000000007) AS BIGINT) AS fp,
        |  substr(md5(text), 1, 8) AS md5_8
        |FROM documents""".stripMargin) { (s, dir) =>
      TextOps.fingerprints(s, t(s, dir, "documents"))
    },

    Q.df(
      "p17_ivf_assign",
      s"""WITH $embCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16)
         |SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM n, cent) x
         |WHERE r = 1""".stripMargin) { (s, dir) =>
      Similarity.ivfAssign(t(s, dir, "embeddings"))
    },

    Q.df(
      "p18_ivf_topk",
      s"""WITH $embCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM n, cent) x WHERE r = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 4),
         |qc AS (SELECT q_id, qv, qn, cell FROM (
         |  SELECT q.q_id, q.qv, q.qn, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * cent.cv[i])) / (q.qn * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM q, cent) y WHERE r <= 4),
         |cand AS (
         |  SELECT qc.q_id, qc.qv, qc.qn, n.vec_id, n.v, n.nrm
         |  FROM qc JOIN asg ON qc.cell = asg.cell JOIN n ON n.vec_id = asg.vec_id
         |  WHERE n.vec_id <> qc.q_id)
         |SELECT q_id, n_id, rnk, cos FROM (
         |  SELECT q_id, vec_id AS n_id,
         |    list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i])) / (qn * nrm) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i])) / (qn * nrm) DESC,
         |      vec_id) AS rnk
         |  FROM cand) z
         |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 4), 5, 4, 16)
    },

    Q.sql(
      "p19_sessionize_batch",
      """WITH ordered AS (
        |  SELECT user_id, ts, event_id,
        |    LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |flagged AS (
        |  SELECT user_id, ts, event_id,
        |    CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 10 MINUTE THEN 1 ELSE 0 END AS new_sess
        |  FROM ordered),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess_id
        |  FROM flagged)
        |SELECT user_id, sess_id, COUNT(*) AS n_events, MIN(ts) AS s_start, MAX(ts) AS s_end
        |FROM sess GROUP BY user_id, sess_id""".stripMargin),

    Q.df(
      "p20_asof_join",
      """SELECT e.event_id, e.user_id, e.ts,
        |  (SELECT o.o_orderkey FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_orderkey,
        |  (SELECT o.o_totalprice FROM orders o
        |   WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |   ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1) AS o_totalprice
        |FROM events e""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      graft.ops.AsOf.join(
        t(s, dir, "events").select("event_id", "user_id", "ts"),
        t(s, dir, "orders"),
        leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        payload = Seq("o_orderkey", "o_totalprice"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("_asof_o_orderkey").as("o_orderkey"),
          col("_asof_o_totalprice").as("o_totalprice"))
    },

    // Approximate sketches (HLL distinct, quantile sketches): the scale
    // substitutes for exact distinct/percentile. Sketch VALUES differ
    // across engines (different HLL/percentile algorithms), so the raw
    // outputs cannot hash-match an oracle — instead the query emits the
    // EXACT distinct counts alongside boolean accuracy verdicts computed
    // in-engine, and the oracle states the counts and asserts every
    // verdict TRUE; the driver's rows+schema+hash compare thus gates BOTH
    // the exact aggregates and the sketches' error bounds.
    //
    // HLL verdict: within 10% relative error of the exact distinct count
    // (default rsd is 5%, so 2 sigma). Percentile verdict: the sketch's
    // own guarantee is on RANK, so each approx value v is checked by
    // counting the corpus against it — v's rank band [count(<v),
    // count(<=v)] must intersect [(q-0.01)n, (q+0.01)n], two orders wider
    // than the 1e-4 rank error at default accuracy. The rank check is one
    // conditional-count aggregate against the broadcast 1-row sketch
    // (map-side combinable); Spark's exact `percentile` would state the
    // same bound but costs ~2 s at sf0.1 buffering value maps, vs ~0.1 s
    // for the counts.
    Q.df(
      "p21_approx_stats",
      """SELECT CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS exact_supps,
        |  TRUE AS parts_ok, TRUE AS supps_ok,
        |  TRUE AS p50_ok, TRUE AS p90_ok, TRUE AS p99_ok
        |FROM lineitem""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      // Single-purpose 1-row aggregates, cross-joined (broadcast of 1-row
      // relations): folding the two distincts and the sketches into one
      // agg would make Catalyst's multi-distinct rewrite Expand the scan
      // 4x and replicate the sketch buffers through it — 5x slower
      // measured.
      val li = t(s, dir, "lineitem")
      val parts = li.agg(
        countDistinct(col("l_partkey")).as("exact_parts"),
        approx_count_distinct(col("l_partkey")).as("ap"))
      val supps = li.agg(
        countDistinct(col("l_suppkey")).as("exact_supps"),
        approx_count_distinct(col("l_suppkey")).as("asup"))
      val sketch = li.agg(
        expr("approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99))").as("q"),
        count(lit(1)).as("n"))
      def rankOk(i: Int, q: Double) = {
        val v = element_at(col("q"), i)
        val le = sum(when(col("l_extendedprice") <= v, 1L).otherwise(0L))
        val lt = sum(when(col("l_extendedprice") < v, 1L).otherwise(0L))
        (le >= first(col("n")) * (q - 0.01) &&
          lt <= first(col("n")) * (q + 0.01)).as(s"p${(q * 100).toInt}_ok")
      }
      val pctOk = li.select(col("l_extendedprice")).crossJoin(broadcast(sketch))
        .agg(rankOk(1, 0.5), rankOk(2, 0.9), rankOk(3, 0.99))
      parts.crossJoin(supps).crossJoin(pctOk)
        .select(
          col("exact_parts"), col("exact_supps"),
          (abs(col("ap") - col("exact_parts")) <=
            col("exact_parts") * 0.1).as("parts_ok"),
          (abs(col("asup") - col("exact_supps")) <=
            col("exact_supps") * 0.1).as("supps_ok"),
          col("p50_ok"), col("p90_ok"), col("p99_ok"))
    },

    // Multimodal metadata over REAL container bytes: per doc, an actual
    // png/gif/jpeg header is synthesized with dimensions derived from
    // (n_chars, doc_id), then extractMeta parses it back byte-level
    // (MediaHeaders) — the oracle states the parsed fields arithmetically,
    // including the container's exact byte length (fixed per format by its
    // header layout: png 33, gif 13, jpeg 21). The md5 payload fingerprint
    // is real too but binary-derived, so OpsSpec (not the SQL oracle) pins
    // it; the corpus entry projects the oracle-stateable columns.
    Q.df(
      "p16_multimodal_meta",
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |       WHEN 2 THEN 'jpeg' ELSE 'mp4' END AS fmt,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 33 WHEN 1 THEN 13
        |       WHEN 2 THEN 21 ELSE 280 END AS BIGINT) AS byte_len,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN n_chars % 640 + 1
        |       WHEN 1 THEN n_chars % 320 + 1 WHEN 2 THEN n_chars % 1024 + 1
        |       ELSE n_chars % 1920 + 1 END AS INT) AS width,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN doc_id % 480 + 1
        |       WHEN 1 THEN doc_id % 240 + 1 WHEN 2 THEN doc_id % 768 + 1
        |       ELSE doc_id % 1080 + 1 END AS INT) AS height,
        |  CASE WHEN CAST(doc_id % 4 AS INT) = 3 THEN 1 ELSE 3 END AS channels
        |FROM documents""".stripMargin) { (s, dir) =>
      Multimodal.extractMeta(s,
        graft.ops.MediaHeaders.synthesizeContainers(s, t(s, dir, "documents")))
        .drop("fingerprint")
    },

    // Cluster resolution over the VERIFIED near-duplicate pairs (the p03
    // edge set — candidates are clustered only after exact verification;
    // raw LSH candidate graphs chain through false positives into giant
    // components that are not duplicate groups): connected components by
    // iterative min-label propagation Spark-side; the oracle derives the
    // same components as a recursive transitive-closure CTE — feasible in
    // DuckDB because verified dup clusters are small, while the Spark
    // loop is the shape that scales.
    Q.df(
      "p26_dedup_clusters",
      s"""WITH RECURSIVE $shingleCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pairx AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (SELECT i, j FROM (
         |  SELECT i, j, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jac
         |  FROM pairx JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j) p
         |  WHERE jac >= 0.8),
         |e AS (SELECT i AS src, j AS dst FROM jp UNION SELECT j AS src, i AS dst FROM jp),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         |comp AS (SELECT src AS doc_id, MIN(dst) AS min_reach FROM reach GROUP BY src)
         |SELECT d.doc_id,
         |  CAST(CASE WHEN comp.min_reach IS NULL OR d.doc_id < comp.min_reach
         |       THEN d.doc_id ELSE comp.min_reach END AS BIGINT) AS cluster_id
         |FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id""".stripMargin) {
      (s, dir) =>
        val docs = t(s, dir, "documents")
        graft.ops.DedupClusters.connectedComponents(
          docs, Dedup.ngramJaccardPairs(docs, 3, 0.8))
    },

    // Vocabulary building: corpus-wide term and document frequencies —
    // the tokenizer-training precursor. Pure integer aggregates (exact in
    // any engine); one shuffle on the token.
    Q.df(
      "p27_vocabulary",
      """SELECT word,
        |  CAST(COUNT(*) AS BIGINT) AS tf,
        |  CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df
        |FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |      FROM documents) w
        |GROUP BY word""".stripMargin) { (s, dir) =>
      TextOps.vocabulary(t(s, dir, "documents"))
    },

    // Deterministic sampling family: membership is a pure function of
    // md5(key) — reproducible across engines (hence oracle-able) and
    // cluster sizes, auditable row-locally at 100 TB. h56 = first 14 md5
    // hex chars as int64, the same construction the minhash family uses.
    Q.df(
      "p23_hash_sample",
      s"""SELECT doc_id, lang, source FROM documents
         |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
         |  < ${graft.ops.Sampling.thresholdFor(0.1)}""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      graft.ops.Sampling.hashSample(t(s, dir, "documents"), 0.1, col("doc_id"))
        .select(col("doc_id"), col("lang"), col("source"))
    },

    Q.df(
      "p24_split_assign",
      """SELECT doc_id,
        |  CASE WHEN b < 90 THEN 'train'
        |       WHEN b < 95 THEN 'validation'
        |       ELSE 'test' END AS split
        |FROM (SELECT doc_id,
        |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) % 100 AS b
        |  FROM documents) x""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      graft.ops.Sampling.splitAssign(t(s, dir, "documents"), col("doc_id"))
        .select(col("doc_id"), col("split"))
    },

    Q.df(
      "p25_stratified_sample",
      """SELECT doc_id, source FROM (
        |  SELECT doc_id, source, ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT), doc_id) AS rk
        |  FROM documents) x
        |WHERE rk <= 20""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      graft.ops.Sampling.stratifiedSample(
        t(s, dir, "documents"), col("source"), 20, col("doc_id"))
        .select(col("doc_id"), col("source"))
    },

    // k-means M-step over the IVF cells: per-(cell, dim) centroid means
    // via the two-level hierarchical exact-order fold (vec_id within
    // bucket, bucket across — double addition is order-dependent, and
    // the bucketing is what keeps per-group state bounded at scale; the
    // oracle states the identical fold chain).
    Q.df(
      "p36_kmeans_step",
      s"""WITH $embCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM n, cent) x WHERE r = 1),
         |px AS (SELECT a.vec_id, a.vec_id >> 8 AS bkt, a.cell, CAST(i - 1 AS INT) AS pos, e.v[i] AS x
         |  FROM asg a JOIN e ON e.vec_id = a.vec_id
         |  CROSS JOIN generate_series(1, 64) t(i)),
         |bsb AS (SELECT cell, pos, bkt, list_sum(list(x ORDER BY vec_id)) AS bs,
         |  CAST(COUNT(*) AS BIGINT) AS cnt FROM px GROUP BY 1, 2, 3)
         |SELECT cell, pos,
         |  list_sum(list(bs ORDER BY bkt)) / CAST(SUM(cnt) AS BIGINT) AS c
         |FROM bsb GROUP BY cell, pos""".stripMargin) { (s, dir) =>
      Similarity.kmeansStep(t(s, dir, "embeddings"), 16, 8)
    },

    // int8 quantization (4x ANN index memory reduction), scalarized for
    // the driver's canonicalizer: per-vector scale plus summary stats of
    // the quantized array stand in for the array itself.
    Q.df(
      "p35_quantize_int8",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |s AS (SELECT vec_id, v, CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale FROM a),
        |q AS (SELECT vec_id, scale, list_transform(v, x -> CAST(FLOOR(x * scale + 0.5) AS INT)) AS qv FROM s)
        |SELECT vec_id, scale,
        |  CAST(list_sum(qv) AS BIGINT) AS q_sum,
        |  list_min(qv) AS q_min, list_max(qv) AS q_max
        |FROM q""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      Similarity.quantizeInt8(t(s, dir, "embeddings"))
        .select(col("vec_id"), col("scale"),
          expr("aggregate(q, 0L, (a, x) -> a + x)").as("q_sum"),
          expr("array_min(q)").as("q_min"),
          expr("array_max(q)").as("q_max"))
    },

    // Point-in-interval join (attribution windows): every event landing
    // within one hour after a purchase by the same user. The oracle
    // states the plain theta join; the Spark side runs the bucketed
    // equi-join form (RangeJoin) — same rows, no per-key nested loop.
    Q.df(
      "p34_range_join",
      """SELECT e.event_id, p.event_id AS purchase_id FROM events e
        |JOIN events p ON p.event_type = 'purchase'
        |AND p.user_id = e.user_id
        |AND e.ts >= p.ts
        |AND e.ts < p.ts + INTERVAL 1 HOUR""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val events = t(s, dir, "events")
      val points = events.select(col("event_id"), col("user_id"), col("ts"))
      val windows = events.filter(col("event_type") === "purchase").select(
        col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("w_start"),
        (col("ts") + expr("INTERVAL 1 HOUR")).as("w_end"))
      graft.ops.RangeJoin.pointInRange(
        points, windows, "user_id", "p_user", "ts", "w_start", "w_end",
        granularitySec = 3600L)
        .select(col("event_id"), col("purchase_id"))
    },

    // Benchmark decontamination: corpus docs leaking evaluation content.
    // The pseudo-benchmark is the deterministic 5% hash sample, so both
    // engines derive the identical benchmark set.
    Q.df(
      "p31_decontam_exact",
      s"""WITH bench AS (SELECT doc_id, text FROM documents
         |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
         |    < ${graft.ops.Sampling.thresholdFor(0.05)}),
         |b AS (SELECT doc_id AS bench_doc_id, md5(substr(text, 1, 100)) AS h FROM bench),
         |c AS (SELECT doc_id AS corpus_doc_id, md5(substr(text, 1, 100)) AS h FROM documents)
         |SELECT bench_doc_id, corpus_doc_id
         |FROM b JOIN c USING (h)
         |WHERE bench_doc_id <> corpus_doc_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      val docs = t(s, dir, "documents")
      graft.ops.Decontamination.exactOverlap(
        docs, graft.ops.Sampling.hashSample(docs, 0.05, col("doc_id")),
        prefixLen = 100)
    },

    Q.df(
      "p32_decontam_ngram",
      s"""WITH bench AS (SELECT doc_id, text FROM documents
         |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
         |    < ${graft.ops.Sampling.thresholdFor(0.05)}),
         |${shingleCteN(8, "documents", "csh")},
         |${shingleCteN(8, "bench", "bsh")}
         |SELECT bench_doc_id, corpus_doc_id, shared FROM (
         |  SELECT b.doc_id AS bench_doc_id, c.doc_id AS corpus_doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS shared
         |  FROM bsh b JOIN csh c ON b.shingle = c.shingle AND b.doc_id <> c.doc_id
         |  GROUP BY 1, 2) p
         |WHERE shared >= 3""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      val docs = t(s, dir, "documents")
      graft.ops.Decontamination.ngramOverlap(
        docs, graft.ops.Sampling.hashSample(docs, 0.05, col("doc_id")), 8, 3)
    },

    // The curation funnel, composed from the operators above: exact-dedup
    // survivors with an adequate stopword ratio, thinned by the
    // deterministic 50% sample — the end-to-end shape of a corpus
    // curation pass, verifying the operators compose.
    Q.df(
      "p33_curation_funnel",
      s"""WITH keep AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
         |q AS (SELECT doc_id FROM documents
         |  WHERE CAST(len(list_filter(string_split(lower(text), ' '),
         |      w -> w IN ('the','a','of','and','to'))) AS DOUBLE)
         |    / len(string_split(text, ' ')) >= 0.04)
         |SELECT d.doc_id, d.n_chars FROM documents d
         |JOIN keep ON keep.doc_id = d.doc_id
         |JOIN q ON q.doc_id = d.doc_id
         |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14) AS BIGINT)
         |  < ${graft.ops.Sampling.thresholdFor(0.5)}""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      val docs = t(s, dir, "documents")
      val keep = Dedup.exactKeep(docs)
      val quality = TextOps.qualityScore(docs)
        .filter(col("stop_ratio") >= 0.04).select(col("doc_id"))
      graft.ops.Sampling.hashSample(
        docs.join(keep, "doc_id").join(quality, "doc_id"), 0.5, col("doc_id"))
        .select(col("doc_id"), col("n_chars"))
    },

    // PII scrubbing: map-only regex redaction with per-doc match counts.
    // The pattern strings use the portable regex subset so the same
    // pattern means the same thing in Spark and the DuckDB oracle.
    Q.df(
      "p29_redact",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(text,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '[0-9]{10,}', '[NUMBER]', 'g') AS clean_text,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '[0-9]{10,}')) AS BIGINT) AS n_numbers
        |FROM documents""".stripMargin) { (s, dir) =>
      TextOps.redact(t(s, dir, "documents"))
    },

    // Sequence packing: concatenate docs in doc_id order and cut at a
    // 512-token budget — bin = how many full budgets precede the doc's
    // first token. The global running sum behind it is the distributed
    // prefix-sum (partition sums -> offsets), NOT the single-partition
    // `SUM OVER (ORDER BY)` window the oracle uses.
    Q.df(
      "p30_seq_pack",
      """SELECT doc_id, n_tokens,
        |  CAST((cum - n_tokens) // 512 AS BIGINT) AS bin
        |FROM (
        |  SELECT doc_id, n_tokens,
        |    SUM(n_tokens) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
        |        FROM documents) t) x""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions._
      val docs = t(s, dir, "documents")
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
      graft.ops.GlobalRank.prefixSum(docs, Seq(col("doc_id")), col("n_tokens"), "cum")
        .select(col("doc_id"), col("n_tokens"),
          expr("CAST((cum - n_tokens) div 512 AS BIGINT)").as("bin"))
    },

    // Skew-safe aggregation: the salted two-stage plan computes the SAME
    // answer as a plain GROUP BY (the oracle), but no reducer ever sees
    // more than ~1/16 of a hot key's rows — the planned answer to key
    // skew where AQE's runtime skew handling (joins only) cannot help.
    Q.df(
      "p28_salted_agg",
      """SELECT user_id AS key,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS DOUBLE) AS total
        |FROM events GROUP BY user_id""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      graft.ops.Skew.saltedCountSum(
        t(s, dir, "events"), col("user_id"), col("event_id"), col("value"))
    },

    // Frame sampling over REAL parsed headers: resize dims and the frame
    // fingerprint derive from the byte-parsed container fields; only the
    // frame COUNT is the documented demux stub ((width*height) % 30 + 1 —
    // no video demuxer in this container), which the oracle states.
    Q.df(
      "p22_frame_sample",
      """WITH m AS (SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |       WHEN 2 THEN 'jpeg' ELSE 'mp4' END AS fmt,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN n_chars % 640 + 1
        |       WHEN 1 THEN n_chars % 320 + 1 WHEN 2 THEN n_chars % 1024 + 1
        |       ELSE n_chars % 1920 + 1 END AS INT) AS width,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN doc_id % 480 + 1
        |       WHEN 1 THEN doc_id % 240 + 1 WHEN 2 THEN doc_id % 768 + 1
        |       ELSE doc_id % 1080 + 1 END AS INT) AS height,
        |  -- mp4: the synthesized stsz sample count (real container
        |  -- metadata graft reads back via the box walk); still images:
        |  -- the documented deterministic stand-in.
        |  CASE WHEN CAST(doc_id % 4 AS INT) = 3 THEN (n_chars + doc_id) % 120 + 1
        |       ELSE (CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN n_chars % 640 + 1
        |              WHEN 1 THEN n_chars % 320 + 1 ELSE n_chars % 1024 + 1 END AS BIGINT)
        |             * CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN doc_id % 480 + 1
        |              WHEN 1 THEN doc_id % 240 + 1 ELSE doc_id % 768 + 1 END AS BIGINT)) % 30 + 1
        |  END AS n_frames
        |  FROM documents)
        |SELECT doc_id,
        |  CAST(frame_idx AS INT) AS frame_idx,
        |  CAST(width // 2 + 1 AS INT) AS frame_w,
        |  CAST(height // 2 + 1 AS INT) AS frame_h,
        |  md5(fmt || ':' || CAST(width AS VARCHAR) || 'x' || CAST(height AS VARCHAR)
        |    || '#' || CAST(frame_idx AS VARCHAR)) AS frame_fp
        |FROM (SELECT doc_id, fmt, width, height,
        |  unnest(range(0, n_frames, 5)) AS frame_idx FROM m) f""".stripMargin) {
      (s, dir) =>
        Multimodal.sampleFrames(s,
          graft.ops.MediaHeaders.synthesizeContainers(s, t(s, dir, "documents")), 5)
    },

    // Gopher-style repetition signals: integer counts only, so any engine
    // reproduces them exactly (no fraction arithmetic enters the result).
    Q.df(
      "p37_repetition",
      """WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |wc AS (SELECT doc_id, word, COUNT(*) AS c FROM (
        |  SELECT doc_id, unnest(w) AS word FROM ws) x GROUP BY 1, 2),
        |top AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_words,
        |  CAST(MAX(c) AS BIGINT) AS top_word_n FROM wc GROUP BY 1),
        |g AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |  i -> w[i] || ' ' || w[i+1])) AS gram FROM ws WHERE len(w) >= 2),
        |ga AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_2grams,
        |  CAST(COUNT(DISTINCT gram) AS BIGINT) AS nd FROM g GROUP BY 1)
        |SELECT t.doc_id, t.n_words, t.top_word_n,
        |  COALESCE(ga.n_2grams, 0) AS n_2grams,
        |  COALESCE(ga.n_2grams - ga.nd, 0) AS dup_2grams
        |FROM top t LEFT JOIN ga USING (doc_id)""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.repetitionSignals(t(s, dir, "documents"))
    },

    // Retrieval-prep chunking: overlapping 64-token windows, stride 48.
    // Map-only — no shuffle at any corpus size.
    Q.df(
      "p38_chunk",
      """WITH ws AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |k AS (SELECT doc_id, w, unnest(generate_series(0,
        |  ((CASE WHEN len(w) > 64 THEN len(w) - 64 ELSE 0 END) + 47) // 48)) AS k
        |  FROM ws)
        |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
        |  CAST(len(list_slice(w, k * 48 + 1, k * 48 + 64)) AS BIGINT) AS n_chunk_tokens,
        |  md5(array_to_string(list_slice(w, k * 48 + 1, k * 48 + 64), ' ')) AS chunk_md5
        |FROM k""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.chunk(t(s, dir, "documents"), 64, 48)
    },

    // Distinctive-term extraction: the corpus-rarest term per doc (argmax
    // of idf alone — integer document frequencies, no float log).
    Q.df(
      "p39_rare_terms",
      """WITH wrd AS (SELECT DISTINCT doc_id, word FROM (
        |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word
        |  FROM documents) x),
        |dfq AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS df FROM wrd GROUP BY 1),
        |r AS (SELECT doc_id, word, df, ROW_NUMBER() OVER (
        |  PARTITION BY doc_id ORDER BY df, word) AS rn
        |  FROM wrd JOIN dfq USING (word))
        |SELECT doc_id, word AS rare_term, df FROM r WHERE rn = 1""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.rarestTerm(t(s, dir, "documents"))
    },

    // Bloom-prefiltered n-gram decontamination: same answer as the plain
    // join (the oracle states it directly), but the corpus side is
    // filtered through a broadcast Bloom sketch of the benchmark's
    // shingles BEFORE the shuffle — at 100 TB only ~fpp of corpus
    // shingles travel. 6-grams, >=2 shared, vs p32's 8-grams/>=3.
    Q.df(
      "p40_decontam_bloom",
      s"""WITH bench AS (SELECT doc_id, text FROM documents
         |  WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT)
         |    < ${graft.ops.Sampling.thresholdFor(0.05)}),
         |${shingleCteN(6, "documents", "csh")},
         |${shingleCteN(6, "bench", "bsh")}
         |SELECT bench_doc_id, corpus_doc_id, shared FROM (
         |  SELECT b.doc_id AS bench_doc_id, c.doc_id AS corpus_doc_id,
         |    CAST(COUNT(*) AS BIGINT) AS shared
         |  FROM bsh b JOIN csh c ON b.shingle = c.shingle AND b.doc_id <> c.doc_id
         |  GROUP BY 1, 2) p
         |WHERE shared >= 2""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.functions.col
      val docs = t(s, dir, "documents")
      graft.ops.Decontamination.ngramOverlapBloom(
        docs, graft.ops.Sampling.hashSample(docs, 0.05, col("doc_id")), 6, 2)
    },

    // ANN over the int8-quantized index (p35's quantizer feeding p09's
    // broadcast + bounded-heap search): integer dot products dequantized
    // by the amax factors — exact small-integer arithmetic in doubles, so
    // the ranking is reproducible bit-for-bit in any engine.
    Q.df(
      "p41_ann_quantized_topk",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
        |a AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS amax FROM e),
        |s AS (SELECT vec_id, v, amax, CASE WHEN amax > 0 THEN 127.0 / amax ELSE 1.0 END AS scale FROM a),
        |qz AS (SELECT vec_id, amax,
        |  list_transform(v, x -> CAST(CAST(FLOOR(x * scale + 0.5) AS INT) AS DOUBLE)) AS qv FROM s),
        |qq AS (SELECT vec_id AS q_id, amax AS q_amax, qv AS qqv FROM qz WHERE vec_id < 8),
        |scored AS (SELECT qq.q_id, d.vec_id AS n_id,
        |  list_sum(list_transform(generate_series(1, len(qqv)), k -> qqv[k] * qv[k]))
        |    * q_amax * amax / 16129.0 AS adot
        |  FROM qz d JOIN qq ON d.vec_id <> qq.q_id)
        |SELECT q_id, n_id, rnk, adot FROM (
        |  SELECT q_id, n_id, adot,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adot DESC, n_id) AS rnk
        |  FROM scored) r
        |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.quantizedTopK(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8), 5)
    },

    // Skew-safe fact-to-dim join: same rows as the plain equi-join (the
    // oracle), but a hot user_id's events land on 16 reducers, not one.
    Q.df(
      "p42_salted_join",
      """SELECT e.event_id, c.c_nationkey
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey""".stripMargin) {
      (s, dir) =>
        import org.apache.spark.sql.functions.col
        graft.ops.Skew.saltedJoin(
          t(s, dir, "events"),
          t(s, dir, "customer").select(col("c_custkey"), col("c_nationkey")),
          "user_id", "c_custkey", col("event_id"))
          .select(col("event_id"), col("c_nationkey"))
    },

    // Product quantization, encode step: each 64-dim vector -> 16 centroid
    // codes (4-dim subspaces, 64 centroids each, TRAINED: first-64 seed
    // refined by one Lloyd iteration with vec_id-ordered mean folds).
    // Squared-L2 per subspace is a sequential fold; ties break on
    // centroid id — bit-reproducible in any engine.
    Q.df(
      "p43_pq_assign",
      matCtes(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |$pqSubCtes,
         |d AS (SELECT sub.vec_id, sub.sub, cb.j,
         |  list_sum(list_transform(generate_series(1, 4), k -> (sv[k]-cv[k])*(sv[k]-cv[k]))) AS d2
         |  FROM sub JOIN cb ON sub.sub = cb.cs),
         |r AS (SELECT vec_id, sub, j, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn FROM d)
         |SELECT vec_id, CAST(sub AS INT) AS sub, CAST(j AS INT) AS code FROM r WHERE rn = 1""".stripMargin,
        "e", "sub", "cb0", "a0", "cbm", "cb")) {
      (s, dir) => ProductQuant.pqAssign(t(s, dir, "embeddings"), bucketShift = 8)
    },

    // Product quantization, ADC search: per-query (16 x 64) exact subspace
    // distance table, corpus vectors scored by summing their 16 looked-up
    // entries in fixed subspace order. The corpus side of the join is the
    // codes table (16 small ints per vector), not the raw vectors — the
    // memory shape that keeps a 100 TB index resident.
    Q.df(
      "p44_pq_adc_topk",
      matCtes(s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings),
         |$pqSubCtes,
         |d AS (SELECT sub.vec_id, sub.sub, cb.j,
         |  list_sum(list_transform(generate_series(1, 4), k -> (sv[k]-cv[k])*(sv[k]-cv[k]))) AS d2
         |  FROM sub JOIN cb ON sub.sub = cb.cs),
         |codes AS (SELECT vec_id, sub, j AS code FROM (
         |  SELECT vec_id, sub, j, ROW_NUMBER() OVER (PARTITION BY vec_id, sub ORDER BY d2, j) AS rn FROM d) x
         |  WHERE rn = 1),
         |lut AS (SELECT sub.vec_id AS q_id, sub.sub AS qs, cb.j,
         |  list_sum(list_transform(generate_series(1, 4), k -> (sv[k]-cv[k])*(sv[k]-cv[k]))) AS d2
         |  FROM sub JOIN cb ON sub.sub = cb.cs WHERE sub.vec_id < 8),
         |scored AS (SELECT q_id, c.vec_id AS n_id, list_sum(list(d2 ORDER BY c.sub)) AS adist
         |  FROM codes c JOIN lut ON c.sub = lut.qs AND c.code = lut.j AND c.vec_id <> lut.q_id
         |  GROUP BY 1, 2)
         |SELECT q_id, n_id, CAST(rnk AS INT) AS rnk, adist FROM (
         |  SELECT q_id, n_id, adist,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY adist, n_id) AS rnk
         |  FROM scored) r
         |WHERE rnk <= 5""".stripMargin, "e", "sub", "cb0", "a0", "cbm", "cb")) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      ProductQuant.pqTopK(emb,
        emb.filter(col("vec_id") < 8), 5, bucketShift = 8)
    },

    // Passage-level dedup: 3-word chunks appearing in more than 3 distinct
    // documents are boilerplate; each document keeps its unique chunks in
    // original order. The frequency pass is one hash aggregate on chunk
    // text; reconstruction state is bounded by document length.
    Q.df(
      "p45_passage_dedup",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, u.s.cid AS cid, u.s.chunk AS chunk FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, CAST(ceil(len(ws)/3.0) AS INT)-1),
        |    i -> struct_pack(cid := i, chunk := array_to_string(ws[(i*3+1):(i*3+3)], ' ')))) AS s
        |  FROM w) u(doc_id, s)),
        |f AS (SELECT chunk, COUNT(DISTINCT doc_id) AS cdf FROM c GROUP BY 1)
        |SELECT c.doc_id,
        |  CAST(COUNT(*) FILTER (WHERE cdf <= 3) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) FILTER (WHERE cdf > 3) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(chunk, ' ' ORDER BY cid) FILTER (WHERE cdf <= 3), '') AS clean_text
        |FROM c JOIN f USING (chunk)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      Boilerplate.removeSharedPassages(t(s, dir, "documents"), 3, 3)
    },

    // Exact rank-quantile length band (drop shortest/longest 5%): the
    // cutoff is the smallest value whose running count reaches
    // ceil(p * n) — integer arithmetic end to end, so both engines derive
    // the identical band. Data pass is a map-only filter against the two
    // broadcast cutoffs.
    Q.df(
      "p46_quantile_band",
      """WITH v AS (SELECT n_chars AS val, CAST(COUNT(*) AS BIGINT) AS cnt FROM documents GROUP BY 1),
        |cum AS (SELECT val, SUM(cnt) OVER (ORDER BY val) AS cle,
        |  (SELECT SUM(cnt) FROM v) AS n FROM v),
        |lo AS (SELECT MIN(val) AS lo FROM cum WHERE cle >= CAST(ceil(0.05 * n) AS BIGINT)),
        |hi AS (SELECT MIN(val) AS hi FROM cum WHERE cle >= CAST(ceil(0.95 * n) AS BIGINT))
        |SELECT doc_id, n_chars FROM documents, lo, hi
        |WHERE n_chars >= lo AND n_chars <= hi""".stripMargin) { (s, dir) =>
      Quantiles.outlierFilter(t(s, dir, "documents"), col("n_chars"), 0.05, 0.95)
        .select(col("doc_id"), col("n_chars"))
    },

    // Real container-header parsing round-trip: per doc, ACTUAL png/gif/
    // jpeg header bytes are synthesized with dimensions derived from
    // (n_chars, doc_id), then parsed back by the byte-level header walker
    // (graft.ops.MediaHeaders) — the oracle states the parsed result
    // arithmetically. Row-local both ways; no shuffle.
    Q.df(
      "p47_media_headers",
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |       WHEN 2 THEN 'jpeg' ELSE 'mp4' END AS fmt,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN n_chars % 640 + 1
        |       WHEN 1 THEN n_chars % 320 + 1 WHEN 2 THEN n_chars % 1024 + 1
        |       ELSE n_chars % 1920 + 1 END AS INT) AS width,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN doc_id % 480 + 1
        |       WHEN 1 THEN doc_id % 240 + 1 WHEN 2 THEN doc_id % 768 + 1
        |       ELSE doc_id % 1080 + 1 END AS INT) AS height,
        |  CASE WHEN CAST(doc_id % 4 AS INT) = 3 THEN 1 ELSE 3 END AS channels
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.ops.MediaHeaders.parseHeaders(s,
        graft.ops.MediaHeaders.synthesizeContainers(s, t(s, dir, "documents")))
    },

    // Directional containment near-dup pairs: catches subset duplication
    // (a short doc quoted inside a long one) that symmetric Jaccard
    // misses. Intersections come from the hash-partitioned shingle
    // equi-join — linear in total shingle volume; worst case (a shingle
    // shared corpus-wide) is the same hot-key caveat as p03's
    // verification stage, with minhashLshCandidates as the pre-block at
    // corpus scale (see Dedup.containmentPairs docs).
    Q.df(
      "p48_containment",
      s"""WITH $shingleCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |ip AS (SELECT a.doc_id AS i, b.doc_id AS j, CAST(COUNT(*) AS BIGINT) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
         |  GROUP BY 1, 2)
         |SELECT i, j, contain FROM (
         |  SELECT i, j, CAST(inter AS DOUBLE) / CAST(cnt.n_sh AS DOUBLE) AS contain
         |  FROM ip JOIN cnt ON cnt.doc_id = i) p
         |WHERE contain >= 0.9""".stripMargin) { (s, dir) =>
      Dedup.containmentPairs(t(s, dir, "documents"), 3, 0.9)
    },

    // BM25 scoring against a fixed query bag (rational idf — the un-logged
    // rational argument is order-equivalent to ln and IEEE-exact, which is
    // what lets two engines hash-match ranking scores). Corpus stats are
    // one tiny driver-collected aggregate folded in as literals; scoring
    // itself is map-only at scan speed. The oracle replays the identical
    // double arithmetic: same operand order, constants written as the same
    // IEEE expressions ((1.2 + 1.0), not 2.2 — decimal renderings of
    // computed doubles need not round-trip).
    Q.df(
      "p49_bm25",
      PipelineOps.bm25OracleSql(Seq("query", "join", "scan"))) { (s, dir) =>
      TextOps.bm25(t(s, dir, "documents"), Seq("query", "join", "scan"))
    },

    // Distribution rebalancing (data mixing): downsample each language
    // stratum toward the smallest with sqrt temperature (lang is the
    // skewed stratum in the testdata — en dominates — so the shrink path
    // actually runs). Membership stays the row-local
    // h56 < floor(sqrt(min_n/n_s) * 2^56) test — one tiny broadcast of
    // per-stratum thresholds, no corpus shuffle, and sqrt / floor / the
    // 2^56 scale are all IEEE-exact, so the oracle derives the identical
    // kept set.
    // Semantic decontamination: corpus embeddings within cosine 0.4 of a
    // benchmark embedding (the deterministic 5% hash sample) — catches
    // paraphrased leakage no n-gram check sees. The benchmark side
    // broadcasts; the corpus streams through the codegen'd vec_dot at
    // scan speed — linear, unlike the all-pairs cosine baseline.
    Q.df(
      "p51_decontam_semantic",
      s"""WITH $embCtes,
         |b AS (SELECT vec_id AS bench_id, v AS bv, nrm AS bn FROM n
         |  WHERE CAST('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 14) AS BIGINT)
         |    < ${graft.ops.Sampling.thresholdFor(0.05)})
         |SELECT bench_id, corpus_id, cos FROM (
         |  SELECT b.bench_id, n.vec_id AS corpus_id,
         |    list_sum(list_transform(generate_series(1, len(n.v)), k -> b.bv[k] * n.v[k])) / (b.bn * n.nrm) AS cos
         |  FROM n JOIN b ON n.vec_id <> b.bench_id) p
         |WHERE cos >= 0.4""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      graft.ops.Decontamination.embeddingOverlap(
        emb, graft.ops.Sampling.hashSample(emb, 0.05, col("vec_id")), 0.4)
    },

    // Cross-document 2-gram novelty: the share of a doc's distinct
    // 2-grams that appear in NO other document — duplicated/boilerplate
    // docs score low, original text high. Integer counts + one division;
    // two vocabulary-sized hash shuffles, nothing quadratic.
    Q.df(
      "p52_ngram_novelty",
      """WITH ws AS (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents),
        |g AS (SELECT DISTINCT doc_id, gram FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> w[i] || ' ' || w[i+1])) AS gram
        |  FROM ws WHERE len(w) >= 2) x),
        |dfq AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS gdf FROM g GROUP BY 1)
        |SELECT doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_distinct_grams,
        |  CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_grams,
        |  CAST(SUM(CASE WHEN gdf = 1 THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS novelty
        |FROM g JOIN dfq USING (gram)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.ngramNovelty(t(s, dir, "documents"), 2)
    },

    // One BPE merge-candidate pass (tokenizer-training inner loop):
    // corpus-wide adjacent character-pair counts inside words, top 20.
    // Pure integer counts; the rank window runs over the alphabet²-
    // bounded pair relation, not the corpus.
    Q.df(
      "p53_bpe_pairs",
      """WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |pr AS (SELECT unnest(list_transform(generate_series(1, length(word) - 1),
        |  i -> substr(word, i, 2))) AS pair
        |  FROM w WHERE length(word) >= 2),
        |c AS (SELECT pair, CAST(COUNT(*) AS BIGINT) AS cnt FROM pr GROUP BY 1)
        |SELECT pair, cnt, rk FROM (
        |  SELECT pair, cnt, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, pair) AS INT) AS rk
        |  FROM c) x
        |WHERE rk <= 20""".stripMargin) { (s, dir) =>
      TextOps.bpePairCounts(t(s, dir, "documents"), 20)
    },

    // OOV rate against the top-100-by-frequency vocabulary: the
    // does-this-tokenizer-cover-this-slice signal. Vocab truncation is a
    // distributed top-k (no global sort), then a broadcast join.
    Q.df(
      "p54_oov_rate",
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |v AS (SELECT w FROM (
        |  SELECT w, COUNT(*) AS tf FROM tok GROUP BY 1
        |  ORDER BY tf DESC, w LIMIT 100) x)
        |SELECT tok.doc_id,
        |  CAST(COUNT(*) AS BIGINT) AS n_tokens,
        |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |  CAST(SUM(CASE WHEN v.w IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) AS oov_rate
        |FROM tok LEFT JOIN v ON tok.w = v.w
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.oovRate(t(s, dir, "documents"), 100)
    },

    // Edit-distance verification over MinHash-LSH candidates: order-aware
    // near-dup confirmation (Jaccard-identical word bags still differ
    // here). The levenshtein DP is capped at 200 chars and runs only on
    // LSH candidates — per-pair constant cost, linear candidate volume.
    Q.df(
      "p55_editdist_pairs",
      s"""WITH $minhashCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
         |  FROM band a JOIN band c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id)
         |SELECT i, j, dist FROM (
         |  SELECT i, j, CAST(levenshtein(substr(da.text, 1, 200), substr(db.text, 1, 200)) AS INT) AS dist
         |  FROM cand JOIN documents da ON da.doc_id = i JOIN documents db ON db.doc_id = j) v
         |WHERE dist <= 40""".stripMargin) { (s, dir) =>
      Dedup.editDistancePairs(t(s, dir, "documents"), 40, 200)
    },

    // Supervised probe TRAINING (the step before p56's scoring): one
    // full-batch gradient-descent step of a linear probe predicting
    // English membership from integer text features. Label and features
    // are integers, weights/lr exact decimals, no division anywhere —
    // residuals, gradient sums, and updated weights are exact decimal
    // arithmetic (order-independent, unlike double sums) and reproduce
    // bit-identically in any engine; only the output casts to double.
    // Gradient sums re-cast to DECIMAL(24,6) before the lr product so no
    // intermediate exceeds decimal(38) in either engine. One map-side-
    // combinable aggregate — a gradient step at 100 TB is a single scan.
    Q.df(
      "p71_linear_probe_step",
      """WITH f AS (SELECT
        |    CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('the','a','of','and','to'))) AS x1,
        |    len(list_filter(string_split(lower(text), ' '),
        |      w -> w IN ('le','la','les','de','et'))) AS x2,
        |    len(string_split(lower(text), ' ')) AS x3
        |  FROM documents),
        |r AS (SELECT y, x1, x2, x3,
        |    CAST(0.010000 AS DECIMAL(12,6)) + CAST(0.020000 AS DECIMAL(12,6)) * x1
        |      + CAST(-0.010000 AS DECIMAL(12,6)) * x2
        |      + CAST(0.000100 AS DECIMAL(12,6)) * x3 - y AS res
        |  FROM f),
        |g AS (SELECT
        |    CAST(SUM(res) AS DECIMAL(24,6)) AS g0,
        |    CAST(SUM(res * x1) AS DECIMAL(24,6)) AS g1,
        |    CAST(SUM(res * x2) AS DECIMAL(24,6)) AS g2,
        |    CAST(SUM(res * x3) AS DECIMAL(24,6)) AS g3
        |  FROM r),
        |w AS (SELECT * FROM (VALUES
        |    (0, CAST(0.010000 AS DECIMAL(12,6))),
        |    (1, CAST(0.020000 AS DECIMAL(12,6))),
        |    (2, CAST(-0.010000 AS DECIMAL(12,6))),
        |    (3, CAST(0.000100 AS DECIMAL(12,6)))) AS t(k, w0))
        |SELECT CAST(w.k AS INT) AS k,
        |  CAST(w.w0 AS DOUBLE) AS w_before,
        |  CAST(CASE w.k WHEN 0 THEN g0 WHEN 1 THEN g1 WHEN 2 THEN g2 ELSE g3 END AS DOUBLE) AS grad,
        |  CAST(w.w0 - CAST(0.000000001 AS DECIMAL(10,9))
        |    * (CASE w.k WHEN 0 THEN g0 WHEN 1 THEN g1 WHEN 2 THEN g2 ELSE g3 END) AS DOUBLE) AS w_after
        |FROM w CROSS JOIN g""".stripMargin) { (s, dir) =>
      graft.ops.Probe.linearProbeStep(t(s, dir, "documents"))
    },

    // INCREMENTAL dedup — the production shape: the doc_id%5=0 slice
    // plays the incoming crawl batch, the rest the already-curated
    // corpus. LSH-banded candidates against existing + earlier-incoming,
    // exact-Jaccard verification, min-id-keeps; every incoming doc is
    // emitted with its duplicate counts so drop reasons are auditable.
    // The existing side contributes only its banded signatures + shingle
    // sets — the relations a production pipeline persists.
    Q.df(
      "p72_incremental_dedup",
      (s"""WITH ${shingleCteN(3, "documents WHERE doc_id % 5 <> 0", "ex_sh")},
         |${shingleCteN(3, "documents WHERE doc_id % 5 = 0", "inc_sh")},
         |${minhashCtesFor("ex")},
         |${minhashCtesFor("inc")},
         |ex_cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM ex_sh GROUP BY 1),
         |inc_cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM inc_sh GROUP BY 1),
         |cand_ex AS (SELECT DISTINCT a.doc_id AS i, e.doc_id AS j
         |  FROM inc_band a JOIN ex_band e ON a.b = e.b AND a.v = e.v),
         |cand_in AS (SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
         |  FROM inc_band a JOIN inc_band c ON a.b = c.b AND a.v = c.v AND c.doc_id < a.doc_id),
         |int_ex AS (SELECT c.i, c.j, COUNT(*) AS inter FROM cand_ex c
         |  JOIN inc_sh sa ON sa.doc_id = c.i
         |  JOIN ex_sh sb ON sb.doc_id = c.j AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |ver_ex AS (SELECT i, COUNT(*) AS nd FROM (
         |  SELECT x.i FROM int_ex x JOIN inc_cnt ca ON ca.doc_id = x.i
         |    JOIN ex_cnt cb ON cb.doc_id = x.j
         |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8) v GROUP BY 1),
         |int_in AS (SELECT c.i, c.j, COUNT(*) AS inter FROM cand_in c
         |  JOIN inc_sh sa ON sa.doc_id = c.i
         |  JOIN inc_sh sb ON sb.doc_id = c.j AND sb.shingle = sa.shingle
         |  GROUP BY 1, 2),
         |ver_in AS (SELECT i, COUNT(*) AS nd FROM (
         |  SELECT x.i FROM int_in x JOIN inc_cnt ca ON ca.doc_id = x.i
         |    JOIN inc_cnt cb ON cb.doc_id = x.j
         |  WHERE CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) >= 0.8) v GROUP BY 1)
         |SELECT d.doc_id,
         |  CAST(COALESCE(ve.nd, 0) AS BIGINT) AS n_dup_existing,
         |  CAST(COALESCE(vi.nd, 0) AS BIGINT) AS n_dup_prior,
         |  (COALESCE(ve.nd, 0) = 0 AND COALESCE(vi.nd, 0) = 0) AS keep
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
         |LEFT JOIN ver_ex ve ON ve.i = d.doc_id
         |LEFT JOIN ver_in vi ON vi.i = d.doc_id""").stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      Dedup.incrementalKeep(
        docs.filter(col("doc_id") % 5 =!= 0), docs.filter(col("doc_id") % 5 === 0))
    },

    // Corpus data-card report: the per-source summary a dataset release
    // publishes. Integer aggregates + a deterministic dominant-language
    // argmax (highest count, ties to the smallest code); ratios left to
    // the reader so no division can diverge across engines.
    Q.df(
      "p73_corpus_report",
      """WITH t AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |    CAST(COUNT(DISTINCT md5(text)) AS BIGINT) AS n_distinct_texts,
        |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_ws_tokens,
        |    CAST(SUM(length(text)) AS BIGINT) AS n_chars
        |  FROM documents GROUP BY 1),
        |lc AS (SELECT source, lang, COUNT(*) AS ln FROM documents GROUP BY 1, 2),
        |tl AS (SELECT source, lang AS top_lang FROM (
        |  SELECT source, lang, ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY ln DESC, lang) AS rn FROM lc) x
        |  WHERE rn = 1)
        |SELECT t.source, n_docs, n_distinct_texts, n_ws_tokens, n_chars, top_lang
        |FROM t JOIN tl ON tl.source = t.source""".stripMargin) { (s, dir) =>
      graft.ops.Report.corpusReport(t(s, dir, "documents"))
    },

    // SemDeDup: paraphrase-level dedup by within-cluster embedding
    // cosine — cluster with the coarse quantizer, drop any vector with a
    // smaller-id neighbor at cosine >= 0.35 in its cell, keep the rest.
    // The oracle replays the identical assignment and pair predicate.
    Q.df(
      "p74_semdedup",
      s"""WITH $embCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM n, cent) x
         |WHERE r = 1),
         |wc AS (SELECT n.vec_id, v, nrm, cell FROM n JOIN asg USING (vec_id)),
         |drp AS (SELECT DISTINCT b.vec_id FROM wc a JOIN wc b
         |  ON a.cell = b.cell AND a.vec_id < b.vec_id
         |  WHERE list_sum(list_transform(generate_series(1, len(a.v)), k -> a.v[k] * b.v[k])) / (a.nrm * b.nrm) >= 0.35)
         |SELECT vec_id, cell FROM wc
         |WHERE vec_id NOT IN (SELECT vec_id FROM drp)""".stripMargin) { (s, dir) =>
      Similarity.semDedupKeep(t(s, dir, "embeddings"))
    },

    // Integerized unigram surprisal (CCNet-style LM quality filter):
    // per-token floor(log2(n_docs/df)) as a pure bit-length, summed per
    // doc — no transcendental log, so any engine reproduces it exactly.
    Q.df(
      "p75_surprisal_score",
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |tf AS (SELECT doc_id, word, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |dfq AS (SELECT word, COUNT(*) AS df FROM tf GROUP BY 1),
        |nd AS (SELECT COUNT(*) AS n_docs FROM documents)
        |SELECT doc_id,
        |  CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |  CAST(SUM(tf * (length(bin(n_docs // df)) - 1)) AS BIGINT) AS surprisal_bits
        |FROM tf JOIN dfq USING (word), nd
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.surprisalScore(t(s, dir, "documents"))
    },

    // Gopher/C4 rule-based quality flags: every rule an integer
    // inequality (no division), char-level C4 signals reported alongside.
    Q.df(
      "p76_gopher_flags",
      """WITH tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w FROM documents),
        |tf AS (SELECT doc_id, w, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
        |st AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_words,
        |    CAST(MAX(tf) AS BIGINT) AS max_tf,
        |    CAST(SUM(tf * length(w)) AS BIGINT) AS sum_len,
        |    CAST(SUM(CASE WHEN w IN ('the','a','of','and','to') THEN 1 ELSE 0 END) AS BIGINT) AS stop_distinct
        |  FROM tf GROUP BY 1),
        |cf AS (SELECT doc_id, regexp_matches(text, '[.!?]$') AS ends_punct,
        |    contains(text, '{') AS has_brace FROM documents)
        |SELECT st.doc_id, n_words, max_tf, stop_distinct,
        |  (n_words >= 20 AND n_words <= 100000) AS ok_word_count,
        |  (3 * n_words <= sum_len AND sum_len <= 10 * n_words) AS ok_mean_word_len,
        |  (max_tf * 8 <= n_words) AS ok_repetition,
        |  (stop_distinct >= 2) AS ok_stopwords,
        |  ends_punct, has_brace,
        |  ((n_words >= 20 AND n_words <= 100000)
        |    AND (3 * n_words <= sum_len AND sum_len <= 10 * n_words)
        |    AND (max_tf * 8 <= n_words) AND (stop_distinct >= 2)) AS keep
        |FROM st JOIN cf ON cf.doc_id = st.doc_id""".stripMargin) { (s, dir) =>
      TextOps.gopherC4Flags(t(s, dir, "documents"))
    },

    // Feature-hashing linear classifier (fastText-style quality-filter
    // shape): hashing-trick bucket weights summed per doc, mean weight as
    // the score. Map-only; deterministic stand-in weights make the score
    // engine-reproducible.
    Q.df(
      "p56_hash_classifier",
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, w ->
        |    (CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1024) % 13 - 6)) AS BIGINT) AS wsum
        |  FROM tok)
        |SELECT doc_id, n_tokens, wsum,
        |  CAST(wsum AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS score,
        |  (CAST(wsum AS DOUBLE) / CAST(n_tokens AS DOUBLE)) > 0.0 AS keep
        |FROM s""".stripMargin) { (s, dir) =>
      TextOps.hashClassifierScore(t(s, dir, "documents"), 1024)
    },

    // Deterministic corpus shuffle + fixed-size training shards: global
    // permutation by md5(doc_id), rank via the distributed GlobalRank
    // (range repartition + offsets — the oracle's single-reducer window
    // is exactly what the op avoids), 64-row shards.
    Q.df(
      "p57_shuffle_shards",
      """SELECT doc_id, rn, CAST((rn - 1) // 64 AS BIGINT) AS shard_id FROM (
        |  SELECT doc_id, ROW_NUMBER() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) x""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.shuffleShards(t(s, dir, "documents"), 64, col("doc_id"))
        .select(col("doc_id"), col("rn"), col("shard_id"))
    },

    // Adjacent-word collocations: top-30 pairs by count with lift =
    // (n_ab * N) / (n_a * n_b) over positional marginals — PMI without
    // the log, so no transcendental drift between engines.
    Q.df(
      "p58_cooccurrence_lift",
      """WITH w AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |p AS (SELECT u.s.w1 AS w1, u.s.w2 AS w2 FROM (
        |  SELECT unnest(list_transform(generate_series(1, len(w) - 1),
        |    i -> struct_pack(w1 := w[i], w2 := w[i+1]))) AS s
        |  FROM w WHERE len(w) >= 2) u(s)),
        |c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n_ab FROM p GROUP BY 1, 2),
        |la AS (SELECT w1, CAST(COUNT(*) AS BIGINT) AS n_a FROM p GROUP BY 1),
        |rb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n_b FROM p GROUP BY 1),
        |tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM p),
        |top AS (SELECT w1, w2, n_ab,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n_ab DESC, w1, w2) AS INT) AS rk
        |  FROM c ORDER BY n_ab DESC, w1, w2 LIMIT 30)
        |SELECT w1, w2, n_ab, rk,
        |  (CAST(n_ab AS DOUBLE) * CAST(nn AS DOUBLE))
        |    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS lift
        |FROM top JOIN la USING (w1) JOIN rb USING (w2) CROSS JOIN tt""".stripMargin) {
      (s, dir) => graft.ops.CorpusSignals.cooccurrenceLift(t(s, dir, "documents"), 30)
    },

    // Intra-document repetition trim: keep the first occurrence of each
    // repeated 3-word chunk WITHIN a doc (cross-doc boilerplate is p45's
    // job). Row-local reconstruction, md5-checked.
    Q.df(
      "p59_selfrep_trim",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |ck AS (SELECT doc_id, list_transform(generate_series(0, CAST(ceil(len(ws)/3.0) AS INT) - 1),
        |    i -> array_to_string(ws[(i*3+1):(i*3+3)], ' ')) AS ch
        |  FROM w),
        |kp AS (SELECT doc_id, ch, list_filter(ch, (c, i) -> list_position(ch, c) = i) AS kept FROM ck)
        |SELECT doc_id, CAST(len(ch) AS BIGINT) AS n_chunks,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  md5(array_to_string(kept, ' ')) AS trimmed_md5
        |FROM kp""".stripMargin) { (s, dir) =>
      TextOps.selfRepetitionTrim(t(s, dir, "documents"), 3)
    },

    // Sparse TF-IDF cosine verification of LSH candidates: integer
    // weights (idf-capped) make every dot product and norm an exact
    // int64 sum — no float summation-order drift — and the cosine is
    // three fixed-order IEEE ops. The oracle derives the same integers
    // through the shared-term join form; the Spark plan verifies each
    // candidate row-locally against the per-doc weight map instead
    // (the join form is df²-quadratic on shared-vocabulary corpora —
    // the MATERIALIZED pin keeps DuckDB's optimizer from reordering
    // cand⋈w⋈w into exactly that quadratic term-term join: 0.45 s vs
    // 113 s at sf0.1, identical rows).
    Q.df(
      "p60_tfidf_cosine",
      s"""WITH $minhashCtes,
         |cand AS (SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
         |  FROM band a JOIN band c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id),
         |tok AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
         |tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
         |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
         |dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |w AS (SELECT doc_id, term, tf * LEAST(n_docs // df, 1000) AS w
         |  FROM tf JOIN dfq USING (term) CROSS JOIN nd),
         |nrm AS (SELECT doc_id, SUM(w * w) AS n2 FROM w GROUP BY 1),
         |j1 AS MATERIALIZED (SELECT i, j, a.term AS term, a.w AS aw
         |  FROM cand JOIN w a ON a.doc_id = i),
         |num AS (SELECT i, j, SUM(aw * b.w) AS num
         |  FROM j1 JOIN w b ON b.doc_id = j1.j AND b.term = j1.term
         |  GROUP BY 1, 2)
         |SELECT i, j, cos FROM (
         |  SELECT i, j, CAST(num AS DOUBLE)
         |      / (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos
         |  FROM num JOIN nrm na ON na.doc_id = i JOIN nrm nb ON nb.doc_id = j) x
         |WHERE cos >= 0.9""".stripMargin) { (s, dir) =>
      graft.ops.Similarity.tfidfCosinePairs(t(s, dir, "documents"), 0.9, 1000)
    },

    // Per-group corpus profiling: top-5 terms per language. The window
    // runs over the (group, term) AGGREGATE, never the corpus.
    Q.df(
      "p61_top_terms_per_lang",
      """WITH tok AS (SELECT lang AS grp, unnest(string_split(lower(text), ' ')) AS term FROM documents),
        |c AS (SELECT grp, term, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2)
        |SELECT grp, term, cnt, CAST(rk AS INT) AS rk FROM (
        |  SELECT grp, term, cnt,
        |    ROW_NUMBER() OVER (PARTITION BY grp ORDER BY cnt DESC, term) AS rk
        |  FROM c) x
        |WHERE rk <= 5""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.topTermsPerGroup(t(s, dir, "documents"), col("lang"), 5)
    },

    // Multi-iteration BPE merge training: the learned merge table for 3
    // greedy merges. The oracle unrolls the three argmax+re-segment
    // iterations as chained CTE stages over the (word, freq) vocabulary.
    // Each word's segmentation is encoded as chr(31)||piece||chr(30)
    // runs, so the left-to-right non-overlapping merge IS a plain
    // replace() — the separators anchor matches to piece boundaries
    // (classic BPE space-join trick, boundary-safe without lookbehind,
    // which DuckDB's RE2 lacks), and replace() resumes scanning after
    // each substitution exactly like the Spark fold (a just-merged token
    // never re-merges).
    Q.df(
      "p62_bpe_merges",
      ("WITH " + bpeTrainCtes + """
        |SELECT CAST(1 AS INT) AS step, p1, p2, cnt FROM top1
        |UNION ALL SELECT CAST(2 AS INT), p1, p2, cnt FROM top2
        |UNION ALL SELECT CAST(3 AS INT), p1, p2, cnt FROM top3""").stripMargin) { (s, dir) =>
      TextOps.bpeMerges(t(s, dir, "documents"), 3)
    },

    // BPE ENCODE — the tokenizer-apply step closing the loop on p53/p62:
    // the corpus is re-tokenized by the merge table just trained on it
    // and per-doc post-BPE token counts reported (what a token-budget
    // mixer or packer consumes after tokenizer training). Same framed-
    // piece replace() technique as the training oracle, applied per WORD
    // of every document this time; the merge strings ride along as
    // columns from a 1-row CTE (scalar subqueries can't appear inside
    // DuckDB lambdas). Spark side is one map-only pass: M chained
    // codegen'd replaces per word, token count = piece-terminator count
    // via translate, summed by a row-local fold — no shuffle beyond the
    // training's own vocabulary collapse.
    Q.df(
      "p70_bpe_encode",
      ("WITH " + bpeTrainCtes + """,
        |m AS (SELECT
        |  (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top1) AS f1,
        |  (SELECT chr(31) || p1 || p2 || chr(30) FROM top1) AS t1,
        |  (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top2) AS f2,
        |  (SELECT chr(31) || p1 || p2 || chr(30) FROM top2) AS t2,
        |  (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top3) AS f3,
        |  (SELECT chr(31) || p1 || p2 || chr(30) FROM top3) AS t3),
        |d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
        |  FROM documents),
        |e AS (SELECT doc_id, len(toks) AS n_words,
        |  list_transform(toks, w -> array_to_string(list_transform(generate_series(1, length(w)),
        |    i -> chr(31) || substr(w, i, 1) || chr(30)), '')) AS encs
        |  FROM d),
        |r AS (SELECT doc_id, n_words,
        |  list_transform(encs, s -> replace(replace(replace(s, f1, t1), f2, t2), f3, t3)) AS encs
        |  FROM e CROSS JOIN m)
        |SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
        |  CAST(coalesce(list_sum(list_transform(encs,
        |    s -> length(s) - length(replace(s, chr(30), '')))), 0) AS BIGINT) AS n_tokens
        |FROM r""").stripMargin) { (s, dir) =>
      TextOps.bpeEncode(t(s, dir, "documents"), 3)
    },

    // Winnowing fingerprints: per-position char-8-gram hashes, keep each
    // 4-window's minimum — any >= 11-char match between docs shares a
    // selected fingerprint at ~1/4 the storage of full shingling. The
    // gram hash is the RollingHash polynomial sum(cp_j * 31^(8-j)) mod
    // 1e9+7 (no per-step mod needed: 8 terms stay under 2^58, so the
    // single final mod is congruent with Spark's fold). The oracle
    // unrolls the 8 coefficients per position over a once-per-doc
    // code-point list — the fastest honest DuckDB form found (2.4 s at
    // sf0.1 vs 6.6 s for nested per-char lambdas; the retired md5 form
    // ran 2.2 s, so the hash change does not flatter the comparison).
    Q.df(
      "p63_winnow_fingerprints",
      """WITH cps AS (SELECT doc_id, length(text) AS n,
        |    list_transform(generate_series(1, length(text)),
        |      i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS cp
        |  FROM documents),
        |h AS (SELECT doc_id,
        |  CASE WHEN n >= 8 THEN
        |    list_transform(generate_series(1, n - 7),
        |      i -> CAST((cp[i]*27512614111 + cp[i+1]*887503681 + cp[i+2]*28629151
        |        + cp[i+3]*923521 + cp[i+4]*29791 + cp[i+5]*961 + cp[i+6]*31
        |        + cp[i+7]) % 1000000007 AS BIGINT))
        |  ELSE
        |    [CAST(coalesce(list_sum(list_transform(generate_series(1, n),
        |      j -> cp[j] * CAST(pow(31, n - j) AS BIGINT))), 0) % 1000000007 AS BIGINT)]
        |  END AS h
        |  FROM cps)
        |SELECT DISTINCT doc_id, fp FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, greatest(len(h) - 3, 1)),
        |    i -> list_min(h[(i):(i+3)]))) AS fp
        |  FROM h) x""".stripMargin) { (s, dir) =>
      TextOps.winnowFingerprints(t(s, dir, "documents"), 8, 4)
    },

    // Ordered funnel: users converting view -> first click after that
    // view -> first purchase after that click. Per-step filtered MIN
    // aggregates chained on user_id; no event-log sort anywhere.
    Q.df(
      "p64_funnel",
      """WITH s0 AS (SELECT user_id, MIN(ts) AS t FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |s1 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s0 ON e.user_id = s0.user_id
        |  WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1),
        |s2 AS (SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s0) AS n_view,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_click,
        |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_purchase""".stripMargin) {
      (s, dir) =>
        graft.ops.Funnels.funnelCounts(t(s, dir, "events"),
          Seq("view", "click", "purchase"))
    },

    // Cohort retention triangle: signup-week cohorts x activity week,
    // distinct users. The join is user-dimension x event-projection.
    Q.df(
      "p65_cohort_retention",
      """WITH c AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        |  FROM events WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS activity_week FROM events)
        |SELECT cohort_week, activity_week, CAST(COUNT(DISTINCT a.user_id) AS BIGINT) AS n_active
        |FROM a JOIN c ON a.user_id = c.user_id
        |WHERE activity_week >= cohort_week
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      graft.ops.Funnels.cohortRetention(t(s, dir, "events"), "signup")
    },

    // Volume-anomaly detection: daily event counts >= 2 standard
    // deviations from the type's mean, the z-score test cleared of every
    // denominator into pure integer arithmetic — (n·c − S)² vs
    // 4(n·SS − S²) — so the flag is bit-identical in any engine.
    Q.df(
      "p77_event_spikes",
      """WITH daily AS (SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, COUNT(*) AS n_days, SUM(n_events) AS s,
        |    SUM(n_events * n_events) AS ss FROM daily GROUP BY 1)
        |SELECT daily.event_type, day, CAST(n_events AS BIGINT) AS n_events,
        |  (CAST(n_days * n_events - s AS HUGEINT) * CAST(n_days * n_events - s AS HUGEINT)
        |    >= 4 * (CAST(n_days AS HUGEINT) * CAST(ss AS HUGEINT)
        |            - CAST(s AS HUGEINT) * CAST(s AS HUGEINT))) AS is_spike
        |FROM daily JOIN st USING (event_type)""".stripMargin) { (s, dir) =>
      graft.ops.Funnels.eventSpikes(t(s, dir, "events"))
    },

    // Bigram LM training + greedy next-token table: the KenLM-style
    // counting pass with a deterministic argmax per context. Pair
    // generation is row-local; both aggregates map-side combinable.
    Q.df(
      "p78_bigram_lm",
      """WITH tok AS (SELECT string_split(lower(text), ' ') AS w FROM documents),
        |k AS (SELECT w, unnest(generate_series(1, len(w) - 1)) AS i FROM tok WHERE len(w) >= 2),
        |bc AS (SELECT w[i] AS context, w[i + 1] AS next, COUNT(*) AS cnt FROM k GROUP BY 1, 2),
        |ctx AS (SELECT context, CAST(SUM(cnt) AS BIGINT) AS n_total FROM bc GROUP BY 1),
        |top AS (SELECT context, next AS top_next, CAST(cnt AS BIGINT) AS top_cnt,
        |    ROW_NUMBER() OVER (PARTITION BY context ORDER BY cnt DESC, next DESC) AS rn
        |  FROM bc)
        |SELECT ctx.context, n_total, top_next, top_cnt
        |FROM ctx JOIN top USING (context)
        |WHERE rn = 1
        |ORDER BY n_total DESC, ctx.context
        |LIMIT 20""".stripMargin) { (s, dir) =>
      TextOps.bigramLm(t(s, dir, "documents"))
    },

    // ANALYZE-style column profile: per-column row/null/distinct counts
    // out of ONE stacked scan (no scan-per-column, no multi-distinct
    // Expand). Float columns excluded by contract — their stringified
    // distinct count is an engine formatting detail.
    Q.df(
      "p79_profile", {
      val cols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_returnflag", "l_linestatus", "l_shipdate")
      cols.map(c =>
        s"""SELECT '$c' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           |  CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           |  CAST(COUNT(DISTINCT CAST($c AS VARCHAR)) AS BIGINT) AS n_distinct
           |FROM lineitem""".stripMargin).mkString("\nUNION ALL\n")
    }) { (s, dir) =>
      graft.ops.Report.profile(t(s, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_returnflag", "l_linestatus", "l_shipdate"))
    },

    // Bigram-LM document scoring (the APPLY step of the CCNet-style LM
    // filter; p78 trains, this scores): per-pair integerized surprisal
    // floor(log2(n_ctx / n_pair)) as a bit length, summed per doc. Pair
    // generation row-local; corpus tables vocabulary²-bounded.
    Q.df(
      "p80_bigram_surprisal",
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
        |  FROM tok WHERE len(toks) >= 2) u),
        |dp AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1, 2, 3),
        |pc AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS n_pair FROM dp GROUP BY 1, 2),
        |cc AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_ctx FROM pc GROUP BY 1)
        |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_pairs,
        |  CAST(SUM(c * (length(bin(n_ctx // n_pair)) - 1)) AS BIGINT) AS bigram_bits
        |FROM dp JOIN pc USING (w1, w2) JOIN cc USING (w1)
        |GROUP BY doc_id""".stripMargin) { (s, dir) =>
      // Explicit broadcast — see p119's note; plan identical to r14's
      // probe-selected one, construction now job-free.
      TextOps.bigramSurprisal(t(s, dir, "documents"), joinStrategy = "broadcast")
    },

    // Coverage-targeted vocabulary truncation: smallest frequency-ranked
    // vocab covering >= 95% of token occurrences — exclusive-prefix
    // admission over the distributed prefix sum, integer inequality only.
    // The oracle's global window IS the single-reducer shape the op
    // avoids (it runs on the vocab relation either way, but graft's form
    // stays distributed when the vocab itself is large).
    Q.df(
      "p81_vocab_coverage",
      """WITH tok AS (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents),
        |v AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS cnt FROM tok GROUP BY 1),
        |r AS (SELECT word, cnt, CAST(SUM(cnt) OVER (ORDER BY cnt DESC, word) AS BIGINT) AS cum_count FROM v),
        |t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS total FROM v)
        |SELECT word, cnt, cum_count FROM r, t
        |WHERE (cum_count - cnt) * 100 < 95 * total""".stripMargin) { (s, dir) =>
      graft.ops.CorpusSignals.vocabCoverage(t(s, dir, "documents"))
    },

    // Deterministic negative sampling: 3 pseudo-random corpus negatives
    // per anchor, position = h56(anchor:slot) mod n against the rank
    // index. Reproducible draws; self-draws filtered.
    Q.df(
      "p66_negative_samples",
      """WITH rk AS (SELECT doc_id AS neg_id,
        |    ROW_NUMBER() OVER (ORDER BY doc_id) AS rn FROM documents),
        |nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
        |dr AS (SELECT d.doc_id AS anchor_id, s.slot,
        |    CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(s.slot AS VARCHAR)), 1, 14) AS BIGINT) % n + 1 AS rn
        |  FROM documents d CROSS JOIN nd
        |  CROSS JOIN (SELECT unnest([1, 2, 3]) AS slot) s)
        |SELECT anchor_id, CAST(slot AS INT) AS slot, neg_id
        |FROM dr JOIN rk USING (rn)
        |WHERE neg_id <> anchor_id""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.negativeSamples(t(s, dir, "documents"), 3, col("doc_id"))
    },

    // Hard-negative mining: per query vector, top-5 most-similar corpus
    // vectors with a DIFFERENT label — same broadcast + bounded-heap
    // shape as p09; the label veto rides the join condition.
    Q.df(
      "p67_hard_negatives",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v, label FROM embeddings),
        |n AS (SELECT vec_id, v, label, sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm FROM e),
        |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn, label AS q_label FROM n WHERE vec_id < 8),
        |scored AS (SELECT q.q_id, n.vec_id AS n_id,
        |  list_sum(list_transform(generate_series(1, len(qv)), k -> qv[k] * v[k])) / (qn * nrm) AS cos
        |  FROM n JOIN q ON n.vec_id <> q.q_id AND n.label <> q.q_label)
        |SELECT q_id, n_id, rnk, cos FROM (
        |  SELECT q_id, n_id, cos,
        |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id) AS rnk
        |  FROM scored) r
        |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.hardNegatives(emb, emb.filter(col("vec_id") < 8), 5)
    },

    // Quality-aware dedup keep: one survivor per near-dup cluster — the
    // BEST-scoring doc, not the min id. Cluster CTEs are p26's; the
    // argmax window is per-cluster (duplicate-group-sized partitions).
    Q.df(
      "p68_cluster_best_keep",
      s"""WITH RECURSIVE $shingleCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pairx AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (SELECT i, j FROM (
         |  SELECT i, j, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jac
         |  FROM pairx JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j) p
         |  WHERE jac >= 0.8),
         |e AS (SELECT i AS src, j AS dst FROM jp UNION SELECT j AS src, i AS dst FROM jp),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         |comp AS (SELECT src AS doc_id, MIN(dst) AS min_reach FROM reach GROUP BY src),
         |cl AS (SELECT d.doc_id,
         |  CAST(CASE WHEN comp.min_reach IS NULL OR d.doc_id < comp.min_reach
         |       THEN d.doc_id ELSE comp.min_reach END AS BIGINT) AS cluster_id
         |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
         |qb AS (SELECT doc_id,
         |  CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_words,
         |  CAST(length(text) AS DOUBLE) AS n_chars,
         |  CAST(length(replace(text, ' ', '')) AS DOUBLE) AS no_space,
         |  CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE) AS punct,
         |  CAST(len(list_filter(string_split(lower(text), ' '), w -> w IN ('the','a','of','and','to'))) AS DOUBLE) AS stop_hits
         |  FROM documents),
         |q AS (SELECT doc_id,
         |  LEAST(n_words / 100.0, 1.0) * 0.25
         |    + (stop_hits / n_words) * 0.25
         |    + (1.0 - punct / n_chars) * 0.25
         |    + (CASE WHEN no_space / n_words BETWEEN 3.0 AND 8.0 THEN 0.25 ELSE 0.0 END) AS quality
         |  FROM qb)
         |SELECT cluster_id, doc_id, quality FROM (
         |  SELECT cl.cluster_id, cl.doc_id, q.quality,
         |    ROW_NUMBER() OVER (PARTITION BY cl.cluster_id ORDER BY q.quality DESC, cl.doc_id) AS rk
         |  FROM cl JOIN q ON q.doc_id = cl.doc_id) x
         |WHERE rk = 1""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.DedupClusters.bestPerCluster(
        docs, Dedup.ngramJaccardPairs(docs, 3, 0.8),
        TextOps.qualityScore(docs).select(col("doc_id"), col("quality")))
    },

    // Token-budgeted source mixing: cap each source at 700 tokens, docs
    // admitted in the deterministic h56 shuffle order (exclusive prefix
    // below budget — documents never split).
    Q.df(
      "p69_token_budget_mix",
      """WITH t AS (SELECT source AS src, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |    CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) AS hk
        |  FROM documents),
        |c AS (SELECT src, doc_id, n_tokens,
        |    CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY src ORDER BY hk, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
        |  FROM t)
        |SELECT src, doc_id, n_tokens, cum_before + n_tokens AS cum_tokens
        |FROM c WHERE cum_before < 700""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.tokenBudgetPerStratum(
        t(s, dir, "documents"), col("source"), 700L, col("doc_id"))
    },

    Q.df(
      "p50_rebalance_strata",
      """WITH c AS (SELECT lang AS s, CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1),
        |mn AS (SELECT MIN(n) AS mn FROM c),
        |thr AS (SELECT s, CAST(FLOOR(SQRT(CAST(mn AS DOUBLE) / CAST(n AS DOUBLE))
        |  * 72057594037927936.0) AS BIGINT) AS thr FROM c, mn)
        |SELECT d.doc_id, d.lang FROM documents d JOIN thr ON d.lang = thr.s
        |WHERE CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 14) AS BIGINT) < thr.thr""".stripMargin) {
      (s, dir) =>
        graft.ops.Sampling.rebalanceStrata(
          t(s, dir, "documents"), col("lang"), col("doc_id"))
          .select(col("doc_id"), col("lang"))
    },

    // Cross-document EXACT substring sharing (the suffix-array train-set
    // dedup flavor, re-shaped candidate→verify): winnowing selects one
    // char-20-gram anchor per 8-window — any shared run >= 27 chars puts
    // the same anchor hash in both docs — anchors in 2..10 docs join on
    // (hash, literal gram), so verification is exact char equality riding
    // the join key and no document text ships. The oracle mirrors the
    // selection exactly: leftmost window argmin via first-occurrence
    // list_indexof, hash = sum(cp_j * 31^(20-j)) mod 1e9+7 with the 20
    // coefficients unrolled (the window-minima pass, not the hash, is
    // DuckDB's cost; the mins-once form below is ~35% faster than
    // sliced-thrice and identical).
    Q.df(
      "p82_exact_substring_pairs",
      s"""WITH $winnowAnchorCtes
        |SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
        |  CAST(COUNT(DISTINCT x.hash) AS BIGINT) AS n_anchors
        |FROM a2 x JOIN a2 y ON x.hash = y.hash AND x.gram = y.gram AND x.doc_id < y.doc_id
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Dedup.exactSubstringPairs(t(s, dir, "documents"), 20, 8, 10, 1)
    },


    // Per-source distribution drift over the top-50 corpus tokens: the
    // domain-shift data card. Over/under flags are cleared-denominator
    // integer inequalities (n_src·N_total vs 2·n_tot·N_src), bit-exact
    // in any engine; a missing frequent token surfaces as n_src = 0.
    Q.df(
      "p83_source_drift",
      """WITH tok AS (SELECT source, unnest(list_filter(string_split(lower(text), ' '),
        |    w -> w <> '')) AS word FROM documents),
        |wt AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n_tot FROM tok GROUP BY 1),
        |top AS (SELECT word, n_tot FROM wt ORDER BY n_tot DESC, word LIMIT 50),
        |st AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_src_total FROM tok GROUP BY 1),
        |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok),
        |sw AS (SELECT source, word, CAST(COUNT(*) AS BIGINT) AS n_src
        |  FROM tok JOIN top USING (word) GROUP BY 1, 2)
        |SELECT g.source, g.word, CAST(coalesce(sw.n_src, 0) AS BIGINT) AS n_src,
        |  g.n_tot,
        |  (CAST(coalesce(sw.n_src, 0) AS HUGEINT) * n_total
        |     > 2 * CAST(g.n_tot AS HUGEINT) * g.n_src_total) AS over_rep,
        |  (2 * CAST(coalesce(sw.n_src, 0) AS HUGEINT) * n_total
        |     < CAST(g.n_tot AS HUGEINT) * g.n_src_total) AS under_rep
        |FROM (SELECT st.source, st.n_src_total, top.word, top.n_tot
        |      FROM st CROSS JOIN top) g
        |CROSS JOIN nt
        |LEFT JOIN sw ON sw.source = g.source AND sw.word = g.word""".stripMargin) {
      (s, dir) =>
        graft.ops.CorpusSignals.sourceDrift(t(s, dir, "documents"), 50, 2)
    },

    // Per-language tokenizer fertility: after training 3 BPE merges on
    // the corpus, each language's doc/word/token/char totals — the
    // multilingual-fairness card (tokens-per-word and chars-per-token
    // ratios left to the reader). Oracle = p70's training + framed
    // encode chain with lang and non-space chars riding along into one
    // GROUP BY.
    Q.df(
      "p84_tokenizer_fertility",
      ("WITH " + bpeTrainCtes + """,
        |m AS (SELECT
        |  (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top1) AS f1,
        |  (SELECT chr(31) || p1 || p2 || chr(30) FROM top1) AS t1,
        |  (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top2) AS f2,
        |  (SELECT chr(31) || p1 || p2 || chr(30) FROM top2) AS t2,
        |  (SELECT chr(31) || p1 || chr(30) || chr(31) || p2 || chr(30) FROM top3) AS f3,
        |  (SELECT chr(31) || p1 || p2 || chr(30) FROM top3) AS t3),
        |d AS (SELECT doc_id, lang, length(replace(text, ' ', '')) AS nchars,
        |    list_filter(string_split(lower(text), ' '), w -> w <> '') AS toks
        |  FROM documents),
        |e AS (SELECT doc_id, lang, nchars, len(toks) AS n_words,
        |  list_transform(toks, w -> array_to_string(list_transform(generate_series(1, length(w)),
        |    i -> chr(31) || substr(w, i, 1) || chr(30)), '')) AS encs
        |  FROM d),
        |r AS (SELECT doc_id, lang, nchars, n_words,
        |  list_transform(encs, s -> replace(replace(replace(s, f1, t1), f2, t2), f3, t3)) AS encs
        |  FROM e CROSS JOIN m),
        |pd AS (SELECT lang, nchars, n_words,
        |  coalesce(list_sum(list_transform(encs,
        |    s -> length(s) - length(replace(s, chr(30), '')))), 0) AS n_tokens
        |  FROM r)
        |SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(n_words) AS BIGINT) AS n_words,
        |  CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
        |  CAST(SUM(nchars) AS BIGINT) AS n_chars
        |FROM pd GROUP BY 1""").stripMargin) { (s, dir) =>
      TextOps.tokenizerFertility(t(s, dir, "documents"), 3)
    },

    // Maximal exact shared-span per near-dup pair: p82's anchors extended
    // code point by code point (cap 60/side) to the longest verbatim run
    // — the verbatim-duplication statistic span-removal policies consume.
    // The oracle finds each side's extension by BINARY LIFTING (x1..x6:
    // greedy steps 32..1, each one substr memcmp — legal because prefix
    // equality is monotone in length): result-identical to the per-char
    // first-false lambda scan (pinned at all SFs when both forms were
    // compared) and the fastest honest DuckDB form found — 4.9 s vs
    // 9.4 s (lambda) at sf0.1 and 100 s vs 406 s at the 10x slice, where
    // graft's codegen'd common_extent runs 12.5 s.
    Q.df(
      "p85_substring_spans",
      ("WITH " + substringSpanCtes + """
        |SELECT doc_a, doc_b, CAST(MAX(20 + el + er) AS BIGINT) AS max_span,
        |  CAST(COUNT(DISTINCT hash) AS BIGINT) AS n_anchors
        |FROM x6 GROUP BY 1, 2""").stripMargin) { (s, dir) =>
      Dedup.exactSubstringSpans(t(s, dir, "documents"), 20, 8, 10, 60)
    },

    // C4-style keep-first chunk dedup: a 5-word chunk occurring more than
    // once in the corpus survives only at its globally-first occurrence
    // (min doc_id<<32|cid). Complementary to p45 (which drops
    // high-document-frequency boilerplate everywhere): this keeps exactly
    // ONE copy of every span — integer argmin, no window.
    Q.df(
      "p86_chunk_keep_first",
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |c AS (SELECT doc_id, u.s.cid AS cid, u.s.chunk AS chunk FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(0, CAST(ceil(len(ws)/5.0) AS INT)-1),
        |    i -> struct_pack(cid := i, chunk := array_to_string(ws[(i*5+1):(i*5+5)], ' ')))) AS s
        |  FROM w) u(doc_id, s)),
        |f AS (SELECT chunk, MIN(4294967296 * doc_id + cid) AS first_occ,
        |  COUNT(*) AS n_occ FROM c GROUP BY 1)
        |SELECT c.doc_id,
        |  CAST(COUNT(*) FILTER (WHERE n_occ = 1 OR 4294967296 * c.doc_id + cid = first_occ) AS BIGINT) AS n_kept,
        |  CAST(COUNT(*) FILTER (WHERE n_occ > 1 AND 4294967296 * c.doc_id + cid <> first_occ) AS BIGINT) AS n_removed,
        |  COALESCE(string_agg(chunk, ' ' ORDER BY cid)
        |    FILTER (WHERE n_occ = 1 OR 4294967296 * c.doc_id + cid = first_occ), '') AS clean_text
        |FROM c JOIN f USING (chunk)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      Boilerplate.dedupChunksKeepFirst(t(s, dir, "documents"), 5)
    },

    // Exact-substring EXCISION (Lee et al. 2022): the later document of
    // each >=30-char verbatim-overlap pair has its single longest shared
    // run cut out (ties: smallest start, then source id); the earlier
    // document keeps the copy. Same candidate chain as p85; the packed
    // common_extent carries position AND length out of one O(cap) scan.
    Q.df(
      "p87_span_excision",
      ("WITH " + substringSpanCtes + """,
        |sel AS (SELECT doc_b, doc_a, pb - el AS sstart, 20 + el + er AS span, tb
        |  FROM x6 WHERE 20 + el + er >= 30),
        |best AS (SELECT doc_b, doc_a, sstart, span, tb,
        |  ROW_NUMBER() OVER (PARTITION BY doc_b ORDER BY span DESC, sstart, doc_a) AS rn,
        |  COUNT(*) OVER (PARTITION BY doc_b) AS n_spans FROM sel)
        |SELECT doc_b AS doc_id, doc_a AS src_doc, CAST(sstart AS BIGINT) AS span_start,
        |  CAST(span AS BIGINT) AS span, CAST(n_spans AS BIGINT) AS n_spans,
        |  CAST(length(tb) - span AS BIGINT) AS clean_len,
        |  md5(substr(tb, 1, CAST(sstart - 1 AS INT)) || substr(tb, CAST(sstart + span AS INT))) AS clean_md5
        |FROM best WHERE rn = 1""").stripMargin) { (s, dir) =>
      Dedup.excisedSpans(t(s, dir, "documents"), 20, 8, 10, 60, 30)
    },

    // DSIR importance weights (Xie et al. 2023): hashed-bigram
    // log-likelihood ratio between the lang='en' target slice and the raw
    // corpus, integerized as bit-lengths (bits(0)=0) — positive means
    // target-like. 4096 buckets; the bucket table is tiny and broadcast.
    Q.df(
      "p88_dsir_weights",
      """WITH tok AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents),
        |bg AS (SELECT doc_id, lang,
        |  CAST('0x' || substr(md5(p), 1, 14) AS BIGINT) % 4096 AS b
        |  FROM (SELECT doc_id, lang, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS p FROM tok WHERE len(toks) >= 2) x),
        |bt AS (SELECT b,
        |  length(bin(2 * COUNT(*) FILTER (WHERE lang = 'en'))) - 1 AS bits_tgt,
        |  length(bin(2 * COUNT(*))) - 1 AS bits_raw
        |  FROM bg GROUP BY 1)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(bits_tgt - bits_raw) AS BIGINT) AS dsir_bits
        |FROM bg JOIN bt USING (b)
        |GROUP BY 1""".stripMargin) { (s, dir) =>
      TextOps.dsirWeights(t(s, dir, "documents"), "en", 4096)
    },

    // Shard manifest with integrity checksums: per 64-doc shard, counts +
    // md5(concat of per-doc md5s in shard order) — the release artifact a
    // consumer re-derives to pinpoint a corrupted shard.
    Q.df(
      "p95_shard_manifest",
      """WITH sh AS (SELECT doc_id, text, rn, CAST((rn - 1) // 64 AS BIGINT) AS shard_id FROM (
        |  SELECT doc_id, text, ROW_NUMBER() OVER (
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) x)
        |SELECT shard_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(length(text)) AS BIGINT) AS n_chars,
        |  md5(string_agg(md5(text), '' ORDER BY rn)) AS shard_md5
        |FROM sh GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.shardManifest(t(s, dir, "documents"), 64, col("doc_id"))
    },

    // LSH tuning card: MinHash-LSH candidates vs the EXACT Jaccard ground
    // truth — precision/recall numerators as four integer counts (missed
    // true pairs are duplicates that would survive dedup).
    Q.df(
      "p94_lsh_tuning_card",
      s"""WITH $minhashCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pair AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |ex AS (SELECT i, j FROM (
         |  SELECT i, j, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jac
         |  FROM pair JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j) p
         |  WHERE jac >= 0.8),
         |cand AS (SELECT DISTINCT a.doc_id AS i, c.doc_id AS j
         |  FROM band a JOIN band c ON a.b = c.b AND a.v = c.v AND a.doc_id < c.doc_id)
         |SELECT
         |  CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
         |  CAST((SELECT COUNT(*) FROM ex) AS BIGINT) AS n_true_pairs,
         |  CAST((SELECT COUNT(*) FROM cand JOIN ex ON cand.i = ex.i AND cand.j = ex.j) AS BIGINT) AS n_verified,
         |  CAST((SELECT COUNT(*) FROM ex WHERE NOT EXISTS (
         |    SELECT 1 FROM cand WHERE cand.i = ex.i AND cand.j = ex.j)) AS BIGINT) AS n_missed""".stripMargin) {
      (s, dir) => Dedup.lshTuningCard(t(s, dir, "documents"), 3, 0.8, 8, 4)
    },

    // Exact integer waterfill mixture quotas: cap dominant sources at
    // the common water level that makes the total hit the 50% token
    // budget, +1 remainder tokens smallest-first — Σ quota == B exactly,
    // pure integer arithmetic.
    Q.df(
      "p93_mixture_waterfill",
      """WITH st AS (SELECT source,
        |  CAST(SUM(len(string_split(lower(text), ' '))) AS BIGINT) AS s
        |  FROM documents GROUP BY 1),
        |o AS (SELECT source, s,
        |  ROW_NUMBER() OVER (ORDER BY s, source) AS r,
        |  SUM(s) OVER (ORDER BY s, source) AS cum,
        |  COUNT(*) OVER () AS n, SUM(s) OVER () AS tot FROM st),
        |o2 AS (SELECT *, tot * 1 // 2 AS B FROM o),
        |valid AS (SELECT r FROM o2
        |  WHERE (r = n AND B >= cum) OR (r < n AND s <= (B - cum) // (n - r))),
        |ks AS (SELECT COALESCE(MAX(r), 0) AS k FROM valid),
        |prm AS (SELECT n, tot, B, k,
        |  COALESCE((SELECT cum FROM o2 WHERE r = k), 0) AS cum_k
        |  FROM (SELECT DISTINCT n, tot, B FROM o2) x, ks),
        |prm2 AS (SELECT k,
        |  CASE WHEN k = n THEN tot ELSE (B - cum_k) // (n - k) END AS L,
        |  CASE WHEN k = n THEN 0
        |       ELSE B - cum_k - ((B - cum_k) // (n - k)) * (n - k) END AS rem
        |  FROM prm)
        |SELECT source, s AS n_tokens,
        |  CAST(CASE WHEN r <= k THEN s
        |       ELSE L + CASE WHEN r - k <= rem THEN 1 ELSE 0 END END AS BIGINT) AS quota
        |FROM o2, prm2""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.mixtureWaterfill(t(s, dir, "documents"), 1, 2)
    },

    // Per-source exact length percentiles (the data-card percentile
    // block): rank-based quantiles — smallest value whose group-local
    // running count reaches ceil(p*n) — so every engine derives identical
    // integers; the window ranges over distinct values per group, never
    // corpus rows.
    Q.df(
      "p92_grouped_quantiles",
      """WITH bv AS (SELECT source AS g, n_chars AS v, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |cum AS (SELECT g, v, cnt, SUM(cnt) OVER (PARTITION BY g ORDER BY v) AS cle FROM bv),
        |tot AS (SELECT g, SUM(cnt) AS n FROM bv GROUP BY 1)
        |SELECT g AS source, CAST(n AS BIGINT) AS n_rows,
        |  CAST(MIN(CASE WHEN cle >= CAST(ceil(0.25 * n) AS BIGINT) THEN v END) AS BIGINT) AS q25,
        |  CAST(MIN(CASE WHEN cle >= CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS BIGINT) AS q50,
        |  CAST(MIN(CASE WHEN cle >= CAST(ceil(0.75 * n) AS BIGINT) THEN v END) AS BIGINT) AS q75,
        |  CAST(MIN(CASE WHEN cle >= CAST(ceil(0.95 * n) AS BIGINT) THEN v END) AS BIGINT) AS q95
        |FROM cum JOIN tot USING (g)
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Quantiles.groupedRankQuantiles(t(s, dir, "documents"),
        col("source"), "source", col("n_chars"), Seq(0.25, 0.5, 0.75, 0.95))
    },

    // Luhn-validated PAN detection/masking over synthesized card runs
    // (the p47 fixture pattern: half the appended 16-digit runs carry a
    // CORRECT Luhn check digit, half a always-wrong one, fifths carry
    // none) — n_valid counts only checksum-passing runs and only those
    // are masked.
    Q.df(
      "p91_luhn_scan",
      """WITH synth AS (SELECT doc_id,
        |  CASE WHEN doc_id % 5 = 0 THEN text
        |       ELSE text || ' ' || b || CAST(CASE WHEN doc_id % 2 = 0
        |            THEN (10 - ds % 10) % 10 ELSE (15 - ds % 10) % 10 END AS VARCHAR) END AS text
        |  FROM (SELECT doc_id, text, b,
        |    list_sum(list_transform(generate_series(1, 15), i -> CASE WHEN (16 - i) % 2 = 1
        |      THEN CASE WHEN 2 * CAST(substr(b, i, 1) AS INT) > 9
        |           THEN 2 * CAST(substr(b, i, 1) AS INT) - 9
        |           ELSE 2 * CAST(substr(b, i, 1) AS INT) END
        |      ELSE CAST(substr(b, i, 1) AS INT) END)) AS ds
        |    FROM (SELECT doc_id, text,
        |      lpad(CAST(doc_id * 7919 % 1000000000000000 AS VARCHAR), 15, '0') AS b
        |      FROM documents) x) y),
        |c AS (SELECT doc_id, text, regexp_extract_all(text, '[0-9]{13,19}') AS cands FROM synth),
        |v AS (SELECT doc_id, text, cands,
        |  list_filter(cands, c -> list_sum(list_transform(generate_series(1, length(c)), i ->
        |    CASE WHEN (length(c) - i) % 2 = 1
        |      THEN CASE WHEN 2 * CAST(substr(c, i, 1) AS INT) > 9
        |           THEN 2 * CAST(substr(c, i, 1) AS INT) - 9
        |           ELSE 2 * CAST(substr(c, i, 1) AS INT) END
        |      ELSE CAST(substr(c, i, 1) AS INT) END)) % 10 = 0) AS valid FROM c)
        |SELECT doc_id, CAST(len(cands) AS BIGINT) AS n_candidates,
        |  CAST(len(valid) AS BIGINT) AS n_valid,
        |  list_reduce(list_prepend(text, valid), (a, b) -> replace(a, b, '[PAN]')) AS clean_text
        |FROM v""".stripMargin) { (s, dir) =>
      TextOps.luhnScan(TextOps.synthesizeCardText(t(s, dir, "documents")))
    },

    // CCNet perplexity buckets: every scoreable doc ranked by its
    // integer-scaled bigram-surprisal RATE ((bits<<20) div n_pairs — no
    // float ever) and split into exact global NTILE thirds; 1 = head.
    Q.df(
      "p90_perplexity_buckets",
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
        |  FROM tok WHERE len(toks) >= 2) u),
        |dp AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1, 2, 3),
        |pc AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS n_pair FROM dp GROUP BY 1, 2),
        |cc AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_ctx FROM pc GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_pairs,
        |  CAST(SUM(c * (length(bin(n_ctx // n_pair)) - 1)) AS BIGINT) AS bits
        |  FROM dp JOIN pc USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY doc_id)
        |SELECT doc_id, n_pairs, ppl_scaled,
        |  CAST(NTILE(3) OVER (ORDER BY ppl_scaled, doc_id) AS INT) AS bucket
        |FROM (SELECT doc_id, n_pairs,
        |  CAST((bits * 1048576) // n_pairs AS BIGINT) AS ppl_scaled FROM sc) x""".stripMargin) {
      (s, dir) =>
        // Explicit broadcast — see p119's note; plan identical to r14's
        // probe-selected one, construction now job-free.
        TextOps.perplexityBuckets(t(s, dir, "documents"), 3, 20,
          joinStrategy = "broadcast")
    },

    // Full Lloyd k-means training (2 E/M iterations, seed = first 16
    // vectors) returning the final cluster assignment. The oracle unrolls
    // both iterations stage by stage (the p62/pq technique): assignment by
    // ROW_NUMBER argmax over cosine, means as vec_id-ordered list folds,
    // empty cells keeping their previous centroid via the left join — so
    // every intermediate centroid double is pinned bit-exactly.
    Q.df("p89_kmeans_train", kmeansTrainOracleSql(2, 16)) { (s, dir) =>
      Similarity.kmeansTrain(t(s, dir, "embeddings"), 16, 2, 8)
    },

    // Domain-graph PageRank for crawl prioritization: ONE corpus scan
    // collapses the synthesized link multiset to the bounded
    // (src_domain, tgt_domain, cnt) relation, then 3 damped power
    // iterations in exact integer fixed-point (floor-division
    // contributions — order-independent integer sums, so the unrolled
    // CTE oracle reproduces every rank bit-for-bit).
    Q.df("p96_domain_rank", domainRankOracleSql(3, 64, 3)) { (s, dir) =>
      graft.ops.DomainRank.domainRank(t(s, dir, "documents"), 64, 3, 3)
    },

    // Multi-query BM25 top-k retrieval: the query set as DATA (the
    // inverted-index shape — p49 folds one term bag into literals), per
    // (query, doc) scores via the fixed-slot-order conditional-MAX pivot,
    // ranking through the bounded-heap top-k (no per-query window).
    Q.df("p97_bm25_topk", bm25TopKOracleSql(
      Seq(0L -> Seq("query", "join"), 1L -> Seq("scan", "filter"),
        2L -> Seq("sort", "merge"), 3L -> Seq("hash", "table")), 10)) { (s, dir) =>
      TextOps.bm25TopK(t(s, dir, "documents"),
        Seq(0L -> Seq("query", "join"), 1L -> Seq("scan", "filter"),
          2L -> Seq("sort", "merge"), 3L -> Seq("hash", "table")), 10)
    },

    // Top singular direction by power iteration (the PCA / whitening /
    // "all-but-the-top" prep): hierarchical ORDER-defined double folds
    // (vec_id within bucket, bucket across) make the exact-order
    // reduction distributable; the oracle unrolls both iterations with
    // the identical fold chain.
    Q.df("p98_pca_power", pcaPowerOracleSql(2, 64, 8)) { (s, dir) =>
      Similarity.topSingularDirection(t(s, dir, "embeddings"), 2, 64, 8)
    },

    // Per-domain cap: keep the 50 longest docs per source WITHOUT a
    // per-domain window — the bounded-heap aggregate caps map-side
    // buffers at k, so a skewed mega-domain never single-reduces.
    Q.df(
      "p99_domain_cap",
      """SELECT source, doc_id AS id, CAST(rnk AS INT) AS rnk FROM (
        |  SELECT source, doc_id, ROW_NUMBER() OVER (
        |    PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rnk
        |  FROM documents) x
        |WHERE rnk <= 50""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.capPerGroup(t(s, dir, "documents"),
        col("source"), "source", col("n_chars"), col("doc_id"), 50)
    },

    // Per-dimension robust scaling stats (median + MAD by the exact rank
    // rule over raw doubles): the outlier-insensitive normalization pass
    // before clustering/quantization. Windows range over DISTINCT VALUES
    // per dimension, never corpus rows.
    Q.df(
      "p100_robust_scale",
      """WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
        |  FROM embeddings),
        |px AS (SELECT CAST(i - 1 AS INT) AS pos, v[i] AS x
        |  FROM e CROSS JOIN generate_series(1, 64) t(i)),
        |bv AS (SELECT pos, x AS v, CAST(COUNT(*) AS BIGINT) AS cnt FROM px GROUP BY 1, 2),
        |cum AS (SELECT pos, v, cnt, SUM(cnt) OVER (PARTITION BY pos ORDER BY v) AS cle FROM bv),
        |tot AS (SELECT pos, SUM(cnt) AS n FROM bv GROUP BY 1),
        |med AS (SELECT pos, MIN(CASE WHEN cle >= CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS med
        |  FROM cum JOIN tot USING (pos) GROUP BY 1),
        |bv2 AS (SELECT bv.pos, abs(bv.v - med.med) AS v, CAST(SUM(bv.cnt) AS BIGINT) AS cnt
        |  FROM bv JOIN med ON bv.pos = med.pos GROUP BY 1, 2),
        |cum2 AS (SELECT pos, v, cnt, SUM(cnt) OVER (PARTITION BY pos ORDER BY v) AS cle FROM bv2),
        |tot2 AS (SELECT pos, SUM(cnt) AS n FROM bv2 GROUP BY 1),
        |mad AS (SELECT pos, MIN(CASE WHEN cle >= CAST(ceil(0.5 * n) AS BIGINT) THEN v END) AS mad
        |  FROM cum2 JOIN tot2 USING (pos) GROUP BY 1)
        |SELECT med.pos, med.med, mad.mad FROM med JOIN mad ON med.pos = mad.pos""".stripMargin) {
      (s, dir) => Quantiles.robustDimStats(t(s, dir, "embeddings"))
    },

    // PCM audio feature extraction: REAL WAV bytes (header + data chunk)
    // synthesized from row arithmetic, decoded back by an actual RIFF
    // chunk walk + int16 scan; the oracle states the decoded statistics
    // arithmetically (the p47 pattern extended to sample DATA).
    Q.df(
      "p101_audio_stats",
      """SELECT doc_id,
        |  CAST(doc_id % 240 + 16 AS BIGINT) AS n_samples,
        |  CAST(list_sum(list_transform(generate_series(0, CAST(doc_id % 240 + 15 AS INT)),
        |    i -> ((doc_id * 31 + i * 17) % 65536 - 32768)
        |         * ((doc_id * 31 + i * 17) % 65536 - 32768))) AS BIGINT) AS sum_sq,
        |  CAST(list_aggregate(list_transform(generate_series(0, CAST(doc_id % 240 + 15 AS INT)),
        |    i -> abs((doc_id * 31 + i * 17) % 65536 - 32768)), 'max') AS INT) AS peak
        |FROM documents""".stripMargin) { (s, dir) =>
      graft.ops.MediaHeaders.audioStats(s,
        graft.ops.MediaHeaders.synthesizeAudio(s, t(s, dir, "documents")))
    },

    // Grayscale-PNG pixel decode: fixtures carry genuinely
    // zlib-compressed, per-scanline-FILTERED pixel data; the op inflates
    // with the JDK zlib and reverses the PNG filter set before reducing
    // to integer pixel statistics. The oracle states the decoded pixels
    // arithmetically — filters and compression must round-trip exactly
    // for the hashes to match.
    Q.df(
      "p102_image_decode",
      """SELECT doc_id,
        |  CAST((doc_id % 24 + 2) * (doc_id % 16 + 2) AS BIGINT) AS n_pixels,
        |  CAST(list_sum(px) AS BIGINT) AS sum_px,
        |  CAST(list_aggregate(px, 'min') AS INT) AS min_px,
        |  CAST(list_aggregate(px, 'max') AS INT) AS max_px
        |FROM (SELECT doc_id, list_transform(
        |    generate_series(0, CAST((doc_id % 24 + 2) * (doc_id % 16 + 2) - 1 AS INT)),
        |    k -> (doc_id * 31 + k * 17) % 256) AS px FROM documents) x""".stripMargin) {
      (s, dir) =>
        graft.ops.MediaHeaders.imageStats(s,
          graft.ops.MediaHeaders.synthesizeImages(s, t(s, dir, "documents")))
    },

    // KMV bottom-k corpus-overlap sketch: even/odd halves compared via
    // two 256-value sketches (TakeOrdered heads, no global sort) —
    // integer mins, integer estimate, no corpus-sized join.
    Q.df(
      "p103_corpus_overlap",
      s"""WITH $shingleCtes,
         |ha AS (SELECT DISTINCT CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h
         |  FROM sh WHERE doc_id % 2 = 0 ORDER BY h LIMIT 256),
         |hb AS (SELECT DISTINCT CAST('0x' || substr(md5(shingle), 1, 14) AS BIGINT) AS h
         |  FROM sh WHERE doc_id % 2 = 1 ORDER BY h LIMIT 256),
         |u AS (SELECT h FROM (SELECT h FROM ha UNION SELECT h FROM hb) z
         |  ORDER BY h LIMIT 256),
         |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS k_used,
         |  CAST(MAX(h) AS BIGINT) AS kth_min,
         |  CAST(SUM(CASE WHEN h IN (SELECT h FROM ha)
         |    AND h IN (SELECT h FROM hb) THEN 1 ELSE 0 END) AS BIGINT) AS n_common
         |  FROM u)
         |SELECT k_used, kth_min, n_common,
         |  CAST(CASE WHEN k_used = 0 THEN 0
         |    ELSE (n_common * 1048576) // k_used END AS BIGINT) AS jaccard_q20
         |FROM st""".stripMargin) { (s, dir) =>
      Dedup.corpusOverlapSketch(t(s, dir, "documents"), 3, 256)
    },

    // Per-user behavior-trajectory assembly: one example row per user
    // with a fingerprint of the FIRST `cap` event types in total
    // (ts, event_id) order — one user-keyed hash aggregate with
    // cap-bounded per-group state (count/min/max + the FirstKBySeq
    // accumulator), no window, no corpus-wide sort, no full-sequence
    // collect. The oracle applies the identical cap, and `truncated`
    // marks capped fingerprints, so engine parity holds above the cap
    // by construction.
    Q.df(
      "p104_trajectories",
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |  MIN(ts) AS first_ts, MAX(ts) AS last_ts,
        |  md5(array_to_string(
        |    list_slice(list(event_type ORDER BY ts, event_id), 1, 100000), '|')) AS traj_md5,
        |  COUNT(*) > 100000 AS truncated
        |FROM events GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.Funnels.trajectories(t(s, dir, "events"))
    },

    // Charset-class entropy: integer surprisal bits over four character
    // classes — the encoding-noise flag beside the word-level quality
    // rules; map-only, integers end to end.
    Q.df(
      "p105_charset_entropy",
      """WITH c AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n,
        |  CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS k1,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS k2,
        |  CAST(length(text) - length(regexp_replace(text, '[ ]', '', 'g')) AS BIGINT) AS k3
        |  FROM documents WHERE length(text) > 0),
        |k AS (SELECT doc_id, n, k1, k2, k3, n - k1 - k2 - k3 AS k4 FROM c)
        |SELECT doc_id, n AS n_chars_total,
        |  CAST(CASE WHEN k1 > 0 THEN k1 * (length(bin(n // k1)) - 1) ELSE 0 END
        |     + CASE WHEN k2 > 0 THEN k2 * (length(bin(n // k2)) - 1) ELSE 0 END
        |     + CASE WHEN k3 > 0 THEN k3 * (length(bin(n // k3)) - 1) ELSE 0 END
        |     + CASE WHEN k4 > 0 THEN k4 * (length(bin(n // k4)) - 1) ELSE 0 END
        |    AS BIGINT) AS class_bits
        |FROM k""".stripMargin) { (s, dir) =>
      TextOps.charsetEntropy(t(s, dir, "documents"))
    },

    // Deterministic curriculum interleave: round-robin training order
    // across sources with NO per-source window — global range-partitioned
    // rank minus per-source exclusive offsets, then a second global rank.
    Q.df(
      "p106_curriculum",
      """WITH r AS (SELECT doc_id, source,
        |  ROW_NUMBER() OVER (PARTITION BY source
        |    ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT),
        |      doc_id) AS rs
        |  FROM documents)
        |SELECT doc_id AS id, source, CAST(rs AS BIGINT) AS rs,
        |  CAST(ROW_NUMBER() OVER (ORDER BY rs, source, doc_id) AS BIGINT) AS pos
        |FROM r""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.curriculumInterleave(
        t(s, dir, "documents"), col("source"), col("doc_id"))
    },

    // ANN recall card: per query, |brute top-5 ∩ IVF(nprobe=2) top-5| —
    // the index-tuning artifact; one semi-join + count over two
    // k-bounded searches.
    Q.df(
      "p107_ann_recall",
      s"""WITH $embCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i] * cent.cv[i])) / (n.nrm * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM n, cent) x WHERE r = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 8),
         |qc AS (SELECT q_id, qv, qn, cell FROM (
         |  SELECT q.q_id, q.qv, q.qn, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * cent.cv[i])) / (q.qn * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM q, cent) y WHERE r <= 2),
         |cand AS (
         |  SELECT qc.q_id, qc.qv, qc.qn, n.vec_id, n.v, n.nrm
         |  FROM qc JOIN asg ON qc.cell = asg.cell JOIN n ON n.vec_id = asg.vec_id
         |  WHERE n.vec_id <> qc.q_id),
         |it AS (SELECT q_id, n_id FROM (
         |  SELECT q_id, vec_id AS n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i])) / (qn * nrm) DESC,
         |      vec_id) AS rnk
         |  FROM cand) z WHERE rnk <= 5),
         |bt AS (SELECT q_id, n_id FROM (
         |  SELECT q.q_id, n.vec_id AS n_id,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * n.v[i])) / (q.qn * n.nrm) DESC,
         |      n.vec_id) AS rnk
         |  FROM n JOIN q ON n.vec_id <> q.q_id) w WHERE rnk <= 5),
         |h AS (SELECT bt.q_id, CAST(COUNT(*) AS BIGINT) AS h
         |  FROM bt JOIN it ON bt.q_id = it.q_id AND bt.n_id = it.n_id GROUP BY 1)
         |SELECT q.q_id, CAST(COALESCE(h.h, 0) AS BIGINT) AS n_hits,
         |  CAST(COALESCE(h.h, 0) * 1048576 // 5 AS BIGINT) AS recall_q20
         |FROM q LEFT JOIN h ON h.q_id = q.q_id""".stripMargin) { (s, dir) =>
      Similarity.annRecallCard(t(s, dir, "embeddings"), 5, 2, 16, 8)
    },

    // Referential-integrity card between the corpus and its embedding
    // table: missing pairs both ways + duplicate ids, six integers.
    Q.df(
      "p108_integrity_card",
      """SELECT
        |  CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs,
        |  CAST((SELECT COUNT(*) FROM embeddings) AS BIGINT) AS n_vecs,
        |  CAST((SELECT COUNT(*) FROM documents d WHERE NOT EXISTS (
        |    SELECT 1 FROM embeddings e WHERE e.vec_id = d.doc_id)) AS BIGINT) AS docs_without_vec,
        |  CAST((SELECT COUNT(*) FROM embeddings e WHERE NOT EXISTS (
        |    SELECT 1 FROM documents d WHERE d.doc_id = e.vec_id)) AS BIGINT) AS vecs_without_doc,
        |  CAST((SELECT COUNT(*) FROM (
        |    SELECT doc_id FROM documents GROUP BY 1 HAVING COUNT(*) > 1) x) AS BIGINT) AS dup_doc_ids,
        |  CAST((SELECT COUNT(*) FROM (
        |    SELECT vec_id FROM embeddings GROUP BY 1 HAVING COUNT(*) > 1) y) AS BIGINT) AS dup_vec_ids""".stripMargin) {
      (s, dir) =>
        graft.ops.Report.integrityCard(
          t(s, dir, "documents"), t(s, dir, "embeddings"))
    },

    // Canonical-form dedup: exact dedup after lowercase/strip/collapse
    // normalization — the cheap middle ground before shingle near-dup;
    // one hash aggregate, min-doc_id survivor.
    Q.df(
      "p109_canonical_dedup",
      """WITH c AS (SELECT doc_id,
        |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
        |    ' +', ' ', 'g'))) AS canon_md5
        |  FROM documents),
        |k AS (SELECT canon_md5, MIN(doc_id) AS keep_id FROM c GROUP BY 1)
        |SELECT c.doc_id, c.canon_md5, c.doc_id = k.keep_id AS keep
        |FROM c JOIN k ON c.canon_md5 = k.canon_md5""".stripMargin) { (s, dir) =>
      Dedup.canonicalDedup(t(s, dir, "documents"))
    },

    // Exactly-N global sample: the N smallest key-hashes corpus-wide —
    // TakeOrdered heads, deterministic and stable under corpus growth.
    Q.df(
      "p110_exact_n_sample",
      """SELECT doc_id, lang, source FROM documents
        |ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT),
        |  doc_id
        |LIMIT 100""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.sampleExactlyN(
        t(s, dir, "documents").select(col("doc_id"), col("lang"), col("source")),
        100, col("doc_id"))
    },

    // Word-blocklist safety screen: per-category occurrence counts +
    // keep decision, row-local over the token array — map-only.
    Q.df(
      "p111_blocklist_screen",
      """SELECT doc_id,
        |  CAST(len(list_filter(toks, w -> list_contains(['slow', 'dup'], w))) AS BIGINT) AS n_quality,
        |  CAST(len(list_filter(toks, w -> list_contains(['drop', 'spam'], w))) AS BIGINT) AS n_spamish,
        |  (len(list_filter(toks, w -> list_contains(['slow', 'dup'], w))) < 3
        |   AND len(list_filter(toks, w -> list_contains(['drop', 'spam'], w))) < 1) AS keep
        |FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents) x""".stripMargin) {
      (s, dir) =>
        TextOps.blocklistScreen(t(s, dir, "documents"), Seq(
          ("quality", Seq("slow", "dup"), 3),
          ("spamish", Seq("drop", "spam"), 1)))
    },

    // Packing-efficiency card at a 512-token context window: naive
    // one-doc-per-window cost, its padding waste, and the perfect-packer
    // lower bound — one map-side-combinable aggregate, all integers.
    Q.df(
      "p112_packing_card",
      """WITH t AS (SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS t,
        |  CAST((len(string_split(text, ' ')) + 511) // 512 AS BIGINT) AS w
        |  FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(t) AS BIGINT) AS n_tokens,
        |  CAST(SUM(w) AS BIGINT) AS naive_windows,
        |  CAST(SUM(w) * 512 - SUM(t) AS BIGINT) AS padding_waste,
        |  CAST((SUM(t) + 511) // 512 AS BIGINT) AS packed_lower_bound
        |FROM t""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.packingCard(t(s, dir, "documents"), 512)
    },

    // Classifier calibration card: corpus bucketed by the p56 hash
    // classifier's score, per-bin positive rate vs the lang='en'
    // reference label — integer bins (range shifted non-negative before
    // the division so both engines' integer division agrees) and
    // cleared-denominator rates; ONE map-side-combinable aggregate.
    Q.df(
      "p113_calibration_card",
      """WITH tok AS (SELECT doc_id, lang, string_split(lower(text), ' ') AS toks FROM documents),
        |s AS (SELECT doc_id, lang, CAST(len(toks) AS BIGINT) AS n_tokens,
        |  CAST(list_sum(list_transform(toks, w ->
        |    (CAST('0x' || substr(md5(w), 1, 8) AS BIGINT) % 1024) % 13 - 6)) AS BIGINT) AS wsum
        |  FROM tok WHERE len(toks) > 0),
        |b AS (SELECT
        |  least((wsum + 6 * n_tokens) * 8 // (12 * n_tokens), 7) AS bin,
        |  CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos, wsum, n_tokens FROM s)
        |SELECT CAST(bin AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(pos) AS BIGINT) AS n_pos,
        |  CAST((SUM(pos) * 1048576) // COUNT(*) AS BIGINT) AS pos_rate_q20,
        |  CAST(SUM(wsum) AS BIGINT) AS sum_wsum,
        |  CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
        |FROM b GROUP BY 1""".stripMargin) { (s, dir) =>
      graft.ops.Report.calibrationCard(t(s, dir, "documents"), 1024, 8)
    },

    // Zipf-law card: least-squares slope of floor(log2 tf) against
    // floor(log2 rank) over the vocabulary, emitted as exact integer
    // numerator/denominator plus the one-IEEE-division slope. The rank
    // is the distributed GlobalRank (the oracle's single-reducer window
    // is exactly what the op avoids at a billion-term vocabulary).
    Q.df(
      "p114_zipf_card",
      """WITH tf AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS tf FROM (
        |  SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
        |  GROUP BY 1),
        |r AS (SELECT tf, ROW_NUMBER() OVER (ORDER BY tf DESC, word) AS rank FROM tf),
        |b AS (SELECT CAST(length(bin(rank)) - 1 AS BIGINT) AS x,
        |  CAST(length(bin(tf)) - 1 AS BIGINT) AS y FROM r),
        |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
        |  CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
        |  CAST(SUM(x * x) AS BIGINT) AS sxx FROM b)
        |SELECT n AS n_terms,
        |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS zipf_num,
        |  CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR) AS zipf_den,
        |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS slope
        |FROM s""".stripMargin) { (s, dir) =>
      graft.ops.Report.zipfCard(t(s, dir, "documents"))
    },

    // Gopher duplicate-n-gram repetition rule at n=2 (r12): duplicate
    // bigram occurrences + the bytes they span, keep verdict as the
    // cleared-denominator integer inequality (fraction <= 0.2).
    Q.df(
      "p115_dup_ngram_card",
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> toks[i] || ' ' || toks[i+1])) AS pair
        |  FROM tok WHERE len(toks) >= 2),
        |dp AS (SELECT doc_id, pair, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1, 2)
        |SELECT doc_id,
        |  CAST(SUM(c) AS BIGINT) AS n_pairs,
        |  CAST(COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) AS BIGINT) AS dup_pair_occ,
        |  CAST(COALESCE(SUM(c * strlen(pair)) FILTER (WHERE c >= 2), 0) AS BIGINT)
        |    AS dup_pair_bytes,
        |  COALESCE(SUM(c) FILTER (WHERE c >= 2), 0) * 5 <= SUM(c) AS ok_dup_pairs
        |FROM dp GROUP BY doc_id""".stripMargin) { (s, dir) =>
      TextOps.dupNgramStats(t(s, dir, "documents"))
    },

    // Filtered vector search (r12): exact top-k under a label predicate
    // over the shared full-corpus IVF index — pre-filtering semantics
    // (candidates restricted BEFORE the cell join; codebook unchanged).
    Q.df(
      "p116_filtered_ann",
      s"""WITH $embCtes,
         |cent AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
         |nf AS (SELECT n.vec_id, n.v, n.nrm FROM n JOIN embeddings e ON e.vec_id = n.vec_id
         |  WHERE e.label IN (1, 2)),
         |asg AS (SELECT vec_id, cell FROM (
         |  SELECT nf.vec_id, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY nf.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(nf.v)), i -> nf.v[i] * cent.cv[i])) / (nf.nrm * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM nf, cent) x WHERE r = 1),
         |q AS (SELECT vec_id AS q_id, v AS qv, nrm AS qn FROM n WHERE vec_id < 4),
         |qc AS (SELECT q_id, qv, qn, cell FROM (
         |  SELECT q.q_id, q.qv, q.qn, cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(q.qv)), i -> q.qv[i] * cent.cv[i])) / (q.qn * cent.cn) DESC,
         |      cent.c_id) AS r
         |  FROM q, cent) y WHERE r <= 4),
         |cand AS (
         |  SELECT qc.q_id, qc.qv, qc.qn, nf.vec_id, nf.v, nf.nrm
         |  FROM qc JOIN asg ON qc.cell = asg.cell JOIN nf ON nf.vec_id = asg.vec_id
         |  WHERE nf.vec_id <> qc.q_id)
         |SELECT q_id, n_id, rnk, cos FROM (
         |  SELECT q_id, vec_id AS n_id,
         |    list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i])) / (qn * nrm) AS cos,
         |    ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(qv)), i -> qv[i] * v[i])) / (qn * nrm) DESC,
         |      vec_id) AS rnk
         |  FROM cand) z
         |WHERE rnk <= 5""".stripMargin) { (s, dir) =>
      val emb = t(s, dir, "embeddings")
      Similarity.filteredIvfTopK(emb,
        emb.filter(org.apache.spark.sql.functions.col("vec_id") < 4),
        Seq(1, 2), 5, 4, 16)
    },

    // REAL uncompressed-video frame decode (r12): genuine YUV4MPEG2
    // bytes (stream header + FRAME markers + raw C444 planes) decoded
    // back by an actual byte walk; the oracle states the per-frame luma
    // statistics arithmetically (the p101/p102 real-decode pattern).
    Q.df(
      "p117_video_decode",
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST(doc_id % 8 + 4 AS INT) AS width,
        |  CAST(doc_id % 6 + 3 AS INT) AS height,
        |  CAST(list_sum(ys) AS BIGINT) AS y_sum,
        |  CAST(list_aggregate(ys, 'min') AS INT) AS y_min,
        |  CAST(list_aggregate(ys, 'max') AS INT) AS y_max
        |FROM (
        |  SELECT doc_id, f, list_transform(
        |    generate_series(0, CAST((doc_id % 8 + 4) * (doc_id % 6 + 3) - 1 AS INT)),
        |    p -> (doc_id * 31 + f * 17 + p * 7) % 256) AS ys
        |  FROM documents CROSS JOIN generate_series(0, 7) t(f)
        |  WHERE f <= doc_id % 7 + 1) x""".stripMargin) { (s, dir) =>
      graft.ops.MediaHeaders.videoFrameStats(s,
        graft.ops.MediaHeaders.synthesizeVideos(s, t(s, dir, "documents")))
    },

    // REAL compressed-frame video decode (r14): Motion-JPEG in a genuine
    // RIFF/AVI container — real Huffman entropy decode, dequantization
    // and the full 2D IDCT per frame (graft.ops.Mjpeg). The synthesized
    // streams keep every block flat (AC zero, DC a multiple of 64
    // against an all-ones quant table), so the IDCT lands on integers
    // and the oracle states the per-frame luma statistics in closed
    // form — the p101/p102/p117 real-decode pattern, extended past the
    // uncompressed formats into an actual codec path.
    Q.df(
      "p126_mjpeg_decode",
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST((doc_id % 3 + 1) * 8 AS INT) AS width,
        |  CAST((doc_id % 2 + 1) * 8 AS INT) AS height,
        |  CAST(64 * list_sum(vs) AS BIGINT) AS y_sum,
        |  CAST(list_aggregate(vs, 'min') AS INT) AS y_min,
        |  CAST(list_aggregate(vs, 'max') AS INT) AS y_max
        |FROM (
        |  SELECT doc_id, f, list_transform(
        |    generate_series(0, CAST((doc_id % 3 + 1) * (doc_id % 2 + 1) - 1 AS INT)),
        |    b -> 128 + 8 * (((doc_id * 31 + f * 17 + b * 7) % 17) - 8)) AS vs
        |  FROM documents CROSS JOIN generate_series(0, 4) t(f)
        |  WHERE f <= doc_id % 5) x""".stripMargin) { (s, dir) =>
      graft.ops.Mjpeg.aviFrameStats(s,
        graft.ops.Mjpeg.synthesizeAviVideos(s, t(s, dir, "documents")))
    },

    // REAL color decode (r16): YCbCr 4:2:0 baseline JPEG in AVI — the
    // layout camera MJPEG actually emits. Extends p126's luma-only path
    // with three components in ONE interleaved scan: 4:2:0 MCUs
    // (4 Y + Cb + Cr), TWO quant tables (chroma all-twos — a distinct
    // dequant path that still lands on integers), four DHT slots
    // selected per component from the stream. Flat-block synthesis keeps
    // every per-frame channel stat closed-form; the decoder runs the
    // general entropy/IDCT machinery (shared block decoder with p126).
    Q.df(
      "p128_ycbcr_decode",
      """SELECT doc_id, CAST(f AS INT) AS frame_idx,
        |  CAST((doc_id % 2 + 1) * 16 AS INT) AS width,
        |  CAST((doc_id % 3 + 1) * 16 AS INT) AS height,
        |  CAST(64 * list_sum(ys) AS BIGINT) AS y_sum,
        |  CAST(list_aggregate(ys, 'min') AS INT) AS y_min,
        |  CAST(list_aggregate(ys, 'max') AS INT) AS y_max,
        |  CAST(64 * list_sum(cbs) AS BIGINT) AS cb_sum,
        |  CAST(list_aggregate(cbs, 'min') AS INT) AS cb_min,
        |  CAST(list_aggregate(cbs, 'max') AS INT) AS cb_max,
        |  CAST(64 * list_sum(crs) AS BIGINT) AS cr_sum,
        |  CAST(list_aggregate(crs, 'min') AS INT) AS cr_min,
        |  CAST(list_aggregate(crs, 'max') AS INT) AS cr_max
        |FROM (
        |  SELECT doc_id, f,
        |    list_transform(
        |      generate_series(0, CAST((doc_id%2+1)*(doc_id%3+1)*4 - 1 AS INT)),
        |      b -> 128 + 8 * (((doc_id*31 + f*17 + b*7) % 17) - 8)) AS ys,
        |    list_transform(
        |      generate_series(0, CAST((doc_id%2+1)*(doc_id%3+1) - 1 AS INT)),
        |      c -> 128 + 8 * (((doc_id*13 + f*7 + c*5) % 17) - 8)) AS cbs,
        |    list_transform(
        |      generate_series(0, CAST((doc_id%2+1)*(doc_id%3+1) - 1 AS INT)),
        |      c -> 128 + 8 * (((doc_id*7 + f*11 + c*3) % 17) - 8)) AS crs
        |  FROM documents CROSS JOIN generate_series(0, 3) t(f)
        |  WHERE f <= doc_id % 4) x""".stripMargin) { (s, dir) =>
      graft.ops.Mjpeg.aviColorFrameStats(s,
        graft.ops.Mjpeg.synthesizeYcbcrAviVideos(s, t(s, dir, "documents")))
    },

    // Dedup cluster-size histogram (r12): the release QA card — cluster
    // sizes bucketed by bit length (exact integers; singletons bucket
    // 0), surfacing a pathological mega-cluster before training.
    Q.df(
      "p118_cluster_histogram",
      s"""WITH RECURSIVE $shingleCtes,
         |cnt AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
         |pairx AS (SELECT a.doc_id AS i, b.doc_id AS j, COUNT(*) AS inter
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |jp AS (SELECT i, j FROM (
         |  SELECT i, j, CAST(inter AS DOUBLE) / (ca.n_sh + cb.n_sh - inter) AS jac
         |  FROM pairx JOIN cnt ca ON ca.doc_id = i JOIN cnt cb ON cb.doc_id = j) p
         |  WHERE jac >= 0.8),
         |e AS (SELECT i AS src, j AS dst FROM jp UNION SELECT j AS src, i AS dst FROM jp),
         |reach AS (
         |  SELECT src, dst FROM e
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN e ON r.dst = e.src),
         |comp AS (SELECT src AS doc_id, MIN(dst) AS min_reach FROM reach GROUP BY src),
         |lab AS (SELECT d.doc_id,
         |  CAST(CASE WHEN comp.min_reach IS NULL OR d.doc_id < comp.min_reach
         |       THEN d.doc_id ELSE comp.min_reach END AS BIGINT) AS cluster_id
         |  FROM documents d LEFT JOIN comp ON comp.doc_id = d.doc_id),
         |sz AS (SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS sz FROM lab GROUP BY 1)
         |SELECT CAST(length(bin(sz)) - 1 AS INT) AS size_bits,
         |  CAST(COUNT(*) AS BIGINT) AS n_clusters,
         |  CAST(SUM(sz) AS BIGINT) AS n_docs
         |FROM sz GROUP BY 1""".stripMargin) { (s, dir) =>
      val docs = t(s, dir, "documents")
      graft.ops.DedupClusters.clusterSizeHistogram(
        docs, Dedup.ngramJaccardPairs(docs, 3, 0.8))
    },

    // DoReMi-flavored domain reweighting (r12): multiplicative-weights
    // over per-source excess surprisal, stated base-2 in exact integers
    // (no exp, no float) — the data-mixing step after the quality pass.
    Q.df(
      "p119_domain_reweight",
      """WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
        |p AS (SELECT doc_id, s.w1 AS w1, s.w2 AS w2 FROM (
        |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
        |    i -> struct_pack(w1 := toks[i], w2 := toks[i+1]))) AS s
        |  FROM tok WHERE len(toks) >= 2) u),
        |dp AS (SELECT doc_id, w1, w2, CAST(COUNT(*) AS BIGINT) AS c FROM p GROUP BY 1, 2, 3),
        |pc AS (SELECT w1, w2, CAST(SUM(c) AS BIGINT) AS n_pair FROM dp GROUP BY 1, 2),
        |cc AS (SELECT w1, CAST(SUM(n_pair) AS BIGINT) AS n_ctx FROM pc GROUP BY 1),
        |sc AS (SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_pairs,
        |  CAST(SUM(c * (length(bin(n_ctx // n_pair)) - 1)) AS BIGINT) AS bits
        |  FROM dp JOIN pc USING (w1, w2) JOIN cc USING (w1)
        |  GROUP BY doc_id),
        |bysrc AS (SELECT d.source,
        |  CAST(SUM(sc.n_pairs) AS BIGINT) AS pairs,
        |  CAST(SUM(sc.bits) AS BIGINT) AS bits
        |  FROM sc JOIN documents d USING (doc_id) GROUP BY 1),
        |r AS (SELECT source, pairs, bits,
        |  CAST((bits * 1024) // pairs AS BIGINT) AS rate_scaled FROM bysrc),
        |m AS (SELECT MIN(rate_scaled) AS min_rate FROM r),
        |ex AS (SELECT source, pairs, bits, rate_scaled,
        |  CAST(rate_scaled - min_rate AS BIGINT) AS excess,
        |  CAST(CAST(1 AS BIGINT) << CAST(least((rate_scaled - min_rate) // 64, 32) AS INT)
        |    AS BIGINT) AS weight_num
        |  FROM r, m)
        |SELECT source, pairs, bits, rate_scaled, excess, weight_num,
        |  CAST((SELECT SUM(weight_num) FROM ex) AS BIGINT) AS weight_den
        |FROM ex""".stripMargin) { (s, dir) =>
      // Explicit broadcast: the card states the informed production
      // posture (CCNet ships the LM to every scoring node; this corpus's
      // pair vocabulary is far under BroadcastPairLimit). The "auto"
      // default would defer the same choice to AQE at runtime.
      graft.ops.Sampling.domainReweight(t(s, dir, "documents"),
        joinStrategy = "broadcast")
    },

    // Pairwise source-overlap matrix (r12): KMV bottom-k Jaccard between
    // every source pair — the "dataset venn" card deciding whether
    // cross-source dedup must run before mixing.
    // Count-Min heavy-hitter card: a 4×1024-cell map-side-combined grid
    // (state independent of vocabulary size), row r's bucket from the
    // minhash two-hash family (a1 + r·a2) mod 1024 — one md5 per
    // distinct token; the exact top-20 is the evaluation half and the
    // estimates are min-over-rows bucket lookups. cms_est >= n_exact by
    // construction.
    Q.df(
      "p121_cms_heavy_hitters",
      """WITH tk AS (SELECT token FROM (
        |    SELECT unnest(string_split(text, ' ')) AS token
        |    FROM documents WHERE length(text) > 0) x WHERE token <> ''),
        |tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS n_exact FROM tk GROUP BY 1),
        |hx AS (SELECT token, n_exact,
        |    CAST('0x' || substr(d, 1, 14) AS BIGINT) AS a1,
        |    CAST('0x' || substr(d, 17, 14) AS BIGINT) AS a2
        |  FROM (SELECT token, n_exact, md5(token) AS d FROM tc) z),
        |rws AS (SELECT unnest(generate_series(0, 3)) AS r),
        |cells AS (SELECT r, (a1 + r * a2) % 1024 AS b,
        |    CAST(SUM(n_exact) AS BIGINT) AS c
        |  FROM hx CROSS JOIN rws GROUP BY 1, 2),
        |top AS (SELECT token, n_exact, a1, a2 FROM hx
        |  ORDER BY n_exact DESC, token LIMIT 20),
        |est AS (SELECT t.token, t.n_exact, MIN(c.c) AS cms_est
        |  FROM top t CROSS JOIN rws r JOIN cells c ON c.r = r.r
        |    AND c.b = (t.a1 + r.r * t.a2) % 1024
        |  GROUP BY 1, 2)
        |SELECT token, n_exact, CAST(cms_est AS BIGINT) AS cms_est,
        |  CAST(cms_est - n_exact AS BIGINT) AS overcount FROM est""".stripMargin) {
      (s, dir) => graft.ops.Sketches.cmsHeavyHitters(t(s, dir, "documents"))
    },

    // HyperLogLog per-source cardinality card + register-merged '*ALL*'
    // union row: MAX(rho) registers per (source, idx) — state bounded by
    // sources×256 — with the exact harmonic numerator kept integer at
    // the 2^50 scale; exact distincts are the evaluation half.
    Q.df(
      "p122_hll_card",
      """WITH hh AS (SELECT DISTINCT source,
        |    CAST('0x' || substr(md5(text), 1, 14) AS BIGINT) AS h
        |  FROM documents WHERE text IS NOT NULL AND source IS NOT NULL),
        |sp AS (SELECT source, h >> 48 AS idx, h & 281474976710655 AS rest FROM hh),
        |rr AS (SELECT source, idx,
        |  CASE WHEN rest = 0 THEN 49 ELSE 49 - length(bin(rest)) END AS rho FROM sp),
        |regs AS (SELECT source, idx, MAX(rho) AS reg FROM rr GROUP BY 1, 2),
        |un AS (SELECT source, idx, reg FROM regs
        |  UNION ALL SELECT '*ALL*' AS source, idx, MAX(reg) AS reg FROM regs GROUP BY 2),
        |card AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS nonzero_regs,
        |  CAST(SUM(CAST(1 AS BIGINT) << CAST(50 - reg AS INT))
        |    + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << 50) AS BIGINT) AS harm_num
        |  FROM un GROUP BY 1),
        |ex AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS exact_distinct
        |    FROM hh GROUP BY 1
        |  UNION ALL SELECT '*ALL*', CAST(COUNT(DISTINCT h) AS BIGINT) FROM hh)
        |SELECT c.source, c.nonzero_regs, c.harm_num, e.exact_distinct
        |FROM card c JOIN ex e USING (source)""".stripMargin) {
      (s, dir) => graft.ops.Sketches.hllCard(t(s, dir, "documents"))
    },

    // Content-defined-chunking storage-dedup card: boundaries where the
    // char-8-gram rolling hash (the p63 polynomial, unrolled with the
    // same 8 coefficients) is ≡ 0 mod 32, cut after the gram's last
    // char; chunk-granular duplicate bytes a content-addressed store
    // would save. The Spark side is the codegen'd cdc_chunks kernel.
    Q.df(
      "p123_cdc_chunks",
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE length(text) > 0),
        |cps AS (SELECT doc_id, text, n,
        |    list_transform(generate_series(1, n),
        |      i -> CAST(unicode(substr(text, i, 1)) AS BIGINT)) AS cp
        |  FROM d),
        |h AS (SELECT doc_id, text, n,
        |  CASE WHEN n >= 8 THEN list_transform(generate_series(1, n - 7),
        |      i -> CAST((cp[i]*27512614111 + cp[i+1]*887503681 + cp[i+2]*28629151
        |        + cp[i+3]*923521 + cp[i+4]*29791 + cp[i+5]*961 + cp[i+6]*31
        |        + cp[i+7]) % 1000000007 AS BIGINT))
        |    ELSE [] END AS hs FROM cps),
        |cuts AS (SELECT doc_id, text, n,
        |  list_transform(list_filter(generate_series(1, greatest(n - 7, 0)),
        |    i -> hs[i] % 32 = 0), i -> i + 7) AS cut
        |  FROM h),
        |bounds AS (SELECT doc_id, text,
        |  list_concat([0], CASE WHEN len(cut) > 0 AND cut[-1] = n THEN cut
        |    ELSE list_concat(cut, [n]) END) AS bd
        |  FROM cuts),
        |ch AS (SELECT unnest(list_transform(generate_series(1, len(bd) - 1),
        |    j -> substr(text, bd[j] + 1, bd[j+1] - bd[j]))) AS chunk FROM bounds),
        |g AS (SELECT md5(chunk) AS cm, CAST(COUNT(*) AS BIGINT) AS cnt,
        |  CAST(MAX(strlen(chunk)) AS BIGINT) AS len FROM ch GROUP BY 1)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_docs,
        |  CAST(SUM(cnt) AS BIGINT) AS total_chunks,
        |  CAST(COUNT(*) AS BIGINT) AS distinct_chunks,
        |  CAST(SUM(cnt - 1) AS BIGINT) AS dup_chunks,
        |  CAST(SUM(cnt * len) AS BIGINT) AS total_bytes,
        |  CAST(SUM((cnt - 1) * len) AS BIGINT) AS dup_bytes,
        |  CAST(MAX(len) AS BIGINT) AS max_chunk_len
        |FROM g""".stripMargin) {
      (s, dir) => Dedup.cdcChunkCard(t(s, dir, "documents"))
    },

    // All-but-the-top embedding post-processing (Mu & Viswanath 2018):
    // mean-center, then project out the dominant direction of the
    // CENTERED embeddings — the isotropy fix applied before cosine
    // retrieval. Every reduction is the p98 two-level order-defined
    // fold; the oracle unrolls mean, both power iterations and the
    // final per-dimension residual folds with the identical chain.
    Q.df("p124_all_but_top", allButTopOracleSql(2, 64, 8)) { (s, dir) =>
      Similarity.allButTheTop(t(s, dir, "embeddings"), 2, 64, 8)
    },

    // Leakage-safe K-fold split card: folds keyed by the canonical
    // CONTENT hash (so exact/re-punctuated copies co-fold by
    // construction — exact_leak_canons is computed and must be 0), plus
    // the measured residual: VERBATIM-span-sharing pairs (the p82
    // winnowing candidate→verify shape — Lee et al.'s contamination
    // definition, any >=27-char shared run) crossing folds.
    Q.df(
      "p125_leakage_split",
      s"""WITH $winnowAnchorCtes,
         |cn AS (SELECT doc_id, source,
         |  md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
         |    ' +', ' ', 'g'))) AS canon
         |  FROM documents),
         |f AS (SELECT doc_id, source, canon,
         |  CAST(CAST('0x' || substr(md5(canon), 1, 14) AS BIGINT) % 5 AS INT) AS fold
         |  FROM cn),
         |cnt AS (SELECT fold, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |  CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canon FROM f GROUP BY 1, 2),
         |el AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_leak_canons FROM (
         |  SELECT canon FROM f GROUP BY canon HAVING COUNT(DISTINCT fold) > 1) x),
         |prs AS (SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
         |  FROM a2 x JOIN a2 y
         |  ON x.hash = y.hash AND x.gram = y.gram AND x.doc_id < y.doc_id),
         |nl AS (SELECT CAST(COUNT(*) AS BIGINT) AS near_leak_pairs
         |  FROM prs JOIN f fi ON fi.doc_id = prs.i JOIN f fj ON fj.doc_id = prs.j
         |  WHERE fi.fold <> fj.fold)
         |SELECT cnt.fold, cnt.source, cnt.n_docs, cnt.n_canon,
         |  el.exact_leak_canons, nl.near_leak_pairs
         |FROM cnt, el, nl""".stripMargin) { (s, dir) =>
      graft.ops.Sampling.leakageSafeSplit(t(s, dir, "documents"))
    },

    Q.df(
      "p120_source_overlap",
      s"""WITH $shingleCtes,
         |hs AS (SELECT DISTINCT d.source,
         |  CAST('0x' || substr(md5(sh.shingle), 1, 14) AS BIGINT) AS h
         |  FROM sh JOIN documents d USING (doc_id)),
         |sk AS (SELECT source, h FROM (
         |  SELECT source, h, ROW_NUMBER() OVER (PARTITION BY source ORDER BY h) AS r
         |  FROM hs) x WHERE r <= 256),
         |pairs AS (SELECT DISTINCT a.source AS src_a, b.source AS src_b
         |  FROM sk a JOIN sk b ON a.source < b.source),
         |u AS (SELECT p.src_a, p.src_b, s.h FROM pairs p
         |  JOIN sk s ON s.source IN (p.src_a, p.src_b) GROUP BY 1, 2, 3),
         |m AS (SELECT src_a, src_b, h FROM (
         |  SELECT src_a, src_b, h,
         |    ROW_NUMBER() OVER (PARTITION BY src_a, src_b ORDER BY h) AS r FROM u) x
         |  WHERE r <= 256),
         |c AS (SELECT m.src_a, m.src_b, m.h,
         |  CASE WHEN EXISTS (SELECT 1 FROM sk WHERE sk.source = m.src_a AND sk.h = m.h)
         |    AND EXISTS (SELECT 1 FROM sk WHERE sk.source = m.src_b AND sk.h = m.h)
         |  THEN 1 ELSE 0 END AS in_both FROM m)
         |SELECT src_a, src_b, CAST(COUNT(*) AS BIGINT) AS k_used,
         |  CAST(SUM(in_both) AS BIGINT) AS n_common,
         |  CAST(CASE WHEN COUNT(*) = 0 THEN 0
         |    ELSE (SUM(in_both) * 1048576) // COUNT(*) END AS BIGINT) AS jaccard_q20
         |FROM c GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Dedup.sourceOverlapMatrix(t(s, dir, "documents"))
    },

    // Per-doc suffix statistics (r16): longest repeated substring
    // (overlaps count — the suffix-array dedup threshold signal, Lee et
    // al. 2022) + 16-gram uniqueness, ONE O(len) suffix-automaton kernel
    // pass per doc on the Spark side. The oracle reconstructs the exact
    // LRS with bounded work via monotonicity: has_repeat(L) is monotone
    // decreasing in L, so a power-of-two ladder finds lo = the largest
    // pow2 with a repeat, and one refinement sweep over (lo, 2*lo) pins
    // the exact value — O(len * lrs) substr rows per doc instead of the
    // O(len^2) all-lengths scan. The ladder is DERIVED from max doc
    // length (ADVICE r16: a fixed cap silently under-reports lrs_len
    // the day fixtures outgrow it — the r16 review caught exactly that
    // bug at cap 1024, so the cap is now data-driven by construction).
    Q.df(
      "p127_suffix_stats",
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents
        |  WHERE text IS NOT NULL),
        |lad AS (SELECT doc_id, text, n, CAST(power(2, k) AS BIGINT) AS l
        |  FROM d, (SELECT unnest(generate_series(0, GREATEST(0,
        |      CAST(ceil(log2(GREATEST(2, (SELECT MAX(n) FROM d)))) AS INT)))) AS k) ks
        |  WHERE CAST(power(2, k) AS BIGINT) <= n),
        |pos1 AS (SELECT doc_id, text, l,
        |    unnest(generate_series(1, n - l + 1)) AS i FROM lad),
        |r1 AS (SELECT doc_id, l,
        |    COUNT(*) > COUNT(DISTINCT substr(text, CAST(i AS INT), CAST(l AS INT))) AS rep
        |  FROM pos1 GROUP BY 1, 2),
        |l0 AS (SELECT doc_id, COALESCE(MAX(l) FILTER (WHERE rep), 0) AS lo
        |  FROM r1 GROUP BY 1),
        |ref AS (SELECT d.doc_id, d.text, d.n,
        |    unnest(generate_series(l0.lo + 1,
        |      least(2 * l0.lo - 1, CAST(d.n AS BIGINT) - 1))) AS l
        |  FROM d JOIN l0 USING (doc_id) WHERE l0.lo > 0),
        |pos2 AS (SELECT doc_id, text, l,
        |    unnest(generate_series(1, n - l + 1)) AS i FROM ref),
        |r2 AS (SELECT doc_id, l,
        |    COUNT(*) > COUNT(DISTINCT substr(text, CAST(i AS INT), CAST(l AS INT))) AS rep
        |  FROM pos2 GROUP BY 1, 2),
        |hi AS (SELECT doc_id, MAX(l) AS hi FROM r2 WHERE rep GROUP BY 1),
        |pk AS (SELECT doc_id, text,
        |    unnest(generate_series(1, n - 15)) AS i FROM d WHERE n >= 16),
        |k16 AS (SELECT doc_id,
        |    CAST(COUNT(DISTINCT substr(text, CAST(i AS INT), 16)) AS BIGINT) AS distinct_k,
        |    CAST(COUNT(*) AS BIGINT) AS total_k
        |  FROM pk GROUP BY 1)
        |SELECT d.doc_id,
        |  CAST(CASE WHEN COALESCE(l0.lo, 0) = 0 THEN 0
        |    ELSE GREATEST(l0.lo, COALESCE(hi.hi, l0.lo)) END AS BIGINT) AS lrs_len,
        |  COALESCE(k16.distinct_k, 0) AS distinct_k,
        |  COALESCE(k16.total_k, 0) AS total_k
        |FROM d LEFT JOIN l0 USING (doc_id)
        |LEFT JOIN hi USING (doc_id) LEFT JOIN k16 USING (doc_id)""".stripMargin) {
      (s, dir) => graft.ops.TextOps.suffixStats(t(s, dir, "documents"))
    },

    // URL-canonicalization dedup (r16): synthesize a deterministic messy
    // URL per document (mixed-case scheme/host, default ports, trailing
    // slash, unsorted + tracking params, fragments — every rule of the
    // kernel exercised), canonicalize with the codegen'd
    // url_canonicalize kernel, and emit the bounded cluster relation.
    // The oracle restates the synthesis verbatim and replays the
    // canonicalization with DuckDB string/list functions.
    Q.df(
      "p129_url_canon_dedup",
      """WITH u AS (SELECT doc_id,
        |    (CASE WHEN doc_id % 2 = 0 THEN 'https' ELSE 'HTTP' END) || '://' ||
        |    (CASE WHEN doc_id % 4 = 0 THEN 'WWW.' WHEN doc_id % 4 = 1 THEN 'www.'
        |          WHEN doc_id % 4 = 2 THEN '' ELSE 'WwW.' END) ||
        |    source || '.Example.COM' ||
        |    (CASE WHEN doc_id % 5 = 0 THEN ':443' WHEN doc_id % 5 = 1 THEN ':80' ELSE '' END) ||
        |    '/a/b' || (CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END) || '?' ||
        |    (CASE WHEN doc_id % 2 = 0
        |      THEN 'utm_source=news&id=' || CAST(doc_id % 3 AS VARCHAR) || '&z=9&utm_campaign=x'
        |      ELSE 'z=9&id=' || CAST(doc_id % 3 AS VARCHAR) || '&fbclid=XYZ' ||
        |        (CASE WHEN doc_id % 3 = 0 THEN '&ref=' || lang ELSE '' END) END) ||
        |    (CASE WHEN doc_id % 6 = 0 THEN '#frag' ELSE '' END) AS url
        |  FROM documents),
        |s1 AS (SELECT doc_id, url,
        |    lower(split_part(url, '://', 1)) AS scheme,
        |    split_part(split_part(url, '://', 2), '#', 1) AS rest FROM u),
        |s2 AS (SELECT *,
        |    CASE WHEN strpos(rest, '/') > 0 AND (strpos(rest, '?') = 0
        |           OR strpos(rest, '/') < strpos(rest, '?')) THEN strpos(rest, '/')
        |         WHEN strpos(rest, '?') > 0 THEN strpos(rest, '?')
        |         ELSE length(rest) + 1 END AS cut FROM s1),
        |s3 AS (SELECT doc_id, url, scheme,
        |    substr(rest, 1, cut - 1) AS auth, substr(rest, cut) AS pq FROM s2),
        |s4 AS (SELECT doc_id, url, scheme,
        |    regexp_replace(lower(split_part(auth, ':', 1)), '^www\.', '') AS host,
        |    split_part(auth, ':', 2) AS port,
        |    split_part(pq, '?', 1) AS path0,
        |    CASE WHEN strpos(pq, '?') > 0 THEN substr(pq, strpos(pq, '?') + 1)
        |         ELSE '' END AS query FROM s3),
        |s5 AS (SELECT doc_id, url, scheme, host,
        |    CASE WHEN port <> '' AND NOT (scheme = 'https' AND port = '443')
        |              AND NOT (scheme = 'http' AND port = '80')
        |         THEN ':' || port ELSE '' END AS portpart,
        |    CASE WHEN path0 = '' THEN '/'
        |         WHEN length(path0) > 1 AND path0 LIKE '%/'
        |           THEN substr(path0, 1, CAST(length(path0) - 1 AS INT))
        |         ELSE path0 END AS path1,
        |    list_sort(list_filter(string_split(query, '&'),
        |      p -> p <> '' AND NOT starts_with(split_part(p, '=', 1), 'utm_')
        |        AND NOT list_contains(['fbclid','gclid','dclid','gbraid','wbraid',
        |          'msclkid','twclid','igshid','yclid','mc_cid','mc_eid',
        |          'ref_src','_ga'], split_part(p, '=', 1)))) AS params
        |  FROM s4),
        |c AS (SELECT doc_id, url,
        |    scheme || '://' || host || portpart || path1 ||
        |    CASE WHEN len(params) > 0 THEN '?' || array_to_string(params, '&')
        |         ELSE '' END AS canon_url FROM s5)
        |SELECT canon_url, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  MIN(doc_id) AS first_doc,
        |  CAST(COUNT(DISTINCT url) AS BIGINT) AS n_variants
        |FROM c GROUP BY 1""".stripMargin) { (s, dir) =>
      Dedup.urlCanonClusters(Dedup.synthesizeUrls(t(s, dir, "documents")))
    },
  )

  /** Oracle for p98: unrolled power iterations. Every double sum is an
    * ORDER-defined list fold (vec_id within bucket, bucket across, pos
    * for the norm) — the exact chain the Spark op executes, so loadings
    * and the variance fraction reproduce bit-for-bit.
    */
  private def pcaPowerOracleSql(iters: Int, dims: Int, bucketShift: Int): String = {
    val v0 = 1.0 / math.sqrt(dims.toDouble)
    val rounds = (1 to iters).map { k =>
      s"""s$k AS (SELECT b.vec_id, b.bkt, b.v,
         |  list_sum(list_transform(generate_series(1, $dims), i -> b.v[i] * v${k - 1}.vv[i])) AS s
         |  FROM b, v${k - 1}),
         |px$k AS (SELECT vec_id, bkt, CAST(i - 1 AS INT) AS pos, v[i] * s AS xs
         |  FROM s$k CROSS JOIN generate_series(1, $dims) t(i)),
         |bs$k AS (SELECT pos, bkt, list_sum(list(xs ORDER BY vec_id)) AS bs
         |  FROM px$k GROUP BY 1, 2),
         |w$k AS (SELECT pos, list_sum(list(bs ORDER BY bkt)) AS w FROM bs$k GROUP BY 1),
         |wl$k AS (SELECT list(w ORDER BY pos) AS wv FROM w$k),
         |v$k AS MATERIALIZED (SELECT list_transform(wv,
         |  x -> x / sqrt(list_sum(list_transform(wv, y -> y * y)))) AS vv FROM wl$k)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |b AS MATERIALIZED (SELECT vec_id, vec_id >> $bucketShift AS bkt, v FROM e),
       |v0 AS (SELECT list_transform(generate_series(1, $dims), i -> $v0) AS vv),
       |$rounds,
       |sf AS (SELECT b.vec_id, b.bkt,
       |  list_sum(list_transform(generate_series(1, $dims), i -> b.v[i] * v$iters.vv[i])) AS s,
       |  list_sum(list_transform(b.v, x -> x * x)) AS nx
       |  FROM b, v$iters),
       |sb AS (SELECT bkt, list_sum(list(s * s ORDER BY vec_id)) AS ssb,
       |  list_sum(list(nx ORDER BY vec_id)) AS nxb FROM sf GROUP BY 1),
       |tot AS (SELECT list_sum(list(ssb ORDER BY bkt)) AS ss,
       |  list_sum(list(nxb ORDER BY bkt)) AS nx FROM sb)
       |SELECT CAST(p.pos AS INT) AS pos, v$iters.vv[p.pos + 1] AS loading,
       |  tot.ss / tot.nx AS sv_fraction
       |FROM (SELECT CAST(i - 1 AS INT) AS pos FROM generate_series(1, $dims) t(i)) p,
       |  v$iters, tot""".stripMargin
  }

  /** Oracle for p124: mean CTEs (per-position bucket folds, one
    * division), the [[pcaPowerOracleSql]] power rounds re-based on the
    * CENTERED relation `c`, then the per-dimension residual folds and
    * the removed-energy fraction — every double sum the identical
    * two-level vec_id-then-bucket ordered chain the Spark op executes.
    */
  private def allButTopOracleSql(iters: Int, dims: Int, bucketShift: Int): String = {
    val v0 = 1.0 / math.sqrt(dims.toDouble)
    val rounds = (1 to iters).map { k =>
      s"""s$k AS (SELECT c.vec_id, c.bkt, c.v,
         |  list_sum(list_transform(generate_series(1, $dims), i -> c.v[i] * v${k - 1}.vv[i])) AS s
         |  FROM c, v${k - 1}),
         |px$k AS (SELECT vec_id, bkt, CAST(i - 1 AS INT) AS pos, v[i] * s AS xs
         |  FROM s$k CROSS JOIN generate_series(1, $dims) t(i)),
         |bs$k AS (SELECT pos, bkt, list_sum(list(xs ORDER BY vec_id)) AS bs
         |  FROM px$k GROUP BY 1, 2),
         |w$k AS (SELECT pos, list_sum(list(bs ORDER BY bkt)) AS w FROM bs$k GROUP BY 1),
         |wl$k AS (SELECT list(w ORDER BY pos) AS wv FROM w$k),
         |v$k AS MATERIALIZED (SELECT list_transform(wv,
         |  x -> x / sqrt(list_sum(list_transform(wv, y -> y * y)))) AS vv FROM wl$k)"""
    }.mkString(",\n")
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |b AS MATERIALIZED (SELECT vec_id, vec_id >> $bucketShift AS bkt, v FROM e),
       |mpx AS (SELECT vec_id, bkt, CAST(i - 1 AS INT) AS pos, v[i] AS x
       |  FROM b CROSS JOIN generate_series(1, $dims) t(i)),
       |mbs AS (SELECT pos, bkt, list_sum(list(x ORDER BY vec_id)) AS bs
       |  FROM mpx GROUP BY 1, 2),
       |mu AS MATERIALIZED (SELECT pos, list_sum(list(bs ORDER BY bkt))
       |  / CAST((SELECT COUNT(*) FROM b) AS DOUBLE) AS m FROM mbs GROUP BY 1),
       |mul AS MATERIALIZED (SELECT list(m ORDER BY pos) AS mv FROM mu),
       |c AS MATERIALIZED (SELECT vec_id, bkt,
       |  list_transform(generate_series(1, $dims), i -> b.v[i] - mul.mv[i]) AS v
       |  FROM b, mul),
       |v0 AS (SELECT list_transform(generate_series(1, $dims), i -> $v0) AS vv),
       |$rounds,
       |sf AS MATERIALIZED (SELECT c.vec_id, c.bkt, c.v,
       |  list_sum(list_transform(generate_series(1, $dims), i -> c.v[i] * v$iters.vv[i])) AS s,
       |  list_sum(list_transform(c.v, x -> x * x)) AS nx
       |  FROM c, v$iters),
       |tpx AS (SELECT vec_id, bkt, CAST(i - 1 AS INT) AS pos, v[i] - s * v$iters.vv[i] AS x
       |  FROM sf, v$iters CROSS JOIN generate_series(1, $dims) t(i)),
       |tbs AS (SELECT pos, bkt, list_sum(list(x ORDER BY vec_id)) AS bs
       |  FROM tpx GROUP BY 1, 2),
       |tsum AS (SELECT pos, list_sum(list(bs ORDER BY bkt)) AS sum_after FROM tbs GROUP BY 1),
       |sb AS (SELECT bkt, list_sum(list(s * s ORDER BY vec_id)) AS ssb,
       |  list_sum(list(nx ORDER BY vec_id)) AS nxb FROM sf GROUP BY 1),
       |tot AS (SELECT list_sum(list(ssb ORDER BY bkt)) AS ss,
       |  list_sum(list(nxb ORDER BY bkt)) AS nx FROM sb)
       |SELECT mu.pos, mu.m AS mean, v$iters.vv[mu.pos + 1] AS loading,
       |  tsum.sum_after, tot.ss / tot.nx AS removed_fraction
       |FROM mu JOIN tsum USING (pos), v$iters, tot""".stripMargin
  }

  /** Oracle for p97: the same posting-slice join plan in DuckDB SQL —
    * identical idf rational, identical left-to-right double chain per
    * term contribution, the same slot-pivot conditional MAX, and
    * ROW_NUMBER (bm25 DESC, doc_id) replaying the bounded-heap's total
    * order.
    */
  private def bm25TopKOracleSql(queries: Seq[(Long, Seq[String])], k: Int): String = {
    val maxSlots = queries.map(_._2.size).max
    val values = queries
      .flatMap { case (qid, ts) => ts.zipWithIndex.map { case (tm, i) => s"($qid, ${i + 1}, '$tm')" } }
      .mkString(", ")
    val slotSum = (1 to maxSlots)
      .map(s => s"COALESCE(MAX(CASE WHEN slot = $s THEN contrib END), 0.0)")
      .mkString("(", "\n    + ", ")")
    s"""WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |q AS (SELECT * FROM (VALUES $values) AS v(query_id, slot, term)),
       |post AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, w AS term,
       |    CAST(COUNT(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, toks, unnest(toks) AS w FROM tok) x
       |  WHERE w IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2, 3),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(toks)) AS BIGINT) AS sum_dl FROM tok),
       |dft AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS dft FROM post GROUP BY 1),
       |c AS (SELECT q.query_id, q.slot, p.doc_id,
       |  (CAST(n_docs AS DOUBLE) - CAST(dft AS DOUBLE) + 0.5) / (CAST(dft AS DOUBLE) + 0.5)
       |    * CAST(tf AS DOUBLE) * ${1.2 + 1.0}
       |    / (CAST(tf AS DOUBLE) + 1.2 * (${1.0 - 0.75} + 0.75 * CAST(dl AS DOUBLE)
       |       / (CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE)))) AS contrib
       |  FROM post p JOIN dft ON dft.term = p.term JOIN q ON q.term = p.term, st),
       |s AS (SELECT query_id, doc_id, $slotSum AS bm25 FROM c GROUP BY 1, 2)
       |SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, CAST(rnk AS INT) AS rnk, bm25
       |FROM (SELECT query_id, doc_id, bm25,
       |  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY bm25 DESC, doc_id) AS rnk
       |  FROM s) x
       |WHERE rnk <= $k""".stripMargin
  }

  /** Unrolled power-iteration oracle for p96: the same bounded
    * (src, tgt, cnt) aggregation, then `iters` chained CTE rounds of the
    * integer fixed-point damped update — DuckDB's `//` is the same floor
    * division as JVM long division on the non-negative operands here.
    */
  private def domainRankOracleSql(iters: Int, domains: Int, fanout: Int): String = {
    val scale = 1000000000000L
    val base = 15L * scale / (100L * domains)
    val pr0 = scale / domains
    val js = (1 to fanout).mkString(", ")
    val rounds = (1 to iters).map { k =>
      s"""c$k AS (SELECT e.tgt AS d, SUM(e.cnt * ((85 * p.pr) // (100 * deg.od))) AS m
         |  FROM e JOIN pr${k - 1} p ON p.d = e.src JOIN deg ON deg.src = e.src GROUP BY 1),
         |pr$k AS (SELECT n.d, CAST($base + COALESCE(c$k.m, 0) AS BIGINT) AS pr
         |  FROM n LEFT JOIN c$k ON c$k.d = n.d)"""
    }.mkString(",\n")
    s"""WITH lnk AS (SELECT
       |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 14) AS BIGINT) % $domains AS src,
       |  CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 14) AS BIGINT) % $domains AS tgt
       |  FROM documents CROSS JOIN (SELECT unnest([$js]) AS j) js),
       |e AS (SELECT src, tgt, CAST(COUNT(*) AS BIGINT) AS cnt FROM lnk WHERE src <> tgt GROUP BY 1, 2),
       |deg AS (SELECT src, SUM(cnt) AS od FROM e GROUP BY 1),
       |n AS (SELECT CAST(range AS BIGINT) AS d FROM range($domains)),
       |pr0 AS (SELECT d, CAST($pr0 AS BIGINT) AS pr FROM n),
       |$rounds
       |SELECT n.d AS domain, CAST(COALESCE(deg.od, 0) AS BIGINT) AS out_edges,
       |  pr$iters.pr AS pr_rank
       |FROM n JOIN pr$iters ON pr$iters.d = n.d LEFT JOIN deg ON deg.src = n.d""".stripMargin
  }

  /** Unrolled Lloyd-iteration oracle for p89: `iters` assign+mean rounds
    * over [[embCtes]], then the final assignment under the last centroids.
    */
  private def kmeansTrainOracleSql(iters: Int, cells: Int): String = {
    def asgCte(name: String, cent: String): String =
      s"""$name AS (SELECT vec_id, cell FROM (
         |  SELECT n.vec_id, $cent.c_id AS cell,
         |    ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
         |      list_sum(list_transform(generate_series(1, len(n.v)), i -> n.v[i] * $cent.cv[i])) / (n.nrm * $cent.cn) DESC,
         |      $cent.c_id) AS r
         |  FROM n, $cent) x WHERE r = 1)"""
    val rounds = (0 until iters).map { k =>
      s"""${asgCte(s"asg$k", s"cent$k")},
         |px$k AS (SELECT a.vec_id, a.vec_id >> 8 AS bkt, a.cell, CAST(i - 1 AS INT) AS pos, e.v[i] AS x
         |  FROM asg$k a JOIN e ON e.vec_id = a.vec_id
         |  CROSS JOIN generate_series(1, 64) t(i)),
         |bsb$k AS (SELECT cell, pos, bkt, list_sum(list(x ORDER BY vec_id)) AS bs,
         |  CAST(COUNT(*) AS BIGINT) AS cnt FROM px$k GROUP BY 1, 2, 3),
         |m$k AS (SELECT cell, pos, list_sum(list(bs ORDER BY bkt)) / CAST(SUM(cnt) AS BIGINT) AS c
         |  FROM bsb$k GROUP BY 1, 2),
         |cvn$k AS (SELECT cell AS c_id, list(c ORDER BY pos) AS cv FROM m$k GROUP BY 1),
         |cent${k + 1} AS (SELECT p.c_id, COALESCE(cvn$k.cv, p.cv) AS cv,
         |  sqrt(list_sum(list_transform(COALESCE(cvn$k.cv, p.cv), x -> x * x))) AS cn
         |  FROM cent$k p LEFT JOIN cvn$k ON p.c_id = cvn$k.c_id)"""
    }.mkString(",\n")
    s"""WITH $embCtes,
       |cent0 AS (SELECT vec_id AS c_id, v AS cv, nrm AS cn FROM n WHERE vec_id < $cells),
       |$rounds,
       |${asgCte("asgf", s"cent$iters")}
       |SELECT vec_id, cell FROM asgf""".stripMargin
  }

  /** DuckDB BM25 oracle mirroring [[TextOps.bm25]]'s exact double
    * arithmetic (rational idf, k1=1.2, b=0.75): same operand order, term
    * sum in query order.
    */
  def bm25OracleSql(terms: Seq[String]): String = {
    val dfCols = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN list_contains(toks, '${terms(i)}') THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(",\n  ")
    val avgdl = "(CAST(sum_dl AS DOUBLE) / CAST(n_docs AS DOUBLE))"
    val termSum = terms.indices.map { i =>
      val tf = s"CAST(len(list_filter(toks, w -> w = '${terms(i)}')) AS DOUBLE)"
      val idf = s"((CAST(n_docs AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5) / (CAST(df$i AS DOUBLE) + 0.5))"
      s"$idf * $tf * (1.2 + 1.0) / ($tf + 1.2 * ((1.0 - 0.75) + 0.75 * CAST(len(toks) AS DOUBLE) / $avgdl))"
    }.mkString("(", "\n    + ", ")")
    s"""WITH tok AS (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents),
       |st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(toks)) AS BIGINT) AS sum_dl,
       |  $dfCols
       |  FROM tok)
       |SELECT doc_id, bm25 FROM (
       |  SELECT doc_id, $termSum AS bm25 FROM tok, st) x
       |WHERE bm25 > 0""".stripMargin
  }
}
