package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document suffix statistics from ONE O(len) suffix-automaton pass
  * (Blumer et al. 1985; the CP-algorithms construction):
  * `suffix_stats(text, k)` returns
  * `struct(lrs_len, distinct_k, total_k)` where
  *
  *   - `lrs_len` is the length of the longest substring occurring at
  *     least TWICE in the document (occurrences may overlap — "aaa" has
  *     lrs_len 2). This is the character-level within-document
  *     repetition signal behind suffix-array dedup thresholds (Lee et
  *     al. 2022 use 50-char repeats); the n-gram fraction rules (p115)
  *     measure *how much* is repeated at a fixed n, this measures *how
  *     long* the worst verbatim repeat is at any n.
  *   - `distinct_k` is the number of DISTINCT substrings of length
  *     exactly `k` (each automaton state covers lengths
  *     (len(link)..len], so this is a state count, no enumeration).
  *   - `total_k` is the number of substring POSITIONS of length `k`,
  *     i.e. max(0, cp_count - k + 1); `distinct_k / total_k` is the
  *     k-gram uniqueness ratio.
  *
  * Positions are Unicode CODE POINTS (matching [[RollingHash]] /
  * DuckDB's `unicode()`; identical to bytes/chars on ASCII corpora).
  * The automaton is built with first-child/next-sibling edge arrays —
  * no per-state hash maps — so a document costs two int-array passes
  * and the kernel stays allocation-light at corpus scale. Occurrence
  * counts propagate over suffix links in len-descending order (counting
  * sort, no comparator).
  */
case class SuffixStats(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"suffix_stats requires a string argument, got ${child.dataType.catalogString}")
    else if (k < 1)
      TypeCheckResult.TypeCheckFailure(s"suffix_stats requires k >= 1, got $k")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StructType(Seq(
    StructField("lrs_len", LongType, nullable = false),
    StructField("distinct_k", LongType, nullable = false),
    StructField("total_k", LongType, nullable = false)))

  override def prettyName: String = "suffix_stats"

  override def nullSafeEval(input: Any): Any =
    SuffixStats.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SuffixStats.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): SuffixStats =
    copy(child = newChild)
}

object SuffixStats {

  /** SQL-registration builder; k must be a foldable integer literal. */
  def forArgs(exprs: Seq[Expression]): SuffixStats = {
    if (exprs.size != 2)
      throw new IllegalArgumentException(
        s"suffix_stats takes (text, k); got ${exprs.size} arguments")
    val k = exprs(1) match {
      case l if l.foldable => l.eval() match {
        case num: Number => num.intValue
        case other => throw new IllegalArgumentException(
          s"suffix_stats: k must be an integer literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "suffix_stats: k must be an integer literal, not a column")
    }
    SuffixStats(exprs.head, k)
  }

  /** Referenced from generated code — keep public and stable. */
  def compute(text: UTF8String, k: Int): InternalRow = {
    val str = text.toString
    // Code points (DuckDB unicode() semantics; == chars on ASCII).
    val m0 = str.codePointCount(0, str.length)
    val cps = new Array[Int](m0)
    var ci = 0
    var t = 0
    while (ci < str.length) {
      val cp = str.codePointAt(ci)
      cps(t) = cp
      ci += Character.charCount(cp)
      t += 1
    }
    val totalK = math.max(0L, m0.toLong - k + 1)
    if (m0 == 0) return new GenericInternalRow(Array[Any](0L, 0L, 0L))

    // Suffix automaton, states 0..size-1 (0 = root). Transitions as
    // first-child/next-sibling int arrays; out-degree per state is
    // alphabet-bounded so lookups are short linear walks.
    val maxStates = 2 * m0 + 2
    val len = new Array[Int](maxStates)
    val link = new Array[Int](maxStates)
    val cnt = new Array[Long](maxStates)
    val head = new Array[Int](maxStates) // first edge index, -1 = none
    java.util.Arrays.fill(head, -1)
    // Edge pool: worst case < 3 * maxStates (fresh edges + clone copies).
    var edgeCap = 4 * m0 + 8
    var eCh = new Array[Int](edgeCap)
    var eTo = new Array[Int](edgeCap)
    var eNext = new Array[Int](edgeCap)
    var nEdges = 0

    def growEdges(): Unit = {
      edgeCap *= 2
      eCh = java.util.Arrays.copyOf(eCh, edgeCap)
      eTo = java.util.Arrays.copyOf(eTo, edgeCap)
      eNext = java.util.Arrays.copyOf(eNext, edgeCap)
    }
    // Returns the edge index for (v, c), or -1.
    def findEdge(v: Int, c: Int): Int = {
      var e = head(v)
      while (e != -1) {
        if (eCh(e) == c) return e
        e = eNext(e)
      }
      -1
    }
    def addEdge(v: Int, c: Int, to: Int): Unit = {
      if (nEdges == edgeCap) growEdges()
      eCh(nEdges) = c; eTo(nEdges) = to; eNext(nEdges) = head(v)
      head(v) = nEdges
      nEdges += 1
    }

    link(0) = -1
    var size = 1
    var last = 0
    var i = 0
    while (i < m0) {
      val c = cps(i)
      val cur = size; size += 1
      len(cur) = len(last) + 1
      cnt(cur) = 1L
      var p = last
      var qEdge = -1
      while (p != -1 && { qEdge = findEdge(p, c); qEdge == -1 }) {
        addEdge(p, c, cur)
        p = link(p)
      }
      if (p == -1) link(cur) = 0
      else {
        val q = eTo(qEdge)
        if (len(p) + 1 == len(q)) link(cur) = q
        else {
          val clone = size; size += 1
          len(clone) = len(p) + 1
          link(clone) = link(q)
          cnt(clone) = 0L
          // Copy q's transitions to the clone.
          var e = head(q)
          while (e != -1) { addEdge(clone, eCh(e), eTo(e)); e = eNext(e) }
          // Redirect the chain of (p, c) -> q edges to the clone.
          var pp = p
          var ee = qEdge
          while (pp != -1 && ee != -1 && eTo(ee) == q) {
            eTo(ee) = clone
            pp = link(pp)
            ee = if (pp == -1) -1 else findEdge(pp, c)
          }
          link(q) = clone
          link(cur) = clone
        }
      }
      last = cur
      i += 1
    }

    // Occurrence counts: propagate over suffix links in len-descending
    // order via a counting sort on len (len <= m0).
    val buckets = new Array[Int](m0 + 2)
    var v = 1
    while (v < size) { buckets(len(v)) += 1; v += 1 }
    var b = 1
    while (b <= m0) { buckets(b) += buckets(b - 1); b += 1 }
    val order = new Array[Int](size - 1)
    v = 1
    while (v < size) {
      buckets(len(v)) -= 1
      order(buckets(len(v))) = v
      v += 1
    }
    var oi = size - 2
    while (oi >= 0) {
      val s = order(oi)
      if (link(s) > 0) cnt(link(s)) += cnt(s)
      else if (link(s) == 0) () // root's count is unused
      oi -= 1
    }

    var lrs = 0L
    var distinctK = 0L
    v = 1
    while (v < size) {
      if (cnt(v) >= 2L && len(v) > lrs) lrs = len(v)
      val minLen = len(link(v)) + 1
      if (minLen <= k && k <= len(v)) distinctK += 1
      v += 1
    }
    new GenericInternalRow(Array[Any](lrs, distinctK, totalK))
  }
}
