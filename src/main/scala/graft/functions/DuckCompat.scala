package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DuckDB-compat scalar functions whose semantics depend on the argument
  * TYPE, so a text-level rename in the gateway's dialect pre-pass cannot
  * express them (reference backend/main.py:95-100 — "any read-only DuckDB
  * SELECT"): DuckDB's `len` is string length AND list cardinality; its
  * `a[i:j]` slice is 1-based-inclusive substring AND list slice. Each is a
  * [[RuntimeReplaceable]] that dispatches on the resolved child type and
  * rewrites itself to the matching native (codegen'd) expression during
  * optimization — zero runtime overhead, and Spark-dialect queries are
  * unaffected because neither name collides with a builtin.
  */
case class DuckLen(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override lazy val replacement: Expression = child.dataType match {
    case _: ArrayType | _: MapType => Size(child)
    case _ => Length(child)
  }
  override def prettyName: String = "len"
  override protected def withNewChildInternal(newChild: Expression): DuckLen =
    copy(child = newChild)
}

/** DuckDB `x[from:to]` (1-based, both ends inclusive; emitted by the
  * dialect pre-pass as `duck_slice(x, from, to)`): `slice` for arrays,
  * `substring` for strings — both take (start, LENGTH), so the length is
  * computed as to-from+1 in long arithmetic, clamped to [0, Int.MaxValue]
  * (the pre-pass encodes an open upper bound `x[i:]` as to=Int.MaxValue).
  */
case class DuckSlice(child: Expression, from: Expression, to: Expression)
    extends RuntimeReplaceable {
  override def children: Seq[Expression] = Seq(child, from, to)
  override lazy val replacement: Expression = {
    // DuckDB treats a 0 lower bound as "from the start" (x[0:2] == x[1:2]);
    // Spark's Slice errors on start=0, so clamp before dispatching.
    val start = Greatest(Seq(Cast(from, IntegerType), Literal(1)))
    val len = Cast(
      Least(Seq(
        Literal(Int.MaxValue.toLong),
        Greatest(Seq(
          Literal(0L),
          Add(Subtract(Cast(to, LongType), Cast(start, LongType)), Literal(1L)))))),
      IntegerType)
    child.dataType match {
      case _: ArrayType => Slice(child, start, len)
      case _ => Substring(child, start, len)
    }
  }
  override def prettyName: String = "duck_slice"
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): DuckSlice =
    copy(child = newChildren(0), from = newChildren(1), to = newChildren(2))
}

object DuckCompat {
  def lenForArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 1, "len expects one argument")
    DuckLen(exprs.head)
  }
  def sliceForArgs(exprs: Seq[Expression]): Expression = {
    require(exprs.length == 3, "duck_slice expects (value, from, to)")
    DuckSlice(exprs(0), exprs(1), exprs(2))
  }
}
