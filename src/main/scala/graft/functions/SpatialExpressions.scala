package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression,
  QuinaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}

/** Native even-odd ray-cast against the geo8 octagon:
  * `octagon_contains(px, py, cx, cy, r)` — true iff point (px, py)
  * falls inside the octagon centered at (cx, cy) with axis vertices at
  * distance r and the 45° vertices at a = ⌊r·70711/100000⌋.
  *
  * The arithmetic is EXACTLY the declarative form this replaces
  * (Spatial.polygonContains's per-edge straddle test + cross-multiplied
  * division-free comparison, BIGINT throughout — membership cannot
  * drift vs the DuckDB oracle's replay of the same integers). What
  * changes is the compiled shape: inlining the 8-edge CASE tree into
  * the candidate join's condition generated one method far past
  * HotSpot's huge-method JIT threshold, so every candidate row paid
  * interpreted-bytecode evaluation — measured ~2.4 µs/row, which WAS
  * the sf1 cost of the face (~12 of 13 s). This kernel is a tight
  * 8-iteration loop, small enough to JIT and inline, per the charter's
  * preference for a native Expression on the hot scalar path.
  */
case class OctagonContains(px: Expression, py: Expression,
                           cx: Expression, cy: Expression,
                           r: Expression) extends QuinaryExpression {

  override def children: Seq[Expression] = Seq(px, py, cx, cy, r)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "octagon_contains"

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType == LongType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects five bigint arguments, got " +
        children.map(_.dataType.simpleString).mkString(", "))

  override def nullSafeEval(pxv: Any, pyv: Any, cxv: Any, cyv: Any,
                            rv: Any): Any =
    OctagonContains.contains(pxv.asInstanceOf[Long],
      pyv.asInstanceOf[Long], cxv.asInstanceOf[Long],
      cyv.asInstanceOf[Long], rv.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (p1, p2, p3, p4, p5) =>
      s"graft.functions.OctagonContains.contains($p1, $p2, $p3, $p4, $p5)")

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): OctagonContains =
    copy(px = newChildren(0), py = newChildren(1), cx = newChildren(2),
      cy = newChildren(3), r = newChildren(4))
}

object OctagonContains {
  /** The kernel both eval paths share (static forwarder makes it
    * callable from generated Java). Identical integer operations to
    * the retired declarative CASE tree, edge order and all. */
  def contains(px: Long, py: Long, cx: Long, cy: Long, r: Long): Boolean = {
    val a = r * 70711L / 100000L
    val ox = Array(r, a, 0L, -a, -r, -a, 0L, a)
    val oy = Array(0L, a, r, a, 0L, -a, -r, -a)
    var cross = 0
    var i = 0
    while (i < 8) {
      val y1 = cy + oy(i)
      val y2 = cy + oy((i + 1) & 7)
      if ((y1 > py) != (y2 > py)) {
        val x1 = cx + ox(i)
        val d = y2 - y1
        val lhs = (px - x1) * d
        val rhs = (py - y1) * ((cx + ox((i + 1) & 7)) - x1)
        if (if (d > 0) lhs < rhs else lhs > rhs) cross += 1
      }
      i += 1
    }
    (cross & 1) == 1
  }
}
