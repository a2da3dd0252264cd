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
  /** One even-odd edge test: does the ray from (px, py) cross the edge
    * (cx+x1o, cy+y1o) → (cx+x2o, cy+y2o)? Same cross-multiplied
    * division-free comparison as the retired CASE tree. Tiny and
    * monomorphic so HotSpot inlines all 8 call sites into
    * [[contains]]. */
  @inline private def edge(px: Long, py: Long, cx: Long, cy: Long,
                           x1o: Long, y1o: Long,
                           x2o: Long, y2o: Long): Int = {
    val y1 = cy + y1o
    val y2 = cy + y2o
    if ((y1 > py) != (y2 > py)) {
      val x1 = cx + x1o
      val d = y2 - y1
      val lhs = (px - x1) * d
      val rhs = (py - y1) * ((cx + x2o) - x1)
      if (if (d > 0) lhs < rhs else lhs > rhs) 1 else 0
    } else 0
  }

  /** The kernel both eval paths share (static forwarder makes it
    * callable from generated Java). Identical integer operations to
    * the retired declarative CASE tree, edge order and all — the 8
    * edges are unrolled (no per-invocation vertex arrays: this runs
    * once per candidate-join row, and escape analysis was not
    * guaranteed to elide the allocations under the generated-code
    * call shape). */
  def contains(px: Long, py: Long, cx: Long, cy: Long, r: Long): Boolean = {
    val a = r * 70711L / 100000L
    var cross = 0
    cross += edge(px, py, cx, cy, r, 0L, a, a)    // E  → NE
    cross += edge(px, py, cx, cy, a, a, 0L, r)    // NE → N
    cross += edge(px, py, cx, cy, 0L, r, -a, a)   // N  → NW
    cross += edge(px, py, cx, cy, -a, a, -r, 0L)  // NW → W
    cross += edge(px, py, cx, cy, -r, 0L, -a, -a) // W  → SW
    cross += edge(px, py, cx, cy, -a, -a, 0L, -r) // SW → S
    cross += edge(px, py, cx, cy, 0L, -r, a, -a)  // S  → SE
    cross += edge(px, py, cx, cy, a, -a, r, 0L)   // SE → E
    (cross & 1) == 1
  }
}
