package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.typedlit

/** Collected-model literals as SINGLE folded `Literal` nodes.
  *
  * The broadcast-the-model pattern ships a collected K-row model back
  * into the plan as a literal array. Building that array as
  * `array(struct(lit(cell), array(lit(x1), …, lit(x64))))` creates one
  * expression node PER SCALAR — a k=8, dims=64 centroid model is ~520
  * nodes, and every expression that references it (assignment argmin,
  * residual lookup, per-cell probe tables) re-expands its own copy, so
  * the IVF-PQ plans carried tens of thousands of literal nodes
  * (~145 KB of formatted plan). The VALUES are constants either way;
  * what the node count buys is nothing — but Catalyst pays for it on
  * every query: analysis, constant folding, and codegen all walk those
  * trees, and at bench scale (2k-row corpus) that driver-side walk WAS
  * the query time.
  *
  * `typedlit` folds the same values into ONE `Literal` node (the array
  * data is a single `GenericArrayData` constant); the `cast` renames
  * tuple fields (`_1`, `_2`) to the model's field names — a positional
  * struct cast over a literal, folded away by the optimizer. Values,
  * types, and field names are bit-identical to the per-scalar form, so
  * every consumer expression (and every DuckDB oracle replay) is
  * unchanged.
  */
private[operators] object ModelLit {

  /** `Seq[Double]` → one literal `array<double>` node. */
  def vec(xs: Seq[Double]): Column = typedlit(xs)

  /** `Seq[Long]` → one literal `array<bigint>` node. */
  def vecL(xs: Seq[Long]): Column = typedlit(xs)

  /** `Seq[Seq[Double]]` → one literal `array<array<double>>` node. */
  def mat(xss: Seq[Seq[Double]]): Column = typedlit(xss.map(_.toSeq))

  /** `(id, vector)` model rows → one literal
    * `array<struct<idName:int, vecName:array<double>>>` node. */
  def cells(rows: Seq[(Int, Seq[Double])], idName: String,
            vecName: String): Column =
    typedlit(rows.map { case (i, v) => (i, v.toSeq) })
      .cast(s"array<struct<$idName:int,$vecName:array<double>>>")

  /** Long-keyed variant of [[cells]]. */
  def cellsL(rows: Seq[(Long, Seq[Double])], idName: String,
             vecName: String): Column =
    typedlit(rows.map { case (i, v) => (i, v.toSeq) })
      .cast(s"array<struct<$idName:bigint,$vecName:array<double>>>")
}
