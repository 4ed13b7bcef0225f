package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` columns, built from Spark's codegen'd
  * higher-order functions (zip_with / aggregate / transform) — no UDFs, so
  * every expression stays inside whole-stage codegen and scales as a pure
  * map over partitions.
  *
  * All accumulation is in double (float32 inputs are widened first) with
  * sequential left-to-right folds for determinism.
  */
object VectorOps {

  /** dot(a, b) with double accumulation — the native codegen'd
    * FloatVecDot expression (registered by GraftExtensions).
    */
  def dot(a: Column, b: Column): Column = call_function("fvec_dot", a, b)

  /** Higher-order-function dot (interpreted): kept for sessions without
    * GraftExtensions; same values as [[dot]].
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** cosine similarity — fused single-pass kernel (dot + both norms in
    * one traversal; arithmetically identical to dot/(norm*norm)).
    */
  def cosine(a: Column, b: Column): Column = call_function("fvec_cos", a, b)

  /** cosine rounded to 6dp — the cross-engine comparison precision
    * (see SURVEY.md §6).
    */
  def cosine6(a: Column, b: Column): Column = round(cosine(a, b), 6)

  /** Elementwise mean of an array-of-vectors column (fixed dim).
    * Mean-pool of chunk vectors = the reference's document vector
    * (reference: src/backend/database/qdrant.py:123).
    */
  def meanPool(vecs: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => aggregate(vecs, lit(0.0), (s, v) => s + get(v, i).cast("double")) / size(vecs))
}
