package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `ArrayType(FloatType)` embedding columns, written as
  * higher-order column expressions (codegen-friendly, no UDF in the hot
  * path). Products are computed in double (cast before multiply) so the
  * DuckDB oracle — which also widens to double — matches bit-for-bit.
  */
object VectorFns {

  /** Σ a[i]*b[i], computed in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ a[i]^2 (double). */
  def sqNorm(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double"))

  def l2Norm(a: Column): Column = sqrt(sqNorm(a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Cosine when norms are precomputed columns (saves re-reduction in
    * pairwise joins — at scale, norm is computed once per vector, not once
    * per pair). */
  def cosineWithNorms(dotCol: Column, normA: Column, normB: Column): Column =
    dotCol / (normA * normB)
}
