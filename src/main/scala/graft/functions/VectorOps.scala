package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` embedding columns, built on the
  * higher-order functions (`zip_with`, `aggregate`, `transform`) so the
  * whole computation stays inside whole-stage codegen — no UDF, no
  * serialization boundary, scales with the scan.
  *
  * All arithmetic is widened to double FIRST and folded sequentially
  * left-to-right, which makes the result bit-identical to any engine that
  * folds the list in order (the DuckDB oracle does) — crucial for exact
  * differential testing of similarity scores.
  */
object VectorOps {

  private def d(c: Column): Column = transform(c, x => x.cast("double"))

  /** Sequential left fold of element products: dot(a, b).
    * Implemented by the codegen'd [[VecDot]] expression; identical
    * arithmetic (widen-then-multiply, in-order fold) to the
    * higher-order-function form [[dotHof]] it replaced.
    */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftext.{ColumnBridge, VecDot}
    ColumnBridge.column(
      VecDot(ColumnBridge.expression(a), ColumnBridge.expression(b)))
  }

  /** Reference implementation of [[dot]] on builtin higher-order
    * functions — kept for differential testing of VecDot.
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(d(a), d(b), (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  /** Squared L2 norm. */
  def normSq(a: Column): Column = dot(a, a)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity (assumes non-zero vectors). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Sign bit of dimension `j` (bit-sampling LSH for angular distance):
    * no arithmetic at all, so the bucket id is bitwise-reproducible in any
    * engine reading the same parquet floats.
    */
  def signBit(a: Column, j: Int): Column =
    when(element_at(a, j + 1) >= 0f, lit(1)).otherwise(lit(0))

  /** Bit-sampling LSH band id: the sign pattern of `width` consecutive
    * dimensions starting at `start`, packed into an int.
    */
  def signBand(a: Column, start: Int, width: Int): Column =
    (0 until width).map(k => signBit(a, start + k) * lit(1 << k))
      .reduce(_ + _)
}
