package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions over `array<double>` / `array<float>`.
  *
  * Built from Catalyst higher-order functions (`zip_with` + `aggregate`),
  * which codegen into tight loops — no UDF serialization, no boxing of the
  * whole array, and the expressions stay inside WholeStageCodegen. The fold
  * is sequential left-to-right, which makes the double accumulation
  * deterministic (same result on any cluster layout and in any engine that
  * folds in order).
  */
object VectorOps {

  /** Elementwise-exact upcast so all arithmetic happens in doubles. */
  def asDouble(v: Column): Column = v.cast("array<double>")

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  def normSq(a: Column): Column = dot(a, a)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / sqrt(normSq(a) * normSq(b))

  /** Euclidean distance squared (cheaper than sqrt for ranking). */
  def distSq(a: Column, b: Column): Column =
    aggregate(zip_with(asDouble(a), asDouble(b), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** a + s*b (axpy). */
  def axpy(s: Column, a: Column, b: Column): Column =
    zip_with(asDouble(a), asDouble(b), (x, y) => x + s * y)

  def scale(s: Column, a: Column): Column =
    transform(asDouble(a), x => x * s)

  /** Sign-of-projection LSH bit for one deterministic pseudo-random
    * hyperplane: the hyperplane's components are derived from md5(seed, i)
    * so the "random" projection is reproducible everywhere with no
    * broadcast state. */
  def hyperplaneBit(v: Column, seed: Int): Column = {
    val proj = aggregate(
      zip_with(asDouble(v),
        transform(sequence(lit(0), size(v) - 1), i =>
          (conv(substring(md5(concat_ws("_", lit(seed), i)), 1, 8), 16, 10)
            .cast("double") / lit(2147483648.0)) - lit(1.0)),
        (x, h) => x * h),
      lit(0.0), (acc, x) => acc + x)
    when(proj >= 0, lit(1)).otherwise(lit(0))
  }

  /** nBits-wide sign-LSH bucket id for an embedding. */
  def lshBucket(v: Column, nBits: Int): Column =
    (0 until nBits).map(b => hyperplaneBit(v, b) * (1 << b))
      .reduce(_ + _)
}
