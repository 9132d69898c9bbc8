package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row down-sampling with weight compensation.
  *
  * Mirrors the reference's two samplers (photon-lib/.../sampling/
  * DefaultDownSampler.scala:28-60 and
  * BinaryClassificationDownSampler.scala:33-70): uniform sampling, and
  * class-aware sampling that keeps all positives, samples negatives at
  * `rate`, and rescales surviving negatives' weights by 1/rate.
  *
  * Instead of `rand(seed)` (which is partitioning-dependent in Spark) we
  * hash the row's unique id — fully deterministic and reproducible across
  * recomputations, cluster sizes, and engines. The filter is a plain
  * Catalyst predicate, so it pushes into the scan pipeline and costs no
  * shuffle.
  */
object DownSampling {

  /** In [0,1): first 8 md5 hex chars of the uid, scaled. */
  def hashFraction(uidCols: Seq[Column]): Column =
    (conv(substring(md5(concat_ws("_", uidCols.map(_.cast("string")): _*)),
      1, 8), 16, 10).cast("double") / lit(4294967296.0))

  /** Uniform deterministic sample at `rate`. */
  def uniform(df: DataFrame, uidCols: Seq[String], rate: Double): DataFrame =
    df.filter(hashFraction(uidCols.map(col)) < rate)

  /** Keep rows where `isPositive`; sample the rest at `rate` and multiply
    * `weightCol` by 1/rate for survivors. */
  def binaryClass(df: DataFrame, uidCols: Seq[String], isPositive: Column,
                  rate: Double, weightCol: String = "weight"): DataFrame =
    df.filter(isPositive || hashFraction(uidCols.map(col)) < rate)
      .withColumn(weightCol,
        when(isPositive, col(weightCol))
          .otherwise(col(weightCol) * lit(1.0 / rate)))
}
