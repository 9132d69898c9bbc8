package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Score algebra over `(key, score)` tables.
  *
  * Reproduces the reference's coordinate-descent score bookkeeping
  * (photon-ml `CoordinateDataScores.joinAndApply`,
  * photon-lib/.../data/scoring/CoordinateDataScores.scala:40-48, and
  * `FixedEffectDataset.addScoresToOffsets`,
  * photon-api/.../data/FixedEffectDataset.scala:46-58) as Catalyst outer
  * joins: a missing side contributes 0. The reference hand-rolls
  * RDD fullOuterJoin/leftOuterJoin; here Catalyst picks the physical join
  * (broadcast when one side is small, shuffled hash otherwise) and AQE
  * handles skew — which is what you want at 100 TB.
  */
object ScoreAlgebra {

  /** `left + right` with full-outer semantics: keys present on either side
    * survive; missing scores count as 0. */
  def add(left: DataFrame, right: DataFrame, key: String,
          scoreCol: String = "score"): DataFrame = {
    val l = left.withColumnRenamed(scoreCol, "_l")
    val r = right.withColumnRenamed(scoreCol, "_r")
    l.join(r, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("_l"), lit(0.0)) + coalesce(col("_r"), lit(0.0)))
          .as(scoreCol))
  }

  /** `left - right`, full-outer, missing = 0. */
  def subtract(left: DataFrame, right: DataFrame, key: String,
               scoreCol: String = "score"): DataFrame = {
    val l = left.withColumnRenamed(scoreCol, "_l")
    val r = right.withColumnRenamed(scoreCol, "_r")
    l.join(r, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("_l"), lit(0.0)) - coalesce(col("_r"), lit(0.0)))
          .as(scoreCol))
  }

  /** Add residual scores into a dataset's offset column (left outer: rows
    * without a score keep their offset). Mirrors
    * `FixedEffectDataset.addScoresToOffsets`. */
  def addToOffsets(data: DataFrame, scores: DataFrame, key: String,
                   offsetCol: String = "offset",
                   scoreCol: String = "score"): DataFrame =
    data.join(scores, Seq(key), "left_outer")
      .withColumn(offsetCol,
        col(offsetCol) + coalesce(col(scoreCol), lit(0.0)))
      .drop(scoreCol)
}
