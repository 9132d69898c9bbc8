package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded per-group sampling and top-K.
  *
  * The reference caps each random-effect entity's "active" sample count with
  * a deterministic reservoir (`RandomEffectDataset.groupDataByKeyAndSample`,
  * photon-api/.../data/RandomEffectDataset.scala:468-527: combineByKey into a
  * fixed-capacity min-heap keyed by a deterministic hash; survivors'
  * weights rescaled by count/capacity so aggregates stay unbiased).
  *
  * Spark-first translation: a window `row_number` over a deterministic hash
  * order. One shuffle on the group key; no driver involvement; AQE splits
  * skewed groups' sort work. For very hot keys the heap-based Aggregator
  * would do a partial (map-side) cap — see `boundedSampleAgg` note.
  */
object GroupedSampling {

  /** Deterministic per-row priority: md5 of the row's unique id rendered as
    * hex. Stable across runs, partitionings, and engines (md5 is md5
    * everywhere), which is what makes recomputation-stable sampling possible
    * — same idea as the reference's byteswap64(hash) key. */
  def priority(uidCols: Seq[Column]): Column =
    md5(concat_ws("_", uidCols.map(_.cast("string")): _*))

  /** Keep at most `cap` rows per group, chosen by deterministic hash
    * priority; add `weight_scale` = n/cap for survivors of capped groups so
    * weighted aggregates remain unbiased (photon's weight rescaling). */
  def boundedSample(df: DataFrame, groupCols: Seq[String],
                    uidCols: Seq[String], cap: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(priority(uidCols.map(col)))
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    df.withColumn("_rn", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(wAll))
      .filter(col("_rn") <= cap)
      .withColumn("weight_scale",
        when(col("_n") > cap, col("_n").cast("double") / cap)
          .otherwise(lit(1.0)))
      .drop("_rn", "_n")
  }

  /** Top-K rows per group by an explicit ordering (deterministic iff the
    * ordering is total — callers must include a tie-breaker). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
