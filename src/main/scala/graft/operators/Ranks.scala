package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact global rank statistics without a single-task sort.
  *
  * `cume_dist`/`percent_rank` over a whole table is the canonical
  * scale trap: a window with no PARTITION BY funnels every row through
  * one task. The distributed formulation splits it into
  *   1. a hash aggregate to per-VALUE counts (shuffle bounded by the
  *      distinct-value count, with map-side combine),
  *   2. a range-partitioned sort of the distinct values with
  *      partition-offset prefix sums (per-partition totals — one tiny
  *      number per partition — are collected, offset on the driver, and
  *      the running sum is completed partition-locally), and
  *   3. an equi-join of value → rank back onto the rows.
  * Every stage is parallel; driver traffic is O(#partitions), not rows.
  * The same offset trick backs [[Profiling.exactQuantiles]]'s index
  * lookup — this is its per-row inverse (value → ECDF rather than
  * quantile → value).
  */
object Ranks {

  /** value → (cnt_le = #rows with value ≤ v, ecdf = cnt_le / n).
    *
    * One row per distinct value of `column` (nulls excluded); join the
    * result back on `column` for per-row ranks. `cnt_le` is the
    * integer-exact rank surface — hash-safe — and `ecdf` its rounded
    * ratio (what `cume_dist()` would return).
    */
  def ecdf(df: DataFrame, column: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(column).cast("double").as("v")).na.drop()
      .groupBy("v").agg(count(lit(1)).as("c"))
      .as[(Double, Long)]
    // range-partition + in-partition sort = globally sorted distinct
    // values; sortBy samples its own range bounds. localCheckpoint (the
    // repo's CC-rounds convention) materializes the sort once and cuts
    // the lineage, so the totals job and the returned plan share one
    // execution instead of re-sorting (an unpersist-in-finally here
    // would silently recompute the sort when the result materializes).
    val sorted = counts.rdd.sortBy(_._1).localCheckpoint()
    // per-partition totals: one long per partition back to the driver
    val partTotals = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._2).sum)
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val n = math.max(1L, offsets.last)
    val ranked = sorted.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { case (v, c) => acc += c; (v, acc) }
    }
    ranked.toDF("v", "cnt_le")
      .select(col("v").as(column), col("cnt_le"),
        round(col("cnt_le").cast("double") / n + lit(1e-9), 6).as("ecdf"))
  }
}
