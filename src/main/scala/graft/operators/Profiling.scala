package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Sketch-based column profiling for the 100 TB path.
  *
  * The exact profile (q65: sort-based percentiles, full distinct) costs
  * a global sort / full shuffle per column. At corpus scale, profiling
  * runs on every ingest — it has to be one pass and mergeable. These are
  * the sketch twins: HyperLogLog++ for distinct counts and the
  * KLL-style quantile sketch behind `percentile_approx`, both
  * order-independent one-pass aggregates whose partials merge
  * associatively (so 1000 executors' sketches combine without a second
  * scan). Accuracy is tunable: `rsd` for HLL, `accuracy` for quantiles.
  */
object Profiling {

  /** Exact interpolated quantiles (the `quantile_cont` / Spark
    * `percentile` definition: index p·(n−1), linear interpolation) via a
    * range-partitioned parallel sort + order-statistics lookup.
    *
    * Spark's built-in exact `percentile` aggregate merges a value→count
    * map on ONE reducer — fine for low-cardinality columns, a
    * single-task funnel for continuous ones (measured: 6 s vs 0.4 s at
    * sf0.1). `sortBy` + `zipWithIndex` keeps every stage parallel: the
    * sort is range-partitioned, the index is partition-offset
    * arithmetic, and only the O(|probs|) boundary rows are collected. */
  def exactQuantiles(df: DataFrame, column: String,
                     probs: Seq[Double]): Seq[Double] = {
    val rdd = df.select(col(column).cast("double")).na.drop()
      .rdd.map(_.getDouble(0)).sortBy(identity)
    val n = rdd.count()
    if (n == 0) return probs.map(_ => Double.NaN)
    val wanted = probs.flatMap { p =>
      val k = p * (n - 1)
      Seq(math.floor(k).toLong, math.ceil(k).toLong)
    }.distinct.toSet
    val boundary = rdd.zipWithIndex().filter(t => wanted(t._2))
      .map(_.swap).collect().toMap
    probs.map { p =>
      val k = p * (n - 1)
      val lo = boundary(math.floor(k).toLong)
      val hi = boundary(math.ceil(k).toLong)
      lo + (k - math.floor(k)) * (hi - lo)
    }
  }

  /** One row per column: count, nulls, approx distinct, approx
    * quartiles, min/max/mean (exact one-pass aggregates ride along for
    * free). */
  def approxProfile(df: DataFrame, columns: Seq[String],
                    rsd: Double = 0.05, accuracy: Int = 10000): DataFrame =
    columns.map { c =>
      df.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as("n_null"),
        approx_count_distinct(col(c), rsd).as("approx_distinct"),
        percentile_approx(col(c),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("_q"),
        min(col(c)).cast("double").as("vmin"),
        max(col(c)).cast("double").as("vmax"),
        avg(col(c)).as("vmean"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_null"),
          col("approx_distinct"),
          col("_q").getItem(0).cast("double").as("p25"),
          col("_q").getItem(1).cast("double").as("p50"),
          col("_q").getItem(2).cast("double").as("p75"),
          col("vmin"), col("vmax"), col("vmean"))
    }.reduce(_ union _)
}
