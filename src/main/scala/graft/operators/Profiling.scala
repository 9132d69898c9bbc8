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
