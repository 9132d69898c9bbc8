package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The two plans for sliding-window distinct counting:
  *   - exact (q179): collapse to (hour, user) pairs, expand ×windows,
  *     countDistinct;
  *   - mergeable-sketch: ONE HLL sketch per hour, union the covering
  *     hours per window — no row expansion at all, the plan every
  *     always-on ingest runs at 100 TB (sketches are tiny and
  *     re-mergeable into any window size after the fact).
  * This spec pins the sketch path's estimates to the exact path within
  * HLL's error envelope, so the scale plan stays honest. */
class SlidingDistinctSpec extends SparkSpec {

  test("per-hour HLL sketches unioned per window track exact counts") {
    val d = sf("sf0.01")
    val exact = graft.SparkEntry.queries("q179_sliding_distinct")(spark, d)
      .select(col("window_start"), col("n_users"))
    val ev = graft.Tables.events(spark, d)
    val perHour = ev
      .select(floor(unix_micros(col("ts")) / lit(3600000000L))
        .cast("long").as("_h"), col("user_id"))
      .groupBy("_h")
      .agg(hll_sketch_agg(col("user_id"), lit(14)).as("_sk"))
    val est = perHour
      .select(col("_sk"), explode(sequence(col("_h") - 5, col("_h")))
        .as("_w"))
      .groupBy("_w")
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"), lit(true)))
        .as("n_est"))
      .select(timestamp_micros(col("_w") * 3600000000L)
        .as("window_start"), col("n_est"))
    val joined = exact.join(est, "window_start")
      .select(col("n_users").cast("double").as("x"),
        col("n_est").cast("double").as("e"))
      .collect()
    assert(joined.length > 500)
    joined.foreach { r =>
      val (x, e) = (r.getDouble(0), r.getDouble(1))
      // lgK=14 → rsd ≈ 0.8%; allow 5% + slack for tiny windows
      assert(math.abs(e - x) <= math.max(3.0, 0.05 * x),
        s"estimate $e vs exact $x")
    }
  }
}
