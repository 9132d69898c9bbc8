package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.util.Exact

/** Mergeable aggregation state — the incremental-recompute pattern every
  * 100 TB ingest pipeline runs: aggregate yesterday's snapshot ONCE, then
  * on each refresh aggregate only the delta and MERGE states, never
  * rescanning the base.
  *
  * The state per key is (n, decimal Σy, min, max): each component is
  * associative and commutative, so `merge(snapshot(a), snapshot(b)) ==
  * snapshot(a ∪ b)` holds EXACTLY — the decimal sum makes even the
  * floating component order-independent (q155 gates this identity against
  * a full-recompute oracle). `finish` derives presentation metrics
  * (mean) from the state.
  *
  * States are plain DataFrames, so they persist to any table format and
  * merge across days/partitions with one keyed aggregate.
  */
object IncrementalAgg {

  /** Aggregate `df` to mergeable per-key state. */
  def snapshot(df: DataFrame, keys: Seq[String], valueCol: String,
               precision: Int = 18, scale: Int = 6): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(col(valueCol)).as("n"),
        sum(Exact.dec(col(valueCol), precision, scale)).as("sum_v"),
        min(col(valueCol)).as("min_v"),
        max(col(valueCol)).as("max_v"))

  /** Merge any number of state frames into one — a single keyed hash
    * aggregate over state-sized (not data-sized) rows. */
  def merge(states: Seq[DataFrame], keys: Seq[String]): DataFrame = {
    require(states.nonEmpty, "need at least one state")
    states.reduce(_ unionByName _)
      .groupBy(keys.map(col): _*)
      .agg(sum(col("n")).as("n"), sum(col("sum_v")).as("sum_v"),
        min(col("min_v")).as("min_v"), max(col("max_v")).as("max_v"))
  }

  /** Presentation metrics from a state frame. */
  def finish(state: DataFrame, keys: Seq[String],
             roundTo: Int = 6): DataFrame =
    state.select(keys.map(col) ++ Seq(
      col("n"),
      round(col("sum_v").cast("double") + lit(1e-9), roundTo).as("sum_v"),
      col("min_v"), col("max_v"),
      round(col("sum_v").cast("double") / col("n").cast("double")
        + lit(1e-9), roundTo).as("mean_v")): _*)
}
