package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Rolling (trailing-window) per-key features over a time series — the
  * lag/rolling-count/rolling-sum trio every behavioral feature pipeline
  * derives from an event log.
  *
  * A RANGE-frame window does the whole job in one shuffle on the key:
  * Spark sorts each key's rows once and slides the frame, so there is no
  * self-join, no per-row probe, and no second shuffle — compare the
  * bucketized [[EventJoins.rangeAgg]], which exists for the join-shaped
  * variant (attach a DIFFERENT stream's trailing stats). The frame here
  * is `RANGE BETWEEN windowSec PRECEDING AND CURRENT ROW` over epoch
  * MICROseconds (the timestamp's native precision — a seconds
  * truncation would make same-second rows peers here but not in a
  * micro-precision oracle), so rows with equal timestamps are peers and
  * aggregate identically in any engine.
  *
  * Determinism: the rolling sum is an exact DECIMAL(18,2) sum (the
  * [[EventJoins.rangeAgg]] convention — addition order can't perturb
  * it); `lag` orders by (time, tieCol), a total order.
  */
object Rolling {

  /** For every row: the count and exact sum of `valCol` over this key's
    * rows in the trailing `windowSec` seconds (current row included),
    * and the previous row's `valCol` (null for the key's first row).
    */
  def trailingFeatures(df: DataFrame, keyCols: Seq[String],
                       timeCol: String, tieCol: String, valCol: String,
                       windowSec: Long): DataFrame = {
    val micros = unix_micros(col(timeCol))
    val range = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(micros)
      .rangeBetween(-windowSec * 1000000L, Window.currentRow)
    val seq = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(timeCol), col(tieCol))
    df.withColumn("n_window", count(lit(1)).over(range))
      .withColumn("sum_window",
        sum(col(valCol).cast("decimal(18,2)")).over(range)
          .cast("double"))
      .withColumn("prev_value", lag(col(valCol), 1).over(seq))
  }

  /** Downsample a per-key time series into fixed `bucketSec` bars:
    * open/high/low/close of `valCol` plus count and exact volume sum.
    *
    * ONE aggregate — open/close are `min(struct(time, tie, val))` /
    * `max(struct(...))`, so first/last-in-bucket resolve inside the
    * map-side combine (planned as SortAggregate — struct buffers aren't
    * hash-aggregable — with per-partition partials before the exchange)
    * instead of a per-(key, bucket) window sort; ties are impossible
    * because `tieCol` is unique. The bucket is
    * `floor(epochMicros / bucketSec·1e6)` — integer arithmetic, no
    * timezone or calendar dependence. */
  def resampleBars(df: DataFrame, keyCols: Seq[String], timeCol: String,
                   tieCol: String, valCol: String,
                   bucketSec: Long): DataFrame = {
    val bucket = floor(unix_micros(col(timeCol)) / (bucketSec * 1000000L))
      .as("bucket")
    val probe = struct(col(timeCol), col(tieCol), col(valCol))
    df.groupBy((keyCols.map(col) :+ bucket): _*)
      .agg(count(lit(1)).as("n"),
        min(probe).as("_o"), max(probe).as("_c"),
        max(col(valCol)).as("high"), min(col(valCol)).as("low"),
        sum(col(valCol).cast("decimal(18,2)")).cast("double")
          .as("volume"))
      .select(keyCols.map(col) ++ Seq(col("bucket"), col("n"),
        col(s"_o.$valCol").as("open"), col("high"), col("low"),
        col(s"_c.$valCol").as("close"), col("volume")): _*)
  }
}
