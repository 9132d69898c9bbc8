package graft.streaming

import graft.ml.{GlmMath, GlmModel}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface.
  *
  * The reference has no streaming (SURVEY §2.10) — these are the natural
  * Spark-native extensions of its batch operators: windowed event
  * aggregation, stateful sessionization, and streaming model scoring
  * (`model join readStream`). Event-time semantics + watermarks mean the
  * same code runs against a 100 TB/day firehose: state is bounded by the
  * watermark horizon, not the stream length.
  */
object EventStreams {

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)

  case class SessionSummary(user_id: Long, n_events: Long, total: Double,
                            startMs: Long, endMs: Long)

  /** Tumbling event-time window aggregation with a watermark — the
    * streaming twin of SparkEntry.q17 (same groupBy, plus lateness
    * handling). */
  def tumblingCounts(events: DataFrame, window_ : String = "6 hours",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Stateful sessionization via flatMapGroupsWithState with an
    * EVENT-TIME timeout: a session closes after `gapMs` of user
    * inactivity, either because a later event arrives past the gap or
    * because the watermark passes lastEvent + gap — so idle users' final
    * sessions flush and their state is freed (a NoTimeout variant leaks
    * state and never emits the last session; state here is bounded by
    * the watermark horizon at any stream length). */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "1 hour"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Event], SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[List[Event]]) =>
          if (state.hasTimedOut) {
            // watermark passed lastEvent + gap: flush everything
            val leftover = state.getOption.getOrElse(Nil)
            state.remove()
            splitSessions(leftover, gapMs) match {
              case (closed, open) =>
                (closed ++ (if (open.nonEmpty) List(open) else Nil))
                  .iterator.map(summarize(user, _))
            }
          } else {
            // accumulate, emit sessions whose gap closed inside the batch
            val all = (state.getOption.getOrElse(Nil) ++ batch.toList)
              .sortBy(_.ts.getTime)
            val (closed, open) = splitSessions(all, gapMs)
            if (open.nonEmpty) {
              state.update(open)
              state.setTimeoutTimestamp(open.last.ts.getTime + gapMs)
            } else state.remove()
            closed.iterator.map(summarize(user, _))
          }
      }
  }

  private def splitSessions(sorted: List[Event], gapMs: Long)
  : (List[List[Event]], List[Event]) = {
    if (sorted.isEmpty) return (Nil, Nil)
    val sessions = scala.collection.mutable.ListBuffer.empty[List[Event]]
    var current = scala.collection.mutable.ListBuffer[Event](sorted.head)
    sorted.tail.foreach { e =>
      if (e.ts.getTime - current.last.ts.getTime > gapMs) {
        sessions += current.toList
        current = scala.collection.mutable.ListBuffer(e)
      } else current += e
    }
    (sessions.toList, current.toList)
  }

  private def summarize(user: Long, s: List[Event]): SessionSummary =
    SessionSummary(user, s.size.toLong, s.map(_.value).sum,
      s.head.ts.getTime, s.last.ts.getTime)

  /** Streaming exact dedup: keep the first document per content hash,
    * with state bounded by the watermark horizon
    * (dropDuplicatesWithinWatermark — duplicates arriving within the
    * watermark window are dropped, older state is evicted; the streaming
    * twin of Dedup.exact). */
  def dedupStream(docs: DataFrame, textCol: String, tsCol: String,
                  watermark: String = "1 hour"): DataFrame =
    docs.withColumn("content_hash", md5(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** Stream-stream interval join: each probe event pairs with build
    * events of the same key within `(probe.ts - windowSec, probe.ts]` —
    * the streaming twin of EventJoins.rangeAgg. The time-range predicate
    * plus watermarks on BOTH sides is what lets Spark bound the join
    * state: build rows older than `watermark + windowSec` below the
    * probe watermark are evicted, so state is proportional to the window
    * horizon, not the stream length. Output columns are qualified via
    * the `p`/`b` aliases; non-key columns should be disjoint. */
  def intervalJoin(probe: DataFrame, build: DataFrame, key: String,
                   timeCol: String, windowSec: Long,
                   watermark: String = "1 hour"): DataFrame = {
    val p = probe.withWatermark(timeCol, watermark).alias("p")
    val b = build.withWatermark(timeCol, watermark).alias("b")
    p.join(b, expr(
      s"""p.$key = b.$key AND
         |b.$timeCol > p.$timeCol - INTERVAL $windowSec SECONDS AND
         |b.$timeCol <= p.$timeCol""".stripMargin))
  }

  /** Streaming GLM scoring: broadcast model over a stream — the
    * `model join readStream` extension called out in SURVEY §2.10. */
  def scoreStream(stream: DataFrame, model: GlmModel, featuresCol: String)
  : DataFrame = {
    val bc = stream.sparkSession.sparkContext.broadcast(model)
    val scoreUdf = udf { (v: Vector) =>
      GlmMath.dot(bc.value.coef, v) + bc.value.intercept
    }
    stream.withColumn("score", scoreUdf(col(featuresCol)))
  }
}
