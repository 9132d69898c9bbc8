package graft.streaming

import graft.ml.{GlmMath, GlmModel}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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

  /** Document arrival for streaming-dedup feeds. */
  case class DocEvent(doc_id: Long, text: String, ts: java.sql.Timestamp)

  /** Tumbling event-time window aggregation with a watermark — the
    * streaming twin of SparkEntry.q17 (same groupBy, plus lateness
    * handling). */
  def tumblingCounts(events: DataFrame, window_ : String = "6 hours",
                     watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Streaming PSI drift monitor: per event-time window, the population
    * stability index of `valueCol` against a REFERENCE distribution —
    * fractions per bin computed batch-side from a trusted baseline (the
    * same fixed-edge binning [[graft.operators.Profiling.psiDrift]]
    * uses on static data). The "is today's traffic still shaped like
    * the training corpus?" alarm, evaluated continuously.
    *
    * All bins ride ONE stateful aggregation as conditional counts (the
    * bin set is fixed), so per-window state is nBins longs — never a
    * distribution sketch — and no second stateful operator is needed
    * (chained streaming aggregations are where append-mode pipelines
    * die). PSI is then a closed-form expression over those columns with
    * the batch operator's Laplace smoothing.
    *
    * `binEdges` are the interior cut points (ascending); values below
    * edge 0 fall in bin 0, above the last edge in bin n−1. `refFrac`
    * must be strictly positive (smooth the reference batch-side) and
    * have `binEdges.length + 1` entries. */
  def psiMonitor(events: DataFrame, tsCol: String, valueCol: String,
                 binEdges: Seq[Double], refFrac: Seq[Double],
                 windowLen: String = "1 hour",
                 watermark: String = "2 hours",
                 smooth: Double = 0.5): DataFrame = {
    require(binEdges.nonEmpty && binEdges == binEdges.sorted,
      "binEdges must be non-empty and ascending")
    require(refFrac.length == binEdges.length + 1,
      s"refFrac needs ${binEdges.length + 1} entries, got ${refFrac.length}")
    require(refFrac.forall(_ > 0),
      "refFrac must be strictly positive (smooth the reference)")
    val nBins = refFrac.length
    val v = col(valueCol).cast("double")
    val bin = binEdges.zipWithIndex
      .foldRight(lit(nBins - 1): Column) { case ((e, i), acc) =>
        when(v < e, lit(i)).otherwise(acc)
      }
    val aggs = (0 until nBins).map(i =>
      count(when(col("_bin") === i, lit(1))).as(s"_n$i"))
    val n = (0 until nBins).map(i => col(s"_n$i")).reduce(_ + _)
    val terms = (0 until nBins).map { i =>
      val p = (col(s"_n$i") + lit(smooth)) /
        (col("n_rows").cast("double") + lit(nBins * smooth))
      val r = lit(refFrac(i))
      (p - r) * log(p / r)
    }
    events
      .withWatermark(tsCol, watermark)
      .withColumn("_bin", bin)
      .groupBy(window(col(tsCol), windowLen))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("n_rows", n)
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"), col("n_rows"),
        round(terms.reduce(_ + _) + lit(1e-9), 6).as("psi"))
  }

  /** Stateful sessionization via flatMapGroupsWithState with an
    * EVENT-TIME timeout: a session closes after `gapMs` of user
    * inactivity — and is EMITTED only once the watermark passes its end
    * + gap, because until then a legitimately-late event could still
    * extend or bridge it (Append mode cannot retract an early emit).
    * Idle users' final sessions flush via the event-time timeout, so
    * state is bounded by the watermark horizon at any stream length (a
    * NoTimeout variant leaks state and never emits the last session).
    *
    * State is the user's PENDING SESSION SUMMARIES, not raw events:
    * summaries are mergeable intervals (a new event either lands inside
    * one, extends one, bridges two, or starts its own), so keeping raw
    * events buys nothing — adding events can only ever MERGE sessions,
    * never split them, so summary-level merging is exact. The state a
    * hot user carries is then O(pending sessions) — bounded by
    * watermark-horizon / gap — instead of O(buffered events), which is
    * the difference between constant-ish state and unbounded state on a
    * firehose user, and it cuts the per-batch state ser/deser from
    * every buffered event to a handful of summaries. */
  def sessionize(events: Dataset[Event], gapMs: Long = 30 * 60 * 1000L,
                 watermark: String = "1 hour"): Dataset[SessionSummary] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.withWatermark("ts", watermark).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionSummary], SessionSummary](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[Event],
         state: GroupState[List[SessionSummary]]) =>
          val wm = state.getCurrentWatermarkMs()
          val incoming = batch.map { e =>
            val t = e.ts.getTime
            SessionSummary(user, 1L, e.value, t, t)
          }.toList
          val all = (state.getOption.getOrElse(Nil) ++ incoming)
            .sortBy(s => (s.startMs, s.endMs))
          // fold sorted intervals, merging while the boundary gap stays
          // within gapMs (within-summary gaps are already <= gapMs, so
          // boundary checks reproduce the event-level split exactly)
          val merged = all.foldLeft(List.empty[SessionSummary]) {
            (acc, s) => acc match {
              case h :: t if s.startMs - h.endMs <= gapMs =>
                SessionSummary(user, h.n_events + s.n_events,
                  h.total + s.total, h.startMs,
                  math.max(h.endMs, s.endMs)) :: t
              case _ => s :: acc
            }
          }.reverse
          // emit only sessions no late-but-valid event can still touch
          val (flushable, rest) =
            merged.partition(s => s.endMs + gapMs <= wm)
          if (rest.nonEmpty) {
            state.update(rest)
            // wake when the EARLIEST pending session becomes flushable
            // (rest is start-sorted and disjoint, so also end-sorted),
            // clamped above the watermark — Spark rejects a timeout
            // at/before it (possible when a backfilled user's events
            // are all older than the horizon)
            state.setTimeoutTimestamp(
              math.max(rest.head.endMs + gapMs, wm + 1))
          } else state.remove()
          flushable.iterator
      }
  }

  /** Running per-key aggregate emitted every micro-batch. */
  case class RunningAgg(key: String, n: Long, sum_v: Double,
                        min_v: Double, max_v: Double)

  /** [[runningAgg]] state: exact scaled-integer sum plus min/max. */
  case class RunningState(n: Long, sumMicros: Long, min: Double, max: Double)

  /** Streaming twin of [[graft.operators.IncrementalAgg]]: maintain the
    * same mergeable state (n, exact scaled-integer Σ, min, max) per key
    * with `mapGroupsWithState` in Update mode, emitting the refreshed
    * totals each micro-batch. The sum is carried as MICRO-UNITS in a
    * long (value rounded to 6 dp), so the running total is exact and
    * batch-boundary independent — the stream converges to
    * `IncrementalAgg.snapshot` of the same rows no matter how the
    * micro-batches slice them.
    *
    * CONTRACT: running totals never expire, so state is one row per KEY
    * — use only with a bounded key domain (metric names, event types).
    * Per-entity unbounded domains belong to [[sessionize]]-style
    * watermarked state. */
  def runningAgg(events: Dataset[Event]): Dataset[RunningAgg] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.event_type)
      .mapGroupsWithState[RunningState, RunningAgg](
        GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[Event],
         state: GroupState[RunningState]) =>
          val s0 = state.getOption.getOrElse(RunningState(
            0L, 0L, Double.PositiveInfinity, Double.NegativeInfinity))
          val s = batch.foldLeft(s0) { (acc, e) =>
            RunningState(acc.n + 1,
              acc.sumMicros + math.round(e.value * 1e6),
              math.min(acc.min, e.value), math.max(acc.max, e.value))
          }
          state.update(s)
          RunningAgg(key, s.n, s.sumMicros / 1e6, s.min, s.max)
      }
  }

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
    * horizon, not the stream length. The output carries the probe's
    * columns plus the build side's payload (build key/time are dropped);
    * payload names should be disjoint from the probe's columns. */
  def intervalJoin(probe: DataFrame, build: DataFrame, key: String,
                   timeCol: String, windowSec: Long,
                   watermark: String = "1 hour"): DataFrame = {
    val p = probe.withWatermark(timeCol, watermark).alias("p")
    val b = build.withWatermark(timeCol, watermark).alias("b")
    // drop the build side's key/time from the output: they duplicate
    // the probe's and would make every downstream reference ambiguous
    val payload = build.columns.toSeq
      .filterNot(c => c == key || c == timeCol)
    p.join(b, expr(
        s"""p.$key = b.$key AND
           |b.$timeCol > p.$timeCol - INTERVAL $windowSec SECONDS AND
           |b.$timeCol <= p.$timeCol""".stripMargin))
      .select(probe.columns.toSeq.map(c => col(s"p.$c")) ++
        payload.map(c => col(s"b.$c")): _*)
  }

  /** Stream-stream LEFT OUTER interval join: like [[intervalJoin]],
    * but probe events with NO build match still emit — with null
    * payload — once the watermark passes their match window (only then
    * can Spark prove no matching build row can still arrive; this is
    * the "every event decorated or explicitly undecorated" contract an
    * audit pipeline needs, where an inner join would silently drop the
    * unmatched). State stays watermark-bounded exactly as in the inner
    * variant; the time-range predicate is what lets rows age out. */
  def intervalJoinLeftOuter(probe: DataFrame, build: DataFrame,
                            key: String, timeCol: String, windowSec: Long,
                            watermark: String = "1 hour"): DataFrame = {
    val p = probe.withWatermark(timeCol, watermark).alias("p")
    val b = build.withWatermark(timeCol, watermark).alias("b")
    val payload = build.columns.toSeq
      .filterNot(c => c == key || c == timeCol)
    p.join(b, expr(
        s"""p.$key = b.$key AND
           |b.$timeCol > p.$timeCol - INTERVAL $windowSec SECONDS AND
           |b.$timeCol <= p.$timeCol""".stripMargin), "left_outer")
      .select(probe.columns.toSeq.map(c => col(s"p.$c")) ++
        payload.map(c => col(s"b.$c")): _*)
  }

  /** Stream-static enrichment: attach a bounded dimension table to a
    * stream by key — the feature-lookup / dimension-decorate step of a
    * streaming pipeline. Stream-static joins are STATELESS (the static
    * side is re-planned each micro-batch, picking up storage-level
    * updates to e.g. a parquet dim automatically), so no watermark and
    * no state store; the broadcast hint keeps the per-batch join
    * map-side, which is the only shape that survives a high-rate
    * stream — a shuffled per-batch join would re-shuffle every batch.
    * Left join by default: an unmatched event passes through with
    * nulls rather than silently dropping (inner available for
    * filter-on-match semantics). */
  def enrich(stream: DataFrame, dim: DataFrame, key: String,
             joinType: String = "left"): DataFrame =
    stream.join(broadcast(dim), Seq(key), joinType)

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
