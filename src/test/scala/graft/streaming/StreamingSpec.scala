package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.sql.Timestamp

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("tumbling window aggregation over a memory stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val events = input.toDF().toDF("ts", "event_type", "value")
    val agg = EventStreams.tumblingCounts(events, "10 minutes", "5 minutes")
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling").start()
    input.addData((ts(1), "click", 1.0), (ts(2), "click", 2.0),
      (ts(11), "view", 3.0), (ts(12), "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling")
      .select(col("window.start").cast("string"), col("event_type"),
        col("n"), col("sum_value")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3))).toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 10:10:00", "view", 1L, 3.0),
      ("2024-01-01 10:10:00", "click", 1L, 4.0)))
  }

  test("stateful sessionization emits closed sessions and keeps open state") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(),
      gapMs = 10 * 60 * 1000, watermark = "30 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sessions").start()
    // user 1: events at 10:01,10:05 then a 40-min gap then 10:45
    input.addData(
      EventStreams.Event(1, ts(1), 1, "click", 1.0),
      EventStreams.Event(2, ts(5), 1, "view", 2.0))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // still open
    // the 10:45 event splits the session logically, but emission must
    // wait for the WATERMARK to pass end+gap — a late event could still
    // bridge the gap, and Append output cannot be retracted
    input.addData(EventStreams.Event(3, ts(45), 1, "click", 5.0))
    q.processAllAvailable()
    assert(spark.table("sessions").count() == 0) // watermark still behind
    // 12:00 pushes the watermark to 11:30; the follow-up microbatch
    // fires the event-time timeouts, flushing both completed sessions
    // ([10:01,10:05] and the 10:45 singleton) while 12:00 stays open
    input.addData(EventStreams.Event(4, Timestamp.valueOf(
      "2024-01-01 12:00:00"), 1, "click", 7.0))
    q.processAllAvailable()
    val closed = spark.table("sessions").as[EventStreams.SessionSummary]
      .collect().sortBy(_.startMs)
    q.stop()
    assert(closed.length == 2, s"got ${closed.toSeq}")
    assert(closed(0).n_events == 2 && closed(0).total == 3.0)
    assert(closed(1).n_events == 1 && closed(1).total == 5.0)
  }

  test("event-time timeout flushes idle users' final sessions") {
    implicit val sqlCtx = spark.sqlContext
    def tsh(h: Int, m: Int): Timestamp =
      Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
    val input = MemoryStream[EventStreams.Event]
    val sessions = EventStreams.sessionize(input.toDS(),
      gapMs = 10 * 60 * 1000, watermark = "30 minutes")
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("timeout_sessions").start()
    input.addData(
      EventStreams.Event(1, tsh(10, 1), 1, "click", 1.0),
      EventStreams.Event(2, tsh(10, 5), 1, "view", 2.0))
    q.processAllAvailable()
    assert(spark.table("timeout_sessions").count() == 0) // open, no timeout
    // another user far in the future pushes the watermark past
    // user 1's last event + gap; the next batch fires the timeout
    input.addData(EventStreams.Event(3, tsh(14, 0), 2, "click", 1.0))
    q.processAllAvailable()
    input.addData(EventStreams.Event(4, tsh(14, 1), 2, "view", 1.0))
    q.processAllAvailable()
    val flushed = spark.table("timeout_sessions")
      .as[EventStreams.SessionSummary].collect().filter(_.user_id == 1)
    q.stop()
    assert(flushed.length == 1, s"got ${flushed.toSeq}")
    assert(flushed.head.n_events == 2 && flushed.head.total == 3.0)
  }

  test("streaming dedup keeps first document per content hash") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Timestamp, String)]
    val deduped = EventStreams.dedupStream(
      input.toDF().toDF("doc_id", "ts", "text"), "text", "ts",
      watermark = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("deduped").start()
    input.addData(
      (1L, ts(1), "same text"), (2L, ts(2), "same text"),
      (3L, ts(3), "other text"))
    q.processAllAvailable()
    val ids = spark.table("deduped").select("doc_id").collect()
      .map(_.getLong(0)).toSet
    q.stop()
    assert(ids == Set(1L, 3L), s"got $ids")
  }

  test("stream-stream interval join pairs events within the window") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDF().toDF("user_id", "ts", "click_id")
    val v = views.toDF().toDF("user_id", "vts", "view_value")
      .withColumnRenamed("vts", "ts")
    // 10-minute lookback: a click joins views in (click - 10m, click]
    val joined = EventStreams.intervalJoin(c, v, "user_id", "ts", 600,
        watermark = "5 minutes")
      .select(col("click_id"), col("view_value"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("interval").start()
    views.addData((1L, ts(0), 10.0), (1L, ts(8), 20.0), (2L, ts(1), 30.0))
    clicks.addData((1L, ts(9), 100L), (1L, ts(20), 101L), (2L, ts(12), 102L))
    q.processAllAvailable()
    val out = spark.table("interval").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSet
    q.stop()
    // click 100 @10:09 sees views @10:00 and @10:08; click 101 @10:20
    // sees none (views are >10m old); click 102 @10:12 window covers
    // (10:02,10:12] so the @10:01 view for user 2 is outside
    assert(out == Set((100L, 10.0), (100L, 20.0)))
  }

  test("left-outer interval join emits unmatched probes after the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val views = MemoryStream[(Long, Timestamp, Double)]
    val c = clicks.toDF().toDF("user_id", "ts", "click_id")
    val v = views.toDF().toDF("user_id", "vts", "view_value")
      .withColumnRenamed("vts", "ts")
    val joined = EventStreams.intervalJoinLeftOuter(c, v, "user_id", "ts",
        600, watermark = "5 minutes")
      .select(col("click_id"), col("view_value"))
    val q = joined.writeStream.outputMode("append")
      .format("memory").queryName("louter").start()
    views.addData((1L, ts(8), 20.0))
    // click 100 matches the view; click 102 (user 2) has no view ever
    clicks.addData((1L, ts(9), 100L), (2L, ts(9), 102L))
    q.processAllAvailable()
    // advance both watermarks far past click 102's window so the join
    // can prove no matching view can still arrive
    views.addData((9L, ts(50), 0.0))
    clicks.addData((9L, ts(50), 999L))
    q.processAllAvailable()
    val out = spark.table("louter").collect()
      .map(r => (r.getLong(0), Option(r.get(1)))).toSet
    q.stop()
    assert(out.contains((100L, Some(20.0))), s"matched click missing: $out")
    assert(out.contains((102L, None)),
      s"unmatched click must surface with null payload: $out")
  }

  test("streaming PSI monitor matches the closed-form batch PSI per window") {
    implicit val sqlCtx = spark.sqlContext
    val edges = Seq(2.0, 4.0)           // 3 bins: <2, [2,4), >=4
    val ref = Seq(0.5, 0.3, 0.2)        // reference fractions
    val input = MemoryStream[(Timestamp, Double)]
    val psi = EventStreams.psiMonitor(input.toDF().toDF("ts", "value"),
      "ts", "value", edges, ref, windowLen = "10 minutes",
      watermark = "5 minutes")
    val q = psi.writeStream.outputMode("complete")
      .format("memory").queryName("psimon").start()
    // window 1 (10:00): roughly reference-shaped; window 2 (10:10):
    // mass shifted to the top bin — drift must register
    input.addData(
      (ts(1), 1.0), (ts(2), 1.5), (ts(3), 3.0), (ts(4), 5.0),
      (ts(11), 5.0), (ts(12), 6.0), (ts(13), 7.0), (ts(14), 3.0))
    q.processAllAvailable()
    val rows = spark.table("psimon")
      .select(col("win_start").cast("string"), col("n_rows"), col("psi"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    q.stop()
    // closed-form expectation with the operator's exact smoothing/order
    def expect(counts: Seq[Long]): Double = {
      val n = counts.sum.toDouble
      val t = counts.zip(ref).map { case (c, r) =>
        val p = (c + 0.5) / (n + 1.5); (p - r) * math.log(p / r)
      }.sum
      BigDecimal(t + 1e-9)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val (n1, p1) = rows("2024-01-01 10:00:00")
    val (n2, p2) = rows("2024-01-01 10:10:00")
    assert(n1 == 4 && n2 == 4)
    assert(p1 == expect(Seq(2L, 1L, 1L)))
    assert(p2 == expect(Seq(0L, 1L, 3L)))
    assert(p2 > p1, "shifted window must show more drift")
  }

  test("runningAgg converges to the batch snapshot, batch-slicing independent") {
    implicit val sqlCtx = spark.sqlContext
    val events = (1 to 60).map(i => EventStreams.Event(
      i.toLong, ts(i % 60), i.toLong % 7,
      if (i % 2 == 0) "click" else "view", i * 1.25))

    def run(chunks: Seq[Seq[EventStreams.Event]], name: String) = {
      val input = MemoryStream[EventStreams.Event]
      val agg = EventStreams.runningAgg(input.toDS())
      val q = agg.writeStream.outputMode("update")
        .format("memory").queryName(name).start()
      chunks.foreach { c => input.addData(c); q.processAllAvailable() }
      // last update per key is the final running total
      val out = spark.table(name).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
          r.getDouble(3), r.getDouble(4)))
        .groupBy(_._1).map { case (k, rows) => rows.maxBy(_._2) }.toSet
      q.stop()
      out
    }

    val oneShot = run(Seq(events), "ra_one")
    val sliced = run(events.grouped(7).toSeq, "ra_sliced")
    assert(oneShot == sliced, "running totals depend on batch slicing")

    // and the totals equal the batch IncrementalAgg snapshot
    val batch = graft.operators.IncrementalAgg.snapshot(
      events.toDF(), Seq("event_type"), "value")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getDecimal(2).doubleValue(), r.getDouble(3), r.getDouble(4)))
      .toSet
    val got = oneShot.map(t => (t._1, t._2,
      math.rint(t._3 * 1e6) / 1e6, t._4, t._5))
    assert(got == batch, s"$got vs $batch")
  }

  test("streaming GLM scoring broadcasts the model over a stream") {
    implicit val sqlCtx = spark.sqlContext
    val model = graft.ml.GlmModel(Array(2.0, 1.0), 0.5, "squared")
    val input = MemoryStream[(Long, Array[Double])]
    val stream = input.toDF().toDF("id", "arr")
      .withColumn("features",
        org.apache.spark.ml.functions.array_to_vector(col("arr")))
    val scored = EventStreams.scoreStream(stream, model, "features")
    val q = scored.writeStream.outputMode("append")
      .format("memory").queryName("scored").start()
    input.addData((1L, Array(1.0, 2.0)), (2L, Array(0.0, 0.0)))
    q.processAllAvailable()
    val out = spark.table("scored").select("id", "score").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    q.stop()
    assert(out(1L) == 4.5 && out(2L) == 0.5)
  }

  test("stream-static enrichment joins stateless and passes unmatched through") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq(("click", "engagement"), ("view", "impression"))
      .toDF("event_type", "category")
    val input = MemoryStream[(Long, String)]
    val stream = input.toDF().toDF("event_id", "event_type")
    val q = EventStreams.enrich(stream, dim, "event_type")
      .writeStream.outputMode("append")
      .format("memory").queryName("enriched").start()
    input.addData((1L, "click"), (2L, "view"), (3L, "purchase"))
    q.processAllAvailable()
    val out = spark.table("enriched")
      .select("event_id", "category").collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    // stream-static joins keep no state store
    assert(q.lastProgress.stateOperators.isEmpty)
    q.stop()
    assert(out == Map(1L -> Some("engagement"), 2L -> Some("impression"),
      3L -> None))
  }
}
