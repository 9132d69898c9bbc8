package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-6 feature-pipeline operators: CDC snapshot, rolling
  * range-frame features, BM25, and the distributed exact ECDF. */
class CdcRollingRanksSpec extends SparkSpec {

  test("Cdc.snapshot: last writer wins, delete drops key, count is full history") {
    import spark.implicits._
    val log = Seq(
      // key 1: insert, update — survives with the v2 payload
      (1L, 10L, 100L, "upsert", 1.0),
      (1L, 20L, 101L, "upsert", 2.0),
      // key 2: upsert then delete — gone
      (2L, 10L, 102L, "upsert", 3.0),
      (2L, 30L, 103L, "delete", 0.0),
      // key 3: delete then upsert (resurrection) — survives
      (3L, 10L, 104L, "delete", 0.0),
      (3L, 20L, 105L, "upsert", 5.0),
      // key 4: same version ts, larger change id wins
      (4L, 10L, 106L, "upsert", 6.0),
      (4L, 10L, 107L, "upsert", 7.0))
      .toDF("k", "sec", "cid", "op", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val snap = Cdc.snapshot(log, Seq("k"), Seq("ts", "cid"), "op",
      Seq("delete"))
      .select("k", "n_changes", "cid", "v")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(snap == Map(
      1L -> ((2L, 101L, 2.0)),
      3L -> ((2L, 105L, 5.0)),
      4L -> ((2L, 107L, 7.0))))
  }

  test("Cdc.snapshot plan is a single aggregate, no window exchange") {
    import spark.implicits._
    val log = Seq((1L, 1L, 1L, "u", 1.0))
      .toDF("k", "sec", "cid", "op", "v")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val plan = Cdc.snapshot(log, Seq("k"), Seq("ts", "cid"), "op",
      Seq("delete")).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "CDC snapshot must not use a window")
  }

  test("Rolling.trailingFeatures matches a brute-force trailing window") {
    import spark.implicits._
    val rows = Seq(
      (1L, 0L, 1L, 1.0), (1L, 1800L, 2L, 2.0), (1L, 3600L, 3L, 4.0),
      (1L, 3601L, 4L, 8.0), (1L, 90000L, 5L, 16.0),
      (2L, 0L, 6L, 32.0), (2L, 0L, 7L, 64.0)) // equal-ts peers
      .toDF("user_id", "sec", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val got = Rolling.trailingFeatures(rows, Seq("user_id"), "ts",
      "event_id", "value", 3600L)
      .select("event_id", "n_window", "sum_window", "prev_value")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2),
          if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    // window is (t-3600, t] inclusive of both ends per RANGE frame
    assert(got(1L) == ((1L, 1.0, None)))
    assert(got(2L) == ((2L, 3.0, Some(1.0))))
    assert(got(3L) == ((3L, 7.0, Some(2.0)))) // 0 is in [-0, 3600]
    assert(got(4L) == ((3L, 14.0, Some(4.0)))) // 0 ages out at 3601
    assert(got(5L) == ((1L, 16.0, Some(8.0))))
    // equal timestamps are peers: both rows see both values
    assert(got(6L)._1 == 2L && got(6L)._2 == 96.0)
    assert(got(7L)._1 == 2L && got(7L)._2 == 96.0)
  }

  test("bm25 scores only matching docs; longer docs score lower") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark fast"),
      (2L, "spark " + Seq.fill(40)("pad").mkString(" ")),
      (3L, "nothing relevant here")).toDF("doc_id", "text")
    val got = TextRanking.bm25(docs, "doc_id", "text", Seq("spark"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet == Set(1L, 2L))
    assert(got(1L)._1 == 1L && got(2L)._1 == 1L)
    // doc 1: tf=2 and short; doc 2: tf=1 and long — doc 1 must win
    assert(got(1L)._2 > got(2L)._2)
    assert(got.values.forall(_._2 > 0.0), "Lucene idf is always positive")
  }

  test("Ranks.ecdf matches the declarative cume_dist and has no global window") {
    import spark.implicits._
    val df = Seq(3.0, 1.0, 2.0, 2.0, 5.0, 1.0, 4.0).toDF("v")
    val e = Ranks.ecdf(df, "v")
    val got = e.collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    assert(got == Map(1.0 -> 2L, 2.0 -> 4L, 3.0 -> 5L, 4.0 -> 6L,
      5.0 -> 7L))
    val plan = e.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "distributed ECDF must not use a single-task global window")
  }

  test("resampleBars: OHLC per bucket, no window in the plan") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10L, 1L, 5.0), (1L, 20L, 2L, 9.0), (1L, 30L, 3L, 2.0),
      (1L, 3599L, 4L, 7.0), // same hour bucket
      (1L, 3600L, 5L, 4.0), // next bucket
      (2L, 10L, 6L, 1.0))
      .toDF("user_id", "sec", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
    val bars = Rolling.resampleBars(rows, Seq("user_id"), "ts",
      "event_id", "value", 3600L)
    val got = bars.collect().map(r => (r.getLong(0), r.getLong(1)) ->
      ((r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5),
        r.getDouble(6), r.getDouble(7)))).toMap
    assert(got((1L, 0L)) == ((4L, 5.0, 9.0, 2.0, 7.0, 23.0)))
    assert(got((1L, 1L)) == ((1L, 4.0, 4.0, 4.0, 4.0, 4.0)))
    assert(got((2L, 0L)) == ((1L, 1.0, 1.0, 1.0, 1.0, 1.0)))
    val plan = bars.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      "resampleBars must resolve open/close inside the aggregate")
  }

  test("Ranks.ecdf is partitioning-invariant") {
    import spark.implicits._
    val vals = (1 to 500).map(i => ((i * 37) % 97).toDouble)
    val a = Ranks.ecdf(vals.toDF("v").repartition(1), "v")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    val b = Ranks.ecdf(vals.toDF("v").repartition(7), "v")
      .collect().map(r => (r.getDouble(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
    assert(a.map(_._2).last == 500L)
  }
}
