package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The bucketized/union formulations of the time-series joins must agree
  * with their declarative per-row definitions. */
class EventJoinsSpec extends SparkSpec {

  private def ts(sec: Long) = timestamp_seconds(lit(sec))

  test("asOf picks latest prior-or-equal right row, ties by largest tie id") {
    import spark.implicits._
    val views = Seq((1L, 10L, 1L, 1.0), (1L, 20L, 2L, 2.0),
      (1L, 20L, 3L, 3.0), (2L, 5L, 4L, 4.0))
      .toDF("user_id", "sec", "event_id", "value")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("user_id", "ts", "event_id", "value")
    val clicks = Seq((1L, 15L, 10L), (1L, 20L, 11L), (1L, 25L, 12L),
      (2L, 4L, 13L), (3L, 9L, 14L))
      .toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("user_id", "ts", "event_id")

    val got = EventJoins.asOf(clicks, views, Seq("user_id"), "ts", "event_id")
      .select(col("event_id"), col("value"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap

    assert(got == Map(10L -> Some(1.0), 11L -> Some(3.0), 12L -> Some(3.0),
      13L -> None, 14L -> None))
  }

  test("asOf: latest right row wins atomically even with null payload") {
    import spark.implicits._
    val views = Seq(
      (1L, 10L, 1L, Some(10.0), None: Option[Double]),
      (1L, 20L, 2L, None, Some(20.0)))
      .toDF("user_id", "sec", "event_id", "a", "b")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("user_id", "ts", "event_id", "a", "b")
    val clicks = Seq((1L, 30L, 10L))
      .toDF("user_id", "sec", "event_id")
      .withColumn("ts", timestamp_seconds(col("sec"))).drop("sec")
      .select("user_id", "ts", "event_id")
    val out = EventJoins.asOf(clicks, views, Seq("user_id"), "ts",
      "event_id").select("a", "b").head()
    // the t=20 row is the as-of match: its null `a` must surface as
    // null (not back-fill 10.0 from t=10), its `b` as 20.0 — never a
    // cross-row mix
    assert(out.isNullAt(0) && out.getDouble(1) == 20.0)
  }

  test("asOf matches the per-row subquery definition on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // the tie column is shared ("id"): ids 1-300 right, 301-500 left
    val right = (1 to 300).map(i =>
      (rnd.nextInt(10).toLong, rnd.nextInt(500).toLong, i.toLong,
        rnd.nextInt(100) / 10.0))
      .toDF("k", "sec", "id", "payload")
    val left = (301 to 500).map(i =>
      (rnd.nextInt(12).toLong, rnd.nextInt(500).toLong, i.toLong))
      .toDF("k", "sec", "id")

    val l = left.withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
      .select("k", "t", "id")
    val r = right.withColumn("t", timestamp_seconds(col("sec"))).drop("sec")
      .select("k", "t", "id", "payload")

    val got = EventJoins.asOf(l, r, Seq("k"), "t", "id")
      .select(col("id"), col("payload"))

    // independent formulation: left join on k with r.t <= l.t, keep the
    // (t desc, rid desc) head per left row
    val w = Window.partitionBy("lid")
      .orderBy(col("rt").desc_nulls_last, col("rid").desc_nulls_last)
    val la = l.select(col("k").as("lk"), col("t"), col("id").as("lid"))
    val ra = r.select(col("k").as("rk"), col("t").as("rt"),
      col("id").as("rid"), col("payload"))
    val want = la.join(ra, col("lk") === col("rk") && col("rt") <= col("t"),
        "left")
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("lid").as("id"), col("payload"))

    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() == l.count())
  }

  test("rangeAgg matches the inequality-join definition incl. boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    // clustered times make bucket-boundary and exact-edge cases common
    val build0 = (1 to 400).map { i =>
      (rnd.nextInt(8).toLong, (rnd.nextInt(40) * 30).toLong, i / 10.0)
    }.toDF("k", "sec", "v")
    val probe0 = (1 to 200).map { i =>
      (rnd.nextInt(8).toLong, (rnd.nextInt(40) * 30).toLong, i.toLong)
    }.toDF("k", "sec", "pid")
    val build = build0.withColumn("t", timestamp_seconds(col("sec")))
      .select("k", "t", "v")
    val probe = probe0.withColumn("t", timestamp_seconds(col("sec")))
      .select("k", "t", "pid")

    val got = EventJoins.rangeAgg(probe, build, Seq("k"), "pid", "t",
      windowSec = 60L, valCol = "v")

    val pa = probe.select(col("k").as("pk"), col("t").as("pt"), col("pid"))
    val ba = build.select(col("k").as("bk"), col("t").as("bt"), col("v"))
    val want = pa.join(ba, col("pk") === col("bk") &&
        col("bt") > col("pt") - expr("INTERVAL 60 SECOND") &&
        col("bt") <= col("pt"), "left")
      .groupBy("pid")
      .agg(count(col("bt")).as("n_in_window"),
        coalesce(sum(col("v").cast("decimal(18,2)")),
          lit(0).cast("decimal(18,2)")).cast("double").as("value_sum"))

    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    // at least one probe must actually have matches for this test to bite
    assert(got.filter(col("n_in_window") > 0).count() > 0)
  }

  test("rangePairs matches the inequality-join pairs incl. boundaries") {
    import spark.implicits._
    val rnd = new scala.util.Random(17)
    val build = (1 to 300).map { i =>
      (rnd.nextInt(6).toLong, (rnd.nextInt(40) * 30).toLong, i.toLong)
    }.toDF("k", "sec", "bid")
      .withColumn("t", timestamp_seconds(col("sec"))).select("k", "t", "bid")
    val probe = (1 to 150).map { i =>
      (rnd.nextInt(6).toLong, (rnd.nextInt(40) * 30).toLong, i.toLong)
    }.toDF("k", "sec", "pid")
      .withColumn("t", timestamp_seconds(col("sec"))).select("k", "t", "pid")

    val got = EventJoins.rangePairs(probe, build, Seq("k"), "pid", "t",
      windowSec = 60L, payload = Seq("bid"))
    val want = probe.select(col("k").as("pk"), col("t").as("pt"), col("pid"))
      .join(build.select(col("k").as("bk"), col("t").as("bt"), col("bid")),
        col("pk") === col("bk") &&
          col("bt") > col("pt") - expr("INTERVAL 60 SECOND") &&
          col("bt") <= col("pt"))
      .select("pid", "bid")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    assert(got.count() > 0)
    // payload collision guard
    intercept[IllegalArgumentException] {
      EventJoins.rangePairs(probe, build.withColumnRenamed("bid", "pid"),
        Seq("k"), "pid", "t", 60L, Seq("pid"))
    }
  }
}
