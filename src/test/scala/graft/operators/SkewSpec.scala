package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Salting only re-routes rows: salted results must equal unsalted. */
class SkewSpec extends SparkSpec {

  test("saltedAgg equals the direct groupBy on hot-key data") {
    import spark.implicits._
    // 90% of rows share one key — the shape salting exists for
    val df = (1 to 2000).map { i =>
      (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong, i * 0.25)
    }.toDF("k", "uid", "v").repartition(8)

    val got = Skew.saltedAgg(df, Seq("k"), col("uid"), 8,
      partial = Seq("_n" -> count(lit(1)),
        "_s" -> sum(col("v").cast("decimal(18,2)"))),
      fin = Seq("n" -> sum(col("_n")),
        "v_sum" -> sum(col("_s")).cast("double")))
    val want = df.groupBy("k").agg(count(lit(1)).as("n"),
      sum(col("v").cast("decimal(18,2)")).cast("double").as("v_sum"))

    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("saltedJoin equals the plain join row-for-row") {
    import spark.implicits._
    val big = (1 to 3000).map { i =>
      (if (i % 5 == 0) i % 20 else 3, i.toLong, i * 1.5) // key 3 is hot
    }.toDF("key", "uid", "x")
    val small = (0 to 19).map(k => (k, s"dim$k")).toDF("key", "name")

    val got = Skew.saltedJoin(big, small, "key", col("uid"), 4)
    val want = big.join(small, "key")

    assert(got.count() == want.count())
    assert(got.select("key", "uid", "x", "name")
      .exceptAll(want.select("key", "uid", "x", "name")).isEmpty)
    assert(want.select("key", "uid", "x", "name")
      .exceptAll(got.select("key", "uid", "x", "name")).isEmpty)
  }

  test("joinSkewReport surfaces the hot key first with exact pair counts") {
    import spark.implicits._
    // key 7 is hot on both sides: 30 x 20 = 600 pairs dominates
    val left = ((1 to 30).map(_ => 7) ++ (1 to 5).flatMap(k => Seq(k, k)))
      .map(k => (k, "l")).toDF("key", "v")
    val right = ((1 to 20).map(_ => 7) ++ (1 to 5).map(k => k))
      .map(k => (k, "r")).toDF("key", "v")
    val got = Skew.joinSkewReport(left, right, "key", topK = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(got.head == ((1L, 7, 30L, 20L, 600L)), s"got ${got.head}")
    // remaining keys all tie at 2*1=2 pairs: tiebreak ascending key
    assert(got.drop(1).map(_._2).toSeq == Seq(1, 2))
    assert(got.drop(1).forall(t => t._5 == 2L))
  }
}
