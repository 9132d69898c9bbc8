package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sketch profile must track the exact profile within its stated
  * error bounds on real table data. */
class ProfilingSpec extends SparkSpec {

  test("approxProfile tracks exact distinct and quantiles on lineitem") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val cols = Seq("l_quantity", "l_extendedprice", "l_orderkey")
    val prof = Profiling.approxProfile(li, cols, rsd = 0.05)
      .collect().map(r => r.getString(0) -> r).toMap

    cols.foreach { c =>
      val exact = li.agg(
        countDistinct(col(c)).cast("double").as("d"),
        expr(s"percentile($c, 0.5)").as("p50"),
        min(col(c)).cast("double").as("mn"),
        max(col(c)).cast("double").as("mx")).first()
      val row = prof(c)
      // HLL++ at rsd=0.05: allow 3 sigma
      assert(math.abs(row.getLong(3) - exact.getDouble(0)) <=
        math.max(3, 0.15 * exact.getDouble(0)),
        s"$c distinct ${row.getLong(3)} vs ${exact.getDouble(0)}")
      // quantile sketch at accuracy 10000 on ~6k rows is near-exact:
      // compare against the exact median within 1% of the value range
      val span = exact.getDouble(3) - exact.getDouble(2)
      assert(math.abs(row.getDouble(5) - exact.getDouble(1)) <=
        math.max(1e-9, 0.01 * span),
        s"$c p50 ${row.getDouble(5)} vs ${exact.getDouble(1)}")
      // min/max are exact aggregates
      assert(row.getDouble(7) == exact.getDouble(2))
      assert(row.getDouble(8) == exact.getDouble(3))
    }
    // profile is one row per column
    assert(prof.size == cols.size)
  }

  test("exactQuantiles matches the built-in percentile aggregate") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val probs = Seq(0.1, 0.25, 0.5, 0.75, 0.9)
    for (c <- Seq("l_extendedprice", "l_quantity")) {
      val got = Profiling.exactQuantiles(li, c, probs)
      val want = li.selectExpr(
        s"percentile($c, array(${probs.mkString(",")})) AS p")
        .first().getSeq[Double](0)
      probs.indices.foreach { i =>
        assert(math.abs(got(i) - want(i)) < 1e-9,
          s"$c p=${probs(i)}: ${got(i)} vs ${want(i)}")
      }
    }
  }

  test("psiDrift: identical groups score ~0, a shifted group scores high") {
    import spark.implicits._
    // two identical groups: each matches the population up to smoothing
    val same = (1 to 500).map(i => ("A", (i % 100).toDouble)) ++
      (1 to 500).map(i => ("B", (i % 100).toDouble))
    val flat = Profiling.psiDrift(same.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2)))).toMap
    assert(flat.keySet == Set("A", "B") && flat("A")._1 == 500L)
    assert(flat("A")._2 < 0.001 && flat("A")._2 == flat("B")._2,
      s"identical groups must match the population: $flat")
    // add a group concentrated in the top decile: it must score far
    // above the unshifted groups (which now differ from the population
    // only through C's contribution to it)
    val rows = same ++ (1 to 500).map(i => ("C", 90.0 + (i % 10)))
    val got = Profiling.psiDrift(rows.toDF("g", "v"), "g", "v")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got("A") == got("B"), "identical groups score identically")
    assert(got("C") > 3 * got("A"),
      s"shifted group must dominate: C=${got("C")} A=${got("A")}")
  }

  test("exactQuantilesAuto: both routes agree bit-exactly with the sort path") {
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val probs = Seq(0.25, 0.5, 0.75)
    val cols = Seq("l_quantity", "l_extendedprice")
    // threshold maxDistinct/2=100: l_quantity (50 values) routes via
    // value counts, l_extendedprice (continuous) falls back to the
    // range sort
    val auto = Profiling.exactQuantilesAuto(li, cols, probs,
      maxDistinct = 200)
    cols.foreach { c =>
      val want = Profiling.exactQuantiles(li, c, probs)
      probs.indices.foreach { i =>
        assert(auto(c)(i) == want(i),
          s"$c p=${probs(i)}: ${auto(c)(i)} vs ${want(i)}")
      }
    }
  }

  test("groupedExactQuantiles agrees with the built-in percentile per group") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (1 to 4000).map { i =>
      val g = s"g${i % 3}"
      (g, math.rint(rnd.nextGaussian() * 50 + i % 7) / 4.0)
    }.toDF("g", "v").repartition(9)
    val got = Profiling.groupedExactQuantiles(df, "g", "v",
      Seq(0.25, 0.5, 0.9)).toMap
    val want = df.groupBy("g").agg(
        expr("percentile(v, 0.25)").as("a"),
        expr("percentile(v, 0.5)").as("b"),
        expr("percentile(v, 0.9)").as("c"))
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == want.keySet)
    for (g <- got.keySet; i <- 0 until 3)
      assert(math.abs(got(g)(i) - want(g)(i)) < 1e-9,
        s"$g p$i: ${got(g)(i)} vs ${want(g)(i)}")
    // single group degenerates to exactQuantiles
    val one = Profiling.groupedExactQuantiles(
      df.withColumn("g", lit("all")), "g", "v", Seq(0.5))
    assert(one.head._2.head ==
      Profiling.exactQuantiles(df, "v", Seq(0.5)).head)
  }

  test("winsorize clips exactly at the rounded quantile fences") {
    import spark.implicits._
    // values 1..100: p10 = 10.9, p90 = 90.1 under p·(n−1) interpolation
    val df = (1 to 100).map(_.toDouble).toDF("x")
    val w = Profiling.winsorize(df, "x", 0.10, 0.90, outCol = "wx")
      .select("x", "wx").as[(Double, Double)].collect().toMap
    assert(w(5.0) == 10.9 && w(1.0) == 10.9, "low tail raised to p10")
    assert(w(95.0) == 90.1 && w(100.0) == 90.1, "high tail lowered to p90")
    assert(w(50.0) == 50.0 && w(11.0) == 11.0, "interior untouched")
    val mn = w.values.min
    val mx = w.values.max
    assert(mn == 10.9 && mx == 90.1)
  }
}
