package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Experiment statistics against closed forms on constructed data, plus
  * the mergeable-state identity for IncrementalAgg. */
class ExperimentsSpec extends SparkSpec {
  import spark.implicits._

  test("welchTTest matches the hand-computed statistic on fixed samples") {
    // A: 1,2,3,4,5 (mean 3, var 2.5); B: 2,4,6,8 (mean 5, var 20/3)
    val a = Seq(1.0, 2.0, 3.0, 4.0, 5.0).map(("g", "A", _))
    val b = Seq(2.0, 4.0, 6.0, 8.0).map(("g", "B", _))
    val df = (a ++ b).toDF("grp", "variant", "y")
    val r = Experiments.welchTTest(df, Seq("grp"), "variant", "y").first()
    assert(r.getAs[Long]("n_a") == 5 && r.getAs[Long]("n_b") == 4)
    assert(math.abs(r.getAs[Double]("mean_a") - 3.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("mean_b") - 5.0) < 1e-6)
    val se2 = 2.5 / 5 + (20.0 / 3) / 4
    val t = (3.0 - 5.0) / math.sqrt(se2)
    val dfW = se2 * se2 /
      ((2.5 / 5) * (2.5 / 5) / 4 + ((20.0 / 3) / 4) * ((20.0 / 3) / 4) / 3)
    assert(math.abs(r.getAs[Double]("t_stat") - t) < 1e-5)
    assert(math.abs(r.getAs[Double]("df_welch") - dfW) < 1e-4)
  }

  test("welchTTest on a null-effect hash split stays small") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .withColumn("variant", Experiments.variant(col("user_id")))
    val rows = Experiments
      .welchTTest(ev, Seq("event_type"), "variant", "value").collect()
    assert(rows.nonEmpty)
    // a random split of the same population: |t| far from pathological
    rows.foreach(r => assert(math.abs(r.getAs[Double]("t_stat")) < 10))
  }

  test("chiSquare is zero for perfectly proportional cells") {
    // factor f1/f2, variant A/B with identical within-factor proportions
    val rows = Seq.fill(30)(("f1", "A")) ++ Seq.fill(60)(("f1", "B")) ++
      Seq.fill(10)(("f2", "A")) ++ Seq.fill(20)(("f2", "B"))
    val r = Experiments.chiSquare(rows.toDF("f", "v"), "f", "v").first()
    assert(r.getAs[Long]("n_rows") == 120)
    assert(r.getAs[Long]("n_cells") == 4)
    assert(r.getAs[Long]("dof") == 1)
    assert(math.abs(r.getAs[Double]("chi2")) < 1e-6)
  }

  test("chiSquare matches the closed form on a 2x2 table") {
    val rows = Seq.fill(10)(("f1", "A")) ++ Seq.fill(20)(("f1", "B")) ++
      Seq.fill(30)(("f2", "A")) ++ Seq.fill(40)(("f2", "B"))
    val r = Experiments.chiSquare(rows.toDF("f", "v"), "f", "v").first()
    // chi2 = N(ad-bc)^2 / (row1*row2*colA*colB)
    val expect = 100.0 * math.pow(10.0 * 40 - 20.0 * 30, 2) /
      (30.0 * 70 * 40 * 60)
    assert(math.abs(r.getAs[Double]("chi2") - expect) < 1e-4)
  }

  test("poissonWeight draws have ~Poisson(1) frequencies") {
    val n = 20000
    val w = (1 to n).toDF("i")
      .select(Experiments.poissonWeight(
        conv(substring(md5(col("i").cast("string")), 1, 8), 16, 10)
          .cast("long")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val p0 = w.getOrElse(0, 0L).toDouble / n
    val p1 = w.getOrElse(1, 0L).toDouble / n
    assert(math.abs(p0 - math.exp(-1)) < 0.01, s"P(0)=$p0")
    assert(math.abs(p1 - math.exp(-1)) < 0.01, s"P(1)=$p1")
  }

  test("bootstrapMeanCI brackets the true mean of a stable sample") {
    val df = (1 to 2000).map(i => ("g", i.toLong, (i % 100).toDouble))
      .toDF("grp", "uid", "y")
    val r = Experiments
      .bootstrapMeanCI(df, Seq("grp"), "uid", "y", replicates = 16)
      .first()
    val lo = r.getAs[Double]("ci_lo")
    val hi = r.getAs[Double]("ci_hi")
    assert(r.getAs[Long]("n_replicates") == 16)
    assert(lo < hi)
    // true mean 49.5; a 95% CI on n=2000 comfortably brackets it
    assert(lo < 49.5 && hi > 49.5, s"[$lo, $hi]")
    // and is tight: sd ~ 28.9/sqrt(2000) ≈ 0.65 → width well under 5
    assert(hi - lo < 5.0)
  }

  test("canary plant/detect round-trips the insertion ground truth") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val marked = Decontamination.plantCanaries(
      docs, "doc_id", "text", k = 16, everyN = 16)
    val truth = marked.filter(col("canary_id").isNotNull)
      .groupBy("canary_id").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val found = Decontamination.detectCanaries(marked, "text", k = 16)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(truth.nonEmpty)
    assert(found == truth)
    // unmarked corpus: zero detections
    assert(Decontamination.detectCanaries(docs, "text", 16).isEmpty)
  }

  test("cuped shrinks toward theta=1 and preserves means on a known model") {
    // y = x + noise per unit: theta ≈ 1 and adjusted means pull each
    // variant's metric by its covariate imbalance
    val rows = (1 to 400).flatMap { u =>
      val v = if (u % 2 == 0) "A" else "B"
      val x = (u % 50).toDouble
      // pre observation carries x; post observation carries y = x + u%7
      Seq((u.toLong, v, true, x), (u.toLong, v, false, x + (u % 7)))
    }
    val df = rows.toDF("uid", "variant", "pre", "y")
    val out = Experiments.cuped(df, "uid", "variant", "y", col("pre"))
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    assert(out.size == 2)
    val theta = out("A").getAs[Double]("theta")
    assert(math.abs(theta - 1.0) < 0.2, s"theta=$theta")
    // adjusted variance must not exceed raw across variants: here just
    // sanity that adjustment moved the means toward each other
    val rawGap = math.abs(out("A").getAs[Double]("mean_raw") -
      out("B").getAs[Double]("mean_raw"))
    val adjGap = math.abs(out("A").getAs[Double]("mean_adj") -
      out("B").getAs[Double]("mean_adj"))
    assert(adjGap <= rawGap + 1e-6, s"adj $adjGap vs raw $rawGap")
  }

  test("cuped drops units missing either period") {
    val df = Seq(
      (1L, "A", true, 1.0), (1L, "A", false, 2.0),
      (2L, "B", true, 3.0), // no post → dropped
      (3L, "B", false, 4.0), // no pre → dropped
      (4L, "B", true, 2.0), (4L, "B", false, 5.0)
    ).toDF("uid", "variant", "pre", "y")
    val out = Experiments.cuped(df, "uid", "variant", "y", col("pre"))
    assert(out.agg(sum(col("n_units"))).first().getLong(0) == 2)
  }

  test("deltaRatio matches the hand-computed estimate and SE") {
    // variant A: units (s, c) = (2, 1), (4, 3); ratio = 6/4 = 1.5
    val df = Seq(
      (1L, "A", 2.0, 1L), (2L, "A", 4.0, 3L),
      (3L, "B", 1.0, 2L), (4L, "B", 3.0, 2L))
      .flatMap { case (u, v, s, c) =>
        // one row carrying the numerator, c rows carrying denominator 1
        Seq((u, v, Some(s), None: Option[Long])) ++
          (1L to c).map(_ => (u, v, None: Option[Double], Some(1L)))
      }.toDF("uid", "variant", "s", "c")
    val out = Experiments.deltaRatio(df, "uid", "variant",
      col("s").cast("decimal(18,6)"), col("c"))
      .collect().map(r => r.getAs[String]("variant") -> r).toMap
    assert(math.abs(out("A").getAs[Double]("ratio") - 1.5) < 1e-6)
    assert(math.abs(out("B").getAs[Double]("ratio") - 1.0) < 1e-6)
    // closed form for A: m=2, var_s=2, cov=2, var_n=2, mean_n=2
    // varR = (2 - 2*1.5*2 + 1.5^2*2)/(2*4) = (2-6+4.5)/8 = 0.0625
    assert(math.abs(out("A").getAs[Double]("se") - 0.25) < 1e-6)
  }

  test("IncrementalAgg: merge of split snapshots equals full recompute") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
      .filter(col("value").isNotNull)
    val keys = Seq("event_type")
    val full = IncrementalAgg.finish(
      IncrementalAgg.snapshot(ev, keys, "value"), keys)
    // split three ways on an arbitrary predicate, snapshot, merge
    val parts = Seq(
      ev.filter(col("event_id") % 3 === 0),
      ev.filter(col("event_id") % 3 === 1),
      ev.filter(col("event_id") % 3 === 2))
    val merged = IncrementalAgg.finish(IncrementalAgg.merge(
      parts.map(IncrementalAgg.snapshot(_, keys, "value")), keys), keys)
    val a = full.orderBy("event_type").collect().map(_.toSeq)
    val b = merged.orderBy("event_type").collect().map(_.toSeq)
    assert(a.sameElements(b), "merged state diverged from recompute")
  }
}
