package graft.operators

import graft.SparkSpec

/** KS and Mann-Whitney against hand-computed values. */
class TwoSampleSpec extends SparkSpec {
  import spark.implicits._

  test("ksTest: disjoint samples reach D=1, identical samples D=0") {
    val a = Seq(1.0, 2.0).toDF("v")
    val b = Seq(3.0, 4.0).toDF("v")
    val r = Ranks.ksTest(a, b, "v").first()
    assert(r.getAs[Long]("d_num") == 4L) // = n_a * n_b
    assert(math.abs(r.getAs[Double]("d_stat") - 1.0) < 1e-9)

    val same = Seq(1.0, 2.0, 3.0).toDF("v")
    val r2 = Ranks.ksTest(same, same, "v").first()
    assert(r2.getAs[Long]("d_num") == 0L)
  }

  test("ksTest matches the hand-computed D on an interleaved sample") {
    // A = {1,3}, B = {2,4}: D = 1/2 at v=1 (CA=1,CB=0) and ties after
    val a = Seq(1.0, 3.0).toDF("v")
    val b = Seq(2.0, 4.0).toDF("v")
    val r = Ranks.ksTest(a, b, "v").first()
    assert(r.getAs[Long]("d_num") == 2L) // |1*2 - 0*2| = 2
    assert(math.abs(r.getAs[Double]("d_stat") - 0.5) < 1e-9)
  }

  test("mannWhitney matches hand-computed U and tie-corrected z") {
    // A = {1,2,2}, B = {2,3}: avg tie ranks give sum_ranks_A = 7,
    // U_A = 1 (u2 = 2); ties sum = 24; var = 2.4; z = -2/sqrt(2.4)
    val a = Seq(1.0, 2.0, 2.0).toDF("v")
    val b = Seq(2.0, 3.0).toDF("v")
    val r = Ranks.mannWhitney(a, b, "v").first()
    assert(r.getAs[Long]("u2_a") == 2L)
    assert(math.abs(r.getAs[Double]("z") - (-2.0 / math.sqrt(2.4))) < 1e-6)
  }

  test("delongAuc matches the hand-computed placements") {
    // pos = {3,1}, neg = {2,1}: placements V10 = {1.0, 0.25} (ties at
    // half), V01 = {0.5, 0.75}; AUC = 0.625, S10 = 0.28125,
    // S01 = 0.03125, se = sqrt(S10/2 + S01/2) = 0.39528...
    val pos = Seq(3.0, 1.0).toDF("v")
    val neg = Seq(2.0, 1.0).toDF("v")
    val r = Ranks.delongAuc(pos, neg, "v").first()
    assert(r.getAs[Long]("n_pos") == 2L && r.getAs[Long]("n_neg") == 2L)
    assert(math.abs(r.getAs[Double]("auc") - 0.625) < 1e-6)
    assert(math.abs(r.getAs[Double]("se") - 0.395285) < 1e-5)
    assert(math.abs(r.getAs[Double]("ci_lo") -
      (0.625 - 1.959964 * 0.3952847)) < 1e-4)
    assert(math.abs(r.getAs[Double]("ci_hi") -
      (0.625 + 1.959964 * 0.3952847)) < 1e-4)
  }

  test("delongAuc: perfect separation gives auc 1 and zero variance") {
    val pos = Seq(10.0, 11.0, 12.0).toDF("v")
    val neg = Seq(1.0, 2.0).toDF("v")
    val r = Ranks.delongAuc(pos, neg, "v").first()
    assert(math.abs(r.getAs[Double]("auc") - 1.0) < 1e-6)
    assert(math.abs(r.getAs[Double]("se")) < 1e-6)
  }

  test("delongAuc AUC agrees with the evaluator's rank-sum AUC") {
    val ev = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val scored = ev.selectExpr("CAST(embedding[0] AS DOUBLE) AS score",
      "label >= 5 AS pos")
    val r = Ranks.delongAuc(scored.filter($"pos"),
      scored.filter(!$"pos"), "score").first()
    val rows = scored.selectExpr("score", "monotonically_increasing_id() AS i",
      "pos").rdd.map(x => (x.getDouble(0), x.getLong(1), x.getBoolean(2)))
    val (sumRnPos, p, n) = graft.ml.Evaluators.rankSumStats(rows)
    val auc = (2.0 * sumRnPos - p.toDouble * (p + 1)) / (2.0 * p.toDouble * n)
    assert(math.abs(r.getAs[Double]("auc") - auc) < 1e-6)
    assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("auc") &&
      r.getAs[Double]("auc") <= r.getAs[Double]("ci_hi"))
  }

  test("gini matches hand-computed values and its bounds") {
    // x = {1,1,2,4}: sorted Σ2i·x = 2(1·1+2·1+3·2+4·4) = 50;
    // S = 8, n = 4 → G = (50 − 5·8)/(4·8) = 10/32 = 0.3125
    val df = Seq(1L, 1L, 2L, 4L).toDF("c")
    val r = Ranks.gini(df, "c").first()
    assert(r.getAs[Long]("n") == 4L)
    assert(r.getAs[Long]("gini_num") == 10L &&
      r.getAs[Long]("gini_den") == 32L)
    assert(math.abs(r.getAs[Double]("gini") - 0.3125) < 1e-9)

    // perfectly equal counts → 0
    val eq = Ranks.gini(Seq(7L, 7L, 7L).toDF("c"), "c").first()
    assert(eq.getAs[Long]("gini_num") == 0L)

    // one key holds everything → (n−1)/n
    val sk = Ranks.gini(Seq(0L, 0L, 0L, 12L).toDF("c"), "c").first()
    assert(math.abs(sk.getAs[Double]("gini") - 0.75) < 1e-9)

    // partition-independence
    val big = (1 to 500).map(i => (i % 13).toLong).toDF("c")
    val a = Ranks.gini(big.repartition(11), "c").first().getAs[Double]("gini")
    val b = Ranks.gini(big.repartition(2), "c").first().getAs[Double]("gini")
    assert(a == b)
  }

  test("mannWhitney is antisymmetric: swapping samples flips z") {
    val ev = spark.read.parquet(sf("sf0.001") + "/events.parquet")
    val a = ev.filter($"event_type" === "click").select("value")
    val b = ev.filter($"event_type" === "view").select("value")
    val z1 = Ranks.mannWhitney(a, b, "value").first().getAs[Double]("z")
    val z2 = Ranks.mannWhitney(b, a, "value").first().getAs[Double]("z")
    assert(math.abs(z1 + z2) < 1e-5, s"$z1 vs $z2")
  }
}
