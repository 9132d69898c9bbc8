package graft.ml

import graft.SparkSpec
import graft.ml.CoordinateDescent._
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

/** GAME coordinate-descent recovery on synthetic additive data:
  * y = w·x (fixed) + perUserIntercept (random) + noise. The descent must
  * recover both parts; per-entity models must beat a fixed-only fit. */
class GameSpec extends SparkSpec {
  import spark.implicits._

  private val nUsers = 20
  private val userEffect: Map[String, Double] =
    (0 until nUsers).map(u => s"u$u" -> (u - nUsers / 2) * 0.5).toMap
  private val wTrue = Array(2.0, -1.0)

  private def gameData(n: Int) = {
    val rnd = new scala.util.Random(7)
    (0 until n).map { i =>
      val u = s"u${rnd.nextInt(nUsers)}"
      val x = Array(rnd.nextGaussian(), rnd.nextGaussian())
      val y = GlmMath.dot(wTrue, Vectors.dense(x)) + userEffect(u) +
        0.05 * rnd.nextGaussian()
      (i.toLong, y, 1.0, 0.0, Vectors.dense(x), Vectors.dense(Array.empty[Double]), u)
    }.toDF("uid", "label", "weight", "offset", "fixedFeatures",
      "emptyFeatures", "userId")
  }

  test("coordinate descent recovers fixed weights and user intercepts") {
    val data = gameData(4000)
    val fixed = FixedSpec("global", "fixedFeatures", 2,
      GlmConfig(SquaredLoss, l2 = 0.0, maxIter = 100, tol = 1e-10))
    val random = RandomSpec("perUser", "userId", "emptyFeatures", 0,
      GlmConfig(SquaredLoss, l2 = 1e-3, maxIter = 50, tol = 1e-10))
    val model = CoordinateDescent.train(data, Seq(fixed, random),
      nIterations = 3)

    val g = model.coordinates("global").asInstanceOf[TrainedFixed].model
    assert(math.abs(g.coef(0) - 2.0) < 0.05, s"w0=${g.coef(0)}")
    assert(math.abs(g.coef(1) + 1.0) < 0.05, s"w1=${g.coef(1)}")

    val userModels = model.coordinates("perUser")
      .asInstanceOf[TrainedRandom].models
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // random-effect intercepts recover the per-user shifts (global
    // intercept absorbs the mean; compare deviations)
    val meanEffect = userEffect.values.sum / nUsers
    userEffect.foreach { case (u, e) =>
      val got = userModels(u) + g.intercept
      assert(math.abs(got - e) < 0.15, s"user $u: got $got want $e")
    }

    // scoring: full GAME score should predict y closely
    val scored = model.score(data).join(data.select("uid", "label"), "uid")
    val rmse = Evaluators.rmse(scored, "score", "label")
    assert(rmse < 0.1, s"rmse=$rmse")
  }

  test("random-effect priors survive for entities with no new data") {
    val prior = spark.createDataset(Seq(
      RandomEffect.ReModel("ghost", Array(1.0), 0.5),
      RandomEffect.ReModel("live", Array(0.0), 0.0)))
    val data = spark.createDataset(Seq(
      RandomEffect.ReSample("live", 2.0, Vectors.dense(1.0), 0.0, 1.0),
      RandomEffect.ReSample("live", 4.0, Vectors.dense(2.0), 0.0, 1.0)))
    val out = RandomEffect.train(data, 1,
      GlmConfig(SquaredLoss, maxIter = 50, tol = 1e-10),
      priors = Some(prior)).collect().map(m => m.reId -> m).toMap
    assert(out("ghost").coef(0) == 1.0 && out("ghost").intercept == 0.5)
    assert(math.abs(out("live").coef(0) - 2.0) < 1e-4)
  }
}
