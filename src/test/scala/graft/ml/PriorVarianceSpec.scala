package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors

class PriorVarianceSpec extends SparkSpec {
  import spark.implicits._

  private def ridgeData(n: Int = 200, seed: Int = 4) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      val y = 2.0 * x1 - 1.0 * x2 + 0.5 + rnd.nextGaussian() * 0.1
      LabeledPoint(y, Vectors.dense(x1, x2))
    }.toDS()
  }

  test("gaussian prior pulls coefficients toward the prior mean") {
    val ds = ridgeData()
    val free = Glm.train(ds, 2, GlmConfig(SquaredLoss, l2 = 0.0,
      maxIter = 100, tol = 1e-10))
    val target = Array(5.0, 5.0, 5.0)
    val strong = Glm.train(ds, 2, GlmConfig(SquaredLoss, l2 = 0.0,
      maxIter = 100, tol = 1e-10,
      prior = Some(GaussianPrior(Array(5.0, 5.0, 5.0),
        Array(1e-8, 1e-8, 1e-8)))))
    // near-zero prior variance: solution ≈ prior mean
    assert(math.abs(strong.coef(0) - 5.0) < 0.01 &&
      math.abs(strong.intercept - 5.0) < 0.01,
      s"strong=${strong.coef.toSeq} ${strong.intercept}")
    val weak = Glm.train(ds, 2, GlmConfig(SquaredLoss, l2 = 0.0,
      maxIter = 100, tol = 1e-10,
      prior = Some(GaussianPrior(target, Array(1e6, 1e6, 1e6)))))
    // huge prior variance: solution ≈ unregularized fit
    assert(math.abs(weak.coef(0) - free.coef(0)) < 1e-3)
  }

  test("simple variances match the closed form for linear regression") {
    val ds = ridgeData()
    val cfg = GlmConfig(SquaredLoss, l2 = 0.3, maxIter = 100, tol = 1e-10,
      varianceComputation = "simple")
    val m = Glm.train(ds, 2, cfg)
    // for squared loss d2z = 1: H_jj = sum(x_j^2) (+ l2 on features)
    val rows = ds.collect()
    val sx1 = rows.map(p => math.pow(p.features(0), 2)).sum
    val sx2 = rows.map(p => math.pow(p.features(1), 2)).sum
    val v = m.variances.get
    assert(math.abs(v(0) - 1.0 / (sx1 + 0.3)) < 1e-9)
    assert(math.abs(v(1) - 1.0 / (sx2 + 0.3)) < 1e-9)
    assert(math.abs(v(2) - 1.0 / rows.length) < 1e-9)
  }

  test("full variances equal inverse-Hessian diagonal, exceed simple " +
    "under correlation") {
    val rnd = new scala.util.Random(9)
    val ds = (0 until 300).map { _ =>
      val x1 = rnd.nextGaussian()
      val x2 = 0.9 * x1 + 0.1 * rnd.nextGaussian() // heavy correlation
      LabeledPoint(x1 - x2 + 0.2 + rnd.nextGaussian() * 0.1,
        Vectors.dense(x1, x2))
    }.toDS()
    val simple = Glm.train(ds, 2, GlmConfig(SquaredLoss, l2 = 0.01,
      maxIter = 100, tol = 1e-10, varianceComputation = "simple"))
    val full = Glm.train(ds, 2, GlmConfig(SquaredLoss, l2 = 0.01,
      maxIter = 100, tol = 1e-10, varianceComputation = "full"))
    // correlated features: diag of the true inverse is much larger than
    // the inverse of the diag
    assert(full.variances.get(0) > 3 * simple.variances.get(0),
      s"full=${full.variances.get.toSeq} simple=${simple.variances.get.toSeq}")
  }

  test("incremental training chains: prior beats cold start on shifted data") {
    val rnd = new scala.util.Random(17)
    def mk(n: Int) = (0 until n).map { _ =>
      val x = rnd.nextGaussian()
      val y = if (rnd.nextDouble() <
        PointwiseLoss.sigmoid(1.5 * x - 0.5)) 1.0 else 0.0
      LabeledPoint(y, Vectors.dense(x))
    }.toDS()
    val cfg = GlmConfig(LogisticLoss, l2 = 0.1, maxIter = 100, tol = 1e-9,
      varianceComputation = "simple")
    val big = Glm.train(mk(2000), 1, cfg)
    assert(big.variances.isDefined)
    // tiny second batch: incremental stays near the well-estimated prior
    val inc = Glm.trainIncremental(mk(20), 1, cfg, big)
    val cold = Glm.train(mk(20), 1, cfg)
    assert(math.abs(inc.coef(0) - big.coef(0)) <
      math.abs(cold.coef(0) - big.coef(0)),
      s"inc=${inc.coef(0)} cold=${cold.coef(0)} prior=${big.coef(0)}")
  }

  test("tron honors the prior regularizer like lbfgs") {
    val ds = ridgeData()
    val prior = Some(GaussianPrior(Array(1.0, 1.0, 1.0),
      Array(0.5, 0.5, 0.5), incrementalWeight = 2.0))
    val cfg = GlmConfig(SquaredLoss, maxIter = 200, tol = 1e-12,
      prior = prior)
    val a = Glm.train(ds, 2, cfg, solver = "lbfgs")
    val b = Glm.train(ds, 2, cfg, solver = "tron")
    assert(a.coef.zip(b.coef).forall { case (x, y) =>
      math.abs(x - y) < 1e-5 },
      s"lbfgs=${a.coef.toSeq} tron=${b.coef.toSeq}")
  }
}
