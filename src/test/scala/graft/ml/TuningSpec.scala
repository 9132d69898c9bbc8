package graft.ml

import breeze.linalg.{DenseMatrix, DenseVector}
import graft.SparkSpec
import graft.ml.tuning._

class TuningSpec extends SparkSpec {

  test("param ranges round-trip linear, log, and discrete transforms") {
    val lin = ParamRange("a", -2, 6)
    assert(math.abs(lin.fromUnit(0.5) - 2.0) < 1e-12)
    assert(math.abs(lin.toUnit(lin.fromUnit(0.3)) - 0.3) < 1e-12)
    val log = ParamRange("l2", 1e-4, 1e2, logScale = true)
    assert(math.abs(log.fromUnit(0.5) - math.sqrt(1e-4 * 1e2)) < 1e-12)
    assert(math.abs(log.toUnit(1.0) - log.toUnit(0.999) -
      (math.log(1.0) - math.log(0.999)) / math.log(1e6)) < 1e-9)
    val disc = ParamRange("k", 1, 10, discrete = true)
    assert(disc.fromUnit(0.24) == math.rint(1 + 0.24 * 9))
  }

  test("sobol stream is deterministic and roughly space-filling") {
    val space = ParamSpace(Seq(ParamRange("x", 0, 1), ParamRange("y", 0, 1)))
    val a = space.sobol(64, seed = 7)
    val b = space.sobol(64, seed = 7)
    assert(a.zip(b).forall { case (u, v) => u == v })
    // every quadrant of the unit square gets points
    val quads = a.map(p => (p(0) < 0.5, p(1) < 0.5)).toSet
    assert(quads.size == 4)
  }

  test("kernel gram is PSD and log-likelihood prefers the true noise") {
    val rnd = new scala.util.Random(5)
    val x = DenseMatrix((0 until 30).map(i =>
      Array(i / 30.0)): _*)
    val f = (0 until 30).map(i => math.sin(6 * i / 30.0))
    val y = DenseVector(f.map(_ + rnd.nextGaussian() * 0.05).toArray)
    val goodK = Matern52(amplitude = 1.0, noise = 0.0025, lengthScale = 0.3)
    val badK = Matern52(amplitude = 1.0, noise = 1.0, lengthScale = 0.3)
    assert(goodK.logMarginalLikelihood(x, y) >
      badK.logMarginalLikelihood(x, y))
  }

  test("GP posterior interpolates observations and grows variance away") {
    val xs = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(v => DenseVector(v))
    val ys = xs.map(v => math.sin(4 * v(0)))
    val gp = new GpEstimator(nSamples = 3, seed = 2).fit(xs, ys)
    val (mAt, vAt) = gp.predict(DenseVector(0.5))
    assert(math.abs(mAt - math.sin(2.0)) < 0.15, s"mean=$mAt")
    val (_, vFar) = gp.predict(DenseVector(3.0))
    assert(vFar > vAt, s"far variance $vFar should exceed near $vAt")
  }

  test("slice sampler approximates a standard normal") {
    val s = new SliceSampler(seed = 11)
    val logp = (x: DenseVector[Double]) => -0.5 * (x dot x)
    val chain = s.chain(DenseVector(0.0), 4000, logp).drop(500)
    val xs = chain.map(_(0))
    val mean = xs.sum / xs.size
    val sd = math.sqrt(xs.map(v => (v - mean) * (v - mean)).sum / xs.size)
    assert(math.abs(mean) < 0.15, s"mean=$mean")
    assert(math.abs(sd - 1.0) < 0.2, s"sd=$sd")
  }

  test("expected improvement is positive under uncertainty, zero when sure") {
    val ei = Acquisition.expectedImprovement(best = 1.0) _
    assert(ei(2.0, 1e-18) == 0.0)           // certain and worse: no EI
    assert(ei(0.5, 1e-18) == 0.5)           // certain and better: gap
    assert(ei(2.0, 4.0) > 0.0)              // uncertain: some EI
    assert(ei(1.0, 4.0) > ei(1.0, 0.01))    // more variance, more EI
  }

  test("GP search finds a better optimum than its own seeding phase") {
    // f(x, y) = (x-0.3)^2 + (y-0.7)^2 on [0,1]^2, minimum 0 at (.3,.7)
    val space = ParamSpace(Seq(ParamRange("x", 0, 1), ParamRange("y", 0, 1)))
    val f = new EvaluationFunction {
      def apply(p: DenseVector[Double]): Double = {
        val dx = p(0) - 0.3; val dy = p(1) - 0.7
        dx * dx + dy * dy
      }
    }
    val gp = new GaussianProcessSearch(space, f, seed = 3,
      minObservations = 4)
    val best = gp.find(16)
    assert(best.value < 0.01, s"best=${best.value} at ${best.params}")
    // the model-guided phase must improve on pure Sobol seeding
    val seedPhaseBest = gp.history.take(4).map(_.value).min
    assert(best.value <= seedPhaseBest)
  }

  test("random search respects log-scaled ranges and returns the best") {
    val space = ParamSpace(Seq(ParamRange("l2", 1e-6, 1e2, logScale = true)))
    val f = new EvaluationFunction {
      def apply(p: DenseVector[Double]): Double =
        math.pow(math.log10(p(0)) + 2, 2) // best at l2 = 1e-2
    }
    val best = new RandomSearch(space, f, seed = 9).find(40)
    assert(best.params(0) > 1e-4 && best.params(0) < 1.0,
      s"best l2=${best.params(0)}")
    assert(space.ranges.head.toUnit(best.params(0)) >= 0 &&
      space.ranges.head.toUnit(best.params(0)) <= 1)
  }
}
