package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors

class ConstraintSpec extends SparkSpec {
  import spark.implicits._

  private val sep = graft.sources.FeatureVectorizer.Sep

  test("constraint JSON parses with defaults and wildcards") {
    val cs = Constraints.parse(
      """[{"name":"age","term":"","lowerBound":0.0},
        |{"name":"geo","term":"*","upperBound":2.0}]""".stripMargin)
    assert(cs.size == 2)
    assert(cs.head.lower == 0.0 && cs.head.upper.isPosInfinity)
    assert(cs(1).term == "*" && cs(1).upper == 2.0)
    intercept[IllegalArgumentException](
      Constraints.parse("""[{"name":"x","term":""}]""")) // bounds nothing
  }

  test("boundsFor renders wildcards and flags conflicts") {
    val idx = Map(s"age$sep" -> 0, s"geo${sep}us" -> 1, s"geo${sep}de" -> 2)
    val (lo, hi) = Constraints.boundsFor(Seq(
      Constraints.Constraint("age", "", lower = 0.0),
      Constraints.Constraint("geo", "*", upper = 2.0)),
      idx, featureDim = 3, fitIntercept = true)
    assert(lo.toSeq == Seq(0.0, Double.NegativeInfinity,
      Double.NegativeInfinity, Double.NegativeInfinity))
    assert(hi.toSeq == Seq(Double.PositiveInfinity, 2.0, 2.0,
      Double.PositiveInfinity))
    intercept[IllegalArgumentException] {
      Constraints.boundsFor(Seq(
        Constraints.Constraint("geo", "*", upper = 2.0),
        Constraints.Constraint("geo", "us", lower = 0.0)),
        idx, 3, fitIntercept = false)
    }
  }

  test("bounded training clamps coefficients at the box") {
    val rnd = new scala.util.Random(13)
    val ds = (0 until 400).map { _ =>
      val x1 = rnd.nextGaussian(); val x2 = rnd.nextGaussian()
      LabeledPoint(3.0 * x1 - 2.0 * x2 + rnd.nextGaussian() * 0.1,
        Vectors.dense(x1, x2))
    }.toDS()
    val free = Glm.train(ds, 2, GlmConfig(SquaredLoss, maxIter = 100,
      tol = 1e-9))
    assert(math.abs(free.coef(0) - 3.0) < 0.1)
    val boxed = Glm.train(ds, 2, GlmConfig(SquaredLoss, maxIter = 100,
      tol = 1e-9, bounds = Some((
        Array(Double.NegativeInfinity, -1.0, Double.NegativeInfinity),
        Array(1.5, Double.PositiveInfinity, Double.PositiveInfinity)))))
    assert(math.abs(boxed.coef(0) - 1.5) < 1e-6,
      s"coef0=${boxed.coef(0)} should sit at the 1.5 upper bound")
    assert(math.abs(boxed.coef(1) - (-1.0)) < 1e-6,
      s"coef1=${boxed.coef(1)} should sit at the -1 lower bound")
  }
}
