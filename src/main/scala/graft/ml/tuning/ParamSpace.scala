package graft.ml.tuning

import breeze.linalg.DenseVector
import org.apache.commons.math3.random.SobolSequenceGenerator

/** One tunable dimension: a bounded range, optionally log-scaled (the
  * natural parameterization for regularization weights) and optionally
  * discretized to an integer grid.
  *
  * Mirrors the reference's HyperparameterConfig ranges + discreteParams +
  * transformMap (photon-lib/.../hyperparameter/HyperparameterConfig.scala:
  * 29-38, VectorRescaling.scala:36-130) as a single self-describing type.
  */
case class ParamRange(name: String, min: Double, max: Double,
                      logScale: Boolean = false, discrete: Boolean = false) {
  require(max > min, s"$name: empty range")
  if (logScale) require(min > 0, s"$name: log scale needs positive bounds")

  /** Map a unit-cube coordinate to this range. */
  def fromUnit(u: Double): Double = {
    val v =
      if (logScale)
        math.exp(math.log(min) + u * (math.log(max) - math.log(min)))
      else min + u * (max - min)
    if (discrete) math.rint(v) else v
  }

  /** Inverse of [[fromUnit]] (discrete values round-trip to their cell). */
  def toUnit(v: Double): Double =
    if (logScale) (math.log(v) - math.log(min)) /
      (math.log(max) - math.log(min))
    else (v - min) / (max - min)
}

/** The search space: an ordered list of ranges with unit-cube transforms
  * and a deterministic Sobol low-discrepancy stream for drawing roughly
  * equidistant candidates (reference RandomSearch.paramDistributions,
  * RandomSearch.scala:43-48 — same commons-math3 generator).
  */
case class ParamSpace(ranges: Seq[ParamRange]) {
  val dim: Int = ranges.size

  def fromUnit(u: DenseVector[Double]): DenseVector[Double] =
    DenseVector(ranges.zipWithIndex.map { case (r, i) => r.fromUnit(u(i)) }
      .toArray)

  def toUnit(v: DenseVector[Double]): DenseVector[Double] =
    DenseVector(ranges.zipWithIndex.map { case (r, i) => r.toUnit(v(i)) }
      .toArray)

  /** n Sobol points in the unit cube, deterministic in `seed` (the seed
    * skips the stream, so two searches with the same seed see the same
    * candidates). */
  def sobol(n: Int, seed: Long, skip: Int = 0): Seq[DenseVector[Double]] = {
    val gen = new SobolSequenceGenerator(dim)
    gen.skipTo(((seed % 100000).toInt.abs + skip).toInt)
    (0 until n).map(_ => DenseVector(gen.nextVector()))
  }
}
