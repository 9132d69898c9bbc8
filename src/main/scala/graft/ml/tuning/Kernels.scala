package graft.ml.tuning

import breeze.linalg.{DenseMatrix, DenseVector, cholesky}

/** Stationary covariance kernels for the Gaussian-process surrogate
  * (reference photon-lib/.../hyperparameter/estimators/kernels/
  * StationaryKernel.scala:35-, RBF.scala, Matern52.scala).
  *
  * All matrix math is driver-side breeze over at most a few hundred
  * observations — hyperparameter tuning observes one point per full
  * distributed training run, so the GP itself is intentionally tiny.
  */
sealed trait Kernel {
  def amplitude: Double
  def noise: Double
  def lengthScale: Double

  def withParams(amplitude: Double, noise: Double, lengthScale: Double): Kernel

  /** k(r) from the scaled distance r = ||x1 - x2|| / lengthScale. */
  protected def fromScaledDistance(r: Double): Double

  /** Cross-covariance (no noise term). */
  def cov(x1: DenseMatrix[Double], x2: DenseMatrix[Double])
  : DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](x1.rows, x2.rows)
    var i = 0
    while (i < x1.rows) {
      var j = 0
      while (j < x2.rows) {
        var d2 = 0.0
        var k = 0
        while (k < x1.cols) {
          val d = x1(i, k) - x2(j, k); d2 += d * d; k += 1
        }
        out(i, j) = amplitude * fromScaledDistance(math.sqrt(d2) / lengthScale)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Training Gram matrix: cov + (noise + jitter)·I. */
  def gram(x: DenseMatrix[Double]): DenseMatrix[Double] = {
    val g = cov(x, x)
    var i = 0
    while (i < x.rows) { g(i, i) += noise + 1e-9; i += 1 }
    g
  }

  /** Log marginal likelihood of (x, y) under this kernel via Cholesky:
    * −½·yᵀK⁻¹y − Σ log Lᵢᵢ − n/2·log 2π
    * (StationaryKernel.logLikelihood, StationaryKernel.scala:106-129). */
  def logMarginalLikelihood(x: DenseMatrix[Double],
                            y: DenseVector[Double]): Double = {
    val l = cholesky(gram(x))
    val alpha = GpMath.cholSolve(l, y)
    var logDet = 0.0
    var i = 0
    while (i < l.rows) { logDet += math.log(l(i, i)); i += 1 }
    -0.5 * (y dot alpha) - logDet - 0.5 * x.rows * math.log(2 * math.Pi)
  }
}

/** Squared-exponential kernel (RBF.scala:44-56). */
case class Rbf(amplitude: Double = 1.0, noise: Double = 1e-4,
               lengthScale: Double = 1.0) extends Kernel {
  protected def fromScaledDistance(r: Double): Double =
    math.exp(-0.5 * r * r)
  def withParams(a: Double, n: Double, l: Double): Kernel = Rbf(a, n, l)
}

/** Matérn 5/2 — the default surrogate kernel, smoother-than-exponential
  * but not infinitely smooth like RBF (Matern52.scala:44-66). */
case class Matern52(amplitude: Double = 1.0, noise: Double = 1e-4,
                    lengthScale: Double = 1.0) extends Kernel {
  protected def fromScaledDistance(r: Double): Double = {
    val s = math.sqrt(5) * r
    (1.0 + s + s * s / 3.0) * math.exp(-s)
  }
  def withParams(a: Double, n: Double, l: Double): Kernel = Matern52(a, n, l)
}

private[ml] object GpMath {
  /** Solve K·z = y given L = chol(K) (lower): forward then back subst. */
  def cholSolve(l: DenseMatrix[Double],
                y: DenseVector[Double]): DenseVector[Double] = {
    val n = l.rows
    val z = y.copy
    var i = 0
    while (i < n) { // L·u = y
      var s = z(i)
      var j = 0
      while (j < i) { s -= l(i, j) * z(j); j += 1 }
      z(i) = s / l(i, i)
      i += 1
    }
    i = n - 1
    while (i >= 0) { // Lᵀ·z = u
      var s = z(i)
      var j = i + 1
      while (j < n) { s -= l(j, i) * z(j); j += 1 }
      z(i) = s / l(i, i)
      i -= 1
    }
    z
  }

  /** Forward substitution L·z = y. */
  def forwardSolve(l: DenseMatrix[Double],
                   y: DenseVector[Double]): DenseVector[Double] = {
    val z = y.copy
    var i = 0
    while (i < l.rows) {
      var s = z(i)
      var j = 0
      while (j < i) { s -= l(i, j) * z(j); j += 1 }
      z(i) = s / l(i, i)
      i += 1
    }
    z
  }

  def stdNormPdf(x: Double): Double =
    math.exp(-0.5 * x * x) / math.sqrt(2 * math.Pi)

  def stdNormCdf(x: Double): Double =
    0.5 * (1.0 + erf(x / math.sqrt(2.0)))

  /** Abramowitz–Stegun 7.1.26 rational approximation (|err| < 1.5e-7). */
  private def erf(x: Double): Double = {
    val sign = if (x < 0) -1.0 else 1.0
    val ax = math.abs(x)
    val t = 1.0 / (1.0 + 0.3275911 * ax)
    val y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741)
      * t - 0.284496736) * t + 0.254829592) * t * math.exp(-ax * ax)
    sign * y
  }
}
