package graft.ml.tuning

import breeze.linalg.DenseVector

/** Dimension-wise slice sampler (Neal 2003) for drawing kernel
  * hyperparameters from their log posterior — the reference's MCMC for
  * GP kernel estimation (photon-lib/.../hyperparameter/SliceSampler.scala:
  * 52-230: draw a level under logp(x), step out an interval, shrink back
  * until a point inside the slice is found).
  *
  * Deterministic given the seed; purely driver-side (the sampled function
  * is a ≤few-hundred-point GP likelihood).
  */
class SliceSampler(seed: Long = 0L, stepSize: Double = 1.0,
                   maxStepOut: Int = 32) {
  private val rnd = new scala.util.Random(seed)

  /** One new sample from logp, updating every dimension in turn. */
  def draw(x: DenseVector[Double],
           logp: DenseVector[Double] => Double): DenseVector[Double] = {
    var cur = x
    var d = 0
    while (d < x.length) {
      cur = drawDim(cur, d, logp)
      d += 1
    }
    cur
  }

  /** n samples, returning the chain (after-in-place of the initial x). */
  def chain(x0: DenseVector[Double], n: Int,
            logp: DenseVector[Double] => Double): Seq[DenseVector[Double]] = {
    var cur = x0
    (0 until n).map { _ => cur = draw(cur, logp); cur }
  }

  private def drawDim(x: DenseVector[Double], d: Int,
                      logp: DenseVector[Double] => Double)
  : DenseVector[Double] = {
    def at(v: Double): DenseVector[Double] = {
      val c = x.copy; c(d) = v; c
    }
    val y = logp(x) + math.log(rnd.nextDouble() + 1e-300) // slice level
    // step out
    var lower = x(d) - stepSize * rnd.nextDouble()
    var upper = lower + stepSize
    var steps = 0
    while (logp(at(lower)) > y && steps < maxStepOut) {
      lower -= stepSize; steps += 1
    }
    steps = 0
    while (logp(at(upper)) > y && steps < maxStepOut) {
      upper += stepSize; steps += 1
    }
    // shrink until inside the slice
    var draw = lower + rnd.nextDouble() * (upper - lower)
    var tries = 0
    while (logp(at(draw)) <= y && tries < 100) {
      if (draw < x(d)) lower = draw else upper = draw
      draw = lower + rnd.nextDouble() * (upper - lower)
      tries += 1
    }
    if (tries >= 100) x else at(draw)
  }
}
