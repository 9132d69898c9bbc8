package graft.ml

/** Per-iteration optimization state log (L1, reference
  * OptimizerState.scala + OptimizationStatesTracker.scala:30-120): the
  * loss value, gradient norm, and elapsed wall time of every optimizer
  * iteration, for convergence diagnostics and driver logging.
  */
case class OptimState(iter: Int, value: Double, gradNorm: Double,
                      elapsedMs: Long)

final class StatesTracker {
  private val buf = scala.collection.mutable.ArrayBuffer.empty[OptimState]
  private val t0 = System.nanoTime()

  def record(value: Double, gradNorm: Double): Unit =
    buf += OptimState(buf.size, value, gradNorm,
      (System.nanoTime() - t0) / 1000000L)

  def states: Seq[OptimState] = buf.toSeq

  /** Relative-improvement convergence check against the first state
    * (the reference's tolerance semantics: |Δf| relative to f₀). */
  def converged(tol: Double): Boolean = buf.size >= 2 && {
    val f0 = math.abs(buf.head.value)
    math.abs(buf(buf.size - 1).value - buf(buf.size - 2).value) <=
      tol * math.max(f0, 1.0)
  }

  def toSummaryString: String =
    if (buf.isEmpty) "no iterations recorded"
    else {
      val last = buf.last
      s"${buf.size} iterations in ${last.elapsedMs} ms; " +
        s"loss ${buf.head.value} -> ${last.value}; " +
        s"final |grad| ${last.gradNorm}"
    }
}
