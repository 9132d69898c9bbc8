package graft.ml.tuning

import breeze.linalg.DenseVector

/** An observed trial: the evaluated point (original space) and its value
  * (lower is better throughout the tuning package). */
case class Trial(params: DenseVector[Double], value: Double)

/** Black-box evaluation of one hyperparameter vector — typically one full
  * distributed training + validation run (reference
  * EvaluationFunction.scala:25-58). */
trait EvaluationFunction {
  def apply(params: DenseVector[Double]): Double
}

/** Sobol-sequence random search (reference search/RandomSearch.scala:
  * 34-178): quasi-random candidates cover the unit cube roughly
  * equidistantly, mapped through the space's per-dimension transforms.
  *
  * This is the baseline searcher and the GP search's candidate pool.
  * Evaluations run sequentially — each is itself a fully distributed
  * Spark training job, so the cluster is already saturated; the search
  * layer adds no parallelism on purpose (same stance as the reference).
  */
class RandomSearch(space: ParamSpace, evalFn: EvaluationFunction,
                   seed: Long = 0L) {

  protected var observed: Vector[Trial] = Vector.empty
  private var drawn = 0

  def history: Seq[Trial] = observed

  def best: Trial = observed.minBy(_.value)

  /** Seed the searcher with completed trials (e.g. from a previous round
    * — the reference's findWithPriorObservations). */
  def withPriors(trials: Seq[Trial]): this.type = {
    trials.foreach(t => onObservation(t))
    this
  }

  def find(n: Int): Trial = {
    (0 until n).foreach { _ =>
      val p = nextCandidate()
      val v = evalFn(p)
      onObservation(Trial(p, v))
    }
    best
  }

  protected def onObservation(t: Trial): Unit = observed :+= t

  protected def nextCandidate(): DenseVector[Double] = {
    val u = space.sobol(1, seed, skip = drawn).head
    drawn += 1
    space.fromUnit(u)
  }
}

/** Bayesian search with a GP surrogate (reference
  * search/GaussianProcessSearch.scala:52-196): after `minObservations`
  * trials, fit a slice-sampled Matérn-5/2 GP ensemble to the observation
  * history in unit-cube space and pick the Sobol candidate maximizing
  * expected improvement; before that, fall back to plain Sobol.
  */
class GaussianProcessSearch(space: ParamSpace, evalFn: EvaluationFunction,
                            seed: Long = 0L, candidatePool: Int = 250,
                            minObservations: Int = 3)
  extends RandomSearch(space, evalFn, seed) {

  private var poolSkip = 1000

  override protected def nextCandidate(): DenseVector[Double] = {
    if (observed.size < minObservations) super.nextCandidate()
    else {
      val xs = observed.map(t => space.toUnit(t.params))
      val ys = observed.map(_.value)
      val gp = new GpEstimator(seed = seed + observed.size)
        .fit(xs, ys)
      val bestVal = ys.min
      val acq = Acquisition.expectedImprovement(bestVal) _
      val pool = space.sobol(candidatePool, seed, skip = poolSkip)
      poolSkip += candidatePool
      val bestU = pool.maxBy { u =>
        val (m, v) = gp.predict(u); acq(m, v)
      }
      space.fromUnit(bestU)
    }
  }
}

/** Entry point mirroring the driver hookup
  * (GameTrainingDriver.runHyperparameterTuning:677-726): mode ∈
  * {"random", "bayesian"}, n total trials, lower-is-better evaluation. */
object Tuner {
  def tune(mode: String, space: ParamSpace, evalFn: EvaluationFunction,
           n: Int, seed: Long = 0L, priors: Seq[Trial] = Nil): Trial = {
    val s = mode.toLowerCase match {
      case "bayesian" | "gp" => new GaussianProcessSearch(space, evalFn, seed)
      case _ => new RandomSearch(space, evalFn, seed)
    }
    s.withPriors(priors).find(n)
  }
}
