package graft.ml

/** Pointwise GLM loss functions.
  *
  * Same task surface as the reference (photon-lib/.../function/glm/
  * LogisticLossFunction.scala:47-84, SquaredLossFunction.scala:43-55,
  * PoissonLossFunction.scala:41-53, photon-api/.../function/svm/
  * SmoothedHingeLossFunction.scala:34-97): each loss exposes value and
  * first/second derivatives with respect to the margin z = w·x + offset,
  * which is all the distributed aggregators need.
  */
sealed trait PointwiseLoss extends Serializable {
  /** (loss(z, y), dLoss/dz) */
  def lossAndDz(z: Double, y: Double): (Double, Double)
  /** d²Loss/dz² (for Hessian aggregation) */
  def d2z(z: Double, y: Double): Double
  /** inverse link: E[y|z] for scoring */
  def mean(z: Double): Double
}

object PointwiseLoss {
  /** Numerically stable log(1 + e^x) (MathUtils.log1pExp equivalent). */
  def log1pExp(x: Double): Double =
    if (x > 0) x + math.log1p(math.exp(-x)) else math.log1p(math.exp(x))

  def sigmoid(x: Double): Double =
    if (x >= 0) 1.0 / (1.0 + math.exp(-x))
    else { val e = math.exp(x); e / (1.0 + e) }

  def fromName(name: String): PointwiseLoss = name.toLowerCase match {
    case "logistic" => LogisticLoss
    case "squared" | "linear" => SquaredLoss
    case "poisson" => PoissonLoss
    case "smoothed_hinge" | "svm" => SmoothedHingeLoss
    case other => throw new IllegalArgumentException(s"unknown loss: $other")
  }
}

/** Binary cross-entropy on labels {0,1}. */
case object LogisticLoss extends PointwiseLoss {
  import PointwiseLoss._
  def lossAndDz(z: Double, y: Double): (Double, Double) =
    if (y > 0.5) (log1pExp(-z), -sigmoid(-z)) else (log1pExp(z), sigmoid(z))
  def d2z(z: Double, y: Double): Double = {
    val s = sigmoid(z); s * (1.0 - s)
  }
  def mean(z: Double): Double = sigmoid(z)
}

/** 0.5*(z-y)^2 — linear regression. */
case object SquaredLoss extends PointwiseLoss {
  def lossAndDz(z: Double, y: Double): (Double, Double) = {
    val d = z - y; (0.5 * d * d, d)
  }
  def d2z(z: Double, y: Double): Double = 1.0
  def mean(z: Double): Double = z
}

/** e^z - y*z — Poisson regression (negative log-likelihood, dropping
  * the label-only term). */
case object PoissonLoss extends PointwiseLoss {
  def lossAndDz(z: Double, y: Double): (Double, Double) = {
    val ez = math.exp(z); (ez - y * z, ez - y)
  }
  def d2z(z: Double, y: Double): Double = math.exp(z)
  def mean(z: Double): Double = math.exp(z)
}

/** Rennie's smoothed hinge on labels {0,1} mapped to {-1,+1}:
  * quadratic for margin in (0,1), linear below 0, zero above 1. */
case object SmoothedHingeLoss extends PointwiseLoss {
  def lossAndDz(z: Double, y: Double): (Double, Double) = {
    val t = if (y > 0.5) 1.0 else -1.0
    val m = z * t
    if (m >= 1.0) (0.0, 0.0)
    else if (m <= 0.0) (0.5 - m, -t)
    else { val d = 1.0 - m; (0.5 * d * d, -t * d) }
  }
  def d2z(z: Double, y: Double): Double = {
    val t = if (y > 0.5) 1.0 else -1.0
    val m = z * t
    if (m > 0.0 && m < 1.0) 1.0 else 0.0
  }
  def mean(z: Double): Double = z
}
