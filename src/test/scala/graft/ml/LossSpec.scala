package graft.ml

import org.scalatest.funsuite.AnyFunSuite

/** Loss derivative checks against central finite differences over a value
  * grid — the same strategy the reference uses for its loss tests. */
class LossSpec extends AnyFunSuite {

  private val grid = BigDecimal(-8.0) to BigDecimal(8.0) by BigDecimal(0.37)
  private val zs = grid.map(_.toDouble)
  private val eps = 1e-6

  def checkDerivatives(loss: PointwiseLoss, y: Double,
                       skip: Double => Boolean = _ => false): Unit =
    zs.filterNot(skip).foreach { z =>
      val (_, dz) = loss.lossAndDz(z, y)
      val (lPlus, dzPlus) = loss.lossAndDz(z + eps, y)
      val (lMinus, dzMinus) = loss.lossAndDz(z - eps, y)
      val fd = (lPlus - lMinus) / (2 * eps)
      val scale = math.max(1.0, math.abs(dz))
      assert(math.abs(dz - fd) / scale < 1e-4,
        s"dz mismatch at z=$z y=$y: $dz vs fd $fd")
      val fd2 = (dzPlus - dzMinus) / (2 * eps)
      val scale2 = math.max(1.0, math.abs(fd2))
      assert(math.abs(loss.d2z(z, y) - fd2) / scale2 < 1e-3,
        s"d2z mismatch at z=$z y=$y: ${loss.d2z(z, y)} vs fd $fd2")
    }

  test("logistic loss derivatives match finite differences") {
    checkDerivatives(LogisticLoss, 0.0)
    checkDerivatives(LogisticLoss, 1.0)
  }
  test("squared loss derivatives match finite differences") {
    checkDerivatives(SquaredLoss, 2.5)
  }
  test("poisson loss derivatives match finite differences") {
    checkDerivatives(PoissonLoss, 3.0)
  }
  test("smoothed hinge derivatives match finite differences away from kinks") {
    def nearKink(z: Double): Boolean =
      math.abs(z) < 0.01 || math.abs(math.abs(z) - 1.0) < 0.01
    checkDerivatives(SmoothedHingeLoss, 1.0, skip = nearKink)
    checkDerivatives(SmoothedHingeLoss, 0.0, skip = nearKink)
  }
  test("log1pExp is stable and correct") {
    assert(math.abs(PointwiseLoss.log1pExp(0.0) - math.log(2)) < 1e-12)
    assert(PointwiseLoss.log1pExp(800.0) == 800.0)
    assert(math.abs(PointwiseLoss.log1pExp(-800.0)) < 1e-12)
    assert(math.abs(PointwiseLoss.sigmoid(0.0) - 0.5) < 1e-12)
  }
  test("means apply the inverse link") {
    assert(math.abs(LogisticLoss.mean(0.0) - 0.5) < 1e-12)
    assert(SquaredLoss.mean(3.25) == 3.25)
    assert(math.abs(PoissonLoss.mean(1.0) - math.E) < 1e-12)
  }
}
