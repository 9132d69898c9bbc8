package graft.ml

import graft.operators.Validators
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L19 per-model validation suite (reference photon-api integTest
  * supervised *Validator.scala files: every prediction finite, metric floors
  * like an AUC threshold). Runs post-training over a scored frame;
  * violations fail the training run instead of silently publishing a
  * bad model. Metric direction follows [[Evaluators.betterThan]]:
  * auc/aupr are floors, losses/rmse are ceilings.
  */
object ModelValidators {

  case class MetricBound(metric: String, bound: Double)

  /** Parse a CLI bound spec: "auc:0.6,rmse:10". */
  def parseBounds(s: String): Seq[MetricBound] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { part =>
      val i = part.lastIndexOf(':')
      require(i > 0, s"bad metric bound '$part' (want metric:value)")
      MetricBound(part.substring(0, i), part.substring(i + 1).toDouble)
    }.toSeq

  /** Violation messages, empty = model valid. One count job for the
    * finite check plus one aggregate per bounded metric. */
  def check(scored: DataFrame, scoreCol: String, labelCol: String,
            bounds: Seq[MetricBound]): Seq[String] = {
    val nBad = scored.filter(Validators.notFinite(col(scoreCol))).count()
    val finite =
      if (nBad > 0) Seq(s"non_finite_predictions=$nBad") else Nil
    finite ++ bounds.flatMap { b =>
      val v = b.metric.toLowerCase match {
        case "auc" => Evaluators.auc(scored, scoreCol, labelCol)
        case "aupr" => Evaluators.aupr(scored, scoreCol, labelCol)
        case "rmse" => Evaluators.rmse(scored, scoreCol, labelCol)
        case "mae" => Evaluators.mae(scored, scoreCol, labelCol)
        case "logistic_loss" =>
          Evaluators.logisticLoss(scored, scoreCol, labelCol)
        case "squared_loss" =>
          Evaluators.squaredLoss(scored, scoreCol, labelCol)
        case other =>
          throw new IllegalArgumentException(s"unknown metric: $other")
      }
      val ok =
        if (v.isNaN) false
        else if (Evaluators.betterThan(b.metric, 1.0, 0.0)) v >= b.bound
        else v <= b.bound
      if (ok) None else Some(s"${b.metric}=$v violates bound ${b.bound}")
    }
  }

  /** Throw unless the model clears every bound (the reference's
    * validator behavior: a failing model aborts the run). */
  def enforce(scored: DataFrame, scoreCol: String, labelCol: String,
              bounds: Seq[MetricBound]): Unit = {
    val bad = check(scored, scoreCol, labelCol, bounds)
    if (bad.nonEmpty)
      throw new IllegalStateException(
        "model validation failed: " + bad.mkString("; "))
  }
}
