package graft.ml

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed evaluation suite (photon-lib/.../evaluation/).
  *
  * Every evaluator consumes (score, label, weight) columns — the caller
  * attaches scores via the left-outer join the reference uses
  * (EvaluationSuite.evaluate:59-68). All metrics are single aggregation
  * passes or window ranks: nothing is collected to the driver, so they
  * hold at any scale.
  *
  * The AUC uses the average-rank Mann–Whitney statistic, which is exactly
  * the tie-aware trapezoidal AUC the reference computes locally
  * (AreaUnderROCCurveLocalEvaluator.scala:33-71).
  */
object Evaluators {

  private def w(weightCol: Option[String]): Column =
    weightCol.map(col).getOrElse(lit(1.0))

  def rmse(df: DataFrame, score: String, label: String,
           weightCol: Option[String] = None): Double = {
    val wc = w(weightCol)
    df.agg(sqrt(sum(wc * pow(col(score) - col(label), 2)) / sum(wc)))
      .first().getDouble(0)
  }

  def squaredLoss(df: DataFrame, score: String, label: String,
                  weightCol: Option[String] = None): Double =
    df.agg(sum(w(weightCol) * pow(col(score) - col(label), 2) * 0.5))
      .first().getDouble(0)

  def mae(df: DataFrame, score: String, label: String,
          weightCol: Option[String] = None): Double = {
    val wc = w(weightCol)
    df.agg(sum(wc * abs(col(score) - col(label))) / sum(wc))
      .first().getDouble(0)
  }

  /** Σ w·log(1+e^{-y'·z}) with y' ∈ {-1,1} — numerically stable form. */
  def logisticLoss(df: DataFrame, score: String, label: String,
                   weightCol: Option[String] = None): Double = {
    val z = col(score)
    val yz = when(col(label) > 0.5, z).otherwise(-z)
    // log1pExp(-yz), stable: max(-yz,0) + log1p(exp(-|yz|))
    val l = greatest(-yz, lit(0.0)) + log1p(exp(-abs(yz)))
    df.agg(sum(w(weightCol) * l)).first().getDouble(0)
  }

  def poissonLoss(df: DataFrame, score: String, label: String,
                  weightCol: Option[String] = None): Double =
    df.agg(sum(w(weightCol) * (exp(col(score)) - col(label) * col(score))))
      .first().getDouble(0)

  def smoothedHingeLoss(df: DataFrame, score: String, label: String,
                        weightCol: Option[String] = None): Double = {
    val t = when(col(label) > 0.5, lit(1.0)).otherwise(lit(-1.0))
    val m = col(score) * t
    val l = when(m >= 1.0, 0.0)
      .when(m <= 0.0, lit(0.5) - m)
      .otherwise(pow(lit(1.0) - m, 2) * 0.5)
    df.agg(sum(w(weightCol) * l)).first().getDouble(0)
  }

  /** Tie-aware AUROC via average ranks (unweighted rows). */
  def auc(df: DataFrame, score: String, label: String): Double =
    groupedAuc(df.withColumn("__g", lit(1)), "__g", score, label)
      .first().getDouble(1)

  /** Per-group tie-aware AUROC: (groupCol, auc) — the MultiEvaluator
    * building block. Groups with one class → null auc (filtered by mean).
    * Average rank for ties = rank + (tieCount-1)/2, all window math. */
  def groupedAuc(df: DataFrame, group: String, score: String,
                 label: String): DataFrame = {
    val byScore = Window.partitionBy(group).orderBy(col(score))
    val tieW = Window.partitionBy(group, score)
    df.select(col(group), col(score),
      when(col(label) > 0.5, 1L).otherwise(0L).as("__pos"))
      .withColumn("__avgRank",
        rank().over(byScore) + (count(lit(1)).over(tieW) - 1) / 2.0)
      .groupBy(group)
      .agg(sum(when(col("__pos") === 1, col("__avgRank"))).as("__sumR"),
        sum(col("__pos")).as("__p"), count(lit(1)).as("__n"))
      .select(col(group),
        when(col("__p") > 0 && col("__n") > col("__p"),
          (col("__sumR") - col("__p") * (col("__p") + 1) / 2.0) /
            (col("__p") * (col("__n") - col("__p"))))
          .as("auc"))
  }

  /** MultiEvaluator (E9): mean per-group AUC over groups with both
    * classes, after joining a group-id table on uid. */
  def meanGroupedAuc(scored: DataFrame, groupIds: DataFrame, uid: String,
                     group: String, score: String, label: String): Double =
    groupedAuc(scored.join(groupIds, uid), group, score, label)
      .agg(avg("auc")).first().getDouble(0)

  /** Precision@k per group then mean (E8). */
  def meanPrecisionAtK(df: DataFrame, group: String, score: String,
                       label: String, k: Int, tieBreak: String): Double = {
    val win = Window.partitionBy(group)
      .orderBy(col(score).desc, col(tieBreak))
    df.withColumn("__rn", row_number().over(win))
      .filter(col("__rn") <= k)
      .groupBy(group)
      .agg((sum(when(col(label) > 0.5, 1.0).otherwise(0.0)) / k)
        .as("__pk"))
      .agg(avg("__pk")).first().getDouble(0)
  }

  /** Best-model selection comparator (EvaluatorType.scala:54-66). */
  def betterThan(metric: String, a: Double, b: Double): Boolean =
    metric.toLowerCase match {
      case "auc" | "aupr" | "precision_at_k" => a > b
      case _ => a < b // losses / rmse: lower is better
    }
}
