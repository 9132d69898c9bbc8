package graft.ml

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One-pass summary strings for driver logging (A11, reference
  * FixedEffectDataset.toSummaryString:124-136 and
  * RandomEffectModel.toSummaryString:105-118). Each summary is exactly
  * one distributed aggregation — never a collect of the data.
  */
object Summaries {

  /** Dataset summary: rows, weight mass, label range/mean, positive
    * rate (for binary labels). */
  def dataSummary(df: DataFrame, label: String = "label",
                  weight: String = "weight"): String = {
    val r = df.agg(
      count(lit(1)).as("n"),
      sum(col(weight)).as("wsum"),
      min(col(label)).as("lmin"),
      max(col(label)).as("lmax"),
      avg(col(label)).as("lmean"),
      avg(when(col(label) > 0.5, 1.0).otherwise(0.0)).as("posRate"))
      .first()
    s"samples=${r.getLong(0)} weightSum=${r.getDouble(1)} " +
      s"label=[${r.getDouble(2)}, ${r.getDouble(3)}] " +
      s"labelMean=${r.getDouble(4)} positiveRate=${r.getDouble(5)}"
  }

  /** Random-effect model summary: entity count plus distribution of the
    * per-entity coefficient L2 norms — one aggregation over the models
    * table (never collected). */
  def reModelSummary(models: DataFrame): String = {
    val withNorm = models.select(
      sqrt(aggregate(col("coef"), lit(0.0), (a, x) => a + x * x) +
        col("intercept") * col("intercept")).as("norm"))
    val r = withNorm.agg(count(lit(1)).as("n"), min("norm"), avg("norm"),
      max("norm")).first()
    s"entities=${r.getLong(0)} coefNorm(min/mean/max)=" +
      s"${r.getDouble(1)}/${r.getDouble(2)}/${r.getDouble(3)}"
  }
}
