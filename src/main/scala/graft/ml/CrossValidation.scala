package graft.ml

import graft.util.Exact
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** K-fold cross-validation for GLMs.
  *
  * The reference validates on a held-out dataset per lambda
  * (photon-client GameTrainingDriver's validation flow); k-fold is the
  * small-data/protocol-rigorous extension: train k models, each on
  * k−1 folds, score the held-out fold, report per-fold metrics.
  *
  * Scale shape: the input is cached ONCE and every fold's train/test
  * split is a filter over it — k passes over cached data, never k
  * materialized copies. Each fold's training runs the same distributed
  * objective aggregates as a full fit ([[Glm.train]]); per-fold results
  * are k tiny rows assembled driver-side (k, not data, sized).
  *
  * Determinism: the held-out RMSE is computed from coefficients ROUNDED
  * to 6dp — the solver's last-ulp wobble (vs e.g. a closed-form
  * reproduction in another engine) would otherwise leak into every
  * prediction; with both sides scoring from identical rounded doubles,
  * per-row squared errors agree bitwise and their 9dp-decimal sum is
  * order-independent.
  */
object CrossValidation {

  /** One row per fold: (fold, n_train, n_test, coef array rounded 6dp,
    * intercept rounded 6dp, rmse rounded 6dp).
    *
    * `data` must carry `foldCol` (0 until k) plus the LabeledPoint
    * columns (label, features, offset, weight). */
  def kfoldGlm(data: DataFrame, foldCol: String, k: Int, featureDim: Int,
               cfg: GlmConfig, solver: String = "tron"): DataFrame = {
    require(k >= 2, "k-fold needs k >= 2")
    val spark = data.sparkSession
    import spark.implicits._
    val cached = data.persist(org.apache.spark.storage.StorageLevel
      .MEMORY_AND_DISK)
    try {
      val total = cached.count()
      val rows = (0 until k).map { f =>
        val train = cached.filter(col(foldCol) =!= f)
          .select("label", "features", "offset", "weight")
          .as[LabeledPoint]
        val test = cached.filter(col(foldCol) === f)
        val m = Glm.train(train, featureDim, cfg, solver)
        def r6(x: Double): Double =
          BigDecimal(x + 1e-9).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble
        val coefR = m.coef.map(r6)
        val intR = r6(m.intercept)
        val bc = spark.sparkContext.broadcast((coefR, intR))
        val sqerr = udf { (v: org.apache.spark.ml.linalg.Vector,
                           y: Double, off: Double) =>
          val (w, b) = bc.value
          val pred = GlmMath.dot(w, v) + b + off
          val e = y - pred
          e * e
        }
        val agg = test.agg(
          count(lit(1)).as("n"),
          sum(Exact.dec(round(sqerr(col("features"), col("label"),
            col("offset")), 9), 18, 9)).cast("double").as("sse"))
          .head()
        val nTest = agg.getLong(0)
        val rmse = r6(math.sqrt(agg.getDouble(1) / nTest))
        Row(f, total - nTest, nTest, coefR.toSeq, intR, rmse)
      }
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1),
        StructType(Seq(
          StructField("fold", IntegerType, nullable = false),
          StructField("n_train", LongType, nullable = false),
          StructField("n_test", LongType, nullable = false),
          StructField("coef", ArrayType(DoubleType), nullable = false),
          StructField("intercept", DoubleType, nullable = false),
          StructField("rmse", DoubleType, nullable = false))))
    } finally { cached.unpersist(false); () }
  }
}
