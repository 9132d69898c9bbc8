package graft.ml

import graft.SparkSpec
import graft.operators.Validators
import org.apache.spark.sql.functions._

/** L19 model-validation polarity and bound-direction guarantees: the
  * finite-prediction check must FAIL on NaN/Inf/null scores (the exact
  * inversion bug `notFinite`'s old `finiteDouble` name invited), and
  * metric bounds must follow Evaluators.betterThan direction. */
class ModelValidatorsSpec extends SparkSpec {
  import spark.implicits._

  test("notFinite is a violation predicate: true only for unusable values") {
    val df = Seq(Some(1.0), Some(0.0), Some(Double.NaN),
      Some(Double.PositiveInfinity), Some(Double.NegativeInfinity), None)
      .toDF("x")
    val bad = df.filter(Validators.notFinite(col("x"))).count()
    val good = df.filter(!Validators.notFinite(col("x"))).count()
    assert(bad == 4 && good == 2)
  }

  test("a NaN-scoring model fails the finite check; a clean one passes") {
    val clean = Seq((0.9, 1.0), (0.2, 0.0), (0.7, 1.0), (0.1, 0.0))
      .toDF("score", "label")
    assert(ModelValidators.check(clean, "score", "label", Nil).isEmpty)
    val poisoned = clean.withColumn("score",
      when(col("label") === 0.0, lit(Double.NaN)).otherwise(col("score")))
    val msgs = ModelValidators.check(poisoned, "score", "label", Nil)
    assert(msgs.exists(_.contains("non_finite_predictions=2")), msgs)
    intercept[IllegalStateException] {
      ModelValidators.enforce(poisoned, "score", "label", Nil)
    }
  }

  test("metric bounds follow direction: auc is a floor, rmse a ceiling") {
    val df = Seq((0.9, 1.0), (0.8, 1.0), (0.3, 0.0), (0.1, 0.0))
      .toDF("score", "label") // auc = 1.0, rmse small
    assert(ModelValidators.check(df, "score", "label",
      ModelValidators.parseBounds("auc:0.9,rmse:1.0")).isEmpty)
    // unreachable floor fails
    val aucFail = ModelValidators.check(df, "score", "label",
      ModelValidators.parseBounds("auc:1.01"))
    assert(aucFail.exists(_.startsWith("auc=")))
    // absurdly tight ceiling fails
    val rmseFail = ModelValidators.check(df, "score", "label",
      ModelValidators.parseBounds("rmse:0.0001"))
    assert(rmseFail.exists(_.startsWith("rmse=")))
  }

  test("data validators accept arbitrary rule names and reject none") {
    import graft.operators.Validators
    val df = Seq(1.0, Double.NaN, 3.0).toDF("v")
    // dashes/quotes in rule names must not break the stack() melt SQL
    val out = Validators.check(df, Seq(
      Validators.Rule("finite-check's", Validators.notFinite(col("v")))))
      .collect()
    assert(out.length == 1)
    assert(out.head.getString(0) == "finite-check's")
    assert(out.head.getLong(1) == 1L)
    intercept[IllegalArgumentException](Validators.check(df, Seq.empty))
  }

  test("parseBounds handles lists and rejects malformed specs") {
    val b = ModelValidators.parseBounds("auc:0.6, rmse:10")
    assert(b == Seq(ModelValidators.MetricBound("auc", 0.6),
      ModelValidators.MetricBound("rmse", 10.0)))
    intercept[IllegalArgumentException](ModelValidators.parseBounds("auc"))
    intercept[IllegalArgumentException] {
      ModelValidators.check(Seq((1.0, 1.0)).toDF("score", "label"),
        "score", "label", ModelValidators.parseBounds("bogus:1"))
    }
  }
}
