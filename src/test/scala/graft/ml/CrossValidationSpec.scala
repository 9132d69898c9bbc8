package graft.ml

import graft.SparkSpec
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._

class CrossValidationSpec extends SparkSpec {

  test("kfoldGlm: perfect linear data recovers the line with ~zero held-out RMSE") {
    import spark.implicits._
    // y = 2x + 1 exactly; any train subset solves to the same line, so
    // every fold's held-out RMSE must vanish
    val data = (1 to 60).map { i =>
      val x = (i % 13).toDouble
      (i % 3, 2.0 * x + 1.0, Vectors.dense(x), 0.0, 1.0)
    }.toDF("fold", "label", "features", "offset", "weight")
    val res = CrossValidation.kfoldGlm(data, "fold", 3, 1,
      GlmConfig(SquaredLoss, l2 = 0.0, maxIter = 50, tol = 1e-12),
      "normal")
      .collect().map(r => r.getInt(0) ->
        ((r.getLong(1), r.getLong(2), r.getSeq[Double](3).head,
          r.getDouble(4), r.getDouble(5)))).toMap
    assert(res.keySet == Set(0, 1, 2))
    res.values.foreach { case (nTr, nTe, w, b, rmse) =>
      assert(nTr + nTe == 60 && nTe == 20)
      assert(math.abs(w - 2.0) < 1e-6, s"slope $w")
      assert(math.abs(b - 1.0) < 1e-6, s"intercept $b")
      assert(rmse < 1e-6, s"rmse $rmse")
    }
  }

  test("kfoldGlm: each fold's model equals a direct fit on its complement") {
    import spark.implicits._
    val data = (1 to 90).map { i =>
      val x = ((i * 7) % 11).toDouble - 5.0
      (i % 3, x * 1.5 + ((i * 13) % 7).toDouble, Vectors.dense(x), 0.0, 1.0)
    }.toDF("fold", "label", "features", "offset", "weight")
    val cfg = GlmConfig(SquaredLoss, l2 = 0.1, maxIter = 50, tol = 1e-12)
    val res = CrossValidation.kfoldGlm(data, "fold", 3, 1, cfg, "normal")
      .collect().map(r => r.getInt(0) ->
        ((r.getSeq[Double](3).head, r.getDouble(4)))).toMap
    (0 until 3).foreach { f =>
      val direct = Glm.train(
        data.filter(col("fold") =!= f)
          .select("label", "features", "offset", "weight")
          .as[LabeledPoint], 1, cfg, "normal")
      assert(math.abs(res(f)._1 - direct.coef(0)) < 1e-6)
      assert(math.abs(res(f)._2 - direct.intercept) < 1e-6)
    }
  }
}
