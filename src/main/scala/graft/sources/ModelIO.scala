package graft.sources

import graft.ml.CoordinateDescent._
import graft.ml._
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** GAME model persistence (S8: ModelProcessingUtils.saveGameModelToHDFS /
  * loadGameModelFromHDFS, photon-client/.../avro/ModelProcessingUtils
  * .scala:77-265): per-coordinate directories
  * (`fixed-effect/<id>`, `random-effect/<id>`) plus a metadata JSON.
  * Coefficients are stored as parquet tables (the Spark-native form of the
  * reference's BayesianLinearModelAvro), so loading a random-effect model
  * is a distributed scan, never a driver collect.
  */
object ModelIO {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def writeText(spark: SparkSession, path: String,
                        content: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    out.write(content.getBytes("UTF-8"))
    out.close()
  }

  private def readText(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    val s = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    in.close()
    s
  }

  private def q(s: String) = "\"" + s + "\""

  /** Save a GAME model. `sparsityThreshold` zeroes |w| below the threshold
    * at save time (P8, modelSparsityThreshold). */
  def saveGame(spark: SparkSession, model: GameModel, dir: String,
               sparsityThreshold: Double = 0.0): Unit = {
    import spark.implicits._
    val metas = model.coordinates.map { case (id, coord) =>
      coord match {
        case TrainedFixed(spec, m) =>
          // variances (when computed) ride along per coefficient; the
          // intercept's variance is the feature_idx = -1 row — incremental
          // retraining needs them back (GaussianPrior)
          val kept = m.coef.zipWithIndex.filter {
            case (wgt, _) => math.abs(wgt) >= sparsityThreshold
          }.map { case (wgt, i) =>
            (i, wgt, m.variances.map(v => v(i)).getOrElse(0.0))
          }
          val rows = m.variances match {
            case Some(v) if v.length > spec.featureDim =>
              kept :+ ((-1, m.intercept, v(spec.featureDim)))
            case _ => kept
          }
          rows.toSeq.toDF("feature_idx", "weight", "variance")
            .write.mode("overwrite").parquet(s"$dir/fixed-effect/$id")
          Seq("fixed-effect", id, spec.featuresCol, spec.featureDim.toString,
            m.lossName, m.intercept.toString, "")
        case TrainedRandom(spec, models) =>
          val zero = udf { (coef: Seq[Double]) =>
            coef.map(w => if (math.abs(w) >= sparsityThreshold) w else 0.0)
          }
          models.withColumn("coef", zero(col("coef")))
            .write.mode("overwrite").parquet(s"$dir/random-effect/$id")
          Seq("random-effect", id, spec.featuresCol,
            spec.featureDim.toString, Glm.lossName(spec.cfg.loss), "0.0",
            spec.reIdCol)
      }
    }
    val json = metas.map(m =>
      s"""{"kind":${q(m(0))},"id":${q(m(1))},"featuresCol":${q(m(2))},
         |"featureDim":${m(3)},"loss":${q(m(4))},"intercept":${m(5)},
         |"reIdCol":${q(m(6))}}""".stripMargin.replaceAll("\n", ""))
      .mkString("[", ",", "]")
    writeText(spark, s"$dir/metadata.json", json)
  }

  /** Load a GAME model saved by [[saveGame]]. */
  def loadGame(spark: SparkSession, dir: String): GameModel = {
    import spark.implicits._
    val json = readText(spark, s"$dir/metadata.json")
    // metadata is machine-written with a fixed field order — parse by
    // regex; the intercept alternation covers diverged fits (NaN/±Inf),
    // and the entry-count check below makes any parse miss LOUD instead
    // of silently dropping a coordinate from the scoring sum
    val entry = ("""\{"kind":"([^"]*)","id":"([^"]*)","featuresCol":"([^"]*)",""" +
      """"featureDim":(\d+),"loss":"([^"]*)","intercept":([-0-9.eE]+|NaN|-?Infinity),""" +
      """"reIdCol":"([^"]*)"\}""").r
    val expected = "\"kind\":".r.findAllMatchIn(json).size
    val parsed = entry.findAllMatchIn(json).toSeq
    require(parsed.size == expected,
      s"metadata.json has $expected coordinate entries but only " +
        s"${parsed.size} parsed — refusing to load a partial GAME model")
    val coords = parsed.iterator.map { m =>
      val (kind, id, featuresCol, dim, loss, intercept, reIdCol) =
        (m.group(1), m.group(2), m.group(3), m.group(4).toInt, m.group(5),
          m.group(6).toDouble, m.group(7))
      val coord: TrainedCoordinate = kind match {
        case "fixed-effect" =>
          val df = spark.read.parquet(s"$dir/fixed-effect/$id")
          val hasVar = df.columns.contains("variance")
          val rows = df.collect()
          val coef = new Array[Double](dim)
          rows.filter(_.getInt(0) >= 0)
            .foreach(r => coef(r.getInt(0)) = r.getDouble(1))
          val variances =
            if (hasVar && rows.exists(_.getInt(0) == -1)) {
              val v = new Array[Double](dim + 1)
              rows.foreach { r =>
                val i = r.getInt(0)
                if (i >= 0) v(i) = r.getDouble(2) else v(dim) = r.getDouble(2)
              }
              Some(v)
            } else None
          TrainedFixed(FixedSpec(id, featuresCol, dim,
            GlmConfig(PointwiseLoss.fromName(loss))),
            GlmModel(coef, intercept, loss, variances))
        case "random-effect" =>
          val df0 = spark.read.parquet(s"$dir/random-effect/$id")
          // saves from before per-entity variances lack the column
          val df = if (df0.columns.contains("variances")) df0
          else df0.withColumn("variances",
            lit(null).cast("array<double>"))
          TrainedRandom(RandomSpec(id, reIdCol, featuresCol, dim,
            GlmConfig(PointwiseLoss.fromName(loss))), df)
      }
      id -> coord
    }.toMap
    GameModel(coords)
  }

  /** Score sink (S7: ScoreProcessingUtils.saveScoredItemsToHDFS with the
    * coalesce(outputFilesLimit) of GameScoringDriver.scala:242-246). */
  def saveScores(df: org.apache.spark.sql.DataFrame, dir: String,
                 modelId: String, outputFilesLimit: Int = 0): Unit = {
    val out = df.withColumn("modelId", lit(modelId))
    val limited = if (outputFilesLimit > 0) out.coalesce(outputFilesLimit)
    else out
    limited.write.mode("overwrite").parquet(dir)
  }
}
