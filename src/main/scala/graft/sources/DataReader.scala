package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reader façade (S2, reference photon-client/.../data/DataReader
  * .scala:27-329): one entry point covering the reference's 12 overload
  * matrix — single path or many, with or without pre-built index maps,
  * with or without an intercept term, Avro or parquet — returning the
  * merged DataFrame plus the index maps actually used (so follow-up
  * reads of validation/scoring data reuse the training vocabulary).
  */
class DataReader(spark: SparkSession, format: String = "avro") {

  /** Raw read, no feature merging (DataReader.read overloads without
    * featureShardConfigurations). */
  def read(path: String): DataFrame = read(Seq(path))

  def read(paths: Seq[String], numPartitions: Int = 0): DataFrame =
    format match {
      // avro parallelism is set at SCAN time (minPartitions) — a
      // repartition would shuffle the full dataset for the same effect
      case "avro" => AvroIO.read(spark, paths, numPartitions)
      case f =>
        val df = spark.read.format(f).load(paths: _*)
        if (numPartitions > 0) df.repartition(numPartitions) else df
    }

  /** Read + merge feature bags into one vector column per shard
    * (DataReader.readMerged overload matrix). `indexMaps` carries a
    * pre-built vocabulary per shard (training → validation reuse);
    * missing shards build theirs from the data. `addIntercept` appends
    * the reference's constant intercept feature to every shard's bags
    * before indexing (INTERCEPT_KEY semantics) — off by default because
    * the GLM layer models the intercept explicitly. */
  def readMerged(paths: Seq[String], shards: Map[String, Seq[String]],
                 indexMaps: Map[String, DataFrame] = Map.empty,
                 numPartitions: Int = 0,
                 addIntercept: Boolean = false)
  : (DataFrame, Map[String, DataFrame]) = {
    val raw = read(paths, numPartitions)
    val withIntercept =
      if (!addIntercept) raw
      else shards.values.flatten.toSeq.distinct.foldLeft(raw) { (acc, bag) =>
        val bagType = acc.schema(bag).dataType
        acc.withColumn(bag, concat(
          coalesce(col(bag), array().cast(bagType)),
          array(struct(lit("(INTERCEPT)").as("name"), lit("").as("term"),
            lit(1.0).as("value"))).cast(bagType)))
      }
    FeatureVectorizer.readMerged(withIntercept, shards, indexMaps)
  }

  def readMerged(path: String, shards: Map[String, Seq[String]])
  : (DataFrame, Map[String, DataFrame]) = readMerged(Seq(path), shards)

  /** Dedicated LibSVM scan (S4, reference photon-api/.../data/avro/
    * LibSVMInputDataFormat.scala:51-88): the built-in codegen'd libsvm
    * source, lifted to the trainer's column contract — label, VectorUDT
    * features, offset 0, weight 1 — so the result feeds `Glm.train`
    * directly. `numFeatures` > 0 fixes the dimension (multi-file reads
    * must agree on it, exactly the reference's featureDimension). */
  def readLibsvm(path: String, numFeatures: Int = 0): DataFrame = {
    val reader = spark.read.format("libsvm")
    val df =
      if (numFeatures > 0) reader.option("numFeatures", numFeatures).load(path)
      else reader.load(path)
    df.select(col("label").cast("double").as("label"), col("features"),
      lit(0.0).as("offset"), lit(1.0).as("weight"))
  }
}
