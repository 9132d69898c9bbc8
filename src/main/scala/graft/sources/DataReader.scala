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

  def read(paths: Seq[String], numPartitions: Int = 0): DataFrame = {
    val df = format match {
      case "avro" => AvroIO.read(spark, paths)
      case f => spark.read.format(f).load(paths: _*)
    }
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
}
