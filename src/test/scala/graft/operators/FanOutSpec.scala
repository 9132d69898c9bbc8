package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

/** Contract of the small-input scan fan-out (Tables.fanOut): it exists
  * ONLY to rescue under-split fixture scans — on production-shaped
  * multi-split input it must be a plan-time no-op, and the conf switch
  * the plan-gate suites rely on must actually disable it. */
class FanOutSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val f = java.io.File.createTempFile(name, "")
    f.delete()
    f.getAbsolutePath
  }

  test("single-split scan fans out to default parallelism") {
    spark.conf.set("spark.graft.fanout", "true")
    val p = tmp("fanout1")
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .coalesce(1).write.parquet(p)
    val df = Tables.fanOut(spark.read.parquet(p), "k")
    assert(df.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
  }

  test("multi-split scan is left untouched (the at-scale no-op)") {
    spark.conf.set("spark.graft.fanout", "true")
    val p = tmp("fanout2")
    spark.range(1000).select(col("id").as("k"), (col("id") * 2).as("v"))
      .repartition(8).write.parquet(p)
    // 8 files ≥ defaultParallelism/2 (4-core spec session) → no repartition
    val scan = spark.read.parquet(p)
    val before = scan.rdd.getNumPartitions
    val df = Tables.fanOut(scan, "k")
    assert(df.rdd.getNumPartitions == before)
    assert(!graft.sources.Bucketing.hasShuffle(df))
  }

  test("spark.graft.fanout=false disables the repartition entirely") {
    val p = tmp("fanout3")
    spark.range(100).select(col("id").as("k")).coalesce(1).write.parquet(p)
    spark.conf.set("spark.graft.fanout", "false")
    try {
      val df = Tables.fanOut(spark.read.parquet(p), "k")
      assert(!graft.sources.Bucketing.hasShuffle(df))
    } finally spark.conf.set("spark.graft.fanout", "true")
  }

  test("fan-out preserves row multiset") {
    spark.conf.set("spark.graft.fanout", "true")
    val p = tmp("fanout4")
    spark.range(500).select(col("id").as("k"), (col("id") % 7).as("v"))
      .coalesce(1).write.parquet(p)
    val got = Tables.fanOut(spark.read.parquet(p), "k")
      .groupBy().agg(count(lit(1)), sum("k"), sum("v")).collect()(0)
    assert(got.getLong(0) == 500 && got.getLong(1) == 500L * 499 / 2)
  }
}
