package graft.tools

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for plan inspection and query timing experiments. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
    }

    val docs = graft.Tables.documents(spark, d)
    val sh = docs.select(col("source").as("block"),
      col("doc_id").as("id"),
      sort_array(array_distinct(transform(TF.shingles(col("text"), 3),
        s => xxhash64(s)))).as("sh"))
      .persist()

    time("shingle+hash build") { sh.count() }
    time("shingle sizes") {
      sh.agg(sum(size(col("sh")))).first().getLong(0)
    }
    val prefixLen = (size(col("sh")) -
      ceil(lit(0.01) * size(col("sh"))) + 1).cast("int")
    val ex = sh.select(col("block"), col("id"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("h"))
    time("exploded prefix rows") { ex.count() }
    time("posting sq (join size)") {
      ex.groupBy("block", "h").agg(count(lit(1)).as("n"))
        .agg(sum(col("n") * col("n"))).first().getLong(0)
    }
    val cands = ex.select(col("block"), col("h"), col("id").as("id_a"))
      .join(ex.select(col("block"), col("h"), col("id").as("id_b")),
        Seq("block", "h"))
      .filter(col("id_a") < col("id_b"))
      .select("block", "id_a", "id_b")
    time("raw candidate rows") { cands.count() }
    time("distinct candidates") { cands.distinct().count() }
    time("full q26") {
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        3, 0.01).count()
    }
    spark.stop()
  }
}
