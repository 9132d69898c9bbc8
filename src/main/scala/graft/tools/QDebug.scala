package graft.tools

import graft.Tables
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

    val docs = Tables.documents(spark, d)

    // variant A: current implementation
    time("A current") {
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        3, 0.01).count()
    }

    // variant B: pre-materialized shingle hashes (no recompute across join)
    time("B cached-proj") {
      val sh = docs.select(col("source").as("block"), col("doc_id").as("id"),
        sort_array(array_distinct(transform(TF.shingles(col("text"), 3),
          s => xxhash64(s)))).as("sh")).cache()
      sh.count()
      val inter = udf { (a: Seq[Long], b: Seq[Long]) =>
        var i = 0; var j = 0; var c = 0
        while (i < a.length && j < b.length) {
          if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
          else if (a(i) < b(j)) i += 1 else j += 1
        }
        c
      }
      val l = sh.select(col("block"), col("id").as("id_a"), col("sh").as("sh_a"))
      val r = sh.select(col("block"), col("id").as("id_b"), col("sh").as("sh_b"))
      val n = l.join(r, Seq("block")).filter(col("id_a") < col("id_b"))
        .withColumn("_i", inter(col("sh_a"), col("sh_b")))
        .select((col("_i").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("_i"))).as("j"))
        .filter(col("j") >= 0.01).count()
      sh.unpersist()
      n
    }

    graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", "source",
      3, 0.01).explain("formatted")

    spark.stop()
  }
}
