package graft.tools

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

    val emb = graft.Tables.embeddings(spark, d)
    time("emb count") { emb.count() }

    import graft.functions.{VectorOps => V}
    val d0 = emb.select(col("vec_id").as("id"), col("embedding").as("v"),
      V.lshBucket(col("embedding"), 4).as("bucket"))
      .persist()
    time("bucket build") { d0.count() }
    time("bucket histogram") {
      val h = d0.groupBy("bucket").count().collect()
      h.sortBy(-_.getLong(1)).take(8).foreach(r =>
        println(s"  bucket ${r.getInt(0)}: ${r.getLong(1)}"))
      h.length.toLong
    }
    val l = d0.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = d0.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    val pairs = l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
    time("candidate pairs") { pairs.count() }
    time("cosine verify") {
      pairs.select(V.cosine(col("v_a"), col("v_b")).as("c"))
        .filter(col("c") >= 0.25).count()
    }
    time("full q45") {
      graft.operators.Dedup.embeddingCosine(emb, "vec_id", "embedding",
        nBits = 4, threshold = 0.25).count()
    }
    time("full q45 again") {
      graft.operators.Dedup.embeddingCosine(emb, "vec_id", "embedding",
        nBits = 4, threshold = 0.25).count()
    }
    spark.stop()
  }
}
