package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch harness for plan inspection and query timing experiments. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
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
    time("q26 countJaccard (t=0.01)") {
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        3, 0.01).count()
    }
    time("q26 again") {
      graft.operators.Dedup.ngramJaccard(docs, "doc_id", "text", "source",
        3, 0.01).count()
    }
    spark.stop()
  }
}
