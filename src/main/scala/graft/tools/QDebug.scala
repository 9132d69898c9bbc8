package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch harness for plan inspection and query timing experiments. */
object QDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name: ${(System.nanoTime() - t0) / 1e9}%.1fs ($n rows)")
    }

    args.drop(1).foreach { q =>
      time(q) {
        val df = graft.SparkEntry.queries(q)(spark, d)
        df.queryExecution.toRdd.count()
      }
    }
    spark.stop()
  }
}
