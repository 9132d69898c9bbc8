package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway micro-experiments (not part of any query path). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = graft.util.SessionTuning(SparkSession.builder())
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.range(100000).select(col("id").as("uid"),
      (col("id") % 97).cast("double").as("x"))
    def keyed(salt: Int) = df.groupBy("uid")
      .agg(sum(col("x") * salt).as("score"))
    for (aqe <- Seq("true", "false")) {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      val a = keyed(1).localCheckpoint(true)
      val b = keyed(2).localCheckpoint(true)
      val joined = graft.operators.ScoreAlgebra.add(a, b, "uid")
      val plan = joined.queryExecution.executedPlan.toString()
      val nEx = "Exchange".r.findAllIn(plan).size
      println(s"=== AQE=$aqe exchanges_in_add_of_checkpointed=$nEx")
      println(plan.linesIterator.take(25).mkString("\n"))
    }
    spark.stop()
  }
}
