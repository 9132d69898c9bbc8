package graft
import org.apache.spark.sql.SparkSession
object Bench {
  private def jsonEscape(s: String): String = graft.util.JsonText.escape(s)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // contract: bench runs at local[32] (override via SPARK_GRAFT_CPUS)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    // warm the JVM (codegen compiler, parquet reader, shuffle paths) on
    // a small query first so the one-time JIT cost isn't attributed to
    // whichever query happens to iterate first (~5s of noise otherwise)
    try SparkEntry.queries("q13_region_revenue")(spark, sfDir)
      .queryExecution.toRdd.foreach(_ => ())
    catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // materialize EVERY output column: a bare count() lets Catalyst
      // prune projection-only plans down to a row count, so pure-map
      // queries would measure nothing
      try { fn(spark, sfDir).queryExecution.toRdd.foreach(_ => ()) }
      catch {
        case e: Throwable =>
          // a failed query must show up as a failure, not as a fast time
          errors(name) = e.getClass.getName + ": " +
            Option(e.getMessage).getOrElse("").take(300)
          System.err.println(s"BENCH FAILURE $name: $e")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, v) =>
      "\"" + k + "\":\"" + jsonEscape(v) + "\""
    }.mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
    if (errors.nonEmpty) sys.exit(1)
  }
}
