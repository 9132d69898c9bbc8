package graft

import org.apache.spark.sql.functions._

class GraftExtensionsSpec extends SparkSpec {

  test("token_count is callable from pure SQL after registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a b c", 3), ("  ", 0), ("one", 1))
      .toDF("s", "want").createOrReplaceTempView("tc_docs")
    val rows = spark.sql(
      "SELECT token_count(s) AS got, want FROM tc_docs").collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    // codegen path: the expression survives whole-stage codegen in SQL
    val n = spark.sql(
      "SELECT SUM(token_count(s)) AS total FROM tc_docs").head().getLong(0)
    assert(n == 4)
  }

  test("cosine_sim is callable from pure SQL after registration") {
    GraftExtensions.register(spark)
    val got = spark.sql(
      "SELECT cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c," +
        " cosine_sim(array(1.0d, 0.0d), array(0.0d, 2.0d)) AS o," +
        " cosine_sim(array(1.0d), array(1.0d, 2.0d)) AS bad").head()
    assert(got.getDouble(0) == 1.0)
    assert(got.getDouble(1) == 0.0)
    assert(got.isNullAt(2))
    // int-array arguments coerce through the declared input types
    // instead of reading garbage off a mistyped buffer
    val coerced = spark.sql(
      "SELECT cosine_sim(array(1, 0), array(2, 0)) AS c").head()
    assert(coerced.getDouble(0) == 1.0)
  }
}
