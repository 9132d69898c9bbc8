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

  test("collect_top_k is callable from pure SQL after registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", 5), ("a", 1), ("a", 3), ("a", 2), ("b", 9))
      .toDF("g", "x").createOrReplaceTempView("ctk_rows")
    val rows = spark.sql(
      "SELECT g, collect_top_k(x, 2, true) AS lo," +
        " collect_top_k(x, 2, false) AS hi" +
        " FROM ctk_rows GROUP BY g ORDER BY g").collect()
    assert(rows(0).getSeq[Int](1) == Seq(1, 2))
    assert(rows(0).getSeq[Int](2) == Seq(5, 3))
    assert(rows(1).getSeq[Int](1) == Seq(9))
    // the heap size must be a plan-time constant
    val e = intercept[Exception] {
      spark.sql("SELECT collect_top_k(x, x, true) FROM ctk_rows").collect()
    }
    assert(e.getMessage.contains("literal"))
  }

  test("index_set_union is callable from pure SQL after registration") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", Seq(3, 1)), ("a", Seq(1, 9)), ("b", Seq(0)))
      .toDF("g", "ix").createOrReplaceTempView("isu_rows")
    val rows = spark.sql(
      "SELECT g, index_set_union(ix) AS u FROM isu_rows" +
        " GROUP BY g ORDER BY g").collect()
    assert(rows(0).getSeq[Int](1) == Seq(1, 3, 9))
    assert(rows(1).getSeq[Int](1) == Seq(0))
  }

  test("index_set_union honors SQL DISTINCT and FILTER clauses") {
    // the registration returns the BARE aggregate function so the
    // analyzer applies its own AggregateExpression wrapping — the path
    // that implements DISTINCT / FILTER for registered functions
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(("a", Seq(3, 1), 1), ("a", Seq(3, 1), 1), ("a", Seq(9), 0),
      ("b", Seq(0), 1))
      .toDF("g", "ix", "keep").createOrReplaceTempView("isu_df_rows")
    val rows = spark.sql(
      "SELECT g, index_set_union(DISTINCT ix) AS d," +
        " index_set_union(ix) FILTER (WHERE keep = 1) AS f" +
        " FROM isu_df_rows GROUP BY g ORDER BY g").collect()
    assert(rows(0).getSeq[Int](1) == Seq(1, 3, 9)) // distinct input rows
    assert(rows(0).getSeq[Int](2) == Seq(1, 3))    // filtered out Seq(9)
    assert(rows(1).getSeq[Int](1) == Seq(0))
    assert(rows(1).getSeq[Int](2) == Seq(0))
  }

  test("constant parameters reject NULL and fractional literals") {
    GraftExtensions.register(spark)
    import spark.implicits._
    Seq(1, 2).toDF("x").createOrReplaceTempView("ck_lit_rows")
    val eNull = intercept[Exception] {
      spark.sql(
        "SELECT collect_top_k(x, NULL, true) FROM ck_lit_rows").collect()
    }
    assert(eNull.getMessage.contains("non-null"), eNull.getMessage)
    val eFrac = intercept[Exception] {
      spark.sql(
        "SELECT collect_top_k(x, 2.5, true) FROM ck_lit_rows").collect()
    }
    assert(eFrac.getMessage.contains("integral"), eFrac.getMessage)
    val eBool = intercept[Exception] {
      spark.sql(
        "SELECT collect_top_k(x, 2, 1) FROM ck_lit_rows").collect()
    }
    assert(eBool.getMessage.contains("boolean"), eBool.getMessage)
  }
}
