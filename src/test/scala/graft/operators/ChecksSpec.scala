package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChecksSpec extends SparkSpec {
  import spark.implicits._

  private def report(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long, Long, Boolean)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("row-local rules evaluate in one scan with null-as-violation") {
    val df = Seq[(Option[Long], Option[Double], String)](
      (Some(1L), Some(5.0), "A"), (Some(2L), Some(500.0), "N"),
      (None, None, "X"), (Some(4L), Some(10.0), "R"))
      .toDF("id", "qty", "flag")
    val got = report(Checks.check(df, Seq(
      Checks.notNull("id"),
      Checks.inRange("qty", 0.0, 100.0),
      Checks.inSet("flag", Seq("A", "N", "R")))))
    assert(got("not_null_id") == ((4L, 1L, false)))
    // 500 out of range AND the null qty both violate
    assert(got("range_qty") == ((4L, 2L, false)))
    assert(got("in_set_flag") == ((4L, 1L, false)))
  }

  test("uniqueness counts rows beyond the first per duplicated key") {
    val df = Seq((1L, 1), (1L, 1), (1L, 2), (2L, 1), (2L, 1), (2L, 1))
      .toDF("k", "sub")
    val got = report(Checks.unique(df, Seq("k", "sub"), "uniq"))
    // (1,1) has 1 extra, (2,1) has 2 extras
    assert(got("uniq") == ((6L, 3L, false)))
  }

  test("foreignKey counts orphans including null keys") {
    val facts = Seq(Some(1L), Some(2L), Some(99L), None).toDF("fk")
    val dims = Seq(1L, 2L, 3L).toDF("pk")
    val got = report(
      Checks.foreignKey(facts, Seq("fk"), dims, Seq("pk"), "fk_dim"))
    assert(got("fk_dim") == ((4L, 2L, false))) // 99 and null
  }

  test("suite unions one row per rule and passes on clean data") {
    val df = Seq((1L, "A"), (2L, "N")).toDF("id", "flag")
    val ref = Seq(1L, 2L).toDF("id")
    val got = report(Checks.suite(df,
      Seq(Checks.notNull("id"), Checks.inSet("flag", Seq("A", "N"))),
      Seq(Checks.unique(df, Seq("id"), "uniq_id"),
        Checks.foreignKey(df, Seq("id"), ref, Seq("id"), "fk"))))
    assert(got.size == 4)
    assert(got.values.forall { case (n, v, p) => n == 2L && v == 0L && p })
  }
}
