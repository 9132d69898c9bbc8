package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AlignUnionSpec extends SparkSpec {
  import spark.implicits._

  test("aligns by name with null fills, first-seen column order") {
    val a = Seq((1L, "x")).toDF("id", "url")
    val b = Seq((2L, "book")).toDF("id", "isbn")
    val c = Seq(("t1", 3L)).toDF("thread_id", "id")
    val u = AlignUnion.unionAligned(Seq(a, b, c))
    assert(u.columns.toSeq == Seq("id", "url", "isbn", "thread_id"))
    val rows = u.orderBy("id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    assert(rows(0).getString(1) == "x" && rows(0).isNullAt(2))
    assert(rows(1).isNullAt(1) && rows(1).getString(2) == "book")
    assert(rows(2).getString(3) == "t1" && rows(2).isNullAt(1))
  }

  test("alignment is by name, not position") {
    // same columns, swapped order: values must not cross columns
    val a = Seq((1L, "s1")).toDF("id", "s")
    val b = Seq(("s2", 2L)).toDF("s", "id")
    val rows = AlignUnion.unionAligned(Seq(a, b)).orderBy("id").collect()
    assert(rows.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "s1"), (2L, "s2")))
  }

  test("conflicting types for a shared name fail fast") {
    val a = Seq((1L, "x")).toDF("id", "v")
    val b = Seq((2L, 3.0)).toDF("id", "v")
    val e = intercept[IllegalArgumentException] {
      AlignUnion.unionAligned(Seq(a, b))
    }
    assert(e.getMessage.contains("conflicting types"))
  }

  test("single input passes through unchanged") {
    val a = Seq((1L, "x")).toDF("id", "v")
    assert(AlignUnion.unionAligned(Seq(a)).collect().toSeq ==
      a.collect().toSeq)
  }
}
