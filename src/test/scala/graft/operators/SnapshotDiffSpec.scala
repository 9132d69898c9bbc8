package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
    .toDF("id", "s", "v")

  test("classifies added, removed, changed; hides unchanged by default") {
    val current = Seq(
      (2L, "b", 20.0),   // unchanged
      (3L, "c", 31.0),   // changed value
      (4L, "e", 40.0),   // changed string
      (5L, "f", 50.0))   // added
      .toDF("id", "s", "v")
    val got = SnapshotDiff.diff(base, current, "id", Seq("s", "v"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 3L -> "changed",
      4L -> "changed", 5L -> "added"))
    val all = SnapshotDiff.diff(base, current, "id", Seq("s", "v"),
      includeUnchanged = true).as[(Long, String)].collect().toMap
    assert(all(2L) == "unchanged" && all.size == 5)
  }

  test("null is distinct from empty string and from absence") {
    val b = Seq((1L, Some("x")), (2L, None), (3L, Some("")))
      .toDF("id", "s")
    val c = Seq((1L, None: Option[String]), (2L, None), (3L, Some("")))
      .toDF("id", "s")
    val got = SnapshotDiff.diff(b, c, "id", Seq("s"),
      includeUnchanged = true).as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "changed", 2L -> "unchanged", 3L -> "unchanged"))
  }

  test("only listed columns participate in the comparison") {
    val current = base.withColumn("v", col("v") + 1)
    val got = SnapshotDiff.diff(base, current, "id", Seq("s"))
    assert(got.count() == 0, "untracked column change must not register")
  }
}
