package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MixtureSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String, Long)*) =
    rows.toDF("doc_id", "source", "n_chars")

  test("quotas sum exactly to k and follow the temperature weighting") {
    // masses 100/400/1600; α=0.5 → weights 10/20/40 → shares 1/7, 2/7, 4/7
    val df = docs((0 until 30).map { i =>
      val (src, m) = i % 3 match {
        case 0 => ("a", 10L); case 1 => ("b", 40L); case _ => ("c", 160L)
      }
      (i.toLong, src, m)
    }: _*)
    val q = Mixture.quotas(df, "source", "n_chars", k = 7, alpha = 0.5)
      .select("source", "quota").as[(String, Long)].collect().toMap
    assert(q.values.sum == 7L)
    assert(q == Map("a" -> 1L, "b" -> 2L, "c" -> 4L))
  }

  test("quotas at alpha=1 are proportional; leftover goes to largest remainder") {
    // masses 5/3/2 over k=10 → exact 5/3/2, no remainder distribution
    val df = docs((1L, "x", 500L), (2L, "y", 300L), (3L, "z", 200L))
    val q = Mixture.quotas(df, "source", "n_chars", k = 10, alpha = 1.0)
      .select("source", "quota").as[(String, Long)].collect().toMap
    assert(q == Map("x" -> 5L, "y" -> 3L, "z" -> 2L))
    // k=4: ideal 2.0/1.2/0.8 → bases 2/1/0, leftover 1 → z (rem .8 > .2)
    val q4 = Mixture.quotas(df, "source", "n_chars", k = 4, alpha = 1.0)
      .select("source", "quota").as[(String, Long)].collect().toMap
    assert(q4 == Map("x" -> 2L, "y" -> 1L, "z" -> 1L))
  }

  test("sample draws exactly the quota per source, stable across partitionings") {
    val df = docs((0 until 60).map(i =>
      (i.toLong, s"s${i % 3}", 100L)): _*)
    val a = Mixture.sample(df.repartition(1), "source", "doc_id", "n_chars",
      k = 12, alpha = 1.0).select("doc_id").as[Long].collect().sorted
    val b = Mixture.sample(df.repartition(11), "source", "doc_id", "n_chars",
      k = 12, alpha = 1.0).select("doc_id").as[Long].collect().sorted
    assert(a.length == 12)
    assert(a.toSeq == b.toSeq)
    val perSrc = Mixture.sample(df, "source", "doc_id", "n_chars", 12, 1.0)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(perSrc == Map("s0" -> 4L, "s1" -> 4L, "s2" -> 4L))
  }

  test("a quota never exceeds a source's row count under a sane budget") {
    // k=6 ≤ total rows; tiny source can be over-apportioned only if its
    // quota ≤ its rows — verify the draw is capped by availability
    val df = docs((1L, "big", 1000L), (2L, "big", 1000L), (3L, "big", 1000L),
      (4L, "big", 1000L), (5L, "tiny", 4000L))
    val got = Mixture.sample(df, "source", "doc_id", "n_chars", 5, 1.0)
    // tiny has 1 row; its ideal share would be >1 — draw yields its 1 row
    assert(got.filter(col("source") === "tiny").count() == 1L)
  }
}
