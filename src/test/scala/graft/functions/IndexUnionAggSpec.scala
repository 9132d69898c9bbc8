package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IndexUnionAggSpec extends SparkSpec {
  import spark.implicits._

  test("indexSetUnion equals the definitional explode+collect_set") {
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map { i =>
      val g = s"g${i % 7}"
      val idxs = Seq.fill(rnd.nextInt(6))(rnd.nextInt(1000))
      (g, idxs)
    }
    // repartition so map-side partials genuinely merge across tasks
    val df = rows.toDF("g", "idxs").repartition(8)
    val got = df.groupBy("g")
      .agg(AggFunctions.indexSetUnion(col("idxs")).as("u"))
      .as[(String, Seq[Int])].collect().toMap
    val want = df.select(col("g"), explode(col("idxs")).as("i"))
      .groupBy("g").agg(sort_array(collect_set(col("i"))).as("u"))
      .as[(String, Seq[Int])].collect().toMap
    assert(got === want)
    // sorted distinct output
    got.values.foreach { u => assert(u === u.distinct.sorted) }
  }

  test("empty arrays and null rows union to empty; nulls are skipped") {
    val df = Seq(
      ("a", Seq.empty[Int]),
      ("a", Seq.empty[Int]),
      ("b", Seq(3, 1, 3))
    ).toDF("g", "idxs")
      // a null array row in group b must be ignored, not crash
      .union(Seq(("b", null.asInstanceOf[Seq[Int]])).toDF("g", "idxs"))
    val got = df.groupBy("g")
      .agg(AggFunctions.indexSetUnion(col("idxs")).as("u"))
      .as[(String, Seq[Int])].collect().toMap
    assert(got("a") === Seq.empty[Int])
    assert(got("b") === Seq(1, 3))
  }

  test("merge keeps the union across asymmetric bitmap lengths") {
    // direct unit surface: one tiny buffer, one large, both directions
    val small = IndexUnionAgg.reduce(IndexUnionAgg.zero, Seq(Integer.valueOf(2)))
    val large = IndexUnionAgg.reduce(IndexUnionAgg.zero, Seq(Integer.valueOf(900)))
    assert(IndexUnionAgg.finish(IndexUnionAgg.merge(small.clone(), large.clone()))
      === Array(2, 900))
    assert(IndexUnionAgg.finish(IndexUnionAgg.merge(large.clone(), small.clone()))
      === Array(2, 900))
  }
}
