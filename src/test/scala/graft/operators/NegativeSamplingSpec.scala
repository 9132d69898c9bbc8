package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NegativeSamplingSpec extends SparkSpec {
  import spark.implicits._

  private def catalog(n: Int) = (1 to n).map(i => i.toLong).toDF("item_id")

  test("emits at most k fresh catalog items per user, deterministically") {
    val pos = Seq((1L, 3L), (1L, 4L), (2L, 1L)).toDF("user_id", "item_id")
    val cat = catalog(50)
    val out = NegativeSampling.sample(pos, "user_id", "item_id",
      cat, "item_id", k = 4).cache()
    val perUser = out.groupBy("user").count().as[(Long, Long)].collect().toMap
    assert(perUser.values.forall(_ <= 4))
    assert(perUser.keySet == Set(1L, 2L))
    // no negative is a positive, and every item comes from the catalog
    assert(out.join(pos,
      out("user") === pos("user_id") && out("item") === pos("item_id"))
      .count() == 0)
    assert(out.join(cat, out("item") === cat("item_id"), "left_anti")
      .count() == 0)
    // bit-stable under a different input partitioning
    val again = NegativeSampling.sample(pos.repartition(7), "user_id",
      "item_id", cat.repartition(5), "item_id", k = 4)
    assert(out.except(again).count() == 0 && again.except(out).count() == 0)
  }

  test("under-delivers when positives blanket the catalog") {
    val cat = catalog(3)
    // user 9 has seen items 1 and 2: only 3 can ever be sampled
    val pos = Seq((9L, 1L), (9L, 2L)).toDF("user_id", "item_id")
    val out = NegativeSampling.sample(pos, "user_id", "item_id",
      cat, "item_id", k = 5, oversample = 10).collect()
    assert(out.forall(_.getAs[Long]("item") == 3L))
    assert(out.length <= 1)
  }

  test("repeated draws of one item keep the earliest attempt") {
    // single-item catalog: every attempt hashes to item 1
    val pos = Seq((7L, 99L)).toDF("user_id", "item_id")
    val out = NegativeSampling.sample(pos, "user_id", "item_id",
      catalog(1), "item_id", k = 3, oversample = 4).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Int]("attempt") == 0)
  }

  test("attempt order is ascending and gap-free in rank") {
    val pos = Seq((5L, 1000L)).toDF("user_id", "item_id")
    val out = NegativeSampling.sample(pos, "user_id", "item_id",
      catalog(1000), "item_id", k = 6, oversample = 2)
      .orderBy("attempt").select("attempt").as[Int].collect()
    assert(out.sorted.sameElements(out), "draw order must be ascending")
    assert(out.length == 6, "ample catalog must deliver exactly k")
  }
}
