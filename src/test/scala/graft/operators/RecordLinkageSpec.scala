package graft.operators

import graft.SparkSpec

class RecordLinkageSpec extends SparkSpec {

  private def pairs(rows: Seq[(Int, String)], maxDist: Int,
                    cap: Long = 100000L): Set[(Int, Int, Int)] = {
    import spark.implicits._
    RecordLinkage.fuzzyPairs(rows.toDF("id", "name"), "id", "name",
        maxDist, cap)
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
  }

  test("fuzzyPairs finds substitution, insertion, and deletion at d=1") {
    val rows = Seq(1 -> "red bolt", 2 -> "rad bolt", // substitution
      3 -> "red bolts", // insertion vs 1
      4 -> "re bolt", // deletion vs 1
      5 -> "blue gear") // unrelated
    val got = pairs(rows, maxDist = 1)
    assert(got.contains((1, 2, 1)) && got.contains((1, 3, 1)) &&
      got.contains((1, 4, 1)), s"missing expected pairs: $got")
    assert(!got.exists(p => p._1 == 5 || p._2 == 5), "unrelated matched")
    // exact duplicates are distance 0 and must also surface
    assert(pairs(Seq(7 -> "same", 8 -> "same"), 1).contains((7, 8, 0)))
  }

  test("fuzzyPairs at d=2 catches what d=1 must miss") {
    val rows = Seq(1 -> "widget", 2 -> "wadget", 3 -> "wadgit")
    val d1 = pairs(rows, maxDist = 1)
    val d2 = pairs(rows, maxDist = 2)
    assert(d1.contains((1, 2, 1)) && !d1.exists(p => p._1 == 1 && p._2 == 3))
    assert(d2.contains((1, 3, 2)), s"2-edit pair not found: $d2")
  }

  test("hot-key guard drops oversubscribed variants") {
    // many ids share the exact same text → every deletion key is hot
    val rows = (1 to 20).map(i => i -> "hot item") :+ (21 -> "cold item")
    assert(pairs(rows, maxDist = 1, cap = 5L).isEmpty)
    assert(pairs(rows, maxDist = 1).nonEmpty)
  }

  test("scorePairs sums rule weights with NULL as disagreement") {
    import spark.implicits._
    import RecordLinkage.FieldRule
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("id_a", "id_b")
    val ents = Seq[(Long, Option[String], Int)](
      (1L, Some("B1"), 10), (2L, Some("B1"), 11), (3L, None, 20))
      .toDF("id", "brand", "size")
    val got = RecordLinkage.scorePairs(cand, "id_a", "id_b", ents, "id",
      Seq(FieldRule.equality("brand", 2.0, -2.0),
        FieldRule.within("size", 1.0, 1.0, -1.0)))
      .select("id_a", "id_b", "agree_brand", "agree_size", "score")
      .as[(Long, Long, Boolean, Boolean, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(got((1L, 2L)) == ((true, true, 3.0)))
    // brand NULL on id 3 → disagreement, size 10 vs 20 disagrees
    assert(got((1L, 3L)) == ((false, false, -3.0)))
    assert(got((2L, 3L)) == ((false, false, -3.0)))
  }
}
