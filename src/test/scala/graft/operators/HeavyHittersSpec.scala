package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  test("frequentItems matches the exact groupBy definition") {
    // skewed stream: 'a' 40%, 'b' 25%, long tail of singletons
    val rows = Seq.fill(400)("a") ++ Seq.fill(250)("b") ++
      (0 until 350).map(i => s"t$i")
    val df = rows.toDF("item").repartition(7) // candidate phase sees splits
    val got = HeavyHitters.frequentItems(df, "item", 0.1)
      .as[(String, Long)].collect().toMap
    val expected = rows.groupBy(identity).view
      .mapValues(_.size.toLong).filter(_._2 > 0.1 * rows.size).toMap
    assert(got == expected)
    assert(got.keySet == Set("a", "b"))
  }

  test("frequentItems never misses across adversarial partitionings") {
    // 'hot' is a heavy hitter only globally — spread thin over partitions
    val rows = (0 until 900).map(i => if (i % 3 == 0) "hot" else s"u$i")
    for (parts <- Seq(1, 5, 13)) {
      val got = HeavyHitters.frequentItems(
        rows.toDF("item").repartition(parts), "item", 0.25)
        .as[(String, Long)].collect().toMap
      assert(got == Map("hot" -> 300L), s"parts=$parts")
    }
  }

  test("frequentItems ignores nulls and validates s") {
    val df = (Seq.fill(6)(Some("x")) ++ Seq(None, None))
      .toDF("item")
    val got = HeavyHitters.frequentItems(df, "item", 0.5)
      .as[(String, Long)].collect().toMap
    assert(got == Map("x" -> 6L)) // 6 > 0.5 * 6 non-null rows
    intercept[IllegalArgumentException] {
      HeavyHitters.frequentItems(df, "item", 1.0)
    }
  }

  test("buildVocab ranks by count desc then token asc with contiguous ids") {
    val docs = Seq("b b b a a c", "a c d", "e").toDF("text")
    val got = TextRanking.buildVocab(docs, "text", 4)
      .as[(Int, String, Long)].collect().toSeq
    // counts: a=3, b=3, c=2, d=1, e=1 → tie a/b broken by token asc
    assert(got == Seq((1, "a", 3L), (2, "b", 3L), (3, "c", 2L), (4, "d", 1L)))
  }

  test("trendSlope recovers an exact linear trend per group") {
    val df = (0 until 50).flatMap { x =>
      Seq(("up", x, 2.0 * x + 1.0), ("flat", x, 7.5))
    }.toDF("g", "x", "y")
    val got = Profiling.trendSlope(df, Seq("g"), col("x"), col("y"))
      .as[(String, Long, Double)].collect()
      .map { case (g, n, s) => g -> ((n, s)) }.toMap
    assert(got("up") == ((50L, 2.0)))
    assert(got("flat") == ((50L, 0.0)))
  }

  test("pmiPairs counts document co-occurrence over the vocab only") {
    // "a b" in 4 docs, "a c" in 1, "z" rare (outside top-3 vocab)
    val docs = Seq("a b", "a b", "a b", "a b z", "a c", "b c")
      .toDF("text")
    val got = TextRanking.pmiPairs(docs, "text",
      vocabSize = 3, minPairCount = 1)
      .as[(String, String, Long, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    // vocab = {a (5), b (5), c (2)}; z excluded
    assert(!got.keySet.exists { case (x, y) => x == "z" || y == "z" })
    val ab = got(("a", "b"))
    assert(ab._3 == 4L && ab._4 == 5L && ab._5 == 5L) // n_ab, n_a, n_b
    // pmi = ln(4·6 / (5·5))
    assert(math.abs(ab._6 -
      math.rint((math.log(24.0 / 25.0) + 1e-9) * 1e6) / 1e6) < 1e-12)
    assert(got(("a", "c"))._3 == 1L && got(("b", "c"))._3 == 1L)
  }

  test("trendSlope excludes null x/y rows from every sum") {
    val df = Seq[(String, Option[Int], Option[Double])](
      ("g", Some(0), Some(1.0)), ("g", Some(1), Some(2.0)),
      ("g", Some(2), None), ("g", None, Some(99.0)), ("g", Some(2), Some(3.0)))
      .toDF("g", "x", "y")
    val got = Profiling.trendSlope(df, Seq("g"), col("x"), col("y"))
      .as[(String, Long, Double)].collect().head
    assert(got._2 == 3L) // only the three complete rows
    assert(got._3 == 1.0) // y = x + 1 on those rows
  }
}
