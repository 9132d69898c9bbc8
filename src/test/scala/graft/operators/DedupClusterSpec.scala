package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected-components + cluster-resolution (Dedup.connectedComponents /
  * resolveClusters): verified against a brute-force union-find. */
class DedupClusterSpec extends SparkSpec {
  import scala.collection.mutable

  private def pairsDf(pairs: Seq[(Long, Long)]): DataFrame = {
    import spark.implicits._
    pairs.toDF("id_a", "id_b")
  }

  /** Reference union-find over the same edges. */
  private def unionFind(pairs: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  private def ccMap(pairs: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(pairsDf(pairs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("path graph collapses to its minimum id") {
    val path = (1L until 8L).map(i => (i, i + 1))
    assert(ccMap(path) == (1L to 8L).map(_ -> 1L).toMap)
  }

  test("hub with the largest id still labels by component minimum") {
    val star = (1L to 9L).map(i => (99L, i))
    assert(ccMap(star) == ((1L to 9L) :+ 99L).map(_ -> 1L).toMap)
  }

  test("disjoint components stay disjoint") {
    val g = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 20L))
    assert(ccMap(g) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
        20L -> 20L, 21L -> 20L))
  }

  test("random graph matches brute-force union-find") {
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(300)(
      (rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
    assert(ccMap(pairs) == unionFind(pairs))
  }

  test("star rounds (fast path disabled) agree with the fast path") {
    // the ≤2^17-edge fast path answers small graphs driver-side; force
    // the distributed star rounds on the same graphs so BOTH paths stay
    // covered and provably equal
    val rnd = new scala.util.Random(7)
    val pairs = Seq.fill(400)(
      (rnd.nextInt(150).toLong, rnd.nextInt(150).toLong))
      .filter { case (a, b) => a != b }
    val stars = Dedup.connectedComponents(pairsDf(pairs),
      smallGraphEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(stars == ccMap(pairs))
    assert(stars == unionFind(pairs))
  }

  test("empty pair list yields an empty labeling") {
    assert(ccMap(Seq.empty).isEmpty)
  }

  test("string ids: fast path orders like SQL min() under supplementary chars") {
    // UTF-16 code-unit order and UTF-8 byte (code point) order DISAGREE
    // here: U+E000 (BMP private-use) sorts ABOVE U+10000 (lead
    // surrogate 0xD800) in UTF-16 code units but BELOW it by code
    // point — Spark's min() orders UTF8String by code point, so the
    // driver union-find must too
    import spark.implicits._
    val supp = new String(Character.toChars(0x10000))
    val bmp = "\uE000"
    val pairs = Seq((supp, bmp), (bmp, "zz"), (supp, "aa0"))
    val df = pairs.toDF("id_a", "id_b")
    val fast = Dedup.connectedComponents(df)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val stars = Dedup.connectedComponents(df, smallGraphEdges = 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(fast == stars, s"fast=$fast stars=$stars")
    // the component minimum by code-point order is "aa0" (ASCII) here;
    // the real assertion is path equality above, but pin the root too
    assert(fast.values.toSet == Set("aa0"))
  }

  test("result is invariant to input partitioning and duplication") {
    val pairs = Seq((5L, 3L), (3L, 9L), (9L, 5L), (1L, 2L), (2L, 1L))
    val base = ccMap(pairs)
    val shuffled = Dedup.connectedComponents(
      pairsDf(pairs ++ pairs).repartition(7))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(base == shuffled)
    assert(base == Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 1L -> 1L, 2L -> 1L))
  }

  test("resolveClusters picks the longest doc, ties to the smallest id") {
    import spark.implicits._
    // cluster {1,2,3}: 2 and 3 tie on priority -> canonical 2
    // cluster {7,8}: 8 longer -> canonical 8; 5 unpaired -> itself
    val docs = Seq(
      (1L, 10), (2L, 30), (3L, 30), (5L, 99), (7L, 4), (8L, 6))
      .toDF("doc_id", "n")
    val pairs = pairsDf(Seq((1L, 2L), (2L, 3L), (7L, 8L)))
    val got = Dedup.resolveClusters(docs, pairs, "doc_id", col("n"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == Map(
      1L -> ((1L, 3L, 2L)), 2L -> ((1L, 3L, 2L)), 3L -> ((1L, 3L, 2L)),
      5L -> ((5L, 1L, 5L)), 7L -> ((7L, 2L, 8L)), 8L -> ((7L, 2L, 8L))))
  }

  test("repeatedSpans merges overlapping cross-doc shingle hits into maximal spans") {
    import spark.implicits._
    // docs 1 and 2 share the run "a b c d e" (tokens 2..6 of doc 1,
    // 0..4 of doc 2); doc 3 shares nothing 3 tokens long with anyone
    val docs = Seq(
      (1L, "x y a b c d e z z2 z3"),
      (2L, "a b c d e q r"),
      (3L, "u v w x2 y2")).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, "doc_id", "text", n = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // shared 5-token run = 3 overlapping shingles -> ONE merged span
    assert(got == Set((1L, 2L, 6L, 3L), (2L, 0L, 4L, 3L)), s"got $got")
  }

  test("repeatedSpans keeps disjoint repeats as separate spans") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c GAP1 GAP2 GAP3 d e f"),
      (2L, "a b c m n o p q r s"),
      (3L, "d e f k l m2 n2 o2")).toDF("doc_id", "text")
    val got = Dedup.repeatedSpans(docs, "doc_id", "text", n = 3)
      .filter(col("doc_id") === 1L)
      .collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set((0L, 2L, 1L), (6L, 8L, 1L)), s"got $got")
  }

  test("repeatedSpans: a within-doc-only repeat is not a cross-doc span") {
    import spark.implicits._
    val docs = Seq(
      (1L, "p q r s p q r s"), // repeats internally only
      (2L, "different words entirely here")).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(docs, "doc_id", "text", n = 3).count() == 0)
  }
}
