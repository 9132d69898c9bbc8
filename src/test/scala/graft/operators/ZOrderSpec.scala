package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits exactly (a even positions, b odd)") {
    val df = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (1023L, 1023L))
      .toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.zValue(col("a"), col("b"), 10))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    def morton(a: Long, b: Long): Long =
      (0 until 10).map(k => (((a >> k) & 1) << (2 * k)) |
        (((b >> k) & 1) << (2 * k + 1))).sum
    assert(got((0L, 0L)) == 0L)
    assert(got((1L, 0L)) == 1L)
    assert(got((0L, 1L)) == 2L)
    assert(got((3L, 5L)) == 39L)
    got.foreach { case ((a, b), z) => assert(z == morton(a, b)) }
  }

  test("clusterBy produces monotonic non-overlapping z-ranges per partition") {
    val df = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val clustered = ZOrder.clusterBy(df, "a", "b", 6, numPartitions = 8)
    val ranges = clustered.select("zvalue").rdd
      .mapPartitionsWithIndex { case (i, it) =>
        val zs = it.map(_.getLong(0)).toArray
        if (zs.isEmpty) Iterator.empty
        else {
          assert(zs.sameElements(zs.sorted), s"partition $i not sorted")
          Iterator.single((i, zs.head, zs.last))
        }
      }.collect().sortBy(_._1)
    // consecutive partitions cover disjoint ascending z-intervals
    ranges.sliding(2).foreach {
      case Array((_, _, hi), (_, lo, _)) => assert(hi <= lo)
      case _                             => ()
    }
    assert(ranges.length > 1, "expected multiple non-empty partitions")
  }

  test("clustering gives 2-D locality: per-partition bounding boxes are tiles") {
    val df = (0 until 64).flatMap(a => (0 until 64).map(b => (a.toLong, b.toLong)))
      .toDF("a", "b")
    val boxes = ZOrder.clusterBy(df, "a", "b", 6, numPartitions = 16)
      .select("a", "b").rdd.mapPartitions { it =>
        val pts = it.map(r => (r.getLong(0), r.getLong(1))).toArray
        if (pts.isEmpty) Iterator.empty
        else Iterator.single((pts.map(_._1).max - pts.map(_._1).min + 1) *
          (pts.map(_._2).max - pts.map(_._2).min + 1))
      }.collect()
    // random assignment would give every partition the full 64x64 box;
    // z-tiles must average far below that
    val avgArea = boxes.sum.toDouble / boxes.length
    assert(avgArea < 64 * 64 / 2.0,
      s"z-clustering shows no 2-D locality: avg bounding area $avgArea")
  }
}
