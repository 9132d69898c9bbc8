package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphsSpec extends SparkSpec {

  test("pagerank: symmetric 2-cycle stays uniform; mass is conserved") {
    import spark.implicits._
    val e = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = Graphs.pagerank(e, "src", "dst", iterations = 5)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r("a") - 0.5) < 1e-9)
    assert(math.abs(r("b") - 0.5) < 1e-9)
  }

  test("pagerank: hub of a star outranks leaves; matches local iteration") {
    import spark.implicits._
    // undirected star: hub h - leaves l1..l4
    val undirected = (1 to 4).map(i => ("h", s"l$i"))
    val e = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    val got = Graphs.pagerank(e, "src", "dst", iterations = 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    // local reference iteration with the same rounding discipline:
    // contributions as integer 1e-12 units, long sums, divide back
    val n = 5.0
    val teleport = (1.0 - 0.85) / n
    def units(x: Double): Long = java.math.BigDecimal.valueOf(x * 1e12)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    var rh = 1.0 / n
    var rl = 1.0 / n
    for (_ <- 1 to 3) {
      val nh = teleport + 0.85 * ((units(rl) * 4).toDouble / 1e12)
      val nl = teleport + 0.85 * (units(rh / 4.0).toDouble / 1e12)
      rh = nh; rl = nl
    }
    assert(got("h") > got("l1"))
    assert(math.abs(got("h") - rh) < 1e-9, s"hub ${got("h")} vs $rh")
    (1 to 4).foreach { i =>
      assert(math.abs(got(s"l$i") - rl) < 1e-9)
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-6, "mass conserved")
  }

  test("pagerank: driver-resident and distributed branches agree bit-exactly") {
    import spark.implicits._
    val edges = (1 to 40).flatMap { i =>
      Seq((s"n$i", s"n${(i * 3) % 40 + 1}"), (s"n${(i * 3) % 40 + 1}", s"n$i"))
    }.toDF("src", "dst")
    val local = Graphs.pagerank(edges, "src", "dst", 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val dist = Graphs.pagerank(edges, "src", "dst", 3,
        broadcastNodeLimit = 0L)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(local == dist)
  }

  test("pagerank is partitioning-invariant") {
    import spark.implicits._
    val edges = (1 to 50).flatMap { i =>
      Seq((s"n$i", s"n${(i * 7) % 50 + 1}"), (s"n${(i * 7) % 50 + 1}", s"n$i"))
    }.toDF("src", "dst")
    val a = Graphs.pagerank(edges, "src", "dst", 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    val b = Graphs.pagerank(edges.repartition(7), "src", "dst", 3)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(a == b)
  }

  test("label propagation: two cliques joined by one bridge separate") {
    import spark.implicits._
    // cliques {1,2,3} and {10,11,12}, bridge 3-10
    def clique(ids: Seq[Long]) =
      for (a <- ids; b <- ids if a != b) yield (a, b)
    val e = (clique(Seq(1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L)) ++
      Seq((3L, 10L), (10L, 3L))).toDF("src", "dst")
    val got = Graphs.labelPropagation(e, "src", "dst", iterations = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each clique converges to its smallest member's label
    assert(Seq(1L, 2L, 3L).map(got).distinct.size == 1)
    assert(Seq(10L, 11L, 12L).map(got).distinct.size == 1)
    assert(got(1L) != got(11L), "cliques must stay distinct communities")
  }

  test("label propagation: tiebreak picks the smallest label") {
    import spark.implicits._
    // node 5's neighbours 2 and 9 are tied at one edge each after round
    // 1 relabels them to themselves (each is isolated-but-for-5)
    val e = Seq((2L, 5L), (5L, 2L), (9L, 5L), (5L, 9L)).toDF("src", "dst")
    val got = Graphs.labelPropagation(e, "src", "dst", iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(5L) == 2L, s"tie must break to the smallest label, got $got")
    assert(got(2L) == 5L && got(9L) == 5L)
  }

  test("label propagation is partitioning-invariant and branch-agnostic") {
    import spark.implicits._
    val edges = (1 to 60).flatMap { i =>
      Seq((i.toLong, ((i * 11) % 60 + 1).toLong),
        (((i * 11) % 60 + 1).toLong, i.toLong))
    }.toDF("src", "dst")
    val a = Graphs.labelPropagation(edges, "src", "dst", 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graphs.labelPropagation(edges.repartition(7), "src", "dst", 3,
        broadcastNodeLimit = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b)
  }
}
