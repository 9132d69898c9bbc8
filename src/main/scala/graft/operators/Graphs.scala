package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge lists. Companions to the
  * specialized graph shapes elsewhere in the repo (connected components
  * in [[Dedup]], triangle counting in the q88 wedge join).
  */
object Graphs {

  /** PageRank with a FIXED iteration count (the deterministic,
    * oracle-checkable variant of run-to-convergence).
    *
    * Each iteration is two keyed shuffles — contributions grouped by
    * destination, then the node-table left join — with map-side partial
    * aggregation; no driver-side graph state, no whole-graph window.
    * At 1000-executor scale this is the textbook join-based PageRank
    * (edge partitioning by src for the contribution join, by id for the
    * aggregate); a hot destination's contributions combine map-side
    * exactly like any aggregate.
    *
    * Determinism: per-edge contributions `rank/degree` are rounded to
    * integer `10^-roundTo` units and summed as LONGS — exact and
    * order-independent like a decimal sum, but allocation-free and fully
    * codegen'd (a `DECIMAL(28,12)` cast from double builds a BigDecimal
    * per edge; measured ~1 s/iteration at sf0.1 against ~0.3 s for the
    * long kernel). Total mass is ≤ 1, so group sums fit a long for any
    * `roundTo` ≤ 15. The teleport term is computed as
    * `(1.0 - damping) / n` in IEEE doubles; an engine mirroring this in
    * SQL must reproduce the SAME subtraction (a literal `0.15` is one
    * ulp away from `1.0 - 0.85`) and the same `round(x·10^roundTo, 0)`
    * scaling.
    *
    * Dangling nodes (no out-edges) contribute nothing — callers wanting
    * the redistribute-to-all variant should add those edges explicitly.
    * For symmetrized (undirected) graphs danglers cannot exist. */
  def pagerank(edges: DataFrame, srcCol: String, dstCol: String,
               iterations: Int, damping: Double = 0.85,
               roundTo: Int = 12,
               broadcastNodeLimit: Long = 10000000L,
               edgesPerPartition: Long = 1000000L): DataFrame = {
    require(iterations >= 1 && roundTo >= 1 && roundTo <= 15 &&
      damping > 0 && damping < 1)
    val spark = edges.sparkSession
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Edge count keys every round's shuffle width
    // ([[graft.util.ExecProfile.withDerivedShuffle]]): a fixed
    // session-width iteration over a small graph is task-launch-bound —
    // each round pays AQE stage-materialization jobs plus near-empty
    // task launches that dwarf the rank arithmetic. 1M edges (~16 MB of
    // (src,dst) longs) per partition is still conservative against the
    // guide's 100 MB-1 GB advisory, and at any scale where width
    // matters (edges ≥ 1M × the session's partitions) the derived
    // count clamps at the session's and NOTHING changes — AQE stays
    // on, width stays the cluster's. The count also materializes the
    // persist, a pass the degree fold below would pay anyway.
    val m = e.count()
    graft.util.ExecProfile.withDerivedShuffle(spark, m,
      edgesPerPartition) {
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val n = nodes.count()
    val nD = n.toDouble
    // rank and degree are NODE-sized — orders of magnitude smaller than
    // the edge list they join. Up to the limit, broadcast them so each
    // iteration is map-side over the cached edges plus ONE shuffle (the
    // by-destination aggregate, PageRank's irreducible shuffle); past
    // it, fall back to shuffle joins and let AQE plan (a >10M-node
    // rank table stops being broadcast material). The same
    // dispatch-on-measured-size pattern as FeatureVectorizer.vectorize.
    val hint: DataFrame => DataFrame =
      if (n <= broadcastNodeLimit) broadcast else identity
    // fold out-degree into the cached edge table ONCE: every round's
    // contribution pass then needs a single rank join instead of a
    // rank join plus a degree join (one fewer stage/broadcast per round)
    val ewd = e.join(e.groupBy("src").agg(count(lit(1)).as("deg")), "src")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var rank = nodes.select(col("id"), lit(1.0 / nD).as("rank"))
    val teleport = (1.0 - damping) / nD
    val scale = math.pow(10.0, roundTo) // exact power of ten in double
    for (i <- 1 to iterations) {
      // round 1's rank is the uniform literal 1/n — the rank join (the
      // round's largest operation) degenerates to a projection
      val withRank =
        if (i == 1) ewd.select(col("src"), col("dst"), col("deg"),
          lit(1.0 / nD).as("rank"))
        else ewd.join(hint(rank.withColumnRenamed("id", "src")), "src")
      val contribs = withRank
        .select(col("dst").as("id"),
          round(col("rank") / col("deg") * lit(scale), 0)
            .cast("long").as("_c"))
      val sums = contribs.groupBy("id")
        .agg((sum(col("_c")).cast("double") / lit(scale)).as("_s"))
      rank = nodes.join(hint(sums), Seq("id"), "left")
        .select(col("id"), (lit(teleport) +
          lit(damping) * coalesce(col("_s"), lit(0.0))).as("rank"))
      // truncate lineage every round (the Dedup.resolveClusters lesson):
      // without this, round i's plan nests rounds 1..i-1, so the final
      // action re-executes every earlier round once per reference —
      // quadratic recompute that swamps the actual per-round work.
      // The FINAL round is checkpointed too so its aggregate runs
      // inside the derived-width scope (the caller's action would
      // otherwise execute it at the session's width after the scope
      // restored it); the caller sees the same rows either way.
      rank = rank.localCheckpoint(true)
    }
    rank
    }
  }

  /** Synchronous label propagation with a FIXED iteration count:
    * every node starts labelled with its own id; each round it adopts
    * the most frequent label among its neighbours, ties broken by the
    * SMALLEST label — fully deterministic, so communities reproduce
    * bit-for-bit and an external SQL engine can replay the rounds.
    *
    * Scale shape: each round is two hash aggregates — neighbour-label
    * counts keyed (node, label), then the per-node argmax as
    * `min(struct(-cnt, lbl))` with map-side partial aggregation — plus
    * the label lookup join, broadcast while the measured node count
    * stays under `broadcastNodeLimit` (the [[pagerank]] dispatch).
    * No per-node window: a 10M-degree hub combines map-side like any
    * aggregate.
    *
    * Edges must be symmetrized (an (a,b) and its (b,a) mirror) — the
    * caller owns direction semantics, same contract as [[pagerank]];
    * every node of a symmetrized edge list appears as a destination, so
    * each round relabels every node. Node ids need an engine-stable
    * ordering for the tiebreak — integers and dates are safe; string
    * ids tie the mirror to collation. Bipartite graphs can oscillate
    * under synchronous updates — with a fixed round budget the result
    * is still deterministic, but interpret communities on such graphs
    * accordingly. */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iterations: Int,
                       broadcastNodeLimit: Long = 10000000L,
                       edgesPerPartition: Long = 1000000L): DataFrame = {
    require(iterations >= 1)
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // edge count keys every round's shuffle width — the [[pagerank]]
    // rationale verbatim (clamps at the session width past 1M edges ×
    // partitions, so production plans are untouched); the count also
    // materializes the persist, which round 1 would otherwise pay
    val m = e.count()
    graft.util.ExecProfile.withDerivedShuffle(edges.sparkSession, m,
      edgesPerPartition) {
    // the node table and its count are only needed to decide broadcast;
    // with the limit at 0 (pure AQE planning) neither job runs. For
    // symmetrized edges every node occurs as a src.
    val hint: DataFrame => DataFrame =
      if (broadcastNodeLimit <= 0) identity
      else if (e.select(col("src")).distinct().count() <= broadcastNodeLimit)
        broadcast
      else identity
    var labels: DataFrame = null
    for (i <- 1 to iterations) {
      // round 1 joins against the identity labelling — algebraically
      // label(src) = src, so the join (the round's largest operation)
      // is a projection instead
      val withLbl =
        if (i == 1) e.select(col("dst"), col("src").as("lbl"))
        else e.join(hint(labels.withColumnRenamed("id", "src")), "src")
          .select(col("dst"), col("lbl"))
      val counts = withLbl
        .groupBy(col("dst").as("id"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      // argmax(cnt) with smallest-label tiebreak as ONE aggregate:
      // struct ordering compares the negated count first, then the
      // label itself — no numeric assumptions about the label type
      labels = counts.groupBy("id")
        .agg(min(struct((-col("cnt")).as("nc"), col("lbl"))).as("m"))
        .select(col("id"), col("m.lbl").as("lbl"))
      // same lineage truncation as [[pagerank]]: each synchronous round
      // must run exactly once, not once per downstream reference — and
      // the final round checkpoints too, so its aggregates execute
      // inside the derived-width scope (values unchanged)
      labels = labels.localCheckpoint(true)
    }
    labels
    }
  }
}
