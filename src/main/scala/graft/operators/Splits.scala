package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic train/validation/test assignment.
  *
  * Splitting by `rand()` is partitioning-dependent in Spark (a retry or a
  * different executor count reshuffles the split); splitting by a hash of
  * the row's stable id is reproducible across recomputations, cluster
  * sizes, and engines, and costs a single codegen'd projection — no
  * shuffle, no state. The same row always lands in the same split, which
  * is also what makes incremental corpus refreshes safe: new data joins a
  * split without moving old data between splits.
  */
object Splits {

  /** Split label from cumulative hash-fraction thresholds.
    * `fractions` maps label → mass; masses must sum to ~1. The hash is
    * salted with `salt` so independent splits of the same table
    * decorrelate. */
  def assign(idCol: Column, fractions: Seq[(String, Double)],
             salt: String = "split"): Column = {
    require(fractions.nonEmpty && math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val f = DownSampling.hashFraction(Seq(lit(salt), idCol))
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    fractions.zip(cum).init.foldRight(lit(fractions.last._1)) {
      case (((label, _), hi), other) => when(f < hi, label).otherwise(other)
    }
  }

  /** Attach a `split` column. */
  def withSplit(df: DataFrame, idCol: String,
                fractions: Seq[(String, Double)],
                salt: String = "split"): DataFrame =
    df.withColumn("split", assign(col(idCol), fractions, salt))

  /** LEAKAGE-SAFE split: the hash is taken over a GROUP key instead of
    * the row id, so every member of a group lands on the same side —
    * the constructive counterpart of the split-leakage audit (q132):
    * row-hash splitting scatters a duplicate cluster across train and
    * test, and the model is then evaluated on rows it memorized.
    * `groupCols` is any precomputed grouping — a content hash for exact
    * duplicates, a [[Dedup.resolveClusters]] cluster id for near-dups,
    * a user/session id for entity-level holdout. Same zero-shuffle,
    * partitioning-independent, engine-mirrorable projection as
    * [[withSplit]]; per-split masses now fluctuate with GROUP sizes
    * (unavoidable: a group is atomic by definition). */
  def groupedSplit(df: DataFrame, groupCols: Seq[String],
                   fractions: Seq[(String, Double)],
                   salt: String = "gsplit"): DataFrame = {
    require(groupCols.nonEmpty, "groupedSplit needs at least one group column")
    // joined with an \u0001 separator so multi-column groups cannot
    // alias each other (("ab","c") vs ("a","bc")) — the NegativeSampling
    // key convention. concat_ws silently DROPS null arguments, which
    // would collapse (null,"a") and ("a",null) onto the same key "a";
    // tag each null with a sentinel first — the SnapshotDiff hashing
    // convention (non-null keys are byte-identical to before, so every
    // existing split assignment is unchanged)
    val key = concat_ws("\u0001", groupCols.map(c =>
      coalesce(col(c).cast("string"), lit("\u0000null"))): _*)
    df.withColumn("split", assign(key, fractions, salt))
  }

  /** EXACT stratified split: within every stratum the labels cut the
    * stratum's deterministic md5 order at `floor(cum_fraction·n + 0.5)`
    * — rounded cumulative boundaries, so an 80/20 split of 25 rows is
    * exactly 20/5 regardless of float representation (an ND `ceil`
    * would see ceil(0.8·25 = 20.000000000000004) = 21; any consumer
    * mirroring this in SQL must also force DOUBLE arithmetic — most
    * engines parse the literal 0.8 as an exact DECIMAL and would round
    * differently). Hash-proportional
    * assignment ([[withSplit]]) is the zero-shuffle default but its
    * per-stratum counts fluctuate binomially; evaluation protocols that
    * need exact counts (k-fold, small strata) need the ranked version.
    *
    * Scale shape: the global rank-within-stratum is computed WITHOUT a
    * per-stratum window sort. One range-partitioned sort of
    * (stratum, key) — strata land contiguously across partitions — then
    * per-(partition, stratum) counts (one small row each, bounded by
    * #partitions × #strata) are collected, offset driver-side, and
    * ranks complete partition-locally. Same offset pattern as
    * [[Ranks.ecdf]] / [[Profiling.exactQuantiles]]. Stratum cardinality
    * must be modest (labels, languages, sources — not user ids); the
    * collect is O(#partitions · #strata).
    *
    * Returns (uidCol, stratumCol, split); join back on `uidCol` for the
    * full rows. `uidCol` must be unique per row. */
  def stratifiedExact(df: DataFrame, stratumCol: String, uidCol: String,
                      fractions: Seq[(String, Double)],
                      salt: String = "strat"): DataFrame = {
    require(fractions.nonEmpty &&
      math.abs(fractions.map(_._2).sum - 1.0) < 1e-9,
      "split fractions must sum to 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keyed = df
      .select(col(stratumCol).cast("string").as("s"),
        md5(concat(lit(salt + "_"), col(uidCol).cast("string"))).as("k"),
        col(uidCol).cast("string").as("u"))
      .as[(String, String, String)]
    // one range-partitioned sort; uid breaks (impossible-in-practice)
    // md5 ties so the order is total and engine-independent
    val sorted = keyed.rdd.sortBy(t => (t._1, t._2, t._3))
      .localCheckpoint()
    val partCounts = sorted.mapPartitionsWithIndex { case (i, it) =>
      val m = scala.collection.mutable.LinkedHashMap.empty[String, Long]
      it.foreach { t => m.update(t._1, m.getOrElse(t._1, 0L) + 1L) }
      m.iterator.map { case (s, c) => (i, s, c) }
    }.collect()
    val totals = partCounts.groupBy(_._2)
      .map { case (s, xs) => s -> xs.map(_._3).sum }
    val offsets: Map[(Int, String), Long] =
      partCounts.groupBy(_._2).iterator.flatMap { case (s, xs) =>
        val byPart = xs.sortBy(_._1)
        byPart.zip(byPart.scanLeft(0L)(_ + _._3))
          .map { case ((i, _, _), off) => (i, s) -> off }
      }.toMap
    val bOff = spark.sparkContext.broadcast((offsets, totals))
    val ranked = sorted.mapPartitionsWithIndex { case (i, it) =>
      val (off, tot) = bOff.value
      var cur: String = null
      var rank = 0L
      it.map { case (s, _, u) =>
        if (s != cur) { cur = s; rank = off.getOrElse((i, s), 0L) }
        val r = rank; rank += 1
        (u, s, r, tot(s))
      }
    }
    val cum = fractions.scanLeft(0.0)(_ + _._2).tail
    val label = fractions.zip(cum).init
      .foldRight(lit(fractions.last._1)) { case (((l, _), hi), other) =>
        when(col("_rk") <
          floor(lit(hi) * col("_n").cast("double") + lit(0.5)), l)
          .otherwise(other)
      }
    ranked.toDF("u", "s", "_rk", "_n")
      .select(col("u").as(uidCol), col("s").as(stratumCol),
        label.as("split"))
  }
}
