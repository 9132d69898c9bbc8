package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Exact global rank statistics without a single-task sort.
  *
  * `cume_dist`/`percent_rank` over a whole table is the canonical
  * scale trap: a window with no PARTITION BY funnels every row through
  * one task. The distributed formulation splits it into
  *   1. a hash aggregate to per-VALUE counts (shuffle bounded by the
  *      distinct-value count, with map-side combine),
  *   2. a range-partitioned sort of the distinct values with
  *      partition-offset prefix sums (per-partition totals — one tiny
  *      number per partition — are collected, offset on the driver, and
  *      the running sum is completed partition-locally), and
  *   3. an equi-join of value → rank back onto the rows.
  * Every stage is parallel; driver traffic is O(#partitions), not rows.
  * The same offset trick backs [[Profiling.exactQuantiles]]'s index
  * lookup — this is its per-row inverse (value → ECDF rather than
  * quantile → value).
  */
object Ranks {

  /** value → (cnt_le = #rows with value ≤ v, ecdf = cnt_le / n).
    *
    * One row per distinct value of `column` (nulls excluded); join the
    * result back on `column` for per-row ranks. `cnt_le` is the
    * integer-exact rank surface — hash-safe — and `ecdf` its rounded
    * ratio (what `cume_dist()` would return).
    */
  def ecdf(df: DataFrame, column: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(column).cast("double").as("v")).na.drop()
      .groupBy("v").agg(count(lit(1)).as("c"))
      .as[(Double, Long)]
    // range-partition + in-partition sort = globally sorted distinct
    // values; sortBy samples its own range bounds. localCheckpoint (the
    // repo's CC-rounds convention) materializes the sort once and cuts
    // the lineage, so the totals job and the returned plan share one
    // execution instead of re-sorting (an unpersist-in-finally here
    // would silently recompute the sort when the result materializes).
    val sorted = counts.rdd.sortBy(_._1).localCheckpoint()
    // per-partition totals: one long per partition back to the driver
    val partTotals = sorted
      .mapPartitionsWithIndex { case (i, it) =>
        Iterator.single(i -> it.map(_._2).sum)
      }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val n = math.max(1L, offsets.last)
    val ranked = sorted.mapPartitionsWithIndex { case (i, it) =>
      var acc = offsets(i)
      it.map { case (v, c) => acc += c; (v, acc) }
    }
    ranked.toDF("v", "cnt_le")
      .select(col("v").as(column), col("cnt_le"),
        round(col("cnt_le").cast("double") / n + lit(1e-9), 6).as("ecdf"))
  }

  /** Two-sample statistics built on the same distributed rank surface:
    * per-value (ca, cb) counts, range-partitioned sort, partition-offset
    * prefix sums — every candidate statistic is INTEGER-exact until one
    * final division, so the result is independent of partitioning and
    * engine. Returns the per-partition scan's reduced sufficient
    * statistics (only O(#partitions) longs ever reach the driver). */
  private def twoSampleScan(a: DataFrame, b: DataFrame, column: String)
    : (Long, Long, Long, Long, Long, Long, Long) = {
    val tagged = a.select(col(column).cast("double").as("v")).na.drop()
      .withColumn("_sa", lit(1L)).withColumn("_sb", lit(0L))
      .unionByName(b.select(col(column).cast("double").as("v")).na.drop()
        .withColumn("_sa", lit(0L)).withColumn("_sb", lit(1L)))
    val counts = tagged.groupBy("v")
      .agg(sum(col("_sa")).as("ca"), sum(col("_sb")).as("cb"))
      .select(col("v"), col("ca"), col("cb"))
      .rdd.map(r => (r.getDouble(0), (r.getLong(1), r.getLong(2))))
    val sorted = counts.sortBy(_._1).localCheckpoint()
    val partTotals = sorted.mapPartitionsWithIndex { case (i, it) =>
      var sa = 0L; var sb = 0L
      it.foreach { case (_, (ca, cb)) => sa += ca; sb += cb }
      Iterator.single((i, sa, sb))
    }.collect().sortBy(_._1)
    val offA = partTotals.map(_._2).scanLeft(0L)(_ + _)
    val offB = partTotals.map(_._3).scanLeft(0L)(_ + _)
    val na = offA.last
    val nb = offB.last
    // per-partition pass: running inclusive counts seeded by the
    // partition offsets; reduce (ksNum max, 2·Σranks_A, Σ(t³−t)) exactly,
    // plus the DeLong placement second moments: a positive at value v
    // has doubled-scaled placement 2·(#neg below) + (#neg at v) and a
    // negative has 2·(#pos above) + (#pos at v) — both integers, so
    // Σ ca·placement² stays integer-exact until the one final division
    val (ksNum, sumA2, tieSum, plA2, plB2) = sorted.mapPartitionsWithIndex {
      case (i, it) =>
        var cA = offA(i); var cB = offB(i)
        var km = 0L; var s2 = 0L; var ts = 0L; var pa = 0L; var pb = 0L
        it.foreach { case (_, (ca, cb)) =>
          val before = cA + cB
          val dPosPlace = 2 * cB + cb          // cB = #neg strictly below
          val dNegPlace = 2 * (na - cA - ca) + ca // #pos strictly above
          cA += ca; cB += cb
          val t = ca + cb
          km = math.max(km, math.abs(cA * nb - cB * na))
          s2 += ca * (2 * before + t + 1)
          ts += t * t * t - t
          pa += ca * dPosPlace * dPosPlace
          pb += cb * dNegPlace * dNegPlace
        }
        Iterator.single((km, s2, ts, pa, pb))
    }.collect().foldLeft((0L, 0L, 0L, 0L, 0L)) {
      case ((k, s, t, a2, b2), (k2, s2, t2, a22, b22)) =>
        (math.max(k, k2), s + s2, t + t2, a2 + a22, b2 + b22)
    }
    (na, nb, ksNum, sumA2, tieSum, plA2, plB2)
  }

  /** Two-sample Kolmogorov-Smirnov D = max |F̂ₐ − F̂ᵦ|, exact: the max
    * runs over the integer cross-products |CA·nb − CB·na| and only the
    * winner is divided. One row: (n_a, n_b, d_num, d_stat). */
  def ksTest(a: DataFrame, b: DataFrame, column: String,
             roundTo: Int = 6): DataFrame = {
    val (na, nb, ksNum, _, _, _, _) = twoSampleScan(a, b, column)
    val spark = a.sparkSession
    import spark.implicits._
    Seq((na, nb, ksNum)).toDF("n_a", "n_b", "d_num")
      .select(col("n_a"), col("n_b"), col("d_num"),
        round(col("d_num").cast("double") /
          (col("n_a").cast("double") * col("n_b").cast("double"))
          + lit(1e-9), roundTo).as("d_stat"))
  }

  /** Mann-Whitney U (average ranks for ties) with the tie-corrected
    * normal approximation. 2·Σranks_A is integer-exact (avg tie rank =
    * R + (t+1)/2 ⇒ doubled it is 2R + t + 1); U and z then mirror as
    * fixed double expressions. One row: (n_a, n_b, u2_a, z) with
    * u2_a = 2·U_A kept integer so the hash never sees a float U. */
  def mannWhitney(a: DataFrame, b: DataFrame, column: String,
                  roundTo: Int = 6): DataFrame = {
    val (na, nb, _, sumA2, tieSum, _, _) = twoSampleScan(a, b, column)
    val u2 = sumA2 - na * (na + 1) // = 2·U_A, integer-exact
    val spark = a.sparkSession
    import spark.implicits._
    Seq((na, nb, u2, tieSum)).toDF("n_a", "n_b", "u2_a", "_ties")
      .select(col("n_a"), col("n_b"), col("u2_a"), {
        val naD = col("n_a").cast("double")
        val nbD = col("n_b").cast("double")
        val nD = naD + nbD
        val u = col("u2_a").cast("double") / lit(2.0)
        val mean = naD * nbD / lit(2.0)
        val variance = naD * nbD / lit(12.0) *
          ((nD + lit(1.0)) - col("_ties").cast("double")
            / (nD * (nD - lit(1.0))))
        round((u - mean) / sqrt(variance) + lit(1e-9), roundTo).as("z")
      })
  }

  /** Gini concentration coefficient of a non-negative INTEGER column
    * (e.g. per-key row counts — the "how skewed is this key domain"
    * diagnostic behind salting decisions). Sorted-data identity
    * G = (Σ 2i·xᵢ − (n+1)·Σx) / (n·Σx): rows with value v and
    * multiplicity m at cumulative offset b contribute the INTEGER
    * v·m·(2b + m + 1) to the first sum, so the whole statistic stays
    * exact until one final division. Distributed exactly like [[ecdf]]:
    * per-value counts, range-partitioned sort, partition-offset prefix
    * sums. Long-exactness needs n·max(x)·2n < 2⁶³ — fine to ~10⁹ rows
    * of bounded counts; past that, pre-bucket the values.
    *
    * One row: (n, gini_num, gini_den, gini). */
  def gini(df: DataFrame, column: String, roundTo: Int = 6): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(column).cast("long").as("v")).na.drop()
      .groupBy("v").agg(count(lit(1)).as("m"))
      .as[(Long, Long)]
    val sorted = counts.rdd.sortBy(_._1).localCheckpoint()
    val partTotals = sorted.mapPartitionsWithIndex { case (i, it) =>
      var m = 0L
      it.foreach(m += _._2)
      Iterator.single(i -> m)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partTotals.scanLeft(0L)(_ + _)
    val (n, s, a) = sorted.mapPartitionsWithIndex { case (i, it) =>
      var b = offsets(i); var sS = 0L; var aS = 0L
      it.foreach { case (v, m) =>
        sS += v * m
        aS += v * m * (2 * b + m + 1)
        b += m
      }
      Iterator.single((0L, sS, aS))
    }.collect().foldLeft((offsets.last, 0L, 0L)) {
      case ((n0, s0, a0), (_, s1, a1)) => (n0, s0 + s1, a0 + a1)
    }
    Seq((n, a - (n + 1) * s, n * s))
      .toDF("n", "gini_num", "gini_den")
      .select(col("n"), col("gini_num"), col("gini_den"),
        round(col("gini_num").cast("double") /
          col("gini_den").cast("double") + lit(1e-9), roundTo).as("gini"))
  }

  /** DeLong (1988) AUC standard error and 95% CI on the same
    * distributed rank surface. The placement value of a positive —
    * the fraction of negatives it outranks, ties at half — is, doubled
    * and scaled by 2·n_neg, the INTEGER `2·(#neg below) + (#neg at v)`;
    * its per-value second moment `Σ ca·placement²` therefore accumulates
    * exactly in longs (likewise for negatives, mirrored), and only the
    * one final variance expression divides. AUC itself is the
    * Mann-Whitney `(2·Σranks_pos − n₁(n₁+1)) / (2·n₁·n₀)`.
    *
    * Long-exactness bound: `n_pos·(2·n_neg)²` must fit 2⁶³ — fine to
    * ~10⁶ rows per class; past that, run DeLong on a score-bucketed
    * surface or a sampled eval set (the standard practice anyway).
    *
    * One row: (n_pos, n_neg, auc, se, ci_lo, ci_hi), all rounded. */
  def delongAuc(pos: DataFrame, neg: DataFrame, scoreCol: String,
                roundTo: Int = 6): DataFrame = {
    val (na, nb, _, sumA2, _, plA2, plB2) = twoSampleScan(pos, neg, scoreCol)
    // fail loudly, not with NaN/null CIs: the variance terms divide by
    // (n-1) per class, and the integer placement moments are exact only
    // while n_pos·(2·n_neg)² (and the mirror) fit a signed long — the
    // require convention of rangePairs/asOf
    require(na > 1 && nb > 1,
      s"delongAuc needs >1 row per class, got n_pos=$na n_neg=$nb")
    require(na <= Long.MaxValue / (2 * nb) / (2 * nb) &&
            nb <= Long.MaxValue / (2 * na) / (2 * na),
      s"delongAuc long-exactness bound exceeded (n_pos=$na, n_neg=$nb): " +
        "bucket scores or sample the eval set (~1e6 rows/class is the limit)")
    val u2 = sumA2 - na * (na + 1) // = 2·U_pos, integer-exact
    val spark = pos.sparkSession
    import spark.implicits._
    val naD = col("n_pos").cast("double")
    val nbD = col("n_neg").cast("double")
    val auc = col("_u2").cast("double") / (lit(2.0) * naD * nbD)
    // E[V²] from the doubled-scaled second moments: a2/(4·n₀²)/n₁
    val s10 = (col("_a2").cast("double") /
      (lit(4.0) * nbD * nbD) - naD * auc * auc) / (naD - lit(1.0))
    // negative placements count #pos ABOVE, so their mean is also auc
    val s01 = (col("_b2").cast("double") /
      (lit(4.0) * naD * naD) - nbD * auc * auc) / (nbD - lit(1.0))
    val se = sqrt(s10 / naD + s01 / nbD)
    val z = lit(1.959964) // Φ⁻¹(0.975) to the mirrored precision
    Seq((na, nb, u2, plA2, plB2))
      .toDF("n_pos", "n_neg", "_u2", "_a2", "_b2")
      .select(col("n_pos"), col("n_neg"),
        round(auc + lit(1e-9), roundTo).as("auc"),
        round(se + lit(1e-9), roundTo).as("se"),
        round(auc - z * se + lit(1e-9), roundTo).as("ci_lo"),
        round(auc + z * se + lit(1e-9), roundTo).as("ci_hi"))
  }
}
