package graft.operators

import graft.functions.AggFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Bounded per-group sampling and top-K.
  *
  * The reference caps each random-effect entity's "active" sample count with
  * a deterministic reservoir (`RandomEffectDataset.groupDataByKeyAndSample`,
  * photon-api/.../data/RandomEffectDataset.scala:468-527: combineByKey into a
  * fixed-capacity min-heap keyed by a deterministic hash; survivors'
  * weights rescaled by count/capacity so aggregates stay unbiased).
  */
object GroupedSampling {

  /** Deterministic per-row priority: md5 of the row's unique id rendered as
    * hex. Stable across runs, partitionings, and engines (md5 is md5
    * everywhere), which is what makes recomputation-stable sampling possible
    * — same idea as the reference's byteswap64(hash) key. */
  def priority(uidCols: Seq[Column]): Column =
    md5(concat_ws("_", uidCols.map(_.cast("string")): _*))

  /** Once-per-JVM marker so a trimming cap logs visibly without spamming
    * (executor-side; reset only on JVM restart — a warning, not a metric). */
  private val trimWarned = new java.util.concurrent.atomic.AtomicBoolean(false)

  /** Keep at most `cap` rows per group, chosen by deterministic hash
    * priority; add `weight_scale` = n/cap for survivors of capped groups so
    * weighted aggregates remain unbiased (photon's weight rescaling).
    *
    * Scale shape: two passes, neither of which sorts or gathers a group's
    * rows into one task.
    *   1. Per-group threshold: bounded-heap aggregate of the `cap` smallest
    *      priorities ([[AggFunctions.collectTopK]] — map-side partial
    *      buffers are ≤cap heaps, the reference's fixed-capacity-heap
    *      reservoir) plus the group count. Output is one tiny row per
    *      group.
    *   2. Equi-join thresholds back (Catalyst broadcasts when the group
    *      table is small; AQE handles skew otherwise) and keep rows whose
    *      priority ≤ the cap-th smallest. A hot group's rows never
    *      funnel through a single-task window sort — the earlier
    *      row_number implementation did exactly that and died at 100×.
    *   3. Exact-cap trim: duplicate uids tie at the threshold and would
    *      admit >cap rows, so a row_number over the pruned rows of
    *      OVER-CAP groups takes exactly cap. Under-cap groups (whose
    *      threshold is their own max — nothing to trim) bypass the
    *      window entirely, so the trim shuffle moves only rows from
    *      groups that actually overflowed, not the whole survivor set;
    *      the thresholds aggregate is shared by both branches via
    *      exchange reuse, so the only duplicated work is the map-side
    *      scan+probe, never a second full shuffle. */
  def boundedSample(df: DataFrame, groupCols: Seq[String],
                    uidCols: Seq[String], cap: Int,
                    warnOnTrim: Boolean = false,
                    keepGroupSize: Boolean = false): DataFrame = {
    val p = priority(uidCols.map(col))
    val thresholds = df
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        array_max(AggFunctions.collectTopK(p, cap, smallest = true))
          .as("_pmax"))
    val trimW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_p"))
    // warnOnTrim: callers applying a DEFAULT cap (not one the user asked
    // for) pass true so silent truncation becomes a visible log line; the
    // UDF computes the identical value as the plain `when` expression
    val scale: Column =
      if (!warnOnTrim)
        when(col("_n") > cap, col("_n").cast("double") / cap)
          .otherwise(lit(1.0))
      else udf { (n: Long) =>
        if (n > cap) {
          if (trimWarned.compareAndSet(false, true))
            org.slf4j.LoggerFactory.getLogger(GroupedSampling.getClass).warn(
              s"boundedSample: a group exceeded cap=$cap; its training " +
                "rows were reservoir-trimmed and weights rescaled")
          n.toDouble / cap
        } else 1.0
      }.apply(col("_n"))
    val admitted = df.withColumn("_p", p)
      .join(thresholds, groupCols)
      .filter(col("_p") <= col("_pmax"))
    val underCap = admitted.filter(col("_n") <= cap)
    val trimmed = admitted.filter(col("_n") > cap)
      .withColumn("_rn", row_number().over(trimW))
      .filter(col("_rn") <= cap)
      .drop("_rn")
    val kept = underCap.unionByName(trimmed)
      .withColumn("weight_scale", scale)
    // the pre-cap group count is already aggregated here — callers that
    // need it (e.g. a lower-bound filter) take it for free instead of
    // re-aggregating the source
    val withSize = if (keepGroupSize)
      kept.withColumn("group_size", col("_n")) else kept
    withSize.drop("_p", "_pmax", "_n", "_rn")
  }

  /** Weighted reservoir sample: at most `cap` rows per group with
    * inclusion probability proportional to `weightCol` (Efraimidis &
    * Spirakis 2006: keep the `cap` LARGEST `u^(1/w)` keys, u uniform per
    * row). Randomness is the row's hash — deterministic across runs,
    * partitionings, and engines — and the selection uses the same
    * bounded-heap threshold pattern as [[boundedSample]], so a hot
    * group never funnels through one task. Weights must be > 0.
    *
    * The rank key is rounded to 12 decimals: JVM Math.pow and other
    * engines' libm pow can disagree in the last ulps, and a raw-double
    * sort key would let near-ties rank differently across engines (the
    * repo convention — TextRanking — is to never sort on raw float
    * keys). Ties the rounding introduces are broken by the md5 row
    * priority, which is engine-exact. */
  def weightedSample(df: DataFrame, groupCols: Seq[String],
                     uidCols: Seq[String], weightCol: String,
                     cap: Int): DataFrame = {
    val u = DownSampling.hashFraction(uidCols.map(col))
    val key = round(pow(u, lit(1.0) / col(weightCol)), 12)
    val thresholds = df
      .withColumn("_k", key)
      .groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("_n"),
        array_min(AggFunctions.collectTopK(col("_k"), cap,
          smallest = false)).as("_kmin"))
    val trimW = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("_k").desc, priority(uidCols.map(col)))
    val admitted = df.withColumn("_k", key)
      .join(thresholds, groupCols)
      .filter(col("_k") >= col("_kmin"))
    val underCap = admitted.filter(col("_n") <= cap)
    val trimmed = admitted.filter(col("_n") > cap)
      .withColumn("_rn", row_number().over(trimW))
      .filter(col("_rn") <= cap)
      .drop("_rn")
    underCap.unionByName(trimmed).drop("_k", "_kmin", "_n")
  }

  /** Top-K rows per group by an explicit ordering (deterministic iff the
    * ordering is total — callers must include a tie-breaker). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   order: Seq[Column], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*).orderBy(order: _*)
    df.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= k)
      .drop("_rn")
  }
}
