package graft.operators

import graft.functions.AggFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data mixture composition: temperature-weighted sampling
  * across sources — the step that turns N heterogeneous corpora into
  * one training mix (upweight small high-quality sources with α < 1,
  * proportional at α = 1).
  *
  * Determinism is engineered the way the oracle queries need it:
  * per-source masses are exact BIGINT sums; the temperature weights
  * `mass^α` are rounded to 9dp and carried as DECIMAL(18,9) so their
  * normalizing sum is order-independent; quota apportionment is
  * Hamilton largest-remainder on exact decimal remainders; and the
  * per-source draw is ordered by md5 hash, so the same documents are
  * chosen on 1 executor or 1000.
  */
object Mixture {

  /** Per-source sample quotas summing exactly to `k`.
    *
    * Hamilton (largest-remainder) apportionment of `k` slots over
    * weights `mass^alpha`: each source gets ⌊k·wᵢ/W⌋, then the
    * leftover slots go to the largest exact-decimal remainders
    * (ties → source asc). The window runs over one row per source —
    * model-sized by definition, not a data-sized sort.
    *
    * Output: (`sourceCol`, mass: BIGINT, quota: BIGINT). */
  def quotas(df: DataFrame, sourceCol: String, massCol: String,
             k: Int, alpha: Double): DataFrame = {
    require(k > 0, s"sample budget must be positive, got $k")
    require(alpha > 0.0, s"temperature must be positive, got $alpha")
    val masses = df.groupBy(sourceCol)
      .agg(sum(col(massCol).cast("long")).as("mass"))
      // mass^α rounded to 9dp then DECIMAL so the total W is an exact,
      // order-independent sum (raw-double Σ pow would be partitioning-
      // dependent); 9dp absorbs libm pow ulp differences across engines
      .withColumn("_w",
        round(pow(col("mass").cast("double"), lit(alpha)), 9)
          .cast("decimal(18,9)"))
    // the weight total is re-cast to DECIMAL(18,9): Spark's sum widens
    // to (28,9) while DuckDB's widens to (38,9), and the later product
    // with `base` would push either past the 38-digit cap, where the
    // engines RE-ROUND differently. At (18,9)·(10,0) every intermediate
    // stays exact in both. (18,9) holds any real weight total: even a
    // million sources of 10^9-char mass sum to ~10^10 at α=1.)
    val total = masses.agg(sum(col("_w")).cast("decimal(18,9)").as("_tw"))
    val based = masses.crossJoin(broadcast(total))
      .withColumn("_kw", col("_w") * lit(k))
      .withColumn("base",
        floor(col("_kw").cast("double") / col("_tw").cast("double"))
          .cast("long"))
      // exact decimal remainder of the ideal share — never a float
      .withColumn("_rem",
        col("_kw") - col("_tw") * col("base").cast("decimal(10,0)"))
    val leftover = based.agg((lit(k) - sum(col("base"))).as("_left"))
    based.crossJoin(broadcast(leftover))
      .withColumn("_rank", row_number().over(
        Window.orderBy(col("_rem").desc, col(sourceCol).asc)))
      .withColumn("quota",
        col("base") + when(col("_rank") <= col("_left"), 1L).otherwise(0L))
      .select(col(sourceCol), col("mass"), col("quota"))
  }

  /** Draw each source's quota of rows, chosen by deterministic md5
    * priority over `uidCol`.
    *
    * Scale shape: the global budget `k` upper-bounds every quota, so a
    * bounded-heap threshold at `k` per source (the [[GroupedSampling]]
    * two-pass trick — map-side ≤k heaps, no window over the corpus)
    * prunes the input to ≤ k·|sources| survivor rows first; the exact
    * per-source quota cut then runs as a window over survivors only.
    *
    * Output: the sampled rows of `df` (original columns). */
  def sampleByQuota(df: DataFrame, sourceCol: String, uidCol: String,
                    quotaDf: DataFrame, k: Int): DataFrame = {
    val key = md5(concat(lit("mix_"), col(uidCol).cast("string")))
    val thresholds = df
      .withColumn("_key", key)
      .groupBy(sourceCol)
      .agg(array_max(AggFunctions.collectTopK(col("_key"), k,
        smallest = true)).as("_kmax"))
    val survivors = df.withColumn("_key", key)
      .join(thresholds, sourceCol)
      .filter(col("_key") <= col("_kmax"))
    val w = Window.partitionBy(sourceCol)
      .orderBy(col("_key").asc, col(uidCol).asc)
    survivors
      .withColumn("_rn", row_number().over(w))
      .join(broadcast(quotaDf.select(col(sourceCol), col("quota"))),
        Seq(sourceCol))
      .filter(col("_rn") <= col("quota"))
      .select(df.columns.map(col): _*)
  }

  /** Compose: temperature-α mixture of `k` rows over sources weighted
    * by Σ`massCol`. */
  def sample(df: DataFrame, sourceCol: String, uidCol: String,
             massCol: String, k: Int, alpha: Double): DataFrame =
    sampleByQuota(df, sourceCol, uidCol,
      quotas(df, sourceCol, massCol, k, alpha), k)
}
