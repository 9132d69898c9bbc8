package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DSIR-style training-data selection (Xie et al. 2023, "Data Selection
  * for Language Models via Importance Resampling"): score every document
  * by how much its hashed-bigram profile resembles a TARGET subset
  * relative to the raw corpus, then keep the top-scoring documents.
  * The published method estimates bag-of-hashed-n-grams distributions
  * p (target) and q (raw), and weighs each document by its log
  * importance ratio  log w(x) = Σ_b c_b(x) · log(p_b / q_b).
  *
  * Scale shape (the whole point of hashed features): both distributions
  * live in a FIXED number of buckets, so the per-bucket count table is
  * `buckets` rows whatever the corpus size — one map-side-combinable
  * hash aggregate over the exploded bigrams, then a broadcast of the
  * log-ratio table back onto the same cached explode for per-doc sums.
  * Two passes over the bigrams, zero corpus-sized shuffles beyond the
  * per-doc aggregate, no driver-side state.
  *
  * Determinism (oracle-mirrorable): the bucket is
  * `conv(md5-hex8) mod buckets` (the repo-wide hash convention);
  * per-bucket log-ratios round at 9 dp into exact decimals, so the
  * per-document sum is independent of bigram order; the reported weight
  * is that decimal sum rounded to 6 dp ([[TextRanking.bigramLmScore]]'s
  * convention).
  */
object DataSelection {

  /** Per-document DSIR log importance weight against the distribution
    * of rows where `targetCol` is true. Laplace smoothing `alpha` keeps
    * unseen buckets finite: p_b = (c_b + α)/(N + α·B). Documents with
    * fewer than two tokens have no bigrams and score 0 over 0 bigrams.
    * Returns `(idCol, n_bigrams, dsir_weight)` for EVERY input row. */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetCol: String, buckets: Int = 256,
                  alpha: Double = 1.0): DataFrame = {
    require(buckets >= 2 && alpha > 0)
    // deliberately NOT persisted: the explode has one row per bigram
    // occurrence — LARGER than the corpus itself. Recomputing the
    // cheap tokenize+md5 projection for the scoring pass beats pinning
    // a corpus-scale cache for the session's lifetime (the returned
    // frame would keep the blocks alive past the caller's action).
    val bg = docs
      .select(col(idCol), col(targetCol).cast("boolean").as("_t"),
        explode(TF.shingles(col(textCol), 2)).as("_bg"))
      .withColumn("_b",
        pmod(conv(substring(md5(col("_bg")), 1, 8), 16, 10).cast("long"),
          lit(buckets.toLong)))
      .drop("_bg")
    // bucket histogram: `buckets` rows after a map-side-combinable agg,
    // with target and raw counted in the same pass
    val counts = bg.groupBy("_b").agg(
      sum(when(col("_t"), 1L).otherwise(0L)).as("_ct"),
      count(lit(1)).as("_ca"))
    val totals = counts.agg(sum(col("_ct")).as("_nt"),
      sum(col("_ca")).as("_na"))
    val aB = alpha * buckets
    val lr = counts.crossJoin(broadcast(totals))
      .select(col("_b"),
        round(log(((col("_ct") + alpha) / (col("_nt") + aB)) /
            ((col("_ca") + alpha) / (col("_na") + aB))), 9)
          .cast("decimal(18,9)").as("_lr"))
    val scored = bg.join(broadcast(lr), Seq("_b"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("_lr")).cast("double") + lit(1e-9), 6)
          .as("dsir_weight"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("dsir_weight"), lit(0.0)).as("dsir_weight"))
  }

  /** The selection step: the `m` highest-weight documents, ties broken
    * by the smaller id. Deterministic top-m via TakeOrdered (a bounded
    * per-partition heap + one m-row gather), never a global sort. */
  def dsirSelect(docs: DataFrame, idCol: String, textCol: String,
                 targetCol: String, m: Int, buckets: Int = 256,
                 alpha: Double = 1.0): DataFrame =
    dsirWeights(docs, idCol, textCol, targetCol, buckets, alpha)
      .orderBy(desc("dsir_weight"), col(idCol))
      .limit(m)
}
