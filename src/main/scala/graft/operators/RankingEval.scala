package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ranking-quality metrics for retrieval evaluation: nDCG@k with graded
  * relevance and mean reciprocal rank — the standard readout for any
  * ANN / BM25 / fusion ranking this repo produces.
  *
  * Scale shape: the input is an already-ranked list (qid, rank, rel) —
  * k rows per query, so every aggregate here is bounded by k·|queries|,
  * never the corpus. The ideal ordering is a per-query window over those
  * same k rows.
  *
  * Determinism: gains are exact integer-valued doubles (2^rel − 1);
  * per-position discount terms are rounded to 6 dp and summed as
  * decimals so DCG is position-order independent; the only
  * library-function hazard (log2) follows the repo's q37/q61 precedent
  * of rounding well above ulp noise. */
object RankingEval {

  /** Per-query nDCG (ideal = the query's own retrieved grades re-sorted
    * descending — the list-normalized variant) and reciprocal rank of
    * the first hit with `rel ≥ relevantMin` (0.0 when none). */
  def perQuery(ranked: DataFrame, qidCol: String, rankCol: String,
               relCol: String, relevantMin: Int,
               roundTo: Int = 6): DataFrame = {
    val gain = pow(lit(2.0), col(relCol).cast("double")) - lit(1.0)
    val g = ranked.select(col(qidCol), col(rankCol).cast("long").as("_r"),
      col(relCol).cast("int").as("_rel"), gain.as("_g"))
    def term(rank: org.apache.spark.sql.Column) =
      round(col("_g") / log2(rank.cast("double") + lit(1.0)) + lit(1e-9), 6)
        .cast("decimal(18,6)")
    val iw = Window.partitionBy(qidCol)
      .orderBy(col("_g").desc, col("_r"))
    val both = g.withColumn("_ir", row_number().over(iw))
    val agg = both.groupBy(qidCol)
      .agg(count(lit(1)).as("n_retrieved"),
        sum(term(col("_r"))).as("_dcg"),
        sum(term(col("_ir"))).as("_idcg"),
        min(when(col("_rel") >= relevantMin, col("_r"))).as("_fr"))
    def r(c: org.apache.spark.sql.Column) = round(c + lit(1e-9), roundTo)
    agg.select(col(qidCol), col("n_retrieved"),
      r(when(col("_idcg").cast("double") === 0.0, lit(0.0))
        .otherwise(col("_dcg").cast("double") / col("_idcg").cast("double")))
        .as("ndcg"),
      r(coalesce(lit(1.0) / col("_fr").cast("double"), lit(0.0))).as("rr"))
  }
}
