package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: flag training documents that share n-gram
  * content with an evaluation/benchmark set, so they can be dropped
  * before training (the standard n-gram-overlap decontamination step in
  * LLM corpus construction).
  *
  * Scale shape: the benchmark side is small by definition (eval sets are
  * thousands of docs, the corpus is billions), so its distinct shingle
  * set is collected into a broadcast hash join. The corpus side is one
  * projection + explode + map-side-combinable count — a single pass over
  * the data, no corpus-keyed shuffle of text.
  */
object Decontamination {

  /** Per-candidate contamination report: how many of the doc's DISTINCT
    * `n`-gram shingles appear anywhere in `benchmark`, and whether any
    * do. Every candidate row is kept (0-hit docs included) so the result
    * can drive either a filter or an audit.
    */
  def report(candidates: DataFrame, benchmark: DataFrame, idCol: String,
             textCol: String, n: Int = 3): DataFrame = {
    val benchSh = benchmark
      .select(explode(TF.distinctShingles(col(textCol), n)).as("_g"))
      .distinct()
    val hits = candidates
      .select(col(idCol), explode(TF.distinctShingles(col(textCol), n)).as("_g"))
      .join(broadcast(benchSh), Seq("_g"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_contaminated"))
    candidates.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        (coalesce(col("n_contaminated"), lit(0L)) > 0).as("is_contaminated"))
  }

  /** The filter a pipeline actually applies: candidates with zero
    * benchmark overlap. */
  def clean(candidates: DataFrame, benchmark: DataFrame, idCol: String,
            textCol: String, n: Int = 3): DataFrame =
    candidates.join(
      report(candidates, benchmark, idCol, textCol, n)
        .filter(col("is_contaminated")).select(col(idCol)),
      Seq(idCol), "left_anti")
}
