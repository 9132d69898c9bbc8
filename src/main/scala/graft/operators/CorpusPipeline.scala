package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a training-data job
  * actually runs, chaining the individual operators: token-count floor,
  * language whitelist, then exact dedup keeping the lowest-id copy.
  *
  * Plan shape at 100 TB: the quality/language stage is pure codegen'd
  * projection+filter (no shuffle); dedup is one hash-aggregate on the
  * content hash plus a semi-join of survivors — two shuffles total,
  * both on well-distributed keys.
  */
object CorpusPipeline {

  def clean(docs: DataFrame, idCol: String, textCol: String,
            minTokens: Int, langs: Seq[String]): DataFrame = {
    // feeds both the keeper aggregate and the semi-join's left side —
    // materialize so tokenCount/langId don't run over the corpus twice
    val filtered = docs.select(col(idCol), col(textCol),
      TF.tokenCount(col(textCol)).as("n_tokens"),
      TF.langId(col(textCol)).as("lang_guess"))
      .filter(col("n_tokens") >= minTokens &&
        col("lang_guess").isInCollection(langs))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val keepers = filtered
      .groupBy(md5(col(textCol)).as("_h"))
      .agg(min(col(idCol)).as("_keeper"))
      .select(col("_keeper"))
    filtered
      .join(keepers, filtered(idCol) === keepers("_keeper"), "left_semi")
      .select(col(idCol), col("n_tokens"), col("lang_guess"))
  }
}
