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

  /** Admission verdicts for one batch of documents against PERSISTED
    * curation state — the kernel of [[streamingAdmission]] and the
    * order-independent core of the q249 daily-ingest gate. Four
    * verdicts per doc, each depending only on the batch row and the
    * index files (NEVER on other batch rows, so the result is
    * invariant under any micro-batch slicing):
    *   - `n_tokens` quality floor;
    *   - `is_dup_exact`: content hash in the persisted
    *     [[Dedup.exactIndexBuild]] hash set;
    *   - `is_neardup`: J ≥ `threshold` against the persisted
    *     [[Dedup.minhashIndexBuild]] index (`base` supplies candidate
    *     text by id, the q236 contract);
    *   - `is_contaminated`: shingle overlap with the persisted
    *     [[Decontamination.decontamIndexBuild]] benchmark set.
    * Intra-batch (same-day) dedup is deliberately NOT here — it is
    * order-DEPENDENT (min-id keeper) and belongs to the daily batch
    * compaction ([[Dedup.incrementalExact]] / q249), the same split
    * production pipelines make. */
  def admitBatch(spark: org.apache.spark.sql.SparkSession,
                 batch: DataFrame, exactDir: String, mhDir: String,
                 dcDir: String, base: DataFrame, idCol: String,
                 textCol: String, minTokens: Int = 5,
                 threshold: Double = 0.5): DataFrame = {
    val exactFlag = Dedup.exactIndexProbe(spark, exactDir, batch,
      idCol, textCol)
      .withColumnRenamed("is_dup", "is_dup_exact")
    val nearIds = Dedup.minhashIndexProbe(spark, mhDir, batch, base,
      idCol, textCol, threshold)
      .select(col("delta_id").as(idCol)).distinct()
      .withColumn("_near", lit(true))
    val contam = Decontamination.decontamIndexReport(spark, dcDir,
      batch, idCol, textCol)
      .select(col(idCol), col("is_contaminated"))
    batch.select(col(idCol), TF.tokenCount(col(textCol)).as("n_tokens"))
      .join(exactFlag, Seq(idCol))
      .join(nearIds, Seq(idCol), "left")
      .join(contam, Seq(idCol))
      .select(col(idCol), col("n_tokens"), col("is_dup_exact"),
        coalesce(col("_near"), lit(false)).as("is_neardup"),
        col("is_contaminated"),
        (col("n_tokens") >= minTokens && !col("is_dup_exact") &&
          !coalesce(col("_near"), lit(false)) &&
          !col("is_contaminated")).as("accepted"))
  }

  /** CONTINUOUS admission: every micro-batch runs [[admitBatch]]
    * against the persisted indexes and appends its verdict rows to
    * `outDir` — the streaming face of the daily-ingest pipeline, with
    * the same verdict-per-doc schema as the q249 batch gate. Because
    * every [[admitBatch]] verdict is independent of micro-batch
    * slicing, the accumulated output CONVERGES to the one-shot batch
    * result whatever the trigger cadence (the spec/gate contract).
    * Delivery is foreachBatch's at-least-once: a replayed batch
    * appends duplicate verdict ROWS (identical values — dedupe by id
    * downstream if exact-once is needed). The indexes are only READ
    * here; accepted-batch appends (exact/minhash) stay explicit daily
    * operations so admission never races its own writers. */
  def streamingAdmission(stream: DataFrame, exactDir: String,
                         mhDir: String, dcDir: String, base: DataFrame,
                         outDir: String, checkpoint: String,
                         idCol: String = "doc_id",
                         textCol: String = "text", minTokens: Int = 5,
                         threshold: Double = 0.5)
    : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          admitBatch(batch.sparkSession, batch, exactDir, mhDir, dcDir,
            base, idCol, textCol, minTokens, threshold)
            .write.mode("append").parquet(outDir)
      }
      .start()
}
