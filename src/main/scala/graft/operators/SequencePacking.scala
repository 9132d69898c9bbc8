package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sequence packing: group documents into sequences of at most
  * `maxTokens` tokens — the batching step between a cleaned corpus and
  * an LLM pretraining run.
  *
  * True first-fit packing is sequential; the distributed form packs
  * WITHIN hash buckets: docs are salted into `nBuckets` independent
  * streams (deterministic md5 bucket, doubling as the corpus shuffle),
  * ordered pseudo-randomly inside each, and cut greedily by cumulative
  * token count — a doc belongs to the sequence where its cumulative
  * range STARTS. The budget bound is therefore `maxTokens` plus the
  * overhang of one boundary-straddling doc (strictly under 2·maxTokens
  * when every doc fits the budget; unbounded only for docs that alone
  * exceed it — truncate or split those upstream, e.g. with Chunking).
  * Each bucket's window is one partition's linear scan, so parallelism
  * = nBuckets and no global sort exists; at 100 TB you raise nBuckets
  * to the write parallelism you want.
  */
object SequencePacking {

  /** Per-doc assignment: (bucket, seq_in_bucket) plus the doc's token
    * count. */
  def assign(docs: DataFrame, idCol: String, textCol: String,
             maxTokens: Int, nBuckets: Int): DataFrame =
    assignCounted(
      docs.select(col(idCol),
        TF.tokenCount(col(textCol)).as("n_tokens")),
      idCol, "n_tokens", maxTokens, nBuckets)

  /** [[assign]] for rows whose token counts are already computed (chunked
    * or pre-tokenized corpora): packs on the counts alone, so the text
    * never has to travel through the bucket shuffle — at 100 TB the
    * packing plan moves (id, n_tokens) pairs, not documents. */
  def assignCounted(rows: DataFrame, idCol: String, nTokensCol: String,
                    maxTokens: Int, nBuckets: Int): DataFrame = {
    val id = col(idCol)
    val bucket = pmod(
      conv(substring(md5(concat(lit("pack_"), id.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(nBuckets))
    val w = Window.partitionBy("bucket")
      .orderBy(col("_ord"), id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows.select(id, col(nTokensCol).as("n_tokens"),
        bucket.as("bucket"),
        md5(concat(lit("ord_"), id.cast("string"))).as("_ord"))
      .withColumn("_cum", sum(col("n_tokens")).over(w))
      .select(id, col("n_tokens"), col("bucket"),
        floor((col("_cum") - col("n_tokens")) / maxTokens)
          .as("seq_in_bucket"))
  }

  /** STRICT next-fit packing — the hard-budget sibling of
    * [[assignCounted]]: where the cumulative cut lets one
    * boundary-straddling doc overhang `budget` (acceptable when the
    * collator truncates), next-fit CLOSES the sequence a doc would
    * overflow, so no sequence ever exceeds the budget except an
    * oversized doc sitting alone — the semantics when sequences must
    * fit the context window untruncated. Documents bucket by the
    * non-negative `pmod(id, numBuckets)` (the q225 oracle mirrors pmod
    * explicitly, so negative ids agree) and each bucket packs
    * independently in id
    * order (hash partitioning keeps a bucket whole on one partition;
    * the within-partition sort makes the walk one ordered scan —
    * parallelism = numBuckets, never a driver collect, and the plan
    * moves (id, n) pairs only). Deterministic by construction, so the
    * walk is SQL-mirrorable as a recursive CTE (q225). Returns
    * `(idCol, bucket, seq, seq_fill)`; `seq_fill` is the fill AFTER
    * placing the row — a sequence's last row carries its total. */
  def packNextFit(df: DataFrame, idCol: String, tokensCol: String,
                  budget: Long, numBuckets: Int): DataFrame = {
    require(budget >= 1 && numBuckets >= 1)
    val spark = df.sparkSession
    import spark.implicits._
    val src = df
      .select(col(idCol).cast("long").as("_id"),
        col(tokensCol).cast("long").as("_n"))
      .withColumn("_bucket",
        pmod(col("_id"), lit(numBuckets.toLong)).cast("int"))
      .repartition(col("_bucket"))
      .sortWithinPartitions("_bucket", "_id")
    src.select(col("_bucket"), col("_id"), col("_n"))
      .as[(Int, Long, Long)]
      .mapPartitions { it =>
        var curBucket = Int.MinValue
        var seq = 0L
        var fill = 0L
        it.map { case (b, id, n) =>
          if (b != curBucket) { curBucket = b; seq = 0L; fill = n }
          else if (fill + n > budget) { seq += 1L; fill = n }
          else fill += n
          (id, b, seq, fill)
        }
      }
      .toDF(idCol, "bucket", "seq", "seq_fill")
  }

  /** Packed-sequence manifest: one row per sequence with doc and token
    * counts. */
  def manifest(docs: DataFrame, idCol: String, textCol: String,
               maxTokens: Int, nBuckets: Int): DataFrame =
    assign(docs, idCol, textCol, maxTokens, nBuckets)
      .groupBy("bucket", "seq_in_bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("n_tokens"))

  /** Length-bucketed batching with padding-waste accounting — the other
    * classic batching strategy (pad-to-max within a batch, so group
    * similar lengths together to keep the padding bill down). Docs land
    * in a length bucket (`bucketWidth`-token bands, integer division —
    * no float boundary), are hash-salted into `nSalts` independent
    * streams inside each band (the [[assign]] trick: per-stream windows
    * are one partition's linear scan, so parallelism = bands·salts and
    * no global sort), ordered pseudo-randomly, and cut into batches of
    * `batchSize`. Output is one row per batch: its doc count, max
    * length, real tokens, and `padding` = batchSize·max−Σtokens the
    * pad-to-max collator would add (short tail batches still pad to
    * `batchSize` rows — the fixed-shape-kernel convention).
    *
    * At 100 TB the plan moves (id, n_tokens) pairs only, and the
    * length-band skew (real corpora pile up at the truncation length)
    * is exactly what the salts flatten. */
  def lengthBucketedBatches(rows: DataFrame, idCol: String,
                            nTokensCol: String, bucketWidth: Int,
                            batchSize: Int, nSalts: Int): DataFrame = {
    val id = col(idCol)
    val band = floor((col(nTokensCol) - 1) / bucketWidth).cast("long")
    val salt = pmod(
      conv(substring(md5(concat(lit("lb_"), id.cast("string"))), 1, 8),
        16, 10).cast("long"), lit(nSalts))
    val w = Window.partitionBy("band", "salt").orderBy(col("_ord"), id)
    rows.select(id, col(nTokensCol).as("n_tokens"), band.as("band"),
        salt.as("salt"),
        md5(concat(lit("ord_"), id.cast("string"))).as("_ord"))
      .withColumn("batch_in_salt",
        floor((row_number().over(w) - 1) / batchSize).cast("long"))
      .groupBy("band", "salt", "batch_in_salt")
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("max_len"),
        sum(col("n_tokens")).as("n_tokens"))
      .withColumn("padding",
        lit(batchSize) * col("max_len") - col("n_tokens"))
  }
}
