package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking: split each document into
  * `chunkTokens`-token windows every `stride` tokens (overlap =
  * chunkTokens − stride) — the preprocessing step for context-bounded
  * training examples and RAG passage indexes.
  *
  * Pure per-row codegen'd array work (split once, slice per chunk, no
  * UDF) followed by one explode — zero shuffle, so it composes with a
  * partitioned write at any corpus size. A document yields
  * ⌈n/stride⌉ chunks (the last may be short); empty docs yield none.
  */
object Chunking {

  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkTokens: Int, stride: Int): DataFrame = {
    require(stride > 0 && chunkTokens >= stride,
      "need chunkTokens >= stride > 0")
    val toks = TF.tokens(col(textCol))
    val n = size(toks)
    val idxs = when(n > lit(0),
      sequence(lit(0), ((n - 1) / stride).cast("int")))
      .otherwise(array().cast("array<int>"))
    docs.select(col(idCol), explode(idxs).as("chunk_idx"), toks.as("_t"))
      .select(col(idCol), col("chunk_idx"),
        slice(col("_t"), col("chunk_idx") * stride + 1, lit(chunkTokens))
          .as("_c"))
      .select(col(idCol), col("chunk_idx"),
        array_join(col("_c"), " ").as("chunk_text"),
        size(col("_c")).as("n_tokens"))
  }
}
