package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Tokenizer-training statistics over a corpus: the byte-pair-merge
  * counting round at the heart of BPE vocabulary induction, and the
  * vocabulary-novelty curve used to monitor ingest drift.
  *
  * Scale shape (the classic BPE trick, Sennrich et al. 2016 §3): pair
  * statistics are computed over the WORD VOCABULARY with multiplicities,
  * not over the corpus — one corpus scan collapses to per-word counts
  * (vocab-sized, with map-side partial aggregation), and the pair
  * explosion then runs on the vocab table. A 100 TB corpus with a 10M-word
  * vocab explodes 10M rows, not 10T. The aggregated pair domain is bounded
  * by |alphabet|² per round, so the final top-k ordering sorts a tiny
  * table — never raw data.
  */
object Tokenizer {

  /** Adjacent character-pair counts within words, weighted by word
    * frequency — exactly the statistic one BPE merge round maximizes.
    * Words shorter than 2 symbols contribute nothing. */
  def bpePairCounts(df: DataFrame, textCol: String): DataFrame = {
    val vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").agg(count(lit(1)).as("wn"))
    vocab
      .select(col("wn"), explode(expr(
        "transform(sequence(0, length(w)-2), i -> substring(w, i+1, 2))"))
        .as("pair"))
      .groupBy("pair").agg(sum(col("wn")).as("cnt"))
  }

  /** The k highest-count pairs, ties broken by pair text — the merge
    * candidates a BPE trainer would adopt, in deterministic order. The
    * input is the aggregated pair table (alphabet²-bounded), so the sort
    * is driver-trivial at any corpus size. */
  def topMerges(pairCounts: DataFrame, k: Int): DataFrame =
    pairCounts.orderBy(col("cnt").desc, col("pair")).limit(k)

  /** Full BPE vocabulary induction (Sennrich et al. 2016 alg. 1) for
    * `merges` rounds: count adjacent symbol pairs over the weighted word
    * vocabulary, adopt the highest-count pair (ties → smallest (a, b)
    * text), merge it in every word, repeat.
    *
    * The corpus is scanned ONCE to build the vocab; every round after
    * that is one vocab-sized pair aggregate (one shuffle) plus a
    * vocab-local merge map, with the vocab localCheckpointed per round
    * so round i never recomputes rounds 1..i-1 (the [[Graphs]] lesson).
    * The only driver-side data is the single winning pair per round —
    * model-sized, like an optimizer state.
    *
    * Returns the adopted merge list in order plus the final vocab
    * (`w`, `wn`, `syms`). */
  def trainBpe(df: DataFrame, textCol: String, merges: Int)
      : (Seq[(String, String)], DataFrame) = {
    require(merges >= 1, s"merges ($merges) must be >= 1")
    // greedy leftmost, non-overlapping — the standard BPE merge walk
    val applyMerge = udf { (syms: Seq[String], a: String, b: String) =>
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.toSeq
    }
    var vocab = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("wn"))
      .withColumn("syms", split(col("w"), ""))
      .localCheckpoint(true)
    val adopted = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var rounds = 0
    while (rounds < merges) {
      rounds += 1
      val best = vocab.filter(size(col("syms")) >= 2)
        .select(col("wn"), explode(expr(
          "transform(sequence(0, size(syms)-2), " +
            "i -> struct(syms[i] AS a, syms[i+1] AS b))")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("wn")).as("cnt"))
        .orderBy(col("cnt").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) rounds = merges // fully merged — stop early
      else {
        val (a, b) = (best.head.getString(0), best.head.getString(1))
        adopted += ((a, b))
        vocab = vocab.withColumn("syms",
          applyMerge(col("syms"), lit(a), lit(b))).localCheckpoint(true)
      }
    }
    (adopted.toSeq, vocab)
  }

  /** BPE ENCODING: apply a trained merge list to a text column,
    * producing each document's subword token sequence — the op a
    * pipeline runs corpus-wide after [[trainBpe]] ran once (training is
    * a vocab-sized job; ENCODING is the 100 TB scan). Tokenization
    * mirrors [[TextFunctions.tokens]] (trim + split on whitespace), then
    * each word is split to characters and the merges replay IN ADOPTED
    * ORDER, each pass greedy-leftmost non-overlapping — the exact walk
    * `trainBpe` used, so encoding a training word reproduces its final
    * vocab symbols (spec invariant). One zero-shuffle projection; the
    * merge list is model-sized and rides the UDF closure as a broadcast.
    */
  def bpeEncode(df: DataFrame, textCol: String,
                merges: Seq[(String, String)],
                outCol: String = "bpe"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(merges.toArray)
    val enc = udf { (text: String) =>
      if (text == null) null
      else {
        val t = text.trim
        if (t.isEmpty) Seq.empty[String]
        else t.split("\\s+").toSeq.flatMap { w =>
          var syms: Array[String] = w.map(_.toString).toArray
          bc.value.foreach { case (a, b) =>
            if (syms.length >= 2) {
              val out = Array.newBuilder[String]
              var i = 0
              while (i < syms.length) {
                if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
                  out += (a + b); i += 2
                } else { out += syms(i); i += 1 }
              }
              syms = out.result()
            }
          }
          syms.toSeq
        }
      }
    }
    df.withColumn(outCol, enc(col(textCol)))
  }

  /** Vocabulary-novelty curve: for an ingest order expressed as a bucket
    * column, how many never-seen-before terms first appear in each
    * bucket. Two hash aggregates (term → min bucket, then bucket →
    * count) — no windows, no driver state; the shape that lets a
    * pipeline monitor "is this crawl still finding new language?" over
    * an unbounded ingest. */
  def noveltyCurve(df: DataFrame, termCol: String,
                   bucketCol: String): DataFrame =
    df.groupBy(col(termCol))
      .agg(min(col(bucketCol)).as("first_bucket"))
      .groupBy("first_bucket")
      .agg(count(lit(1)).as("new_terms"))
}
