package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-statistics text scoring: TF-IDF keyword extraction and an
  * n-gram language-model quality score (the CCNet-style "perplexity
  * filter" shape, with the LM trained on the corpus itself).
  *
  * Both operators are two-phase: a corpus-wide statistics aggregate
  * (keyed by term — map-side combinable, bounded by vocabulary size, not
  * corpus size), then one join back onto per-document rows. No driver
  * state: corpus scalars (N docs, vocabulary size) ride along as
  * broadcast one-row crossJoins so the whole thing stays a single lazy
  * plan.
  */
object TextRanking {

  /** Top-`k` characteristic terms per document.
    *
    * Ranking is by (tf desc, df asc, term asc) — exact integer ordering,
    * deterministic in any engine; the familiar `tf·ln(N/df)` score is
    * attached for consumers but never used as a sort key, so floating-
    * point ulps can't reorder results across engines. */
  def topTfIdfTerms(docs: DataFrame, idCol: String, textCol: String,
                    k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(idCol), explode(TF.tokens(col(textCol))).as("term"))
      .groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("_n"))
    val w = Window.partitionBy(idCol)
      .orderBy(col("tf").desc, col("df").asc, col("term").asc)
    tf.join(df, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        round(col("tf") * log(col("_n").cast("double") / col("df")) + 1e-9, 6)
          .as("tfidf"))
  }

  /** Mean negative log-probability per document under a corpus-trained
    * token-bigram LM with add-one smoothing:
    * `p(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + |V|)`.
    *
    * High scores mark improbable (low-quality / out-of-distribution)
    * text — the cheap stand-in for an external LM perplexity filter,
    * with the same pipeline shape: train counts once, score per row.
    * Per-bigram terms are rounded to 9 decimals and summed as exact
    * decimals so the per-doc mean is independent of aggregation order.
    * Documents with fewer than 2 tokens score 0 over 0 bigrams. */
  def bigramLmScore(docs: DataFrame, idCol: String, textCol: String)
  : DataFrame = {
    val bg = docs
      .select(col(idCol), explode(TF.shingles(col(textCol), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cBig = bg.groupBy("bg").agg(count(lit(1)).as("c2"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // prefix counts roll up from the (much smaller) bigram-count table —
    // summing c2 per prefix equals counting bg rows per prefix, without
    // a second full shuffle of the exploded corpus
    val cPre = cBig
      .groupBy(substring_index(col("bg"), " ", 1).as("w1"))
      .agg(sum(col("c2")).as("c1"))
    val vocab = docs
      .select(explode(TF.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("_v"))
    val nlp = bg.join(cBig, Seq("bg")).join(cPre, Seq("w1"))
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        round(-log((col("c2") + lit(1.0)) /
          (col("c1") + col("_v")).cast("double")), 9)
          .cast("decimal(18,9)").as("nlp"))
    val scored = nlp.groupBy(idCol)
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("nlp")).cast("double") / count(lit(1)) + lit(1e-9), 6)
          .as("avg_nll"))
    // eager-materialize the (doc-sized) scores and RELEASE the
    // per-bigram-occurrence cache — `bg` is larger than the corpus, and
    // a lazy return would pin it for the session (the Clustering.kmeans
    // cache-release convention)
    val out = docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("avg_nll"), lit(0.0)).as("avg_nll"))
      .localCheckpoint(true)
    bg.unpersist(false)
    cBig.unpersist(false)
    out
  }

  /** BM25 relevance of every document to a fixed bag of query terms
    * (Robertson-Spärck Jones; the idf variant is Lucene's
    * `ln(1 + (N - df + 0.5)/(df + 0.5))`, always positive).
    *
    * Scale shape: term frequencies only for rows that MATCH a query
    * term — the explode is filtered before the aggregate, so the
    * shuffled tf table is bounded by matches, not corpus tokens; df for
    * the handful of query terms and the corpus scalars (N, avgdl) ride
    * as broadcast one-row/tiny crossJoin-or-join sides. One pass over
    * the corpus for lengths, one for matching tokens.
    *
    * Determinism: per-term partial scores are rounded to 9 decimals and
    * summed as exact decimals (the [[bigramLmScore]] convention), so the
    * per-doc score is independent of term-summation order; the returned
    * score is that decimal sum rounded to 6, never a raw-double sum. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
           queryTerms: Seq[String], k1: Double = 1.2, b: Double = 0.75)
  : DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val toks = docs.select(col(idCol), explode(TF.tokens(col(textCol)))
      .as("term"))
    val dl = docs.select(col(idCol),
      size(TF.tokens(col(textCol))).cast("double").as("_dl"))
    val corpus = dl.agg(count(lit(1)).as("_n"), avg(col("_dl")).as("_avgdl"))
    val hits = toks.filter(col("term").isin(queryTerms: _*))
    val tf = hits.groupBy(idCol, "term").agg(count(lit(1)).as("tf"))
    val df = hits.select(col(idCol), col("term")).distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val idf = log(lit(1.0) +
      (col("_n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val termScore = idf * (col("tf") * (k1 + 1)) /
      (col("tf") + lit(k1) * (lit(1.0) - b + lit(b) * col("_dl") / col("_avgdl")))
    tf.join(broadcast(df), Seq("term"))
      .join(dl, Seq(idCol))
      .crossJoin(broadcast(corpus))
      .select(col(idCol),
        round(termScore, 9).cast("decimal(18,9)").as("_s"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_terms"),
        round(sum(col("_s")).cast("double") + lit(1e-9), 6).as("bm25"))
  }

  /** Frequency-ranked vocabulary: the `k` most common tokens with
    * deterministic contiguous 1-based ids (count desc, token asc) — the
    * tokenizer-training step of a corpus pipeline.
    *
    * Shape at 100 TB: one map-side-combinable hash agg (state bounded
    * by the token domain, not the corpus), then a bounded
    * TakeOrdered(k) — never a global sort of the counts. The
    * id-assigning window runs over the k survivors only (model-sized,
    * single partition by construction — that is the point, not a
    * bottleneck). */
  def buildVocab(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Seq(col("cnt").desc, col("token").asc)
    docs.select(explode(TF.tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(ord: _*).limit(k)
      .withColumn("id", row_number().over(Window.orderBy(ord: _*)))
      .select(col("id"), col("token"), col("cnt"))
  }

  /** Document-level PMI collocations over the top-`vocabSize` tokens:
    * for vocabulary tokens a < b, `pmi = ln(n_ab·N / (n_a·n_b))` from
    * exact document frequencies — the association-mining step behind
    * collocation extraction and topic seeding.
    *
    * The vocabulary restriction IS the scale story: unrestricted
    * co-occurrence is quadratic in per-doc distinct terms, but each
    * doc's vocab-filtered distinct set is ≤ `vocabSize`, so the pair
    * explode is bounded at C(vocabSize, 2) per document. Pairs are
    * generated from one per-doc sorted array (a single groupBy-free
    * projection — tokens are filtered against the broadcast
    * vocabulary, then paired by index in one higher-order expression),
    * never a corpus self-join. All counts are exact integers; only the
    * final ln/division touch floats, on identical operands. */
  def pmiPairs(docs: DataFrame, textCol: String,
               vocabSize: Int = 20, minPairCount: Long = 2): DataFrame = {
    val vocabList = buildVocab(docs, textCol, vocabSize)
      .select(collect_list(col("token")).as("vl"))
    val nDocs = docs.agg(count(lit(1)).as("_nd"))
    // per-doc sorted distinct vocab tokens, paired by index (i < j)
    val toks = docs
      .crossJoin(broadcast(vocabList))
      .select(array_sort(array_distinct(filter(TF.tokens(col(textCol)),
        t => array_contains(col("vl"), t)))).as("ts"))
    val pairs = toks.select(explode(flatten(transform(col("ts"),
        (a, i) => transform(slice(col("ts"), i + 2, size(col("ts"))),
          b => struct(a.as("t_a"), b.as("t_b")))))).as("p"))
      .select(col("p.t_a"), col("p.t_b"))
      .groupBy("t_a", "t_b").agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minPairCount)
    val docFreq = docs
      .crossJoin(broadcast(vocabList))
      .select(explode(array_distinct(filter(TF.tokens(col(textCol)),
        t => array_contains(col("vl"), t)))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("df"))
    pairs
      .join(broadcast(docFreq.select(col("token").as("t_a"),
        col("df").as("n_a"))), Seq("t_a"))
      .join(broadcast(docFreq.select(col("token").as("t_b"),
        col("df").as("n_b"))), Seq("t_b"))
      .crossJoin(broadcast(nDocs))
      .select(col("t_a"), col("t_b"), col("n_ab"), col("n_a"), col("n_b"),
        round(log((col("n_ab") * col("_nd")).cast("double") /
          (col("n_a") * col("n_b")).cast("double")) + lit(1e-9), 6)
          .as("pmi"))
  }
}
