package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => TF}

/** Rule-based document quality filtering in the style of Gopher's
  * heuristics (Rae et al. 2021, arXiv:2112.11446 §A1.1), the stage a
  * corpus pipeline runs before any model-based scoring: cheap,
  * explainable, per-rule verdicts that an operator downstream can AND
  * together or audit individually. The reference engine has no corpus
  * layer; this mirrors the published rule family the way MassiveText /
  * RefinedWeb / Dolma describe it, restricted to the rules that are
  * well-defined on whitespace-token text (word-count bounds, mean word
  * length, duplicate-bigram repetition, stopword presence).
  *
  * Shape at 100 TB: a pure per-row projection — every rule is a codegen
  * expression over the token array (built once per row and shared by
  * Catalyst CSE), zero shuffles, and the verdict columns are
  * boolean/long so downstream filters stay whole-stage-codegen'd. The
  * repetition rule reuses the single-pass shingle builder, so the whole
  * operator stays linear in document bytes.
  */
object QualityRules {

  /** Default stopword rule list (Gopher uses a similar "must contain at
    * least 2 of" English function-word list). */
  val defaultStopwords: Seq[String] =
    Seq("the", "a", "of", "to", "and", "in", "is")

  /** Append per-rule verdict columns and an overall `keep` to `docs`.
    *
    * Added columns: `n_words` (long), `r_word_count`, `r_mean_word_len`,
    * `r_dup_bigram`, `r_stopwords` (boolean rule verdicts), `keep`
    * (their conjunction). All verdicts are exact: the doubles compared
    * against thresholds are ratios of integers both engines compute
    * identically, so the booleans are reproducible bit-for-bit. */
  def gopherRules(docs: DataFrame, textCol: String = "text",
                  minWords: Int = 50, maxWords: Int = 100000,
                  minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                  maxDupBigram: Double = 0.2,
                  stopwords: Seq[String] = defaultStopwords,
                  minStopHits: Int = 2): DataFrame = {
    val text = col(textCol)
    val toks = TF.tokens(text)
    val nWords = TF.tokenCount(text)
    // distinct stopword hits as an exact integer sum (array_contains per
    // listed word), not a set intersection — intersection dedup rules
    // differ across engines, integer sums do not
    // foldLeft, not reduce: an empty caller-supplied stopword list must
    // degrade to zero hits (rule passes only if minStopHits <= 0), not
    // throw UnsupportedOperationException
    val stopHits = stopwords
      .map(w => array_contains(toks, w).cast("int"))
      .foldLeft(lit(0): Column)(_ + _)
    docs
      .withColumn("n_words", nWords.cast("long"))
      .withColumn("r_word_count",
        col("n_words").between(minWords, maxWords))
      .withColumn("r_mean_word_len",
        TF.meanTokenLen(text).between(minMeanLen, maxMeanLen))
      .withColumn("r_dup_bigram",
        TF.duplicateNgramFraction(text, 2) <= maxDupBigram)
      .withColumn("r_stopwords", stopHits >= minStopHits)
      .withColumn("keep",
        col("r_word_count") && col("r_mean_word_len") &&
          col("r_dup_bigram") && col("r_stopwords"))
  }

  /** Convenience: the rows `gopherRules` keeps, original schema. */
  def filterByRules(docs: DataFrame, textCol: String = "text",
                    minWords: Int = 50): DataFrame = {
    val flagged = gopherRules(docs, textCol, minWords = minWords)
    flagged.filter(col("keep")).select(docs.columns.map(col): _*)
  }
}
