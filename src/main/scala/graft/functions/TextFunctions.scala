package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for large-scale corpus pipelines:
  * tokenization, quality scoring, language ID, fingerprinting, shingling,
  * MinHash signatures. Everything here is built from codegen'd Catalyst
  * builtins (split / transform / aggregate / md5) — no Scala UDFs — so the
  * whole pipeline stays inside WholeStageCodegen and scales linearly over
  * a 100 TB corpus with zero shuffles until an explicit groupBy/join.
  *
  * Determinism note: md5 is used as the hash everywhere so results are
  * identical across engines, runs, and cluster layouts.
  */
object TextFunctions {

  /** Whitespace tokens of trimmed text (empty text → empty array). */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Fraction of tokens found in `stop` (lower-cased match). */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      size(filter(t, x => lower(x).isInCollection(stop))).cast("double") /
        size(t))
  }

  /** Mean token length: non-whitespace chars / token count. */
  def meanTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      length(regexp_replace(trim(text), "\\s+", "")).cast("double") / size(t))
  }

  /** Composite heuristic quality score in [0,1]: favors mid-length docs
    * with a healthy stopword ratio and moderate token length. */
  def qualityScore(text: Column, stop: Seq[String]): Column = {
    val n = tokenCount(text).cast("double")
    val lengthTerm = least(n / lit(100.0), lit(1.0))
    val stopTerm = least(stopwordRatio(text, stop) * 4.0, lit(1.0))
    val lenTok = meanTokenLen(text)
    val tokTerm = when(lenTok.between(3.0, 10.0), 1.0).otherwise(0.5)
    lengthTerm * 0.4 + stopTerm * 0.4 + tokTerm * 0.2
  }

  /** Per-language stopword tables for the n-gram/stopword language-ID
    * heuristic (public-knowledge most-frequent words). */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "a"),
    "fr" -> Seq("le", "la", "et", "les", "des", "un", "une"),
    "de" -> Seq("der", "die", "und", "das", "nicht", "ist", "ein"),
    "es" -> Seq("el", "los", "y", "que", "en", "una", "por"))

  /** Language ID by stopword hit counting with a deterministic preference
    * order (first language with the max count wins; all-zero → "und"). */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val hits = langStopwords.map { case (lang, words) =>
      lang -> size(filter(t, x => lower(x).isInCollection(words)))
    }
    val maxHits = greatest(hits.map(_._2): _*)
    hits.foldRight(lit("und"): Column) { case ((lang, h), acc) =>
      when(h === maxHits && h > 0, lit(lang)).otherwise(acc)
    }
    // foldRight keeps the declared order as the tie-break preference
  }

  /** Document fingerprint: stable 16-hex-digit digest prefix. */
  def fingerprint(text: Column): Column = substring(md5(text), 1, 16)

  /** Word n-gram shingles (space-joined); fewer than n tokens → empty. */
  def shingles(text: Column, n: Int): Column = {
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(t) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(t, i + j)): _*)))
  }

  def distinctShingles(text: Column, n: Int): Column =
    array_distinct(shingles(text, n))

  /** One MinHash value: the minimum md5 (as hex string — lexicographic min
    * of fixed-width hex equals numeric min) of seeded shingles. Empty
    * shingle set → null. */
  def minhash(shingleArr: Column, seed: Int): Column =
    array_min(transform(shingleArr, s => md5(concat(lit(seed.toString), s))))

  /** k-wide MinHash signature as an array of hex strings. */
  def minhashSignature(text: Column, n: Int, k: Int): Column = {
    val sh = distinctShingles(text, n)
    array((0 until k).map(seed => minhash(sh, seed)): _*)
  }

  /** LSH band id: hash of a contiguous slice of the signature. Docs sharing
    * a band are near-duplicate candidates. */
  def lshBand(signature: Column, bandStart: Int, bandSize: Int): Column =
    md5(concat_ws("|",
      (bandStart until bandStart + bandSize).map(i =>
        element_at(signature, i + 1)): _*))

  /** n-gram Jaccard similarity between two *distinct-shingle* arrays. */
  def jaccard(a: Column, b: Column): Column =
    when(size(array_union(a, b)) === 0, lit(0.0)).otherwise(
      size(array_intersect(a, b)).cast("double") / size(array_union(a, b)))

  /** 64-bit SimHash from tokens: per-token md5-derived 64-bit value; each
    * bit votes +1/-1 weighted by term frequency; sign → bit. Built from
    * builtins: conv(md5 hex slice) gives 2×32-bit halves. */
  def simhash64(text: Column): Column = {
    val t = tokens(text)
    // per token: two 32-bit words from md5
    val words = transform(t, tok => struct(
      conv(substring(md5(tok), 1, 8), 16, 10).cast("long").as("hi"),
      conv(substring(md5(tok), 9, 8), 16, 10).cast("long").as("lo")))
    // majority vote over tokens for each of 64 bits: a bit is set in the
    // simhash iff more than half the tokens have it set
    val nTok = size(t)
    def packBits(field: String): Column =
      (0 until 32).map { bit =>
        val ones = aggregate(words, lit(0L), (vacc, w) =>
          vacc + shiftright(w.getField(field), bit).bitwiseAND(lit(1L)))
        when(ones * 2 > nTok.cast("long"), shiftleft(lit(1L), bit))
          .otherwise(lit(0L))
      }.reduce(_ bitwiseOR _)
    when(nTok === 0, lit(0L)).otherwise(
      shiftleft(packBits("hi"), 32).bitwiseOR(packBits("lo")))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
