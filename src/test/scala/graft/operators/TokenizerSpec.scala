package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed BPE pair statistics and novelty-curve cases (q137/q138
  * gate the corpus-scale versions against the DuckDB oracle). */
class TokenizerSpec extends SparkSpec {
  import spark.implicits._

  test("bpePairCounts weights pairs by word frequency") {
    // corpus: "low low lower" + "low" → vocab {low:3, lower:1}
    // pairs: low → lo,ow ×3; lower → lo,ow,we,er ×1
    val df = Seq("low low lower", "low").toDF("text")
    val got = Tokenizer.bpePairCounts(df, "text")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("lo" -> 4L, "ow" -> 4L, "we" -> 1L, "er" -> 1L))
  }

  test("single-char words contribute nothing; empty corpus is empty") {
    val df = Seq("a b c", "").toDF("text")
    assert(Tokenizer.bpePairCounts(df, "text").count() == 0L)
  }

  test("topMerges orders by count desc then pair text") {
    val df = Seq("ab ab ba").toDF("text")
    // pairs: ab×2, ba×1 — deterministic order
    val top = Tokenizer.topMerges(Tokenizer.bpePairCounts(df, "text"), 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(top == Seq(("ab", 2L), ("ba", 1L)))
  }

  test("trainBpe reproduces the classic merge sequence") {
    // Sennrich's toy vocab {low:5, lower:2, newest:6, widest:3} without
    // the end-of-word marker: pair counts put (e,s) and (s,t) tied at 9,
    // tie-break adopts (e,s); round 2's (es,t) count 9 wins
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val (merges, vocab) = Tokenizer.trainBpe(words.toDF("text"), "text", 2)
    assert(merges == Seq(("e", "s"), ("es", "t")))
    val syms = vocab.filter(col("w") === "newest")
      .select("syms").collect().head.getSeq[String](0)
    assert(syms == Seq("n", "e", "w", "est"))
  }

  test("trainBpe stops early when every word is one symbol") {
    val (merges, _) = Tokenizer.trainBpe(Seq("ab ab").toDF("text"),
      "text", 5)
    assert(merges == Seq(("a", "b"))) // after one merge nothing pairs
  }

  test("bpeEncode replays trained merges: encoding a training word " +
    "reproduces its final vocab symbols") {
    val words = Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest")
    val (merges, vocab) = Tokenizer.trainBpe(words.toDF("text"), "text", 3)
    // every vocab word, re-encoded from raw text, lands on exactly the
    // symbol sequence training left it with — train/encode agree
    val enc = Tokenizer.bpeEncode(vocab.select(col("w").as("text")),
      "text", merges)
    val mismatches = enc.select(col("text"), col("bpe"))
      .collect().map { r =>
        val want = vocab.filter(col("w") === r.getString(0))
          .select("syms").head().getSeq[String](0)
        (r.getString(0), r.getSeq[String](1), want)
      }.filter { case (_, got, want) => got != want }
    assert(mismatches.isEmpty, mismatches.mkString("\n"))
    // multi-word documents flatten in order; unseen words fall back to
    // characters (plus any merges that happen to apply)
    val doc = Tokenizer.bpeEncode(
      Seq("newest news").toDF("text"), "text", merges)
      .select("bpe").head().getSeq[String](0)
    assert(doc.startsWith(vocab.filter(col("w") === "newest")
      .select("syms").head().getSeq[String](0)), doc.toString)
    // null and empty texts behave like TextFunctions.tokens
    val edge = Tokenizer.bpeEncode(
      Seq(Some(""), Some("  "), None).toDF("text"), "text", merges)
      .select("bpe").collect()
    assert(edge(0).getSeq[String](0).isEmpty)
    assert(edge(1).getSeq[String](0).isEmpty)
    assert(edge(2).isNullAt(0))
  }

  test("packNextFit packs per bucket in id order; oversized " +
    "docs isolate; partitioning-invariant") {
    import spark.implicits._
    // one bucket (ids all ≡ 0 mod 1): budget 10, sizes walk the edges
    val df = Seq(
      (0L, 4L), (1L, 5L),         // seq 0: fill 4, 9
      (2L, 2L),                   // 9+2 > 10 -> seq 1: fill 2
      (3L, 25L),                  // oversize -> seq 2 alone: fill 25
      (4L, 1L),                   // fill 25+1 > 10 -> seq 3: fill 1
      (5L, 9L),                   // 1+9 = 10 fits exactly -> fill 10
      (6L, 1L)                    // -> seq 4
    ).toDF("id", "n")
    val got = SequencePacking.packNextFit(df, "id", "n", budget = 10L,
      numBuckets = 1)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == Seq((0L, 0L, 4L), (1L, 0L, 9L), (2L, 1L, 2L),
      (3L, 2L, 25L), (4L, 3L, 1L), (5L, 3L, 10L), (6L, 4L, 1L)),
      got.mkString(","))
    // multi-bucket: sequences never cross buckets, numbering per bucket
    val multi = SequencePacking.packNextFit(df, "id", "n", budget = 10L,
      numBuckets = 3)
    val byBucket = multi.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSeq
    assert(byBucket.forall { case (id, b, _) => b == (id % 3).toInt })
    assert(byBucket.filter(_._2 == 0).map(_._3).min == 0L)
    // invariant under input partitioning
    val again = SequencePacking.packNextFit(df.repartition(5), "id", "n",
      budget = 10L, numBuckets = 3).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(again == multi.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
      .toSet)
  }

  test("noveltyCurve counts first occurrences per bucket") {
    val df = Seq(
      (0L, "x"), (0L, "y"), (1L, "x"), (1L, "z"), (2L, "x"), (2L, "z")
    ).toDF("bucket", "term")
    val got = Tokenizer.noveltyCurve(df, "term", "bucket")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // x,y new in bucket 0; z new in bucket 1; nothing new in bucket 2
    assert(got == Map(0L -> 2L, 1L -> 1L))
  }
}
