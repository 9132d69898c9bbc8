package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** DSIR importance-resampling selection: weight semantics, edge cases,
  * determinism, and the bounded-state scale contract. */
class DataSelectionSpec extends SparkSpec {
  import spark.implicits._

  // two distinctive vocabularies: target docs speak "alpha beta ...",
  // raw-only docs speak "omega psi ..." — a target-matching candidate
  // must outscore a raw-matching one
  private def corpus = Seq(
    (1L, "alpha beta gamma alpha beta", true),
    (2L, "beta gamma alpha beta gamma", true),
    (3L, "omega psi chi omega psi", false),
    (4L, "psi chi omega psi chi", false),
    (5L, "alpha beta gamma beta alpha", false), // target-like candidate
    (6L, "omega psi omega chi psi", false),     // raw-like candidate
    (7L, "", false),                            // no bigrams
    (8L, "single", false)                       // one token, no bigrams
  ).toDF("doc_id", "text", "is_t")

  test("target-matching candidates outscore raw-matching ones") {
    val w = DataSelection
      .dsirWeights(corpus, "doc_id", "text", "is_t", buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(w.size == 8)
    assert(w(5L) > w(6L), s"target-like ${w(5L)} vs raw-like ${w(6L)}")
    // the target docs themselves score above the raw-vocab docs
    assert(math.min(w(1L), w(2L)) > math.max(w(3L), w(4L)))
  }

  test("documents without bigrams weigh 0 over 0 bigrams") {
    val rows = DataSelection
      .dsirWeights(corpus, "doc_id", "text", "is_t", buckets = 64)
      .filter(col("doc_id") >= 7L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.toSet == Set((7L, 0L, 0.0), (8L, 0L, 0.0)))
  }

  test("weights are partitioning-independent (decimal-exact sums)") {
    val a = DataSelection
      .dsirWeights(corpus, "doc_id", "text", "is_t", buckets = 64)
    val b = DataSelection
      .dsirWeights(corpus.repartition(7), "doc_id", "text", "is_t",
        buckets = 64)
    assert(a.collect().toSet == b.collect().toSet)
  }

  test("dsirSelect returns m rows, weight-desc with id tiebreak") {
    val top = DataSelection
      .dsirSelect(corpus, "doc_id", "text", "is_t", m = 3, buckets = 64)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(top.length == 3)
    assert(top.map(_._2).sameElements(top.map(_._2).sorted.reverse))
    // ties (if any) must come out in id order
    top.sliding(2).foreach { case Array((ida, wa), (idb, wb)) =>
      assert(wa > wb || (wa == wb && ida < idb))
    }
  }

  test("bucket state is fixed-size whatever the corpus (scale contract)") {
    // 200 docs over a large vocabulary still produce ≤ buckets rows of
    // distribution state — the hashed-feature point of DSIR
    val big = (1L to 200L)
      .map(i => (i, (1 to 20).map(j => s"w${(i * 31 + j * 7) % 997}")
        .mkString(" "), i % 5 == 0))
      .toDF("doc_id", "text", "is_t")
    val w = DataSelection.dsirWeights(big, "doc_id", "text", "is_t",
      buckets = 16)
    assert(w.count() == 200)
    // every weight is a sum of per-bucket log-ratios from ≤16 buckets;
    // distinct summand values across the corpus are therefore bounded
    val distinctPerBucketTerms = big
      .select(explode(graft.functions.TextFunctions
        .shingles(col("text"), 2)).as("bg"))
      .select(pmod(conv(substring(md5(col("bg")), 1, 8), 16, 10)
        .cast("long"), lit(16L)).as("b")).distinct().count()
    assert(distinctPerBucketTerms <= 16)
  }
}
