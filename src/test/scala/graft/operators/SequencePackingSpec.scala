package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SequencePackingSpec extends SparkSpec {

  test("packing covers every doc once and respects the cut property") {
    import spark.implicits._
    val rnd = new scala.util.Random(5)
    val docs = (1L to 800L).map(i =>
      (i, (1 to (1 + rnd.nextInt(60))).map(_ => "tok").mkString(" ")))
      .toDF("doc_id", "text").repartition(7)
    val maxTokens = 100
    val assign = SequencePacking.assign(docs, "doc_id", "text",
      maxTokens, nBuckets = 4)

    // every doc exactly once, token counts preserved
    assert(assign.count() == 800)
    assert(assign.select(countDistinct("doc_id")).first().getLong(0) == 800)
    val totalTokens = assign.agg(sum("n_tokens")).first().getLong(0)
    assert(totalTokens ==
      docs.select(sum(graft.functions.TextFunctions.tokenCount(col("text"))))
        .first().getLong(0))

    // cut property: a sequence minus its LAST doc (in pack order the
    // cumulative start of every member is < maxTokens past the seq
    // start) fits the budget — i.e. each member's in-seq start offset
    // is < maxTokens
    val m = SequencePacking.manifest(docs, "doc_id", "text",
      maxTokens, nBuckets = 4)
    val bad = m.filter(col("n_tokens") - lit(maxTokens) >= lit(maxTokens))
      .count() // a seq can overhang by at most one doc (< maxTokens here)
    assert(bad == 0, "some sequence exceeds budget by a full window")

    // sequence ids are contiguous from 0 within each bucket
    val gaps = m.groupBy("bucket")
      .agg(min("seq_in_bucket").as("mn"), max("seq_in_bucket").as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1)
      .count()
    assert(gaps == 0, "sequence ids must be dense per bucket")

    // deterministic under repartitioning
    val again = SequencePacking.assign(docs.repartition(3), "doc_id",
      "text", maxTokens, nBuckets = 4)
    assert(assign.exceptAll(again).isEmpty && again.exceptAll(assign).isEmpty)
  }

  test("length-bucketed batches: invariants and determinism") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val rows = (1L to 600L).map(i => (i, 1 + rnd.nextInt(80)))
      .toDF("doc_id", "n_tokens").repartition(5)
    val b = SequencePacking.lengthBucketedBatches(rows, "doc_id",
      "n_tokens", bucketWidth = 16, batchSize = 8, nSalts = 4)
      .persist()

    // every doc lands in exactly one batch; token mass preserved
    assert(b.agg(sum("n_docs")).first().getLong(0) == 600)
    assert(b.agg(sum("n_tokens")).first().getLong(0) ==
      rows.agg(sum("n_tokens")).first().getLong(0))

    // batches never exceed batchSize docs; padding is the pad-to-max
    // bill and non-negative; max_len stays inside its band
    assert(b.filter(col("n_docs") > 8).count() == 0)
    assert(b.filter(col("padding") =!=
      lit(8) * col("max_len") - col("n_tokens")).count() == 0)
    assert(b.filter(col("padding") < 0).count() == 0)
    assert(b.filter(col("max_len") > (col("band") + 1) * 16 ||
      col("max_len") < col("band") * 16 + 1).count() == 0)

    // batch ids dense from 0 within each (band, salt) stream
    val gaps = b.groupBy("band", "salt")
      .agg(min("batch_in_salt").as("mn"), max("batch_in_salt").as("mx"),
        count(lit(1)).as("n"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1).count()
    assert(gaps == 0)

    // deterministic under repartitioning
    val again = SequencePacking.lengthBucketedBatches(rows.repartition(3),
      "doc_id", "n_tokens", bucketWidth = 16, batchSize = 8, nSalts = 4)
    assert(b.exceptAll(again).isEmpty && again.exceptAll(b).isEmpty)
    b.unpersist()
  }
}
