package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The bloom pre-filter is a superset prune: join results must be
  * row-for-row the plain join, and the prune must actually prune. */
class BloomJoinSpec extends SparkSpec {

  test("bloom-filtered join equals the plain join and prunes the scan") {
    import spark.implicits._
    val big = (1 to 20000).map(i => (i.toLong % 5000, i.toLong))
      .toDF("key", "uid")
    // selective small side: 1% of the key space
    val small = (0 to 49).map(k => (k.toLong, s"dim$k")).toDF("key", "name")

    val got = BloomJoin.join(big, small, "key",
      estItems = 1000L, numBits = 1L << 16)
    val want = big.join(small, "key")
    assert(got.count() == want.count())
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

    // the probe alone keeps far fewer rows than the full scan (false
    // positives allowed, misses not)
    val bf = small.agg(
      org.apache.spark.sql.classic.GraftColumnShims.column(
        org.apache.spark.sql.catalyst.expressions.GraftBloomShims.bloomAgg(
          org.apache.spark.sql.classic.GraftColumnShims.expression(
            xxhash64(col("key"))), 1000L, 1L << 16)).as("_bf"))
    val pruned = big.filter(
      org.apache.spark.sql.classic.GraftColumnShims.column(
        org.apache.spark.sql.catalyst.expressions.GraftBloomShims
          .mightContain(bf,
            org.apache.spark.sql.classic.GraftColumnShims.expression(
              xxhash64(col("key")))))).count()
    assert(pruned >= want.count(), "bloom must never drop a true match")
    assert(pruned < 20000 / 10,
      s"bloom kept $pruned of 20000 rows - not selective")
  }
}
