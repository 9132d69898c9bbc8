package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[IndexClone.cloneIndex]] / [[Similarity.fleetClone]] — the
  * backup/restore verb: byte-level point-in-time copies behind one
  * manifest flip at the target. */
class IndexCloneSpec extends SparkSpec {
  import spark.implicits._

  private def fresh() = graft.util.TempDirs.fresh("clone_")

  test("cloneIndex: the clone answers like the source, is independent " +
    "after the copy, carries pending tombstone debt, and refuses a " +
    "non-virgin target") {
    def ang(deg: Double): Array[Float] = Array(
      math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val corpus = ((0 until 6).map(i => (i.toLong, ang(10.0 + i))) ++
      (0 until 6).map(i => (10L + i, ang(80.0 + i)))).toDF("id", "v")
    val srcD = fresh(); val dstD = fresh()
    try {
      val src = srcD.getAbsolutePath
      val dst = dstD.getAbsolutePath + "/ivf"
      Similarity.ivfBuild(corpus, src, nList = 2, kmeansMaxIter = 2)
      Similarity.ivfAppend(spark, src,
        Seq((20L, ang(12.0))).toDF("id", "v"))
      // a pending (unfolded) retraction must travel with the clone
      Similarity.ivfDelete(spark, src, Seq(5L).toDF("id"))
      val report = IndexClone.cloneIndex(spark, src, dst)
      val tables = report.select("table").as[String].collect().toSet
      assert(tables.contains("postings") && tables.contains("centroids")
        && tables.contains("tombstones"), s"$tables")
      assert(report.select("bytes").as[Long].collect().forall(_ > 0L))
      val q = Seq((0L, ang(11.0))).toDF("qid", "qv")
      def ids(dir: String) = Similarity.ivfQuery(spark, dir, q, k = 6,
        nProbe = 1).select("id").as[Long].collect().toSet
      assert(ids(dst) == ids(src), "clone answers like the source")
      assert(!ids(dst).contains(5L),
        "the cloned tombstone keeps hiding the retracted id")
      // independence: a post-clone append lands only where it was sent
      Similarity.ivfAppend(spark, dst,
        Seq((30L, ang(81.0))).toDF("id", "v"))
      def rows(dir: String) = spark.read.parquet(
        Manifest.snapshot(spark, dir).path("postings")).count()
      assert(rows(dst) == rows(src) + 1,
        "the clone's writer lock domain is its own")
      // a clone is a new index, never a merge
      val e = intercept[IllegalArgumentException](
        IndexClone.cloneIndex(spark, src, dst))
      assert(e.getMessage.contains("virgin"))
    } finally Seq(srcD, dstD)
      .foreach(graft.util.TempDirs.deleteRecursively)
  }

  test("cloneIndex version pin: a clone at the pre-delete-fold version " +
    "still carries the row the latest version physically dropped") {
    val texts = Seq(0L -> "alpha beta", 1L -> "gamma delta",
      2L -> "epsilon zeta").toDF("id", "text")
    val srcD = fresh(); val dstD = fresh()
    try {
      val src = srcD.getAbsolutePath
      Dedup.exactIndexBuild(texts, src, "id", "text")
      Dedup.exactIndexCompact(spark, src) // v1
      Dedup.exactIndexDelete(spark, src,
        Seq(1L -> "gamma delta").toDF("id", "text"), "id", "text")
      Dedup.exactIndexCompact(spark, src) // v2: hash physically gone
      val v2 = Manifest.snapshot(spark, src).version
      assert(v2 >= 2)
      val pinned = dstD.getAbsolutePath + "/pinned"
      val latest = dstD.getAbsolutePath + "/latest"
      IndexClone.cloneIndex(spark, src, pinned, version = Some(v2 - 1))
      IndexClone.cloneIndex(spark, src, latest)
      def live(dir: String): Long = {
        val snap = Manifest.snapshot(spark, dir)
        Tombstones.live(spark, snap,
          spark.read.parquet(snap.path("hashes"))).count()
      }
      assert(live(latest) == 2L)
      // the pinned clone copied the PRE-fold physical state: the
      // doomed hash is still on disk there, hidden by its (also
      // copied) tombstone — exactly the source's v1+delete state
      val pinnedSnap = Manifest.snapshot(spark, pinned)
      assert(spark.read.parquet(pinnedSnap.path("hashes")).count() == 3L)
      assert(live(pinned) == 2L)
    } finally Seq(srcD, dstD)
      .foreach(graft.util.TempDirs.deleteRecursively)
  }

  test("fleetClone: mixed-family sweep with per-row isolation — a " +
    "sabotaged member reports failed, the rest back up") {
    val exD = fresh(); val mhD = fresh(); val dstD = fresh()
    try {
      val texts = Seq(0L -> "alpha beta gamma delta epsilon zeta",
        1L -> "eta theta iota kappa lambda mu").toDF("id", "text")
      val ex = exD.getAbsolutePath + "/ex"
      val mh = mhD.getAbsolutePath + "/mh"
      val ghost = mhD.getAbsolutePath + "/ghost"
      Dedup.exactIndexBuild(texts, ex, "id", "text")
      Dedup.minhashIndexBuild(texts, mh, "id", "text")
      val rep = Similarity.fleetClone(spark, Seq(ex, mh, ghost),
        dstD.getAbsolutePath + "/backups", parallelism = 3)
        .select("src", "family", "status").collect()
        .map(r => r.getString(0) -> ((r.getString(1), r.getString(2))))
        .toMap
      assert(rep(ex) == (("exact", "executed")))
      assert(rep(mh) == (("minhash", "executed")))
      assert(rep(ghost)._2 == "failed",
        s"an empty dir has nothing to clone: ${rep(ghost)}")
      val probe = Dedup.exactIndexProbe(spark,
        dstD.getAbsolutePath + "/backups/ex",
        Seq(5L -> "alpha beta gamma delta epsilon zeta")
          .toDF("id", "text"), "id", "text")
        .select("is_dup").head().getBoolean(0)
      assert(probe, "the backed-up exact set answers probes")
    } finally Seq(exD, mhD, dstD)
      .foreach(graft.util.TempDirs.deleteRecursively)
  }
}
