package graft.operators

import graft.functions.{TextFunctions => TF, VectorOps => V}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus deduplication at training-data scale.
  *
  * Five strategies, cheapest first. All candidate generation is
  * bucket-based (groupBy / equi-join on a hash), never an unbucketed
  * cross-join — the difference between O(n) + shuffle and O(n²) at 100 TB.
  */
object Dedup {

  /** Exact dedup: one hash-aggregate over md5(text). Keeps the minimum id
    * per content hash and reports the multiplicity. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Incremental exact dedup: which docs of a `delta` batch are new?
    * A doc is dropped if its content hash already exists in the base
    * corpus (join against the base's hash set — at scale that set is a
    * stored table, not a rescan) or if an earlier delta doc (lower id)
    * has the same hash. The refresh-time path: the full-corpus
    * [[exact]] pass runs once, then every ingest batch runs this. */
  def incrementalExact(delta: DataFrame, base: DataFrame, idCol: String,
                       textCol: String): DataFrame = {
    val baseHashes = base.select(md5(col(textCol)).as("content_hash"))
      .distinct()
    val d = delta.select(col(idCol), md5(col(textCol)).as("content_hash"))
    val newInDelta = d.join(baseHashes, Seq("content_hash"), "left_anti")
    val keeper = newInDelta.groupBy("content_hash")
      .agg(min(col(idCol)).as("_keep"))
    delta.select(col(idCol), md5(col(textCol)).as("content_hash"))
      .join(keeper, Seq("content_hash"), "left")
      .select(col(idCol),
        (col("_keep").isNotNull && col("_keep") === col(idCol))
          .as("is_new"))
  }

  // ---- persisted exact-hash index ---------------------------------
  //
  // [[incrementalExact]]'s own contract says it: "at scale that set is
  // a stored table, not a rescan". This is that table — the seventh
  // persisted family, and the cheapest: one 32-char md5 per distinct
  // document text. Same operational contract as every other family
  // (writers under [[Manifest.withLock]], compaction behind a manifest
  // flip, one health row for the fleet table). Appends write the
  // BATCH's distinct hashes without anti-joining the stored set (an
  // anti-join would scan the corpus-sized table per batch); duplicate
  // hashes across appends are harmless to probes (semi-join semantics)
  // and are folded out by [[exactIndexCompact]].

  /** Build the persisted exact-dedup index: the corpus's distinct
    * content hashes. In-place fresh build (reader-UNSAFE, like every
    * fresh build in this package). */
  def exactIndexBuild(docs: DataFrame, dir: String, idCol: String,
                      textCol: String): Unit = {
    docs.select(md5(col(textCol)).as("h")).distinct()
      .write.mode("overwrite").parquet(s"$dir/hashes.parquet")
    Manifest.reset(docs.sparkSession, dir)
  }

  /** Append an accepted batch's distinct hashes — one batch scan, no
    * stored-set rescan. Lock held for the whole drop, table resolved
    * through the snapshot inside it. With `batchId` set the batch is
    * also recorded in the index's [[IngestLog]] (same locked span, data
    * first) so [[CorpusPipeline.fleetIngestReconcile]] can detect a
    * multi-family admission that crashed between appends. */
  def exactIndexAppend(spark: org.apache.spark.sql.SparkSession,
                       dir: String, batch: DataFrame, idCol: String,
                       textCol: String,
                       batchId: Option[String] = None): Unit =
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      batch.select(md5(col(textCol)).as("h")).distinct()
        .write.mode("append").parquet(snap.path("hashes"))
      // append-supersedes-delete: a re-admitted text's pending
      // tombstone is pruned in the same locked span, so the fold
      // cannot silently drop the row just written
      Tombstones.pruneOnAppend(spark, dir, snap,
        batch.select(md5(col(textCol)).as("h")))
      batchId.foreach(IngestLog.record(spark, snap, _))
    }

  /** Probe a delta batch against the persisted hash set: one content
    * hash per delta row, one membership join against the files —
    * duplicate stored hashes cannot change the verdict OR the row
    * count (the stored side is deduplicated before the join, so the
    * output is exactly one row per delta row however many times a hash
    * was re-appended — the contract [[CorpusPipeline.admitBatch]]'s
    * funnel counts rely on). Returns every delta row with `is_dup`
    * (its text already exists in the indexed corpus). */
  def exactIndexProbe(spark: org.apache.spark.sql.SparkSession,
                      dir: String, delta: DataFrame, idCol: String,
                      textCol: String): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val stored = Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("hashes")))
    val hashed = delta.select(col(idCol), md5(col(textCol)).as("h"))
    hashed.join(
        stored.select(col("h")).distinct().withColumn("_hit", lit(true)),
        Seq("h"), "left")
      .select(col(idCol), coalesce(col("_hit"), lit(false)).as("is_dup"))
  }

  /** Retract content from the persisted hash set ([[Tombstones]] — the
    * erasure verb): the given docs' content hashes are tombstoned, so
    * probes immediately stop reporting matching text as a duplicate;
    * the next [[exactIndexCompact]] physically drops the hashes. Note
    * the key is the CONTENT hash: if another live document shares the
    * exact text, re-append it after the fold (the key-level-delete
    * contract). */
  def exactIndexDelete(spark: org.apache.spark.sql.SparkSession,
                       dir: String, docs: DataFrame, idCol: String,
                       textCol: String): Unit =
    Tombstones.append(spark, dir,
      docs.select(md5(col(textCol)).as("h")))

  /** Deterministic partition count for a flat-table compaction
    * rewrite: live table bytes / `bytesPerPart`, min 1. Pinned
    * explicitly because an argless `repartitionByRange` leaves the
    * output file count to AQE's shuffle coalescing — the q253 re-plan
    * gate (and any `n_fragments` ceiling) must see a file count that
    * is a function of DATA SIZE, not of the session's shuffle
    * settings. 256 MB/partition keeps post-compaction files in the
    * large-scan sweet spot at any corpus size. */
  private def compactPartitions(spark: org.apache.spark.sql.SparkSession,
                                path: String,
                                bytesPerPart: Long = 256L << 20): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes =
      if (!fs.exists(p)) 0L
      else fs.listStatus(p).toSeq
        .filter(_.getPath.getName.endsWith(".parquet"))
        .map(_.getLen).sum
    math.max(1L, (bytes + bytesPerPart - 1) / bytesPerPart).toInt
  }

  /** Fold append fragments into one distinct, range-clustered file set
    * behind a [[Manifest]] flip — the dedupe point for cross-append
    * duplicate hashes AND the fold point for pending [[Tombstones]]
    * (retracted hashes are dropped from the rewrite; the emptied
    * tombstone table flips in the same publish). */
  def exactIndexCompact(spark: org.apache.spark.sql.SparkSession,
                        dir: String): Unit =
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val tmp = s"$dir/_compact.tmp.hashes"
      Tombstones.live(spark, snap,
          spark.read.parquet(snap.path("hashes"))).distinct()
        .repartitionByRange(
          compactPartitions(spark, snap.path("hashes")), col("h"))
        .sortWithinPartitions("h")
        .write.mode("overwrite").parquet(tmp)
      Manifest.publishUnderLock(spark, dir, Seq("hashes" -> tmp) ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
    }

  /** Health row of the persisted hash set — fleet-table shape:
    * `total_rows` vs `distinct_hashes` measures cross-append duplicate
    * accumulation (compaction due when the gap grows), `n_fragments`
    * the file fragmentation. */
  def exactIndexHealth(spark: org.apache.spark.sql.SparkSession,
                       dir: String): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val hashesPath = snap.path("hashes")
    val tableP = new org.apache.hadoop.fs.Path(hashesPath)
    val nFragments = tableP
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(tableP).count(_.getPath.getName.endsWith(".parquet"))
      .toLong
    // pending/ingest ride the SAME collected plan — one fused aggregate
    // ([[OpsStats.attach]]) instead of driver-side count jobs (or two
    // separate crossJoin sides) per reading: a fleet health union over
    // a thousand indexes stays one action. The logged accepted-batch
    // count matters because rows from several families union into the
    // fleet table, where a LOWER count than the siblings' is the
    // crash-divergence smell fleetIngestReconcile pins down.
    OpsStats.attach(spark, snap)(
      spark.read.parquet(hashesPath).agg(
        count(lit(1)).as("total_rows"),
        count_distinct(col("h")).as("distinct_hashes"),
        lit(dir).as("dir"), lit(snap.version).as("version"),
        lit(nFragments).as("n_fragments")))
  }

  /** Hot-bucket guard for LSH bucket self-joins: drop buckets with more
    * than `cap` members before pair generation. One degenerate bucket
    * (empty / boilerplate docs all hashing together) otherwise goes
    * |bucket|² — the classic LSH-dedup scale failure. The guard is a
    * map-side-combinable count (one row per bucket) and a broadcast
    * anti-join against only the over-cap bucket keys, so it costs one
    * cheap pass. Members of an over-cap bucket are near-identical
    * boilerplate by construction — run [[exact]] dedup first to collapse
    * them; pairs inside dropped buckets are reported by no strategy. */
  private def dropHotBuckets(banded: DataFrame, keys: Seq[String],
                             cap: Int): DataFrame =
    banded.join(
      banded.groupBy(keys.map(col): _*).agg(count(lit(1)).as("_bn"))
        .filter(col("_bn") > cap).select(keys.map(col): _*),
      keys, "left_anti")

  /** The [[dropHotBuckets]] guard for a PROBE's bucket equi-join,
    * fused: candidate pairs only come from buckets present on BOTH
    * sides, so dropping a bucket from either side removes all of its
    * pairs — anti-joining the delta side alone against the union of
    * both sides' over-cap bucket keys is pair-for-pair equivalent to
    * guarding each side separately, for ONE aggregate + ONE anti-join
    * instead of two of each (the serialized per-probe broadcast-job
    * chain every admission probe pays per reading). Per-side counts
    * stay separate (grouped on keys + side tag), so the cap semantics
    * are unchanged. */
  private def probeHotBucketKeys(base: DataFrame, delta: DataFrame,
                                 keys: Seq[String], cap: Int): DataFrame =
    base.select(keys.map(col): _*).withColumn("_s", lit(1))
      .unionByName(
        delta.select(keys.map(col): _*).withColumn("_s", lit(2)))
      .groupBy((keys :+ "_s").map(col): _*)
      .agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") > cap)
      .select(keys.map(col): _*)

  /** MinHash-LSH near-dup candidate pairs: signature → bands → equi-join
    * within band buckets → verify with true shingle Jaccard. Only pairs
    * sharing ≥1 band are ever materialized.
    *
    * The band join carries BARE ids — candidate (id_a, id_b) pairs are
    * deduplicated across bands BEFORE the shingle arrays are joined back
    * for one verification, so a pair sharing all `bands` bands is
    * verified once, not `bands` times, and the heavy arrays never ride
    * the banded shuffle (the [[prefixFilterJaccard]] shape). */
  def minhashLsh(docs: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, sigK: Int = 8, bands: Int = 4,
                 threshold: Double = 0.5,
                 maxBucketSize: Int = 10000): DataFrame = {
    require(bands >= 1 && sigK % bands == 0,
      s"sigK=$sigK must be a positive multiple of bands=$bands " +
        "(bands > sigK would make every band empty and silently " +
        "return no pairs)")
    val rows = bands
    val bandSize = sigK / bands
    // shingles feed the two verify joins; signatures feed the band
    // explode — persist once (LRU-evictable) instead of re-shingling
    val withSig = docs.select(col(idCol).as("id"),
      TF.distinctShingles(col(textCol), shingleN).as("sh"),
      TF.minhashSignature(col(textCol), shingleN, sigK).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded0 = withSig.select(col("id"),
      explode(array((0 until rows).map(b =>
        struct(lit(b).as("band"),
          TF.lshBand(col("sig"), b * bandSize, bandSize).as("bucket"))): _*))
        .as("lb"))
      .select(col("id"), col("lb.band"), col("lb.bucket"))
    val banded = dropHotBuckets(banded0, Seq("band", "bucket"), maxBucketSize)
    val cands = banded.select(col("band"), col("bucket"),
        col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cands
      .join(withSig.select(col("id").as("id_a"), col("sh").as("sh_a")),
        Seq("id_a"))
      .join(withSig.select(col("id").as("id_b"), col("sh").as("sh_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TF.jaccard(col("sh_a"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Incremental MinHash-LSH: delta (ingest batch) docs probed against
    * the BASE corpus's banded index — the daily-ingest near-dup path
    * where [[minhashLsh]] is the full-corpus refresh. Output: one row
    * per (delta_id, base_id) near-dup pair with its verified Jaccard.
    *
    * Scale shape: the base side's (band, bucket, id) index is exactly
    * what a production pipeline persists between batches; the candidate
    * join is delta-bands (batch-sized) against that index, so corpus-
    * internal duplicates never re-pair and the join output is bounded
    * by the delta's bucket occupancy. Both sides pass the hot-bucket
    * guard before pairing (one degenerate boilerplate bucket would
    * otherwise go |delta-bucket|·|base-bucket|); the shingle-verify
    * joins touch candidate ids only. */
  def incrementalMinhashLsh(delta: DataFrame, base: DataFrame,
                            idCol: String, textCol: String,
                            shingleN: Int = 3, sigK: Int = 4,
                            bands: Int = 2, threshold: Double = 0.5,
                            maxBucketSize: Int = 10000): DataFrame = {
    require(bands >= 1 && sigK % bands == 0,
      s"sigK=$sigK must be a positive multiple of bands=$bands")
    val bandSize = sigK / bands
    def prep(docs: DataFrame): DataFrame = docs
      .select(col(idCol).as("id"),
        TF.distinctShingles(col(textCol), shingleN).as("sh"),
        TF.minhashSignature(col(textCol), shingleN, sigK).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def banded(p: DataFrame): DataFrame = dropHotBuckets(
      p.select(col("id"),
        explode(array((0 until bands).map(b =>
          struct(lit(b).as("band"),
            TF.lshBand(col("sig"), b * bandSize, bandSize).as("bucket"))
        ): _*)).as("lb"))
        .select(col("id"), col("lb.band"), col("lb.bucket")),
      Seq("band", "bucket"), maxBucketSize)
    val dP = prep(delta)
    val bP = prep(base)
    val cands = banded(dP)
      .select(col("band"), col("bucket"), col("id").as("delta_id"))
      .join(banded(bP)
        .select(col("band"), col("bucket"), col("id").as("base_id")),
        Seq("band", "bucket"))
      .select("delta_id", "base_id")
      .distinct()
    cands
      .join(dP.select(col("id").as("delta_id"), col("sh").as("sh_d")),
        Seq("delta_id"))
      .join(bP.select(col("id").as("base_id"), col("sh").as("sh_b")),
        Seq("base_id"))
      .select(col("delta_id"), col("base_id"),
        TF.jaccard(col("sh_d"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  // ---- persisted near-dup (MinHash-LSH) index ------------------------
  // [[incrementalMinhashLsh]] documents its base-side (band, bucket, id)
  // table as "exactly what a production pipeline persists between
  // batches" — these close that loop: the base corpus is signed and
  // banded ONCE (the full-corpus scan), every ingest batch probes the
  // FILES, and accepted batches append their own banded rows so
  // tomorrow's batch dedups against today's. The LSH parameters
  // (shingleN, sigK, bands) are pinned in index metadata: a probe at
  // different parameters would hash into disjoint buckets and silently
  // report zero duplicates. Verification needs base TEXT for the exact
  // Jaccard — candidate base_ids (bounded by bucket occupancy) join
  // back to the caller's corpus table, shingling only matched rows,
  // the same candidates-then-fetch shape as IVF-PQ's refine.

  private def minhashMetaPath(dir: String) = s"$dir/_minhash_meta"

  /** (shingleN, sigK, bands) the index at `dir` was built with. */
  def minhashIndexParams(spark: org.apache.spark.sql.SparkSession,
                         dir: String): (Int, Int, Int) = {
    val p = new org.apache.hadoop.fs.Path(minhashMetaPath(dir))
    val in = p.getFileSystem(spark.sparkContext.hadoopConfiguration).open(p)
    val m =
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .filter(_.contains('=')).map { l =>
          val Array(k, v) = l.split("=", 2); k -> v.trim.toInt
        }.toMap
      finally in.close()
    (m("shingleN"), m("sigK"), m("bands"))
  }

  /** (id, band, bucket) banded-signature rows for `docs`. */
  private def bandRows(docs: DataFrame, idCol: String, textCol: String,
                       shingleN: Int, sigK: Int, bands: Int): DataFrame = {
    val bandSize = sigK / bands
    docs.select(col(idCol).as("id"),
      TF.minhashSignature(col(textCol), shingleN, sigK).as("sig"))
      .select(col("id"), explode(array((0 until bands).map(b =>
        struct(lit(b).as("band"),
          TF.lshBand(col("sig"), b * bandSize, bandSize).as("bucket"))
      ): _*)).as("lb"))
      .select(col("id"), col("lb.band"), col("lb.bucket"))
  }

  /** Build the persisted index: the corpus's banded rows plus pinned
    * parameters. The one full-corpus signature scan a daily pipeline
    * should ever pay. In-place fresh build (reader-UNSAFE, like
    * [[Similarity.ivfBuild]]): overwrites the default table and drops
    * any stale manifest so an earlier compaction cannot shadow it. */
  def minhashIndexBuild(docs: DataFrame, dir: String, idCol: String,
                        textCol: String, shingleN: Int = 3,
                        sigK: Int = 4, bands: Int = 2): Unit = {
    require(bands >= 1 && sigK % bands == 0,
      s"sigK=$sigK must be a positive multiple of bands=$bands")
    val spark = docs.sparkSession
    bandRows(docs, idCol, textCol, shingleN, sigK, bands)
      .write.mode("overwrite").parquet(s"$dir/bands.parquet")
    val p = new org.apache.hadoop.fs.Path(minhashMetaPath(dir))
    val out = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .create(p, true)
    out.write(s"shingleN=$shingleN\nsigK=$sigK\nbands=$bands\n"
      .getBytes("UTF-8"))
    out.close()
    Manifest.reset(spark, dir)
  }

  /** Append an accepted batch's banded rows (parameters from the index
    * metadata) — one batch scan, no rebuild. [[Manifest.withLock]] is
    * held for the WHOLE file drop and the live table is resolved
    * through the snapshot INSIDE it, so an append can neither interleave
    * with another writer nor land files in a directory a concurrent
    * compaction is about to supersede (the single-writer contract every
    * index writer in this package enforces). Each append adds one file
    * fragment set; [[minhashIndexCompact]] folds them back. */
  def minhashIndexAppend(spark: org.apache.spark.sql.SparkSession,
                         dir: String, batch: DataFrame, idCol: String,
                         textCol: String,
                         batchId: Option[String] = None): Unit = {
    val (shingleN, sigK, bands) = minhashIndexParams(spark, dir)
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      bandRows(batch, idCol, textCol, shingleN, sigK, bands)
        .write.mode("append").parquet(snap.path("bands"))
      // append-supersedes-delete (see [[Tombstones.pruneOnAppend]])
      Tombstones.pruneOnAppend(spark, dir, snap,
        batch.select(col(idCol).as("id")))
      batchId.foreach(IngestLog.record(spark, snap, _))
    }
  }

  /** Retract documents from the persisted MinHash index
    * ([[Tombstones]] — the erasure verb): the ids' banded rows stop
    * matching probes immediately (stored-side anti-join) and are
    * physically dropped by the next [[minhashIndexCompact]]. `ids`
    * needs one column, cast here to the stored id type so the
    * anti-join cannot silently type-mismatch. */
  def minhashIndexDelete(spark: org.apache.spark.sql.SparkSession,
                         dir: String, ids: DataFrame,
                         idCol: String = "id"): Unit = {
    val snap = Manifest.snapshot(spark, dir)
    val idType = spark.read.parquet(snap.path("bands"))
      .schema("id").dataType
    Tombstones.append(spark, dir,
      ids.select(col(idCol).cast(idType).as("id")))
  }

  /** Compact the banded table's accumulated append fragments into one
    * coherent file set — [[Similarity.ivfCompact]] for the text-dedup
    * index. Read once under the writer lock (held across the whole
    * read→rewrite→flip span, so a racing append cannot land rows in
    * the superseded directory), rewritten range-clustered on
    * (band, bucket) — the probe's equi-join keys, so row-group min/max
    * pruning works after the rewrite — and swapped in with ONE
    * [[Manifest]] flip: a concurrent probe sees the old file set or
    * the new one, never a torn mix. Pending [[Tombstones]] fold into
    * the rewrite (retracted ids dropped, tombstone table emptied in
    * the same flip). */
  def minhashIndexCompact(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Unit =
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val tmp = s"$dir/_compact.tmp.bands"
      // distinct(): the dedupe point for replayed-ingest rows — a
      // foreachBatch micro-batch that committed its append and crashed
      // before its checkpoint is replayed, landing identical
      // (id, band, bucket) rows; probes survive that (candidate-pair
      // dedup) but the duplicates inflate total_rows/max_bucket and
      // scan cost forever unless compaction folds them (the
      // exactIndexCompact contract, mirrored here)
      Tombstones.live(spark, snap,
          spark.read.parquet(snap.path("bands"))).distinct()
        .repartitionByRange(
          compactPartitions(spark, snap.path("bands")),
          col("band"), col("bucket"))
        .sortWithinPartitions("band", "bucket")
        .write.mode("overwrite").parquet(tmp)
      Manifest.publishUnderLock(spark, dir, Seq("bands" -> tmp) ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
    }

  /** Operational health report of a persisted [[minhashIndexBuild]]
    * index — the q-220-shaped dashboard row for the text-dedup side:
    * physical size plus BUCKET-SKEW readings, because a hot LSH bucket
    * is this index's failure mode (pair generation goes |bucket|²;
    * [[minhashIndexProbe]]'s guard silently drops over-cap buckets, so
    * a growing `hot_buckets` count means near-dups are going
    * unreported and an exact-dedup pre-pass is due). One row per
    * index; rows from many indexes union into one fleet table. All
    * aggregates are one bounded scan of the (band, bucket, id) table. */
  def minhashIndexHealth(spark: org.apache.spark.sql.SparkSession,
                         dir: String,
                         hotBucketCap: Int = 10000): DataFrame = {
    val (shingleN, sigK, bands) = minhashIndexParams(spark, dir)
    val snap = Manifest.snapshot(spark, dir)
    val bandsPath = snap.path("bands")
    // append-fragment count: one FS listing of the live banded table —
    // each [[minhashIndexAppend]] adds a file set, and past the
    // planner's ceiling the scan-cost cliff says [[minhashIndexCompact]]
    // is due (the IVF family's max_files_per_list signal, flat layout)
    val tableP = new org.apache.hadoop.fs.Path(bandsPath)
    val nFragments = tableP
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(tableP).count(_.getPath.getName.endsWith(".parquet"))
      .toLong
    // _nd = distinct ids per bucket: a replayed ingest batch lands
    // IDENTICAL (id, band, bucket) rows, so Σ _nd is the table's
    // distinct-row count and the total_rows − distinct_rows gap is the
    // replay-duplicate debt compaction will fold (the
    // exactIndexHealth total-vs-distinct reading for this family)
    val sizes = spark.read.parquet(bandsPath).groupBy("band", "bucket")
      .agg(count(lit(1)).as("_n"), count_distinct(col("id")).as("_nd"))
    // one collected plan, no per-reading driver jobs, pending/ingest
    // fused into a single aggregate side (see exactIndexHealth)
    OpsStats.attach(spark, snap)(sizes.agg(
      lit(shingleN).as("shingle_n"), lit(sigK).as("sig_k"),
      lit(bands).as("n_bands"),
      sum(col("_n")).as("total_rows"),
      sum(col("_nd")).as("distinct_rows"),
      count(lit(1)).as("n_buckets"),
      max(col("_n")).as("max_bucket"),
      count(when(col("_n") > hotBucketCap, 1)).as("hot_buckets"),
      lit(dir).as("dir"), lit(snap.version).as("version"),
      lit(nFragments).as("n_fragments")))
  }

  /** Probe a delta batch against the persisted index:
    * [[incrementalMinhashLsh]] with the base side read from files —
    * the base corpus is never re-signed. `base` supplies the TEXT for
    * the exact-Jaccard verification of candidate ids only; a candidate
    * base_id with NO row in `base` fails the job loudly (codegen'd
    * `raise_error`, free on the no-miss path) instead of silently
    * under-reporting near-dups — the caller passed a text table that
    * does not cover the index (e.g. appended batches missing from it).
    * The result is eagerly materialized (localCheckpoint) so the
    * per-probe signature cache can be released before returning —
    * a long-lived daily-pipeline session never accumulates cached
    * partitions across probes. Release the result's pinned blocks with
    * [[Clustering.releasePairs]] when done with it. */
  def minhashIndexProbe(spark: org.apache.spark.sql.SparkSession,
                        dir: String, delta: DataFrame, base: DataFrame,
                        idCol: String, textCol: String,
                        threshold: Double = 0.5,
                        maxBucketSize: Int = 10000): DataFrame = {
    val (pairs, handles) = minhashProbeLazy(spark, dir, delta, base,
      idCol, textCol, threshold, maxBucketSize)
    val out = pairs.localCheckpoint(true)
    handles.foreach(_.unpersist(false))
    out
  }

  /** [[minhashIndexProbe]]'s LAZY core: the verified-pair frame
    * WITHOUT the final eager checkpoint, plus the persisted handles
    * its plan still reads (unpersist them only AFTER the plan has been
    * consumed — the signature cache is multi-consumer inside the
    * plan). For compositions that fold the pairs into exactly one
    * downstream action (the admission kernel's verdict write), the
    * checkpoint bought nothing: skipping it lets the whole verdict
    * batch execute as ONE job instead of one eager job per probe
    * family per micro-batch. */
  private[operators] def minhashProbeLazy(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, delta: DataFrame, base: DataFrame,
      idCol: String, textCol: String, threshold: Double,
      maxBucketSize: Int): (DataFrame, Seq[DataFrame]) = {
    val (shingleN, sigK, bands) = minhashIndexParams(spark, dir)
    val snap = Manifest.snapshot(spark, dir)
    val idx = Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("bands")))
    val dP = delta.select(col(idCol).as("id"),
      TF.distinctShingles(col(textCol), shingleN).as("sh"),
      TF.minhashSignature(col(textCol), shingleN, sigK).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bandSize = sigK / bands
    val dBands0 = dP.select(col("id"), explode(array((0 until bands)
      .map(b => struct(lit(b).as("band"),
        TF.lshBand(col("sig"), b * bandSize, bandSize).as("bucket"))
      ): _*)).as("lb"))
      .select(col("id"), col("lb.band"), col("lb.bucket"))
    // both sides' hot-bucket guards from one aggregate, applied to the
    // delta side alone — equivalent for the equi-join's output
    // ([[probeHotBucketKeys]])
    val dBands = dBands0.join(
      probeHotBucketKeys(idx, dBands0, Seq("band", "bucket"),
        maxBucketSize),
      Seq("band", "bucket"), "left_anti")
    val cands = dBands
      .select(col("band"), col("bucket"), col("id").as("delta_id"))
      .join(idx.select(col("band"), col("bucket"),
        col("id").as("base_id")), Seq("band", "bucket"))
      .select("delta_id", "base_id")
      .distinct()
    // fetch-then-shingle ONLY candidate base rows (join before the
    // shingle projection — the whole point of the persisted index is
    // never re-shingling the base corpus); LEFT join so a candidate id
    // the text table cannot resolve raises instead of vanishing
    val candBase = cands.select(col("base_id")).distinct()
      .join(base.select(col(idCol).as("base_id"),
        col(textCol).as("_t")), Seq("base_id"), "left")
      .select(col("base_id"),
        TF.distinctShingles(
          when(col("_t").isNull, raise_error(concat(
            lit("minhashIndexProbe: index candidate base_id "),
            col("base_id").cast("string"),
            lit(" has no row in the supplied base text table — pass " +
              "a table covering every indexed batch")))).otherwise(
            col("_t")), shingleN).as("sh_b"))
    val out = cands
      .join(dP.select(col("id").as("delta_id"), col("sh").as("sh_d")),
        Seq("delta_id"))
      .join(candBase, Seq("base_id"))
      .select(col("delta_id"), col("base_id"),
        TF.jaccard(col("sh_d"), col("sh_b")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
    (out, Seq(dP))
  }

  /** Execute an [[Similarity.indexMaintenancePlan]] action on a
    * persisted MinHash index — [[Similarity.indexMaintenanceApply]]'s
    * text-family counterpart, closing the health → plan → apply loop
    * for this index: `compact` folds append fragments
    * ([[minhashIndexCompact]]); `dedup_prepass` answers a hot
    * `hot_buckets` reading — the bucket's members are near-identical
    * boilerplate by construction, so the fix is collapsing them, not
    * rewriting files: the corpus is exact-deduped to its min-id
    * representatives and the index is REBUILT from the survivors (same
    * pinned LSH params) through the build path into a sibling temp
    * index, swapped in with one manifest flip under the full-span
    * writer lock. A post-action probe reports the pairs the hot-bucket
    * guard was silently dropping, now against each boilerplate class's
    * keeper. `dedup_prepass` REQUIRES the corpus text table (the banded
    * table cannot reconstruct text — the [[Similarity.ivfPqRebuild]]
    * situation) and throws without it. */
  def minhashMaintenanceApply(spark: org.apache.spark.sql.SparkSession,
                              dir: String, action: String,
                              corpus: Option[DataFrame] = None,
                              idCol: String = "id",
                              textCol: String = "text"): Unit =
    action match {
      case "none" => ()
      case "compact" => minhashIndexCompact(spark, dir)
      case "dedup_prepass" =>
        val c = corpus.getOrElse(throw new IllegalArgumentException(
          "minhashMaintenanceApply: a dedup_prepass rebuild needs the " +
            "corpus text table — the banded index cannot reconstruct " +
            "text"))
        val (shingleN, sigK, bands) = minhashIndexParams(spark, dir)
        Manifest.withLock(spark, dir) {
          val keepers = c.join(
            exact(c, idCol, textCol).select(col("keeper_id").as(idCol)),
            Seq(idCol), "left_semi")
          val tmp = s"$dir/_rebuild.tmp"
          minhashIndexBuild(keepers, tmp, idCol, textCol, shingleN,
            sigK, bands)
          Manifest.publishUnderLock(spark, dir,
            Seq("bands" -> s"$tmp/bands.parquet"))
          val tmpP = new org.apache.hadoop.fs.Path(tmp)
          tmpP.getFileSystem(spark.sparkContext.hadoopConfiguration)
            .delete(tmpP, true)
        }
      case other => throw new IllegalArgumentException(
        s"minhashMaintenanceApply: unknown action '$other'")
    }

  /** SimHash near-dup pairs: 64-bit signature, bucket by 16-bit prefix
    * bands (docs within `maxHamming` share ≥1 of 4 bands by pigeonhole),
    * verify with full Hamming distance. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              maxHamming: Int = 3, maxBucketSize: Int = 10000): DataFrame = {
    // signatures feed the band explode AND the verify join-back — persist
    // once (LRU-evictable) instead of re-hashing the corpus twice
    val sig = docs.select(col(idCol).as("id"),
      TF.simhash64(col(textCol)).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val banded0 = sig.select(col("id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))
          .as("bucket"))): _*)).as("lb"))
      .select(col("id"), col("lb.band"), col("lb.bucket"))
    val banded = dropHotBuckets(banded0, Seq("band", "bucket"), maxBucketSize)
    // bare-id candidates, deduped across bands BEFORE the signatures are
    // joined back (the minhashLsh shape): a pair sharing all 4 bands is
    // verified once, not 4×, and only 8-byte ids ride the banded shuffle
    val cands = banded.select(col("band"), col("bucket"),
        col("id").as("id_a"))
      .join(banded.select(col("band"), col("bucket"), col("id").as("id_b")),
        Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cands
      .join(sig.select(col("id").as("id_a"), col("sig").as("sig_a")),
        Seq("id_a"))
      .join(sig.select(col("id").as("id_b"), col("sig").as("sig_b")),
        Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        TF.hamming64(col("sig_a"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // ---- persisted SimHash index ------------------------------------
  //
  // The third persisted text-dedup family (after the MinHash banded
  // index and the decontamination shingle index), for the boilerplate/
  // template near-dup regime MinHash's set-Jaccard misses: Hamming
  // distance over 64-bit [[graft.functions.TextFunctions.simhash64]]
  // signatures. What lands on disk is ONLY (id, sig) — 16 bytes per
  // document, the cheapest persisted dedup state of the three — because
  // SimHash banding is a bit-slice of the signature itself: the 4×16-bit
  // pigeonhole buckets are DERIVED on scan (two codegen'd bit ops), not
  // stored 4× like MinHash's band rows, and verification is Hamming
  // distance on the very signatures the candidate join already carried —
  // unlike [[minhashIndexProbe]], a probe needs NO base text table at
  // all. Same operational contract as every other persisted family:
  // every writer under [[Manifest.withLock]], compaction behind a
  // versioned-manifest flip, one health row per index for the fleet
  // table, hot-bucket guards on both probe sides.

  /** Build the persisted SimHash index: one signature scan of the
    * corpus, (id, sig) on disk. `simhash64` is parameter-free over the
    * fixed tokenization, so unlike the MinHash index there are no LSH
    * parameters to pin — any probe is comparable with any build.
    * In-place fresh build (reader-UNSAFE, like [[minhashIndexBuild]]):
    * overwrites the default table and drops any stale manifest. */
  def simhashIndexBuild(docs: DataFrame, dir: String, idCol: String,
                        textCol: String): Unit = {
    docs.select(col(idCol).as("id"), TF.simhash64(col(textCol)).as("sig"))
      .write.mode("overwrite").parquet(s"$dir/sigs.parquet")
    Manifest.reset(docs.sparkSession, dir)
  }

  /** Append an accepted batch's signatures — one batch scan, no
    * rebuild. Lock held for the whole file drop, live table resolved
    * through the snapshot INSIDE it (the single-writer contract every
    * index writer in this package enforces). Each append adds one file
    * fragment set; [[simhashIndexCompact]] folds them back. */
  def simhashIndexAppend(spark: org.apache.spark.sql.SparkSession,
                         dir: String, batch: DataFrame, idCol: String,
                         textCol: String,
                         batchId: Option[String] = None): Unit =
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      batch.select(col(idCol).as("id"),
        TF.simhash64(col(textCol)).as("sig"))
        .write.mode("append").parquet(snap.path("sigs"))
      // append-supersedes-delete (see [[Tombstones.pruneOnAppend]])
      Tombstones.pruneOnAppend(spark, dir, snap,
        batch.select(col(idCol).as("id")))
      batchId.foreach(IngestLog.record(spark, snap, _))
    }

  /** Retract documents from the persisted SimHash index
    * ([[Tombstones]]): the ids' signatures stop matching probes
    * immediately and are physically dropped by the next
    * [[simhashIndexCompact]]. */
  def simhashIndexDelete(spark: org.apache.spark.sql.SparkSession,
                         dir: String, ids: DataFrame,
                         idCol: String = "id"): Unit = {
    val snap = Manifest.snapshot(spark, dir)
    val idType = spark.read.parquet(snap.path("sigs"))
      .schema("id").dataType
    Tombstones.append(spark, dir,
      ids.select(col(idCol).cast(idType).as("id")))
  }

  /** Fold the signature table's append fragments into one coherent
    * file set behind a [[Manifest]] flip. The rewrite range-clusters on
    * `sig`, which sorts band 3 (the top 16 bits) into contiguous row
    * groups — one of the four probe joins gets min/max pruning; the
    * other three are bit-slices no single sort order can serve, and at
    * 16 bytes/row the table is small enough that defragmentation is the
    * point, not pruning. Pending [[Tombstones]] fold into the rewrite
    * (retracted ids dropped, tombstone table emptied in the flip). */
  def simhashIndexCompact(spark: org.apache.spark.sql.SparkSession,
                          dir: String): Unit =
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val tmp = s"$dir/_compact.tmp.sigs"
      // distinct(): folds replayed-ingest duplicates (identical
      // (id, sig) rows from an at-least-once micro-batch retry) — see
      // minhashIndexCompact; partition count pinned by data size so
      // the post-compaction fragment count is AQE-independent
      Tombstones.live(spark, snap,
          spark.read.parquet(snap.path("sigs"))).distinct()
        .repartitionByRange(
          compactPartitions(spark, snap.path("sigs")), col("sig"))
        .sortWithinPartitions("sig")
        .write.mode("overwrite").parquet(tmp)
      Manifest.publishUnderLock(spark, dir, Seq("sigs" -> tmp) ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
    }

  /** (id, band, bucket, sig) rows for a signature table — the banding
    * used by probe and health. The signature rides along (8 bytes) so
    * the candidate join needs no join-back for the Hamming verify. */
  private def simhashBandRows(sigs: DataFrame): DataFrame =
    sigs.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL))
          .as("bucket"))): _*)).as("lb"))
      .select(col("id"), col("sig"), col("lb.band"), col("lb.bucket"))

  /** Operational health report of a persisted [[simhashIndexBuild]]
    * index — one row per index for the fleet table, same failure
    * signals as [[minhashIndexHealth]]: `hot_buckets`/`max_bucket`
    * (the probe guard silently drops over-cap buckets — template
    * boilerplate funnels thousands of docs into one 16-bit bucket, so a
    * hot bucket means near-dups are going unreported and an exact-dedup
    * pre-pass is due) and `n_fragments` (append fragmentation →
    * [[simhashIndexCompact]]). Bucket stats are computed by banding the
    * stored signatures on scan — one bounded aggregate. */
  def simhashIndexHealth(spark: org.apache.spark.sql.SparkSession,
                         dir: String,
                         hotBucketCap: Int = 10000): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val sigsPath = snap.path("sigs")
    val tableP = new org.apache.hadoop.fs.Path(sigsPath)
    val nFragments = tableP
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(tableP).count(_.getPath.getName.endsWith(".parquet"))
      .toLong
    val sigs = spark.read.parquet(sigsPath)
    // distinct (id, sig) vs total rows: the replay-duplicate debt a
    // retried ingest micro-batch leaves behind (see
    // minhashIndexHealth) — one extra bounded aggregate over the
    // 16-byte/row table
    val rowStats = sigs.agg(count(lit(1)).as("total_rows"),
      count_distinct(col("id"), col("sig")).as("distinct_rows"))
    val sizes = simhashBandRows(sigs)
      .groupBy("band", "bucket").agg(count(lit(1)).as("_n"))
    // one collected plan, no per-reading driver jobs, pending/ingest
    // fused into a single aggregate side (see exactIndexHealth)
    OpsStats.attach(spark, snap)(sizes.agg(
      sum(col("_n")).as("total_band_rows"),
      count(lit(1)).as("n_buckets"),
      max(col("_n")).as("max_bucket"),
      count(when(col("_n") > hotBucketCap, 1)).as("hot_buckets"))
      .crossJoin(rowStats)
      .select(col("total_band_rows"), col("total_rows"),
        col("distinct_rows"), col("n_buckets"), col("max_bucket"),
        col("hot_buckets"),
        lit(dir).as("dir"), lit(snap.version).as("version"),
        lit(nFragments).as("n_fragments")))
  }

  /** Probe a delta batch against the persisted index: [[simhash]] with
    * the base side read from files — the base corpus is never re-hashed,
    * and because verification is Hamming distance on the STORED
    * signatures, the probe needs no base text table at all (the
    * candidates-then-fetch step [[minhashIndexProbe]] pays simply does
    * not exist for this family). Both sides pass the hot-bucket guard;
    * candidate (delta_id, base_id) pairs are deduplicated across bands
    * with their signatures riding along, so each pair is verified once.
    * The result is eagerly materialized so the per-probe delta cache is
    * released before returning (no cached-partition accumulation across
    * a daily pipeline's probes); release the result's pinned blocks with
    * [[Clustering.releasePairs]] when done. */
  def simhashIndexProbe(spark: org.apache.spark.sql.SparkSession,
                        dir: String, delta: DataFrame, idCol: String,
                        textCol: String, maxHamming: Int = 3,
                        maxBucketSize: Int = 10000): DataFrame = {
    val (pairs, handles) = simhashProbeLazy(spark, dir, delta, idCol,
      textCol, maxHamming, maxBucketSize)
    val out = pairs.localCheckpoint(true)
    handles.foreach(_.unpersist(false))
    out
  }

  /** [[simhashIndexProbe]]'s LAZY core — the [[minhashProbeLazy]]
    * contract: (lazy pair frame, persisted handles to release after
    * the plan is consumed). */
  private[operators] def simhashProbeLazy(
      spark: org.apache.spark.sql.SparkSession,
      dir: String, delta: DataFrame, idCol: String, textCol: String,
      maxHamming: Int, maxBucketSize: Int): (DataFrame, Seq[DataFrame]) = {
    val snap = Manifest.snapshot(spark, dir)
    val baseBands = simhashBandRows(Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("sigs"))))
    val dSigs = delta.select(col(idCol).as("id"),
      TF.simhash64(col(textCol)).as("sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dBands0 = simhashBandRows(dSigs)
    // both sides' hot-bucket guards from one aggregate, applied to the
    // delta side alone — equivalent for the equi-join's output
    // ([[probeHotBucketKeys]])
    val dBands = dBands0.join(
      probeHotBucketKeys(baseBands, dBands0, Seq("band", "bucket"),
        maxBucketSize),
      Seq("band", "bucket"), "left_anti")
    val out = dBands
      .select(col("band"), col("bucket"), col("id").as("delta_id"),
        col("sig").as("sig_d"))
      .join(baseBands.select(col("band"), col("bucket"),
        col("id").as("base_id"), col("sig").as("sig_b")),
        Seq("band", "bucket"))
      .select("delta_id", "base_id", "sig_d", "sig_b")
      .distinct()
      .select(col("delta_id"), col("base_id"),
        TF.hamming64(col("sig_d"), col("sig_b")).as("hamming"))
      .filter(col("hamming") <= maxHamming)
    (out, Seq(dSigs))
  }

  /** [[minhashMaintenanceApply]] for the SimHash family — the apply
    * half of its health → plan → apply loop: `compact` folds signature
    * fragments ([[simhashIndexCompact]]); `dedup_prepass` answers a hot
    * `hot_buckets` reading by exact-deduping the corpus and REBUILDING
    * the signature table from the min-id keepers (same fix as MinHash:
    * a hot 16-bit band bucket is template boilerplate by construction —
    * collapse it, don't rewrite files), swapped in with one manifest
    * flip under the full-span writer lock. `dedup_prepass` REQUIRES the
    * corpus text table (signatures cannot reconstruct text). */
  def simhashMaintenanceApply(spark: org.apache.spark.sql.SparkSession,
                              dir: String, action: String,
                              corpus: Option[DataFrame] = None,
                              idCol: String = "id",
                              textCol: String = "text"): Unit =
    action match {
      case "none" => ()
      case "compact" => simhashIndexCompact(spark, dir)
      case "dedup_prepass" =>
        val c = corpus.getOrElse(throw new IllegalArgumentException(
          "simhashMaintenanceApply: a dedup_prepass rebuild needs the " +
            "corpus text table — the signature index cannot " +
            "reconstruct text"))
        Manifest.withLock(spark, dir) {
          val keepers = c.join(
            exact(c, idCol, textCol).select(col("keeper_id").as(idCol)),
            Seq(idCol), "left_semi")
          val tmp = s"$dir/_rebuild.tmp.sigs"
          keepers.select(col(idCol).as("id"),
            TF.simhash64(col(textCol)).as("sig"))
            .write.mode("overwrite").parquet(tmp)
          Manifest.publishUnderLock(spark, dir, Seq("sigs" -> tmp))
        }
      case other => throw new IllegalArgumentException(
        s"simhashMaintenanceApply: unknown action '$other'")
    }

  /** Streaming micro-batch ingest into a persisted [[minhashIndexBuild]]
    * index — [[Similarity.ivfIngest]] for the text-dedup side: each
    * micro-batch of accepted documents appends its banded rows via
    * [[minhashIndexAppend]] (LSH parameters pinned by the index
    * metadata). At-least-once like every foreachBatch sink — a retried
    * batch lands its band rows twice, which inflates candidate
    * multiplicity but never pair VALUES (the probe deduplicates
    * candidate pairs before verifying); exact-once pipelines dedupe by
    * id at the next [[minhashIndexCompact]]. Single-writer: a batch
    * colliding with a concurrent compaction fails loudly and the
    * restarted query replays it from the checkpoint. */
  def minhashIngest(stream: DataFrame, dir: String, checkpoint: String,
                    idCol: String = "id", textCol: String = "text")
    : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          minhashIndexAppend(batch.sparkSession, dir, batch, idCol,
            textCol)
      }
      .start()

  /** [[minhashIngest]] for the SimHash family: each micro-batch appends
    * its 16-byte signatures via [[simhashIndexAppend]]. A retried batch
    * writes duplicate (id, sig) rows — candidate dedup keeps probe
    * values unaffected; compaction is the dedupe point. */
  def simhashIngest(stream: DataFrame, dir: String, checkpoint: String,
                    idCol: String = "id", textCol: String = "text")
    : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          simhashIndexAppend(batch.sparkSession, dir, batch, idCol,
            textCol)
      }
      .start()

  /** n-gram Jaccard near-dup pairs within an explicit blocking key (e.g.
    * source), computed by prefix-filtered set-similarity join — never the
    * all-pairs |block|² product.
    *
    * Candidate generation (the standard ppjoin/AllPairs prefix filter,
    * Bayardo et al. WWW'07): shingles are xxhash64-hashed, deduped and
    * sorted ONCE per document; any pair with J ≥ t must share ≥
    * ⌈t·max(|a|,|b|)⌉ hashes, therefore must share at least one hash in
    * each side's first |x| − ⌈t·|x|⌉ + 1 sorted hashes. Candidates are an
    * equi-join on (block, prefix-hash) — a shuffle keyed by hash whose
    * cost is Σ posting-list², not Σ block². At t→0 the prefix degrades to
    * a full inverted index: still only pairs sharing ≥1 actual shingle
    * (which J ≥ t > 0 requires), so correctness is unconditional.
    *
    * Verification is a linear merge over the two sorted long arrays
    * (~8× cheaper than a string hash-set intersection at sf0.1). Hash
    * collisions within a compared pair are ~2⁻⁶⁴·|sh|² — negligible. */
  def ngramJaccard(docs: DataFrame, idCol: String, textCol: String,
                   blockCol: String, n: Int = 3,
                   threshold: Double = 0.1): DataFrame = {
    val d0 = docs.select(col(blockCol).as("block"), col(idCol).as("id"),
      sort_array(array_distinct(transform(TF.shingles(col(textCol), n),
        s => xxhash64(s)))).as("sh"))
    // Strategy crossover: the prefix filter prunes candidates by a factor
    // of ~t², so it wins when t is high; as t→0 the prefix degrades to
    // the full inverted index and the count-based join (no distinct, no
    // array-carrying verify joins, map-side-combinable aggregate) is
    // strictly cheaper on the same candidate volume.
    if (threshold >= 0.3) prefixFilterJaccard(d0, threshold)
    else countJaccard(d0, threshold)
  }

  /** Exact Jaccard by co-occurrence counting: join the full inverted
    * index with itself, so each candidate pair appears once per SHARED
    * hash, and `groupBy(pair).count()` IS the exact intersection size —
    * Spark's partial aggregation combines duplicates map-side before the
    * shuffle, replacing ppjoin's `.distinct()` + two verify joins that
    * ship the shingle arrays. Only the two scalar set sizes are joined
    * back. Correct for any t > 0 (a qualifying pair shares ≥1 hash);
    * preferable when t is too low for the prefix filter to prune. */
  private def countJaccard(d0: DataFrame, threshold: Double): DataFrame = {
    val (inter, sizes) = coOccurrenceCounts(d0,
      pairFilter = col("id_a") < col("id_b"))
    inter
      .join(sizes.select(col("block"), col("id").as("id_a"),
        col("n").as("n_a")), Seq("block", "id_a"))
      .join(sizes.select(col("block"), col("id").as("id_b"),
        col("n").as("n_b")), Seq("block", "id_b"))
      .select(col("block"), col("id_a"), col("id_b"),
        (col("_i").cast("double") / (col("n_a") + col("n_b") - col("_i")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Shared candidate machinery for the inverted-index strategies:
    * persist the shingled corpus, self-join the exploded index on
    * (block, hash), and count shared hashes per surviving pair.
    * Returns (per-pair intersection counts as `_i`, per-doc set sizes
    * as `n`). */
  private def coOccurrenceCounts(d0: DataFrame, pairFilter: Column)
  : (DataFrame, DataFrame) = {
    val d = d0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ex = d.select(col("block"), col("id"), explode(col("sh")).as("h"))
    val inter = ex.select(col("block"), col("h"), col("id").as("id_a"))
      .join(ex.select(col("block"), col("h"), col("id").as("id_b")),
        Seq("block", "h"))
      .filter(pairFilter)
      .groupBy("block", "id_a", "id_b").agg(count(lit(1)).as("_i"))
    val sizes = d.select(col("block"), col("id"), size(col("sh")).as("n"))
    (inter, sizes)
  }

  /** Directional containment pairs: C(a→b) = |sh(a) ∩ sh(b)| / |sh(a)| —
    * the asymmetric twin of Jaccard that catches PARTIAL duplication
    * (doc a quoted or subsumed inside doc b) which symmetric Jaccard
    * misses when |b| ≫ |a|. Same inverted-index co-occurrence count as
    * [[countJaccard]] (one shuffle keyed by shingle hash, map-side
    * combinable), emitted in both directions per unordered pair. */
  def containmentPairs(docs: DataFrame, idCol: String, textCol: String,
                       blockCol: String, n: Int = 3,
                       threshold: Double = 0.8): DataFrame = {
    val d0 = docs.select(col(blockCol).as("block"), col(idCol).as("id"),
      sort_array(array_distinct(transform(TF.shingles(col(textCol), n),
        s => xxhash64(s)))).as("sh"))
    val (inter, sizes) = coOccurrenceCounts(d0,
      pairFilter = col("id_a") =!= col("id_b"))
    inter
      .join(sizes.select(col("block"), col("id").as("id_a"),
        col("n").as("n_a")), Seq("block", "id_a"))
      // threshold on the EXACT integer ratio (consistent with the other
      // strategies); the display column rounds afterwards
      .filter(col("_i").cast("double") / col("n_a") >= threshold)
      .select(col("block"), col("id_a"), col("id_b"),
        round((col("_i").cast("double") / col("n_a")) + lit(1e-9), 6)
          .as("containment"))
  }

  /** The standard ppjoin/AllPairs prefix filter (Bayardo et al. WWW'07):
    * candidates share a hash in the first |sh| − ⌈t·|sh|⌉ + 1 sorted
    * hashes, then exact verification by a linear merge of the sorted
    * hash arrays. The shingled corpus is persisted (LRU-evictable) for
    * the duration of the plan — it feeds three scans. */
  private def prefixFilterJaccard(d0: DataFrame, threshold: Double)
  : DataFrame = {
    // shingle+hash arrays feed the prefix explode AND both verify joins —
    // materialize once instead of re-tokenizing the corpus three times
    val d = d0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // prefix length |sh| − ⌈t·|sh|⌉ + 1 (≥1 shared prefix hash required)
    val prefixLen = (size(col("sh")) -
      ceil(lit(threshold) * size(col("sh"))) + 1).cast("int")
    val ex = d.select(col("block"), col("id"),
      explode(slice(col("sh"), lit(1), prefixLen)).as("h"))
    val cands = ex.select(col("block"), col("h"), col("id").as("id_a"))
      .join(ex.select(col("block"), col("h"), col("id").as("id_b")),
        Seq("block", "h"))
      .filter(col("id_a") < col("id_b"))
      .select("block", "id_a", "id_b")
      .distinct()
    val inter = udf { (a: Seq[Long], b: Seq[Long]) =>
      var i = 0; var j = 0; var c = 0
      while (i < a.length && j < b.length) {
        if (a(i) == b(j)) { c += 1; i += 1; j += 1 }
        else if (a(i) < b(j)) i += 1
        else j += 1
      }
      c
    }
    cands
      .join(d.select(col("block"), col("id").as("id_a"),
        col("sh").as("sh_a")), Seq("block", "id_a"))
      .join(d.select(col("block"), col("id").as("id_b"),
        col("sh").as("sh_b")), Seq("block", "id_b"))
      .withColumn("_i", inter(col("sh_a"), col("sh_b")))
      .select(col("block"), col("id_a"), col("id_b"),
        (col("_i").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("_i")))
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** Embedding-cosine near-dup pairs: sign-LSH bucket join, then exact
    * cosine verification within buckets. */
  def embeddingCosine(emb: DataFrame, idCol: String, vecCol: String,
                      nBits: Int = 8, threshold: Double = 0.95,
                      maxBucketSize: Int = 10000): DataFrame = {
    val d = dropHotBuckets(
      emb.select(col(idCol).as("id"), col(vecCol).as("v"),
        V.lshBucket(col(vecCol), nBits).as("bucket")),
      Seq("bucket"), maxBucketSize)
    val l = d.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val r = d.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("bucket")).filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        V.cosine(col("v_a"), col("v_b")).as("cosine"))
      .filter(col("cosine") >= threshold)
  }

  // ------------------------------------------------- cluster resolution

  /** Both directions of an undirected edge list. */
  private def symmetrize(e: DataFrame): DataFrame =
    e.select(col("a").as("u"), col("b").as("v"))
      .union(e.select(col("b").as("u"), col("a").as("v")))

  /** min(Γ(u) ∪ {u}) per node — a map-side-combinable aggregate, never a
    * collected adjacency list, so a hot node costs its edge count. */
  private def nbrMin(sym: DataFrame): DataFrame =
    sym.groupBy("u").agg(min("v").as("mn"))
      .select(col("u"), least(col("u"), col("mn")).as("m"))

  /** Large-star: attach every neighbor v > u to m = min(Γ(u) ∪ {u}). */
  private def largeStar(e: DataFrame): DataFrame = {
    val sym = symmetrize(e)
    sym.join(nbrMin(sym), "u")
      .filter(col("v") > col("u"))
      // m ≤ u < v, so (m, v) is already in canonical (small, large) order
      .select(col("m").as("a"), col("v").as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Small-star: attach every neighbor v < u, and u itself, to
    * m = min(Γ(u) ∪ {u}). (When v < u exists, the global neighborhood
    * min is itself ≤ v, so one aggregate serves both stars.) */
  private def smallStar(e: DataFrame): DataFrame = {
    val sym = symmetrize(e)
    val mins = nbrMin(sym)
    sym.filter(col("v") < col("u")).join(mins, "u")
      .select(col("m").as("a"), col("v").as("b"))
      .union(mins.select(col("m").as("a"), col("u").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct()
  }

  /** Connected components over an undirected pair list, by alternating
    * large-star / small-star rounds (Kiveris et al., "Connected Components
    * in MapReduce and Beyond", SoCC'14). Each round is two shuffles — a
    * per-node neighborhood-min aggregate and an equi-join back onto the
    * edge list — with no adjacency-list materialization and no driver-side
    * graph state, and the alternation converges in O(log n) rounds, so the
    * same loop that resolves 500 documents resolves a 100 TB corpus's dup
    * graph. This is the step that turns near-dup PAIRS (minhashLsh /
    * simhash / ngramJaccard / embeddingCosine output) into disjoint
    * duplicate CLUSTERS a pipeline can act on.
    *
    * Returns one row per node appearing in `pairs`: (id, component), where
    * `component` is the smallest node id in the node's component. Rounds
    * are eagerly local-checkpointed so plan depth stays constant however
    * many iterations run. */
  def connectedComponents(pairs: DataFrame, idACol: String = "id_a",
                          idBCol: String = "id_b",
                          maxIter: Int = 30,
                          smallGraphEdges: Long = 1L << 17): DataFrame = {
    // order-insensitive content fingerprint of a distinct edge set
    // (count, xor of row hashes) — one cheap aggregate per round
    def fingerprint(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), expr("bit_xor(xxhash64(a, b))")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    def materialize(df: DataFrame): DataFrame = df.localCheckpoint(true)
    def release(df: DataFrame): Unit = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
      case _ => df.unpersist(false)
    }

    var edges = materialize(pairs
      .filter(col(idACol).isNotNull && col(idBCol).isNotNull)
      .select(least(col(idACol), col(idBCol)).as("a"),
        greatest(col(idACol), col(idBCol)).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct())
    var fp = fingerprint(edges)
    // Bounded small-graph fast path: the fingerprint has already COUNTED
    // the distinct edge set, so when it is broadcast-class (≤ 2^17 pairs
    // of ids ≈ a few MB — the same size class as a broadcast dim table),
    // a driver union-find replaces the star rounds. Each star round is a
    // full stage barrier (2 shuffles + fingerprint + checkpoint, ~0.5s of
    // scheduling floor locally and worse on a cluster), and near-dup
    // graphs are usually tiny relative to the corpus — q57 spent ~3.5s of
    // its 4.7s on rounds over a few hundred edges. This is NOT unbounded
    // driver graph state: one row over the bound and the checkpointed
    // rounds run exactly as before (set `smallGraphEdges = 0` to force
    // them — the specs cover both paths).
    // the fast path is only taken for id types whose JVM ordering
    // provably matches SQL min() ordering (integral, string); anything
    // else — binary, decimal, struct ids — keeps the star rounds, which
    // handle every type least/greatest/min supports
    val idTypeOk = {
      import org.apache.spark.sql.types._
      edges.schema("a").dataType match {
        case LongType | IntegerType | ShortType | ByteType |
             StringType => true
        case _ => false
      }
    }
    if (fp._1 > 0 && fp._1 <= smallGraphEdges && idTypeOk) {
      val spark = pairs.sparkSession
      val idType = edges.schema("a").dataType
      val rows = edges.select("a", "b").collect()
      release(edges)
      val parent = new java.util.HashMap[Any, Any]()
      def find(x: Any): Any = {
        var r = x
        while (parent.containsKey(r)) r = parent.get(r)
        // path compression: point every node on the walk at the root
        var c = x
        while (parent.containsKey(c)) {
          val nxt = parent.get(c); parent.put(c, r); c = nxt
        }
        r
      }
      // union by the SAME ordering SQL's min() uses for the id type, so
      // the surviving root IS the component minimum — no second pass.
      // Strings must compare as UTF-8 BYTES (unsigned), not UTF-16 code
      // units: Spark's UTF8String orders by code point, and the two
      // orders diverge when supplementary characters (U+10000+, lead
      // surrogates 0xD800+) mix with BMP chars in [U+E000, U+FFFF]
      def utf8Lt(a: String, b: String): Boolean = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val n = math.min(x.length, y.length)
        var i = 0
        while (i < n) {
          val c = (x(i) & 0xff) - (y(i) & 0xff)
          if (c != 0) return c < 0
          i += 1
        }
        x.length < y.length
      }
      def lt(x: Any, y: Any): Boolean = (x, y) match {
        case (a: Long, b: Long)     => a < b
        case (a: Int, b: Int)       => a < b
        case (a: Short, b: Short)   => a < b
        case (a: Byte, b: Byte)     => a < b
        case (a: String, b: String) => utf8Lt(a, b)
        case _ => throw new IllegalStateException(
          s"unexpected id runtime type ${x.getClass} — idTypeOk gate broken")
      }
      rows.foreach { r =>
        val (ra, rb) = (find(r.get(0)), find(r.get(1)))
        if (ra != rb) {
          if (lt(ra, rb)) parent.put(rb, ra) else parent.put(ra, rb)
        }
      }
      val nodes = new java.util.HashSet[Any]()
      rows.foreach { r => nodes.add(r.get(0)); nodes.add(r.get(1)); () }
      val out = new java.util.ArrayList[org.apache.spark.sql.Row]()
      nodes.forEach { n =>
        out.add(org.apache.spark.sql.Row(n, find(n))); ()
      }
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id", idType),
        org.apache.spark.sql.types.StructField("component", idType)))
      return spark.createDataFrame(out, schema)
    }
    var it = 0
    var converged = fp._1 == 0L
    while (!converged && it < maxIter) {
      val next = materialize(smallStar(largeStar(edges)))
      val nfp = fingerprint(next)
      release(edges)
      edges = next
      converged = nfp == fp
      fp = nfp
      it += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds " +
          "(O(log n) expected; raise maxIter)")
    // converged state is a forest of stars centered at each component min
    edges.select(col("b").as("id"), col("a").as("component"))
      .union(edges.select(col("a").as("id"), col("a").as("component")))
      .groupBy("id").agg(min("component").as("component"))
  }

  /** Resolve near-dup pairs into actionable per-document decisions: every
    * document gets its duplicate-cluster id (its own id when unpaired),
    * the cluster size, and the cluster's canonical keeper — the member
    * with the highest `priorityCol` (e.g. token count), ties broken by
    * smallest id. A training pipeline keeps `doc_id == canonical_id` rows.
    *
    * Canonical selection is two hash aggregates plus equi-joins — max
    * priority per component, then min id among the maxima — never a
    * per-component window sort, so one degenerate mega-cluster cannot
    * funnel into a single task. */
  def resolveClusters(docs: DataFrame, pairs: DataFrame, idCol: String,
                      priorityCol: Column,
                      idACol: String = "id_a", idBCol: String = "id_b",
                      maxIter: Int = 30): DataFrame = {
    val cc = connectedComponents(pairs, idACol, idBCol, maxIter)
    // null priorities sink to -inf instead of poisoning max(): with a
    // raw null, `_prio === _maxp` is never true for an all-null
    // component and the inner canon join would DROP those docs
    val base = docs.select(col(idCol),
      coalesce(priorityCol.cast("double"),
        lit(Double.NegativeInfinity)).as("_prio"))
      .join(cc.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("component", coalesce(col("component"), col(idCol)))
    val best = base.groupBy("component").agg(
      count(lit(1)).as("cluster_size"), max(col("_prio")).as("_maxp"))
    val canon = base.join(best, "component")
      .filter(col("_prio") === col("_maxp"))
      .groupBy("component").agg(min(col(idCol)).as("canonical_id"))
    base.join(best.select("component", "cluster_size"), "component")
      .join(canon, "component")
      .select(col(idCol), col("component"), col("cluster_size"),
        col("canonical_id"))
  }

  /** Per-document duplicated-passage fraction: the share of a doc's
    * DISTINCT n-token shingles that appear in at least one other doc.
    * The hash-count approximation of exact-substring dedup (Lee et al.
    * 2022 build suffix arrays; at corpus scale the shingle
    * document-frequency join is the shape that survives): one shingle
    * explode → one (shingle → doc count) aggregate → one join back,
    * never a pairwise comparison. A doc with no shingles (< n tokens)
    * scores 0.
    *
    * Output: `(idCol, n_shingles, n_duplicated, dup_fraction)` with the
    * fraction rounded 6dp. Downstream: filter high fractions out, or
    * feed the flagged docs to [[ngramJaccard]] for pair resolution. */
  /** Cross-document passage-dedup REWRITE — the transform sibling of
    * [[duplicatePassages]] (which only scores): split every document
    * into passages on `sep`, keep each distinct passage's globally
    * FIRST occurrence only (first = smallest `(doc id, position)` — the
    * paragraph-dedup rule of public corpus pipelines: CCNet, Dolma),
    * and reassemble each document from its surviving passages in
    * original order. A passage repeated within one document also keeps
    * only its first instance.
    *
    * Scale shape: explode → ONE hash aggregate on the passage hash
    * (keeper = `min(struct(doc, idx))`, map-side combinable — never a
    * per-passage window over the corpus) → equi-join back on the hash →
    * per-doc ordered reassembly from collected `(idx, passage)` structs
    * (bounded by the doc's own passage count, the same per-doc bound
    * every text function here lives with). Passage text rides the
    * shuffle once (inside the join), the aggregate itself carries only
    * `(hash, doc, idx)`.
    *
    * Output: `(idCol, n_passages, n_kept, text_out)` — `text_out` is
    * the rebuilt document ("" when nothing survives). */
  def dropRepeatedPassages(df: DataFrame, idCol: String, textCol: String,
                           sep: String = ". "): DataFrame = {
    val quoted = java.util.regex.Pattern.quote(sep)
    val ex = df.select(col(idCol).as("_id"),
        posexplode(split(col(textCol), quoted)).as(Seq("_idx", "_p")))
      .withColumn("_h", md5(col("_p")))
    val firsts = ex.groupBy("_h")
      .agg(min(struct(col("_id"), col("_idx"))).as("_first"))
    ex.join(firsts, Seq("_h"))
      .withColumn("_keep",
        col("_first._id") === col("_id") && col("_first._idx") === col("_idx"))
      .groupBy(col("_id").as(idCol))
      .agg(count(lit(1)).as("n_passages"),
        sum(col("_keep").cast("long")).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(when(col("_keep"),
            struct(col("_idx"), col("_p"))))),
          s => s.getField("_p")), sep).as("text_out"))
  }

  def duplicatePassages(df: DataFrame, idCol: String, textCol: String,
                        n: Int = 3): DataFrame = {
    val ex = df.select(col(idCol).as("_id"),
      explode_outer(TF.distinctShingles(col(textCol), n)).as("_sh"))
    val docFreq = ex.filter(col("_sh").isNotNull)
      .groupBy("_sh").agg(count(lit(1)).as("_df"))
    ex.join(docFreq, Seq("_sh"), "left")
      .groupBy(col("_id").as(idCol))
      .agg(count(col("_sh")).as("n_shingles"),
        sum(when(col("_df") >= 2, 1L).otherwise(0L)).as("n_duplicated"))
      .select(col(idCol), col("n_shingles"), col("n_duplicated"),
        when(col("n_shingles") === 0, lit(0.0))
          .otherwise(round(
            col("n_duplicated").cast("double") / col("n_shingles")
              + lit(1e-9), 6)).as("dup_fraction"))
  }

  /** Cross-document repeated SPANS — the span-level sibling of
    * [[duplicatePassages]] (which only scores a fraction): for every
    * document, the maximal token ranges covered by n-token shingles
    * that also appear in at least `minDocs − 1` OTHER documents. This
    * is the shingle-join realization of exact-substring training-data
    * dedup (Lee et al., "Deduplicating Training Data Makes Language
    * Models Better", ACL 2022 — the suffix-array construction there is
    * single-machine; the distributed shape is position-aware shingles +
    * one frequency join).
    *
    * Plan: positioned shingles (map-side) → cross-doc shingle set (two
    * hash aggregates over DISTINCT (doc, shingle)) → semi join back →
    * per-document overlap-merge of hit positions (hits at p and q
    * overlap iff q ≤ p + n − 1) via one doc-partitioned window —
    * document-local state, bounded by the document's own token count,
    * the same boundedness as chunking/sessionization. All-integer
    * output: (doc_id, span_start, span_end, n_hits), token-indexed,
    * end inclusive. */
  def repeatedSpans(docs: DataFrame, idCol: String, textCol: String,
                    n: Int = 3, minDocs: Int = 2): DataFrame = {
    require(n >= 1 && minDocs >= 2)
    val sh = docs.select(col(idCol).as("doc_id"),
        posexplode(TF.shingles(col(textCol), n)).as(Seq("pos", "sh")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dup = sh.select("doc_id", "sh").distinct()
      .groupBy("sh").agg(count(lit(1)).as("_nd"))
      .filter(col("_nd") >= minDocs).select("sh")
    val hits = sh.join(dup, Seq("sh"), "left_semi").select("doc_id", "pos")
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prev = lag(col("pos"), 1).over(w)
    hits
      .withColumn("_new",
        when(prev.isNull || col("pos") > prev + lit(n - 1), 1).otherwise(0))
      .withColumn("_isl", sum(col("_new")).over(w))
      .groupBy(col("doc_id"), col("_isl"))
      .agg(min(col("pos")).cast("long").as("span_start"),
        (max(col("pos")) + lit(n - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_hits"))
      .select("doc_id", "span_start", "span_end", "n_hits")
  }
}
