package graft.operators

import graft.functions.{AggFunctions, VectorOps => V}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * `bruteForce` is the exact baseline: broadcast the (small) query set and
  * scan the corpus once — a single map-side pass at any corpus size.
  *
  * `lsh` is the scale path: both sides bucketed by deterministic
  * sign-hyperplane LSH; only same-bucket pairs are scored. Probing
  * `nProbe` neighboring buckets (bit flips) trades recall for cost.
  *
  * Both end in [[topK]] — a bounded-heap aggregate, not a per-query
  * window sort: each map task keeps at most k candidates per query, so
  * the shuffle carries ≤ k·#tasks rows per query regardless of corpus
  * size (a window row_number would gather every scored candidate of a
  * query into one task before discarding all but k).
  */
object Similarity {

  /** Symmetric int8 quantization of an embedding column: per-vector
    * scale = max|v|/127, codes = round(v/scale) ∈ [-127, 127] — the
    * compression step an embedding store runs before ANN indexing (4×
    * smaller than float32, dot products stay within ~1% at typical
    * dims). Built-in higher-order functions (interpreted expressions —
    * Spark HOFs are CodegenFallback — but still a single zero-shuffle
    * projection, no UDF serialization); the all-zero vector quantizes
    * to all-zero codes with scale 0. Output carries codes + scale so
    * [[dequantize]] round-trips. */
  def quantizeInt8(df: DataFrame, vecCol: String,
                   codesCol: String = "codes",
                   scaleCol: String = "scale"): DataFrame = {
    val v = transform(col(vecCol), x => x.cast("double"))
    val mx = array_max(transform(v, x => abs(x)))
    val codes = when(mx === 0d,
      transform(v, _ => lit(0L))).otherwise(
      transform(v, x => round(x * 127.0 / mx).cast("long")))
    df.withColumn(codesCol, codes)
      .withColumn(scaleCol, mx / 127.0)
  }

  /** Inverse of [[quantizeInt8]]: v ≈ codes · scale (float32 result,
    * matching the embedding column type). */
  def dequantize(df: DataFrame, codesCol: String, scaleCol: String,
                 outCol: String = "embedding_deq"): DataFrame =
    df.withColumn(outCol,
      transform(col(codesCol), c => (c * col(scaleCol)).cast("float")))

  /** Deterministic ±1 sign for projection cell (i, j): parity of the
    * first hex digit of md5("i_j") — reproducible anywhere md5 exists,
    * including a SQL oracle. */
  def projectionSign(i: Int, j: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"${i}_$j".getBytes("UTF-8"))
    // first hex digit even ⇔ high nibble of byte 0 even
    if (((h(0) >> 4) & 1) == 0) 1.0 else -1.0
  }

  /** Achlioptas-style random projection to `outDims` dimensions: each
    * output dim j is Σᵢ sign(i,j)·vᵢ with the md5-derived ±1 matrix —
    * the distance-preserving dim-reduce a pipeline runs before LSH/ANN
    * when 100 TB of float32 embeddings won't fit the index budget.
    *
    * The sign matrix is data-independent, so it is baked in as LITERAL
    * arrays (computed once on the driver, dims·outDims values) — zero
    * per-row hashing; the projection itself is a zero-shuffle map. Each
    * output is a left-to-right fold seeded with 0.0 (0.0 + t₁ = t₁
    * bit-exactly), the q109 convention, so any engine folding the same
    * sequence reproduces the doubles bit-for-bit. */
  def randomProjection(df: DataFrame, vecCol: String, inDims: Int,
                       outDims: Int, outCol: String = "proj"): DataFrame = {
    require(inDims > 0 && outDims > 0 && outDims <= inDims)
    val v = transform(col(vecCol), x => x.cast("double"))
    val projs = (0 until outDims).map { j =>
      val signs = array((0 until inDims).map(i =>
        lit(projectionSign(i, j))): _*)
      aggregate(zip_with(v, signs, (x, s) => x * s), lit(0.0), _ + _)
    }
    df.withColumn(outCol, array(projs: _*))
  }

  /** Per-query top-k by (cosine desc, id asc): bounded-heap aggregate on
    * the struct (-cosine, id), whose ascending order IS that ranking.
    * CollectTopK's eval returns the retained k in ascending order, so
    * array position is the rank. */
  private def topK(scored: DataFrame, k: Int): DataFrame =
    scored.groupBy("qid")
      .agg(AggFunctions.collectTopK(
        struct((-col("cosine")).as("nc"), col("id")), k, smallest = true)
        .as("_top"))
      .select(col("qid"), posexplode(col("_top")))
      .select(col("qid"), col("col.id").as("id"),
        (-col("col.nc")).as("cosine"), (col("pos") + 1).as("rank"))

  /** Iteration-friendly view of a k-means fit input: every Lloyd round
    * is one Spark job over the input, so a near-empty partition charges
    * its task-launch overhead once per round — 20 iterations over a
    * 2k-row corpus fanned to 32 partitions is 640 almost-empty tasks
    * (r7 measured q43 at 2.67× its r6 time from exactly this). Same
    * remedy as `DistributedGlmObjective`'s iteration view
    * (ml/Objectives.scala:61-76): coalesce the FIT input to ≥25k rows
    * per partition (assignment/probe passes stay on the fanned scan —
    * they run once, not per iteration). The count() is one cheap job the
    * fit's own first pass would pay anyway; at production row counts the
    * clamp keeps the incoming partitioning, so this is a no-op at scale. */
  private def fitView(df: DataFrame, rowsPerPart: Long = 25000L): DataFrame = {
    val par = df.sparkSession.sparkContext.defaultParallelism.toLong
    val n = df.count()
    val target = math.min(par, n / rowsPerPart + 1).toInt
    df.coalesce(target)
  }

  /** Coarse k-means fit through MLlib's RDD API directly. Numerically
    * IDENTICAL to `ml.clustering.KMeans.fit` — the ml wrapper delegates
    * to exactly this implementation with the same defaults (k-means||
    * init, 2 init steps, epsilon 1e-4, euclidean distance) — but
    * WITHOUT the wrapper's training-summary instrumentation, which
    * re-transforms the whole fit input and collects per-cluster sizes
    * just to log them: one full extra pass over the corpus per build,
    * at any scale, computing something nothing reads (guide §1.2). */
  private def coarseKMeansFit(fit: DataFrame, k: Int, seed: Long,
                              maxIter: Int)
  : org.apache.spark.mllib.clustering.KMeansModel = {
    val rdd = fit.select(col("fv")).rdd.map(r =>
      org.apache.spark.mllib.linalg.Vectors.fromML(
        r.getAs[org.apache.spark.ml.linalg.Vector](0)))
    // the ml wrapper persists its instances RDD across the fit's
    // iterations when the input is uncached (handlePersistence) — the
    // direct path keeps that behavior
    rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try new org.apache.spark.mllib.clustering.KMeans().setK(k)
      .setSeed(seed).setMaxIterations(maxIter).run(rdd)
    finally rdd.unpersist(false)
  }

  /** List assignment against a [[coarseKMeansFit]] model — the same
    * `predict` kernel `ml.KMeansModel.transform`'s prediction UDF
    * applies, so assignments are bit-identical to the wrapper's. */
  private def assignList(
      model: org.apache.spark.mllib.clustering.KMeansModel)
  : org.apache.spark.sql.expressions.UserDefinedFunction =
    udf { (v: org.apache.spark.ml.linalg.Vector) =>
      model.predict(org.apache.spark.mllib.linalg.Vectors.fromML(v))
    }

  /** Exact top-k cosine neighbors of each query vector.
    * queries: (qid, qv), corpus: (id, v). Queries must be broadcastable. */
  def bruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    topK(corpus.join(broadcast(queries))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)

  /** Hard-negative mining for contrastive training: exact top-k cosine
    * neighbors of each query EXCLUDING its known positives — the
    * highest-similarity non-matches are exactly the negatives a
    * retrieval model learns most from.
    *
    * `positives` is (qid, id) for the query batch only, so it is
    * broadcast-sized by the same argument that makes `queries`
    * broadcastable; the exclusion is then a broadcast anti join applied
    * BEFORE the bounded-heap top-k (excluding after would silently
    * under-fill k), and the whole mine stays a single map-side corpus
    * scan — no shuffle at any corpus size. */
  def hardNegatives(queries: DataFrame, corpus: DataFrame,
                    positives: DataFrame, k: Int): DataFrame = {
    val scored = corpus.join(broadcast(queries))
      .select(col("qid"), col("id"), V.cosine(col("qv"), col("v")).as("cosine"))
    topK(scored.join(broadcast(positives.select("qid", "id")),
      Seq("qid", "id"), "left_anti"), k)
  }

  /** IVF-Flat ANN: a k-means coarse quantizer (distributed MLlib fit)
    * assigns every corpus vector to its nearest of `nList` centroids;
    * queries probe the `nProbe` nearest inverted lists and score only
    * those lists' members. The classic IVF trade-off: centroids adapt to
    * the data distribution (vs. data-oblivious LSH hyperplanes), at the
    * cost of a training pass. Corpus side = one k-means fit + one
    * shuffle on list id; centroids (nList · dim doubles) broadcast. */
  def ivf(queries: DataFrame, corpus: DataFrame, k: Int,
          nList: Int = 16, nProbe: Int = 2, seed: Long = 7L,
          kmeansMaxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val av = corpus.select(col("id"), col("v"),
      array_to_vector(col("v").cast("array<double>")).as("fv"))
    val model = coarseKMeansFit(fitView(av), nList, seed, kmeansMaxIter)
    val bucketed = av.select(col("id"), col("v"),
      assignList(model)(col("fv")).as("list"))
    val centers = corpus.sparkSession.sparkContext
      .broadcast(model.clusterCenters.map(_.toArray))
    val probeLists = udf { (qv: Seq[Double]) =>
      probeIdx(centers.value, qv, nProbe)
    }
    val q = queries.select(col("qid"), col("qv"),
      explode(probeLists(col("qv").cast("array<double>"))).as("list"))
    topK(bucketed.join(broadcast(q), Seq("list"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
  }

  /** Build and PERSIST an IVF-Flat index — the production workflow at
    * corpus scale: the k-means fit and list assignment run ONCE and the
    * index is reused across query batches, never refit per query.
    * Writes two tables under `dir`:
    *   - `centroids.parquet`: (list, center) — nList rows, the coarse
    *     quantizer;
    *   - `postings.parquet`: (id, v) PARTITIONED BY list — each
    *     inverted list is its own partition directory, so a probe that
    *     touches `nProbe` lists READS only those directories (storage
    *     partition pruning, the IVF promise made physical: at 100 TB
    *     the unprobed lists never leave object storage).
    * The postings write repartitions by list so each partition is one
    * coherent file set, not a per-task fragment spray. */
  // ---- persisted-index shared plumbing ---------------------------------
  // one loader + one kernel each, shared by the build/append/query
  // paths: a layout change edited in a single place cannot
  // desynchronize append from probe

  /** Snapshot a BOUNDED (broadcast-class) frame: one collect + a local
    * relation over the rows. Used where one plan execution derives
    * driver-side state (a partition filter) that a second execution
    * must agree with — recomputing a nondeterministic input in between
    * would desynchronize them. Unlike localCheckpoint this pins nothing
    * in the block manager after the caller drops the frame. */
  private def materialize(spark: org.apache.spark.sql.SparkSession,
                          df: DataFrame): DataFrame = {
    val rows = df.collect()
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), df.schema)
  }

  /** Coarse centroids of a persisted index, in list order — bounded
    * (nList · dim doubles). `path` is the manifest-resolved table
    * directory (one [[Manifest.snapshot]] per query keeps every table a
    * plan reads on the same index version). */
  private def loadCentroids(spark: org.apache.spark.sql.SparkSession,
                            path: String): Array[Array[Double]] =
    spark.read.parquet(path)
      .orderBy("list").collect().map(_.getSeq[Double](1).toArray)

  /** PQ codebooks of a persisted index as a (j)(c) grid — bounded
    * (m · nCodes · subLen doubles). */
  private def loadCodebooks(spark: org.apache.spark.sql.SparkSession,
                            path: String): Array[Array[Array[Double]]] = {
    val rows = spark.read.parquet(path)
      .orderBy("j", "c").collect()
    val m = rows.map(_.getInt(0)).max + 1
    val nCodes = rows.map(_.getInt(1)).max + 1
    Array.tabulate(m, nCodes) { (j, c) =>
      rows(j * nCodes + c).getSeq[Double](2).toArray
    }
  }

  /** Index of the nearest centroid by squared L2 (lowest index wins
    * ties) — the assignment kernel of the append paths. */
  private def nearestIdx(cents: Array[Array[Double]],
                         v: Seq[Double]): Int = {
    var best = 0
    var bestD = Double.MaxValue
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      var d = 0.0
      var j = 0
      while (j < c.length) { val t = c(j) - v(j); d += t * t; j += 1 }
      if (d < bestD) { bestD = d; best = i }
      i += 1
    }
    best
  }

  /** The `nProbe` nearest centroid indices by squared L2, ascending
    * distance — the probe kernel of the query paths. */
  private def probeIdx(cents: Array[Array[Double]], v: Seq[Double],
                       nProbe: Int): Seq[Int] =
    cents.zipWithIndex.map { case (c, i) =>
      var d = 0.0
      var j = 0
      while (j < c.length) { val t = c(j) - v(j); d += t * t; j += 1 }
      (d, i)
    }.sortBy(_._1).take(nProbe).map(_._2).toSeq

  /** Asymmetric-distance cosine estimate: Σⱼ dot(qⱼ, codebook_j[code_j])
    * over the stored norm — the PQ scoring kernel of both the in-memory
    * and persisted query paths. */
  private def adcScore(cb: Array[Array[Array[Double]]], subLen: Int,
                       qv: Seq[Double], codes: Seq[Int],
                       nrm: Double): Double = {
    var s = 0.0
    var j = 0
    while (j < cb.length) {
      val cent = cb(j)(codes(j))
      var t = 0
      while (t < subLen) { s += cent(t) * qv(j * subLen + t); t += 1 }
      j += 1
    }
    var qn = 0.0
    var i = 0
    while (i < qv.length) { qn += qv(i) * qv(i); i += 1 }
    if (nrm == 0.0 || qn == 0.0) 0.0 else s / (math.sqrt(qn) * nrm)
  }

  /** Appended ids must WIDEN into the index's id type: Spark's default
    * cast would silently wrap a narrowing integral cast (long batch ids
    * into an int-id index), storing corrupted ids that later probes
    * join against nothing. */
  private def requireIdWidens(from: org.apache.spark.sql.types.DataType,
                              to: org.apache.spark.sql.types.DataType)
  : Unit = {
    import org.apache.spark.sql.types._
    def rank(dt: DataType): Option[Int] = dt match {
      case ByteType => Some(1)
      case ShortType => Some(2)
      case IntegerType => Some(3)
      case LongType => Some(4)
      case _ => None
    }
    val ok = from == to || ((rank(from), rank(to)) match {
      case (Some(f), Some(t)) => f <= t
      case _ => false
    })
    require(ok, s"append id type ${from.catalogString} does not widen " +
      s"to index id type ${to.catalogString}")
  }

  /** PQ-encode one vector against the codebook grid: per-subspace
    * nearest sub-centroid indices plus the vector norm. */
  private def pqEncode(cb: Array[Array[Array[Double]]], subLen: Int,
                       v: Seq[Double]): (Array[Int], Double) = {
    val codes = new Array[Int](cb.length)
    var nrm = 0.0
    var i = 0
    while (i < v.length) { nrm += v(i) * v(i); i += 1 }
    var j = 0
    while (j < cb.length) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cb(j).length) {
        var d = 0.0
        var t = 0
        while (t < subLen) {
          val diff = cb(j)(c)(t) - v(j * subLen + t); d += diff * diff
          t += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(j) = best; j += 1
    }
    (codes, math.sqrt(nrm))
  }

  def ivfBuild(corpus: DataFrame, dir: String, nList: Int = 16,
               seed: Long = 7L, kmeansMaxIter: Int = 20): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val av = corpus.select(col("id"), col("v"),
      array_to_vector(col("v").cast("array<double>")).as("fv"))
    val model = coarseKMeansFit(fitView(av), nList, seed, kmeansMaxIter)
    import spark.implicits._
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("list", "center")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids.parquet")
    av.select(assignList(model)(col("fv")).as("list"), col("id"),
        col("v"))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list")
      .parquet(s"$dir/postings.parquet")
    // a fresh in-place build supersedes any prior compaction history:
    // clear stale manifests/versions so readers resolve the new tables
    Manifest.reset(spark, dir)
  }

  /** Append a delta batch to a persisted [[ivfBuild]] index WITHOUT
    * refitting: the batch assigns to the EXISTING coarse centroids
    * (bounded broadcast) and its postings land as NEW files inside each
    * list's partition directory (`mode("append")` + `partitionBy` only
    * touches the lists the batch hits). This is the daily-growth
    * workflow at corpus scale — a refit is a training job over the
    * whole corpus, an append is one scan of the delta. The documented
    * trade: coarse centroids drift as the distribution moves, so probe
    * recall decays until a rebuild; probe-all correctness (the oracle
    * gate) is unaffected because every vector lands in exactly one
    * list whatever the assignment. */
  def ivfAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                batch: DataFrame,
                batchId: Option[String] = None): Unit =
    // writer lock for the WHOLE drop, snapshot taken inside it: an
    // append racing a compaction would otherwise land its files in the
    // superseded physical directory after the compactor's read — rows
    // silently lost at the manifest flip (and GC'd with the old dir)
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val postingsPath = snap.path("postings")
      val bc = spark.sparkContext.broadcast(
        loadCentroids(spark, snap.path("centroids")))
      val assign = udf { (v: Seq[Double]) => nearestIdx(bc.value, v) }
      // coerce the batch to the EXISTING index's column types: an
      // append that silently mixes (say) float and double data files
      // under one directory corrupts every later probe's scan
      val existing = spark.read.parquet(postingsPath).schema
      requireIdWidens(batch.schema("id").dataType, existing("id").dataType)
      batch
        .select(assign(col("v").cast("array<double>")).as("list"),
          col("id").cast(existing("id").dataType),
          col("v").cast(existing("v").dataType))
        .repartition(col("list"))
        .write.mode("append").partitionBy("list")
        .parquet(postingsPath)
      // append-supersedes-delete (see [[Tombstones.pruneOnAppend]])
      Tombstones.pruneOnAppend(spark, dir, snap,
        batch.select(col("id").cast(existing("id").dataType).as("id")))
      batchId.foreach(IngestLog.record(spark, snap, _))
    }

  /** Probe a persisted [[ivfBuild]] index: centroids load as one
    * bounded collect (nList · dim doubles — broadcast-class by
    * construction), each query explodes into its `nProbe` nearest
    * lists, and the postings scan carries a LITERAL `list IN (...)`
    * partition filter — the union of probed lists, at most nList
    * values, computed driver-side from the broadcast-class query
    * batch — so unprobed list directories are pruned STATICALLY at
    * planning time (never read from storage), rather than hoping the
    * runtime join or DPP filters them. Same semantics as [[ivf]] with
    * the fit amortized away. */
  def ivfQuery(spark: org.apache.spark.sql.SparkSession, dir: String,
               queries: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val bc = spark.sparkContext.broadcast(
      loadCentroids(spark, snap.path("centroids")))
    val probeLists = udf { (qv: Seq[Double]) =>
      probeIdx(bc.value, qv, nProbe)
    }
    // MATERIALIZE the exploded query batch (broadcast-class:
    // |queries|·nProbe rows) before deriving the partition filter: the
    // filter is collected from one execution of this plan and the join
    // below re-executes it — a nondeterministic `queries` (sample(),
    // unordered limit) could otherwise probe lists the static filter
    // already excluded, silently dropping candidates. Collect-and-
    // recreate (the annIndexGate convention) rather than
    // localCheckpoint: nothing stays pinned in the block manager across
    // repeated probe calls
    val q = materialize(spark,
      queries.select(col("qid"), col("qv"),
        explode(probeLists(col("qv").cast("array<double>"))).as("list")))
    // distinct probed lists: ≤ nList ints — one tiny job over the
    // query batch buys a static PartitionFilter on the postings scan
    val probed = q.select(col("list")).distinct()
      .collect().map(_.getInt(0)).sorted
    // tombstone filter AFTER the static partition prune: retracted ids
    // vanish from results immediately, and the anti-join only sees the
    // probed lists' rows
    val postings = Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("postings"))
        .where(col("list").isin(probed.map(Int.box): _*)))
    topK(postings.join(broadcast(q), Seq("list"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
  }

  /** Retract vectors from a persisted [[ivfBuild]] /  [[ivfPqBuild]]
    * index ([[Tombstones]] — the erasure verb the
    * build/append/probe/compact lifecycle otherwise lacks): the ids
    * stop appearing in [[ivfQuery]]/[[ivfPqQuery]] results immediately
    * (stored-side anti-join, applied after the partition prune) and
    * their postings/codes rows are physically dropped by the next
    * [[ivfCompact]]/[[ivfPqCompact]]/rebuild. Works for both layouts —
    * the tombstone table is keyed by id alone. */
  def ivfDelete(spark: org.apache.spark.sql.SparkSession, dir: String,
                ids: DataFrame, idCol: String = "id"): Unit = {
    val snap = Manifest.snapshot(spark, dir)
    val table =
      if (new org.apache.hadoop.fs.Path(snap.path("codes"))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(new org.apache.hadoop.fs.Path(snap.path("codes"))))
        "codes"
      else "postings"
    val idType = spark.read.parquet(snap.path(table))
      .schema("id").dataType
    Tombstones.append(spark, dir,
      ids.select(col(idCol).cast(idType).as("id")))
  }

  /** Build and PERSIST an IVF-PQ index — [[ivfBuild]]'s layout with the
    * postings product-quantized: what lands on disk is the COMPRESSED
    * corpus (m byte-scale codes + one norm per vector, ~100× smaller
    * than the embeddings), partitioned by inverted list. At 100 TB this
    * is the index you actually ship: the ANN scan reads pruned
    * directories of codes; the original vectors stay in the embedding
    * store and are fetched by id only for the ≤ |queries|·refineK
    * refine join. Writes under `dir`:
    *   - `centroids.parquet`: (list, center) — the coarse quantizer;
    *   - `codebooks.parquet`: (j, c, center) — m·nCodes sub-centroids;
    *   - `codes.parquet`: (id, codes, norm) PARTITIONED BY list.
    * Training mirrors [[ivfPq]]: distributed coarse fit on a
    * row-sized-partition view, sub-codebooks via local Lloyd on a
    * bounded sample (codebook quality needs thousands of examples, not
    * the corpus). */
  def ivfPqBuild(corpus: DataFrame, dir: String, nList: Int = 16,
                 m: Int = 4, nCodes: Int = 16, trainFraction: Double = 1.0,
                 seed: Long = 7L, kmeansMaxIter: Int = 20): Unit = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val av = corpus.select(col("id"), col("v"),
      array_to_vector(col("v").cast("array<double>")).as("fv"))
    val coarse = coarseKMeansFit(fitView(av), nList, seed, kmeansMaxIter)
    val dim = corpus.select(size(col("v")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subLen = dim / m
    val maxTrain = 65536
    val sample: Array[Array[Double]] =
      (if (trainFraction >= 1.0) av
       else av.sample(withReplacement = false, trainFraction, seed))
        .select(col("v").cast("array<double>")).limit(maxTrain)
        .collect().map(_.getSeq[Double](0).toArray)
    val codebooks: Array[Array[Array[Double]]] = (0 until m).map { j =>
      localLloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * subLen, (j + 1) * subLen)),
        nCodes, kmeansMaxIter)
    }.toArray
    coarse.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }.toSeq
      .toDF("list", "center")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/centroids.parquet")
    codebooks.zipWithIndex.flatMap { case (cb, j) =>
      cb.zipWithIndex.map { case (cent, c) => (j, c, cent.toSeq) }
    }.toSeq.toDF("j", "c", "center")
      .coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/codebooks.parquet")
    val bcCb = spark.sparkContext.broadcast(codebooks)
    // float→double widening is exact, so encoding the cast column with
    // the shared double kernel is bit-identical to a float-input loop
    val encode = udf { (v: Seq[Double]) =>
      pqEncode(bcCb.value, subLen, v)
    }
    av.select(assignList(coarse)(col("fv")).as("list"), col("id"),
        encode(col("v").cast("array<double>")).as("e"))
      .select(col("list"), col("id"), col("e._1").as("codes"),
        col("e._2").as("norm"))
      .repartition(col("list"))
      .write.mode("overwrite").partitionBy("list")
      .parquet(s"$dir/codes.parquet")
    // see ivfBuild: fresh in-place build invalidates compaction history
    Manifest.reset(spark, dir)
  }

  /** Append a delta batch to a persisted [[ivfPqBuild]] index WITHOUT
    * refitting ([[ivfAppend]]'s workflow for the compressed layout):
    * the batch assigns to the EXISTING coarse centroids and encodes
    * against the EXISTING codebooks (both bounded broadcasts), and its
    * codes land as new files in the hit lists' partition directories.
    * Same drift trade as [[ivfAppend]], plus quantization error grows
    * if the new vectors leave the codebooks' trained region — probe-all
    * + refine-all correctness is unaffected (codes only order
    * candidates; the exact rescoring decides). */
  def ivfPqAppend(spark: org.apache.spark.sql.SparkSession, dir: String,
                  batch: DataFrame,
                  batchId: Option[String] = None): Unit =
    // [[ivfAppend]]'s writer lock, same rationale
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val codesPath = snap.path("codes")
      val codebooks = loadCodebooks(spark, snap.path("codebooks"))
      val subLen = codebooks(0)(0).length
      val bcC = spark.sparkContext.broadcast(
        loadCentroids(spark, snap.path("centroids")))
      val bcCb = spark.sparkContext.broadcast(codebooks)
      val assignAndEncode = udf { (v: Seq[Double]) =>
        val (codes, nrm) = pqEncode(bcCb.value, subLen, v)
        (nearestIdx(bcC.value, v), codes, nrm)
      }
      // [[ivfAppend]]'s schema coercion: the appended files must carry
      // the EXISTING index's column types
      val existing = spark.read.parquet(codesPath).schema
      requireIdWidens(batch.schema("id").dataType, existing("id").dataType)
      batch
        .select(col("id").cast(existing("id").dataType),
          assignAndEncode(col("v").cast("array<double>")).as("e"))
        .select(col("e._1").as("list"), col("id"), col("e._2").as("codes"),
          col("e._3").as("norm"))
        .repartition(col("list"))
        .write.mode("append").partitionBy("list")
        .parquet(codesPath)
      // append-supersedes-delete (see [[Tombstones.pruneOnAppend]])
      Tombstones.pruneOnAppend(spark, dir, snap,
        batch.select(col("id").cast(existing("id").dataType).as("id")))
      batchId.foreach(IngestLog.record(spark, snap, _))
    }

  /** Probe a persisted [[ivfPqBuild]] index. Centroids and codebooks
    * load as bounded collects (coarse nList·dim + m·nCodes·subLen
    * doubles — broadcast-class by construction); the codes scan carries
    * the [[ivfQuery]] literal `list IN (...)` partition filter so
    * unprobed directories never leave storage; asymmetric-distance
    * scoring runs over CODES (the ~100× smaller table), a bounded heap
    * keeps refineK candidates per query, and only those ids fetch their
    * original vectors from `corpus` for the exact rescoring. With
    * nProbe = nList and refineK ≥ |corpus| the result equals brute
    * force (the oracle gate); production settings are recall-gated. */
  def ivfPqQuery(spark: org.apache.spark.sql.SparkSession, dir: String,
                 queries: DataFrame, corpus: DataFrame, k: Int,
                 nProbe: Int = 2, refineK: Int = 50): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val codebooks = loadCodebooks(spark, snap.path("codebooks"))
    val subLen = codebooks(0)(0).length
    val bcC = spark.sparkContext.broadcast(
      loadCentroids(spark, snap.path("centroids")))
    val bcCb = spark.sparkContext.broadcast(codebooks)
    val probeLists = udf { (qv: Seq[Double]) =>
      probeIdx(bcC.value, qv, nProbe)
    }
    val adc = udf { (qv: Seq[Double], codes: Seq[Int], nrm: Double) =>
      adcScore(bcCb.value, subLen, qv, codes, nrm)
    }
    // materialized before the filter collect for the same
    // consistency-under-nondeterminism reason as [[ivfQuery]]
    val q = materialize(spark, queries.select(col("qid"),
      col("qv").cast("array<double>").as("qd"),
      explode(probeLists(col("qv").cast("array<double>"))).as("list")))
    val probed = q.select(col("list")).distinct()
      .collect().map(_.getInt(0)).sorted
    val codes = Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("codes"))
        .where(col("list").isin(probed.map(Int.box): _*)))
    val approxTop = codes.join(broadcast(q), Seq("list"))
      .select(col("qid"), col("id"),
        adc(col("qd"), col("codes"), col("norm")).as("approx"))
      .groupBy("qid")
      .agg(AggFunctions.collectTopK(
        struct((-col("approx")).as("na"), col("id")), refineK,
        smallest = true).as("_top"))
      .select(col("qid"), explode(col("_top")).as("c"))
      .select(col("qid"), col("c.id").as("id"))
    topK(approxTop
      .join(corpus, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
  }

  // ---- persisted-index lifecycle: compaction + recall monitoring ------
  // every [[ivfAppend]]/[[ivfPqAppend]] writes NEW files into the hit
  // lists' partition directories, so a daily-append index accumulates
  // hundreds of small files per list (the classic small-file scan-cost
  // cliff) while the un-refit centroids drift away from the data. These
  // close the loop the append docstrings promise: a compactor that
  // rewrites each list into sized files (optionally refitting — a
  // rebuild), and a recall probe that MEASURES the drift so the rebuild
  // is triggered by evidence, not a calendar. The versioned-directory
  // [[Manifest]] (its own file — it is the shared substrate of every
  // persisted index family in this package) keeps all of it reader-safe.

  /** Compact a persisted [[ivfBuild]] index's postings: every list's
    * accumulated append fragments are rewritten into ONE coherent file
    * set per list (the same `repartition(list)` layout the build path
    * writes), read once → write once → swap. With `rebuild = true` the
    * whole index is refit from the stored postings — new coarse
    * centroids (same nList, read from the centroid table) and fresh
    * assignments — which is the answer to append-induced centroid
    * drift; [[ivfRecallProbe]] tells you when that is worth a training
    * pass. Probe-all semantics are invariant under both modes (every
    * vector lands in exactly one list either way). */
  def ivfCompact(spark: org.apache.spark.sql.SparkSession, dir: String,
                 rebuild: Boolean = false, seed: Long = 7L,
                 kmeansMaxIter: Int = 20,
                 maxRecordsPerFile: Long = 0L): Unit =
  // lock across the whole read→rewrite→flip span (not just the flip):
  // an append landing between our postings read and the manifest flip
  // would be dropped with the superseded directory
  Manifest.withLock(spark, dir) {
    val snap = Manifest.snapshot(spark, dir)
    // pending Tombstones fold here, whichever mode: retracted rows are
    // physically dropped from the rewrite and the emptied tombstone
    // table flips in the same publish. The FULL-ROW distinct is the
    // dedupe point for replayed/repaired appends (a crashed
    // multi-family admission's `re_append` repair, or an at-least-once
    // micro-batch retry, lands the SAME vectors again — identical
    // (list, id, v) rows under the frozen centroids) — without it a
    // duplicate id occupies multiple top-k slots forever, which is why
    // [[CorpusPipeline.fleetIngestReconcile]]'s repair is only safe
    // because every family's compaction folds duplicates. Full-row,
    // not by-id: replayed rows are identical by construction, so they
    // still fold, while two rows sharing an id but carrying DIFFERENT
    // vectors (an upstream id collision) both survive LOUDLY instead
    // of one being dropped nondeterministically. Gated on the ingest
    // log's replay evidence ([[IngestLog.hasReplayEvidence]]): the
    // common no-replay compaction stays a straight rewrite
    val raw = Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("postings")))
    val postings =
      if (IngestLog.hasReplayEvidence(spark, snap)) raw.distinct()
      else raw
    if (rebuild) {
      // full refit through the build path itself (one code path =
      // layouts cannot diverge) into a sibling temp index, then ONE
      // manifest flip for both tables — a concurrent reader never pairs
      // new centroids with old list assignments
      val nList = spark.read.parquet(snap.path("centroids"))
        .count().toInt
      val tmp = s"$dir/_rebuild.tmp"
      ivfBuild(postings.select(col("id"), col("v")), tmp, nList,
        seed, kmeansMaxIter)
      Manifest.publishUnderLock(spark, dir, Seq(
        "centroids" -> s"$tmp/centroids.parquet",
        "postings" -> s"$tmp/postings.parquet") ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
      val tmpP = new org.apache.hadoop.fs.Path(tmp)
      tmpP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(tmpP, true)
    } else {
      // keep assignments; just coalesce each list's file spray.
      // maxRecordsPerFile bounds the HOT-list case twice over: salted
      // repartitioning caps the rewrite TASK at ~target rows (see
      // [[saltedByList]]) and the write option caps the FILE size
      val tmp = s"$dir/_compact.tmp.postings"
      val w = saltedByList(
        postings.select(col("list"), col("id"), col("v")),
        maxRecordsPerFile)
        .write.mode("overwrite").partitionBy("list")
      (if (maxRecordsPerFile > 0L)
         w.option("maxRecordsPerFile", maxRecordsPerFile)
       else w).parquet(tmp)
      Manifest.publishUnderLock(spark, dir, Seq("postings" -> tmp) ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
    }
  }

  /** [[ivfCompact]] for the compressed [[ivfPqBuild]] layout: rewrite
    * each list's accumulated code fragments into one file set per list.
    * No in-place rebuild mode — the index stores codes, not vectors, so
    * a refit needs the embedding store: that is [[ivfPqRebuild]]. */
  def ivfPqCompact(spark: org.apache.spark.sql.SparkSession,
                   dir: String, maxRecordsPerFile: Long = 0L): Unit =
    // [[ivfCompact]]'s full-span writer lock, same rationale
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val tmp = s"$dir/_compact.tmp.codes"
      // replayed/repaired appends land identical (list, id, codes,
      // norm) rows — fold them by FULL-ROW distinct, gated on replay
      // evidence (see [[ivfCompact]]: divergent same-id rows survive
      // loudly; the no-replay path is a straight rewrite)
      val raw = Tombstones.live(spark, snap,
        spark.read.parquet(snap.path("codes")))
        .select(col("list"), col("id"), col("codes"), col("norm"))
      val src =
        if (IngestLog.hasReplayEvidence(spark, snap)) raw.distinct()
        else raw
      val w = saltedByList(src, maxRecordsPerFile)
        .write.mode("overwrite").partitionBy("list")
      (if (maxRecordsPerFile > 0L)
         w.option("maxRecordsPerFile", maxRecordsPerFile)
       else w).parquet(tmp)
      Manifest.publishUnderLock(spark, dir, Seq("codes" -> tmp) ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
    }

  /** Reader-safe refit of a persisted [[ivfPqBuild]] index from the
    * embedding store (`corpus` — the codes table cannot reconstruct
    * vectors): [[ivfCompact]]'s rebuild mode for the compressed layout.
    * Re-trains through `ivfPqBuild` itself into a sibling temp index
    * (same nList/m/nCodes, read from the existing tables), then flips
    * centroids, codebooks, and codes in ONE manifest publish — a
    * concurrent reader sees the old index or the new one, never new
    * centroids scoring old codes. */
  def ivfPqRebuild(spark: org.apache.spark.sql.SparkSession, dir: String,
                   corpus: DataFrame, trainFraction: Double = 1.0,
                   seed: Long = 7L, kmeansMaxIter: Int = 20): Unit =
    // [[ivfCompact]]'s full-span writer lock, same rationale
    Manifest.withLock(spark, dir) {
      val snap = Manifest.snapshot(spark, dir)
      val nList = spark.read.parquet(snap.path("centroids")).count().toInt
      val cb = loadCodebooks(spark, snap.path("codebooks"))
      val tmp = s"$dir/_rebuild.tmp"
      // fold pending Tombstones: the embedding store may still carry
      // retracted ids — a rebuild that re-encoded them would silently
      // resurrect deleted vectors
      ivfPqBuild(Tombstones.live(spark, snap, corpus), tmp, nList,
        cb.length, cb(0).length, trainFraction, seed, kmeansMaxIter)
      Manifest.publishUnderLock(spark, dir, Seq(
        "centroids" -> s"$tmp/centroids.parquet",
        "codebooks" -> s"$tmp/codebooks.parquet",
        "codes" -> s"$tmp/codes.parquet") ++
        Tombstones.foldedForPublish(spark, dir, snap),
        drops = Tombstones.dropIfFolded(spark, snap))
      val tmpP = new org.apache.hadoop.fs.Path(tmp)
      tmpP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .delete(tmpP, true)
    }

  /** Compaction repartitioning: one shuffle partition per list by
    * default; with a records-per-file target also SALT the hot lists so
    * a skewed list is rewritten by ⌈rows/target⌉ parallel tasks instead
    * of one giant task (the write's own `maxRecordsPerFile` bounds file
    * SIZE but not task time). The per-list slice counts are one bounded
    * aggregate (nList rows) collected to a broadcast-class map. */
  private def saltedByList(src: DataFrame,
                           maxRecordsPerFile: Long): DataFrame = {
    if (maxRecordsPerFile <= 0L) src.repartition(col("list"))
    else {
      val spark = src.sparkSession
      val slices = src.groupBy("list").count().collect().map { r =>
        r.getInt(0) ->
          math.max(1L, (r.getLong(1) + maxRecordsPerFile - 1)
            / maxRecordsPerFile).toInt
      }.toMap
      val bc = spark.sparkContext.broadcast(slices)
      val slicesOf = udf { (list: Int) => bc.value.getOrElse(list, 1) }
      src.repartition(col("list"),
        pmod(xxhash64(col("id")), slicesOf(col("list"))))
    }
  }

  /** Mean recall@k of the PRODUCTION probe (persisted index, partial
    * nProbe) against exact brute force over the index's own postings,
    * on a bounded query sample — the drift monitor that decides when
    * [[ivfCompact]]'s rebuild is due. Both sides are ≤ |queries|·k rows
    * (bounded-heap top-k), so the comparison is driver-cheap at any
    * corpus size; the cost is one postings scan for the brute-force
    * side, which is why the probe runs on a SAMPLE of queries on a
    * schedule, not per batch. Ties are deterministic on both sides
    * (cosine desc, id asc), so the hit-set comparison is exact. */
  def ivfRecallProbe(spark: org.apache.spark.sql.SparkSession,
                     dir: String, queries: DataFrame, k: Int,
                     nProbe: Int): Double = {
    val snap = Manifest.snapshot(spark, dir)
    // the brute-force side must see the same LIVE rows as the probe —
    // an un-filtered exact side would count tombstoned ids as misses
    val corpus = Tombstones.live(spark, snap,
      spark.read.parquet(snap.path("postings")))
      .select(col("id"), col("v"))
    val exact = bruteForce(queries, corpus, k).select("qid", "id")
    val got = ivfQuery(spark, dir, queries, k, nProbe).select("qid", "id")
    recallOf(exact, got)
  }

  /** recall = |got ∩ exact| / |exact| in ONE action: the two counts
    * used to be separate `exact.count()` + `intersect().count()` jobs,
    * re-executing the brute-force subtree twice per probe. Both sides
    * are unique on (qid, id) — bounded top-k with deterministic
    * ties — so the group count equals the row count and the grouped
    * presence-product equals `intersect().count()` exactly. */
  private def recallOf(exact: DataFrame, got: DataFrame): Double = {
    val r = exact.select(col("qid"), col("id"), lit(1).as("_t"))
      .unionByName(got.select(col("qid"), col("id"), lit(2).as("_t")))
      .groupBy("qid", "id")
      .agg(max(when(col("_t") === 1, 1).otherwise(0)).as("_e"),
        max(when(col("_t") === 2, 1).otherwise(0)).as("_g"))
      .agg(sum(col("_e")).as("_denom"),
        sum(col("_e") * col("_g")).as("_hits"))
      .head()
    val denom = if (r.isNullAt(0)) 0L else r.getLong(0)
    if (denom == 0L) 1.0
    else (if (r.isNullAt(1)) 0L else r.getLong(1)).toDouble / denom
  }

  /** [[ivfRecallProbe]] for a persisted [[ivfPqBuild]] index: the
    * brute-force side reads the original vectors from `corpus` (the
    * codes table cannot reconstruct them), the probe side runs the
    * production partial-probe + bounded-refine path. */
  def ivfPqRecallProbe(spark: org.apache.spark.sql.SparkSession,
                       dir: String, queries: DataFrame, corpus: DataFrame,
                       k: Int, nProbe: Int, refineK: Int): Double = {
    val exact = bruteForce(queries, corpus, k).select("qid", "id")
    val got = ivfPqQuery(spark, dir, queries, corpus, k, nProbe, refineK)
      .select("qid", "id")
    recallOf(exact, got)
  }

  /** Centroid-DRIFT probe of a persisted [[ivfBuild]] index: the early-
    * warning signal [[ivfRecallProbe]] confirms. An IVF index's quality
    * rests on its coarse centroids modeling the data distribution; as
    * appended batches drift (new domains, new embedding model epochs),
    * vectors land ever farther from their assigned centroid and probe
    * recall decays. This probe measures that directly and CHEAPLY —
    * no brute-force exact side, no queries needed:
    *
    *   - `base_mean_sim`: mean cosine of (a deterministic 1-in-
    *     `baseSampleMod` sample of) the STORED postings to the centroid
    *     of the list each is filed under — how well the quantizer fits
    *     the corpus it currently holds;
    *   - `batch_mean_sim`: mean cosine of the incoming batch to its
    *     nearest centroid (the same squared-L2 assignment [[ivfAppend]]
    *     would use) — how well the quantizer fits what is ARRIVING;
    *   - `drift_ratio` = batch/base: ≈1 means the batch looks like the
    *     corpus; falling means the quantizer is going stale for new
    *     data. [[indexMaintenancePlan]]'s `driftRatioFloor` turns it
    *     into a `rebuild` verdict.
    *
    * Cost: BOUNDED by construction — the base side reads at most
    * `maxBaseFiles` posting files (a deterministic path-hash subset;
    * [[sampledTableScan]]), joined to the broadcast-class centroid
    * table by the STORED list id (no assignment recompute), plus one
    * batch scan. `baseSampleMod` further thins rows WITHIN the read
    * files (compute, not IO). The output row carries
    * `base_files_read`/`base_files_total` so the fleet table shows
    * the touched fraction. A daily probe of a 100 TB index therefore
    * costs a few dozen GB, not a full postings pass — the whole point
    * of a cheap leading indicator. One output row; rows from many
    * indexes union into the fleet table. */
  /** Deterministic bounded-IO scan of a stored table: when the table
    * holds more than `maxFiles` parquet files, read only a
    * deterministic `maxFiles`-file subset (ranked by a hash of each
    * file's path — append order and listing order do not matter) with
    * partition-column discovery preserved via `basePath`. This is what
    * keeps a "cheap" monitoring probe cheap at corpus scale: a row-mod
    * sample still READS every file before filtering; a file subset
    * bounds the IO itself. Returns the frame plus (filesRead,
    * filesTotal) so callers can report the touched fraction. */
  private[operators] def sampledTableScan(
      spark: org.apache.spark.sql.SparkSession, path: String,
      maxFiles: Int): (DataFrame, Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = scala.collection.mutable.ArrayBuffer.empty[String]
    val it = fs.listFiles(p, true)
    while (it.hasNext) {
      val s = it.next()
      if (s.getPath.getName.endsWith(".parquet"))
        files += s.getPath.toString
    }
    if (maxFiles <= 0 || files.length <= maxFiles)
      (spark.read.parquet(path), files.length.toLong, files.length.toLong)
    else {
      // rank by a hash of the path RELATIVE to the table root so the
      // selection is stable under directory moves and version flips
      def rank(f: String): (Int, String) = {
        // listed paths come back fully qualified (file:/..., hdfs://…)
        // while `path` may be bare — strip up through the root if found
        val i = f.indexOf(path)
        val rel = if (i >= 0) f.substring(i + path.length) else f
        (scala.util.hashing.MurmurHash3.stringHash(rel, 42), rel)
      }
      val picked = files.sortBy(rank).take(maxFiles)
      (spark.read.option("basePath", path).parquet(picked.toSeq: _*),
        maxFiles.toLong, files.length.toLong)
    }
  }

  def ivfDriftProbe(spark: org.apache.spark.sql.SparkSession,
                    dir: String, batch: DataFrame,
                    baseSampleMod: Long = 1L,
                    maxBaseFiles: Int = 256): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val cents = spark.read.parquet(snap.path("centroids"))
      .select(col("list"), col("center"))
    val (postings, filesRead, filesTotal) =
      sampledTableScan(spark, snap.path("postings"), maxBaseFiles)
    val base = postings
      .filter(pmod(xxhash64(col("id")), lit(baseSampleMod)) === 0)
      .join(broadcast(cents), Seq("list"))
      .agg(avg(V.cosine(col("v").cast("array<double>"), col("center")))
        .as("base_mean_sim"))
    val bc = spark.sparkContext.broadcast(
      loadCentroids(spark, snap.path("centroids")))
    val assign = udf { (v: Seq[Double]) => nearestIdx(bc.value, v) }
    val bat = batch
      .select(assign(col("v").cast("array<double>")).as("list"), col("v"))
      .join(broadcast(cents), Seq("list"))
      .agg(avg(V.cosine(col("v").cast("array<double>"), col("center")))
        .as("batch_mean_sim"))
    base.crossJoin(bat).select(
      lit(dir).as("dir"), lit(snap.version).as("version"),
      col("base_mean_sim"), col("batch_mean_sim"),
      (col("batch_mean_sim") / col("base_mean_sim")).as("drift_ratio"),
      lit(filesRead).as("base_files_read"),
      lit(filesTotal).as("base_files_total"))
  }

  /** [[ivfDriftProbe]] for the compressed [[ivfPqBuild]] layout. The
    * codes table stores no vectors, so the base side scores the
    * RECONSTRUCTION — each row decodes to concat(codebook_j[code_j]),
    * the best x the index can represent — against the centroid of the
    * list it is filed under. That folds BOTH decay modes into one
    * number: coarse-centroid drift (vectors far from their list) and
    * codebook staleness (vectors the codebooks can no longer represent
    * — reconstruction error pulls the cosine down even when the coarse
    * assignment is fine). The batch side scores the caller's REAL
    * vectors against their nearest centroid, exactly as [[ivfAppend]]
    * would assign them. Cost: bounded as for [[ivfDriftProbe]] — at
    * most `maxBaseFiles` code files read (deterministic path-hash
    * subset, fraction reported in the output row), decoded against the
    * broadcast-class codebooks + centroids, plus one batch scan. */
  def ivfPqDriftProbe(spark: org.apache.spark.sql.SparkSession,
                      dir: String, batch: DataFrame,
                      baseSampleMod: Long = 1L,
                      maxBaseFiles: Int = 256): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val cents = spark.read.parquet(snap.path("centroids"))
      .select(col("list"), col("center"))
    val cb = loadCodebooks(spark, snap.path("codebooks"))
    val subLen = cb(0)(0).length
    val bcCb = spark.sparkContext.broadcast(cb)
    val recon = udf { (codes: Seq[Int]) =>
      val out = new Array[Double](codes.length * subLen)
      var j = 0
      while (j < codes.length) {
        System.arraycopy(bcCb.value(j)(codes(j)), 0, out, j * subLen,
          subLen)
        j += 1
      }
      out.toSeq
    }
    val (codes, filesRead, filesTotal) =
      sampledTableScan(spark, snap.path("codes"), maxBaseFiles)
    val base = codes
      .filter(pmod(xxhash64(col("id")), lit(baseSampleMod)) === 0)
      .join(broadcast(cents), Seq("list"))
      .agg(avg(V.cosine(recon(col("codes")), col("center")))
        .as("base_mean_sim"))
    val bcC = spark.sparkContext.broadcast(
      loadCentroids(spark, snap.path("centroids")))
    val assign = udf { (v: Seq[Double]) => nearestIdx(bcC.value, v) }
    val bat = batch
      .select(assign(col("v").cast("array<double>")).as("list"), col("v"))
      .join(broadcast(cents), Seq("list"))
      .agg(avg(V.cosine(col("v").cast("array<double>"), col("center")))
        .as("batch_mean_sim"))
    base.crossJoin(bat).select(
      lit(dir).as("dir"), lit(snap.version).as("version"),
      col("base_mean_sim"), col("batch_mean_sim"),
      (col("batch_mean_sim") / col("base_mean_sim")).as("drift_ratio"),
      lit(filesRead).as("base_files_read"),
      lit(filesTotal).as("base_files_total"))
  }

  /** Semantic DECONTAMINATION against an evaluation benchmark: annotate
    * every corpus row with its maximum cosine to ANY benchmark vector
    * plus a `contaminated` flag at `tau` — the embedding-space
    * complement of n-gram decontamination (a paraphrased eval question
    * shares no 13-gram but sits next to the original in embedding
    * space). Eval benchmarks are small, so the benchmark rides a
    * broadcast and the whole operator is ONE zero-shuffle projection
    * over the corpus (spec-asserted: no Exchange in the plan) — at
    * 100 TB the corpus streams through map tasks once. For a benchmark
    * too big to broadcast, flip the roles: build a persisted
    * [[ivfBuild]] index over the benchmark and [[ivfQuery]] the corpus
    * against it. Cosine arithmetic mirrors the exact-kNN oracle's
    * sequential sums, so the annotation is hash-exact against SQL. */
  def benchmarkContamination(corpus: DataFrame, idCol: String,
                             vecCol: String, benchmark: DataFrame,
                             benchVecCol: String, tau: Double): DataFrame = {
    val spark = corpus.sparkSession
    val bench: Array[Array[Double]] = benchmark
      .select(col(benchVecCol).cast("array<double>")).collect()
      .map(_.getSeq[Double](0).toArray)
    require(bench.nonEmpty, "benchmarkContamination: empty benchmark")
    val bc = spark.sparkContext.broadcast(bench)
    val maxCos = udf { (v: Seq[Double]) =>
      val a = v.toArray
      var vn = 0.0
      var i = 0
      while (i < a.length) { vn += a(i) * a(i); i += 1 }
      var best = Double.NegativeInfinity
      var r = 0
      while (r < bc.value.length) {
        val b = bc.value(r)
        var s = 0.0
        var bn = 0.0
        var j = 0
        while (j < b.length) { s += a(j) * b(j); bn += b(j) * b(j); j += 1 }
        val c = s / math.sqrt(vn * bn)
        if (c > best) best = c
        r += 1
      }
      best
    }
    corpus
      .withColumn("max_benchmark_cosine",
        maxCos(col(vecCol).cast("array<double>")))
      .withColumn("contaminated",
        col("max_benchmark_cosine") >= tau)
  }

  /** Continuous embedding ingest into a persisted [[ivfBuild]] index:
    * each micro-batch appends WITHOUT refit via [[ivfAppend]] (assign to
    * existing centroids — a bounded broadcast per batch — and write new
    * files into the hit lists), the Structured-Streaming face of the
    * daily-growth workflow. The maintenance loop stays the batch one:
    * [[ivfIndexHealth]] on a schedule, [[ivfCompact]] when fragmentation
    * climbs, `rebuild = true` when [[ivfRecallProbe]] decays.
    *
    * Delivery is foreachBatch's at-least-once: a retried batch appends
    * its vectors twice. Probe correctness degrades gracefully (a
    * duplicate id can at worst displace one true neighbor from top-k);
    * exact-once pipelines should dedupe by id at the next compaction or
    * upstream. Single-writer: do not run concurrent with appends or
    * compactions of the same index. */
  def ivfIngest(stream: DataFrame, dir: String,
                checkpoint: String): org.apache.spark.sql.streaming
                  .StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ivfAppend(batch.sparkSession, dir, batch)
      }
      .start()

  /** [[ivfIngest]] for the compressed [[ivfPqBuild]] layout: each
    * micro-batch PQ-encodes against the existing quantizers and appends
    * via [[ivfPqAppend]]. Same at-least-once and single-writer contract;
    * quantization drift on shifted data is the batch monitor's problem
    * ([[ivfPqRecallProbe]] → [[ivfPqRebuild]]). */
  def ivfPqIngest(stream: DataFrame, dir: String,
                  checkpoint: String): org.apache.spark.sql.streaming
                    .StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty)
          ivfPqAppend(batch.sparkSession, dir, batch)
      }
      .start()

  /** The probe-budget tuner run after a build or rebuild: the smallest
    * nProbe among 1, 2, 4, … (capped at the index's nList) whose sampled
    * recall@k meets `targetRecall` — evidence-picked instead of
    * hand-tuned, the operational complement of [[ivfRecallProbe]]
    * (which monitors an ALREADY-chosen budget for drift). The exact side
    * is computed ONCE (one postings scan); each candidate budget costs
    * one partial probe over its pruned lists. Doubling granularity is
    * deliberate: at production nList (thousands) the budget/recall curve
    * is flat enough that the next power of two is the right unit of
    * spend. Returns the cap if even probing everything misses the target
    * (only possible when `queries`' neighbors tie non-deterministically —
    * probe-all itself is exact). */
  def ivfSuggestNProbe(spark: org.apache.spark.sql.SparkSession,
                       dir: String, queries: DataFrame, k: Int,
                       targetRecall: Double): Int = {
    val snap = Manifest.snapshot(spark, dir)
    val nList = spark.read.parquet(snap.path("centroids")).count().toInt
    val corpus = spark.read.parquet(snap.path("postings"))
      .select(col("id"), col("v"))
    val exact = bruteForce(queries, corpus, k).select("qid", "id")
      .collect().map(r => (r.get(0), r.get(1))).toSet
    if (exact.isEmpty) return 1
    var p = 1
    while (p < nList) {
      val got = ivfQuery(spark, dir, queries, k, p).select("qid", "id")
        .collect().map(r => (r.get(0), r.get(1))).toSet
      if (got.intersect(exact).size.toDouble / exact.size >= targetRecall)
        return p
      p = math.min(p * 2, nList)
    }
    nList
  }

  /** [[ivfSuggestNProbe]] for the compressed [[ivfPqBuild]] layout —
    * where the knob matters MORE: PQ's lossy candidate ordering sits
    * below IVF recall at equal nProbe, so a budget tuned on an IVF
    * twin overstates PQ recall. The exact side reads the original
    * vectors from `corpus` (codes cannot reconstruct them) and is
    * computed ONCE; each candidate budget runs the production
    * partial-probe + bounded-refine path at the SAME `refineK` the
    * pipeline will use — the suggestion is for the deployed
    * (nProbe, refineK) pair, not an idealized probe.
    *
    * Unlike the plain-IVF tuner, probe-all is NOT exact here — PQ's
    * lossy candidate ordering at a finite refineK can keep the true
    * neighbor out of the refine set no matter how many lists are
    * probed — so the ladder MEASURES recall at nList too and returns
    * `None` (with a warning) when the target is unreachable at this
    * refineK: no budget is implied to meet a target it provably
    * misses; the operator's knob at that point is refineK, not
    * nProbe. */
  def ivfPqSuggestNProbe(spark: org.apache.spark.sql.SparkSession,
                         dir: String, queries: DataFrame,
                         corpus: DataFrame, k: Int, refineK: Int,
                         targetRecall: Double): Option[Int] = {
    val snap = Manifest.snapshot(spark, dir)
    val nList = spark.read.parquet(snap.path("centroids")).count().toInt
    val exact = bruteForce(queries, corpus, k).select("qid", "id")
      .collect().map(r => (r.get(0), r.get(1))).toSet
    if (exact.isEmpty) return Some(1)
    var p = 1
    while (true) {
      val got = ivfPqQuery(spark, dir, queries, corpus, k, p, refineK)
        .select("qid", "id")
        .collect().map(r => (r.get(0), r.get(1))).toSet
      val recall = got.intersect(exact).size.toDouble / exact.size
      if (recall >= targetRecall) return Some(p)
      if (p >= nList) {
        org.slf4j.LoggerFactory.getLogger(Similarity.getClass).warn(
          f"ivfPqSuggestNProbe: target recall $targetRecall%.3f is " +
            f"unreachable at refineK=$refineK (probe-all measured " +
            f"$recall%.3f); raise refineK")
        return None
      }
      p = math.min(p * 2, nList)
    }
    None // unreachable
  }

  /** The maintenance DECISION the health numbers exist for: map each
    * health row (or a fleet union of them — IVF, IVF-PQ, and the
    * MinHash text index all emit one-row reports, so a mixed-family
    * fleet table is just `unionByName(allowMissingColumns = true)`) to
    * the action an operator would take:
    *
    *  - `rebuild` — sampled `recall_at_k` below the pipeline's floor,
    *    or [[ivfDriftProbe]]'s `drift_ratio` below `driftRatioFloor`
    *    (IVF family; fragmentation-only compaction cannot recover
    *    centroid drift);
    *  - `dedup_prepass` — `hot_buckets` over its ceiling (MinHash
    *    family: the probe's guard silently drops over-cap buckets, so
    *    near-dups are going unreported; the fix is collapsing the
    *    boilerplate feeding the bucket — an exact-dedup pre-pass and
    *    param rebuild, [[Dedup.minhashMaintenanceApply]] — not a file
    *    rewrite);
    *  - `compact` — small-file count (`max_files_per_list` for the
    *    list-partitioned IVF layouts, `n_fragments` for the flat
    *    MinHash banded table), row skew, or pending-retraction debt
    *    (`deleted_pending` over `tombstoneDebtCeiling` — every probe
    *    pays the tombstone anti-join until a compaction folds it)
    *    over its ceiling;
    *  - `none` otherwise.
    *
    * Pure column logic: runs over a one-row report or a million-index
    * fleet table identically. Columns a family does not emit resolve to
    * NULL (or are synthesized as NULL if absent from the frame
    * entirely), and NULL never triggers an action — an IVF row cannot
    * trip the hot-bucket rule, a MinHash row cannot trip the recall
    * rule, a health sampled without a probe never triggers a rebuild. */
  def indexMaintenancePlan(health: DataFrame, recallFloor: Double,
                           maxFilesPerListCeiling: Long,
                           rowSkewCeiling: Double =
                             Double.PositiveInfinity,
                           hotBucketsCeiling: Long = 0L,
                           maxFragmentsCeiling: Long =
                             Long.MaxValue,
                           driftRatioFloor: Double =
                             Double.NegativeInfinity,
                           hotClustersCeiling: Long =
                             Long.MaxValue,
                           tombstoneDebtCeiling: Long =
                             Long.MaxValue): DataFrame = {
    val present = health.columns.toSet
    def c(name: String) =
      if (present(name)) col(name) else lit(null).cast("double")
    health.withColumn("action",
      when(c("recall_at_k") < recallFloor, lit("rebuild"))
        // drift is the recall rule's cheap leading indicator
        // ([[ivfDriftProbe]]): a batch/base assignment-similarity ratio
        // under the floor means the quantizer has gone stale for the
        // arriving data — same remedy, a refit
        .when(c("drift_ratio") < driftRatioFloor, lit("rebuild"))
        // SemDeDup family: clusters past the probe's maxCluster guard
        // are silently skipped, so pairs go unreported — the quantizer's
        // k has fallen behind the corpus; the remedy is a re-cluster
        // with more clusters (semDedupStateSave), a rebuild
        .when(c("hot_clusters") > hotClustersCeiling, lit("rebuild"))
        .when(c("hot_buckets") > hotBucketsCeiling, lit("dedup_prepass"))
        .when(c("max_files_per_list") > maxFilesPerListCeiling ||
          c("row_skew") > rowSkewCeiling ||
          c("n_fragments") > maxFragmentsCeiling ||
          // retraction debt: every probe pays the tombstone anti-join
          // until a compaction folds it — past the ceiling, fold now
          c("deleted_pending") > tombstoneDebtCeiling, lit("compact"))
        .otherwise(lit("none")))
  }

  /** Execute an [[indexMaintenancePlan]] action on a persisted index —
    * the apply half of the health → plan → apply loop. The layout is
    * sniffed from the manifest snapshot (a codes table means IVF-PQ):
    * `compact` defragments ([[ivfCompact]] / [[ivfPqCompact]]),
    * `rebuild` refits ([[ivfCompact]]`(rebuild = true)` for IVF;
    * [[ivfPqRebuild]] for PQ, which REQUIRES the embedding store —
    * codes cannot reconstruct vectors, so a PQ rebuild without `corpus`
    * throws rather than silently downgrading to a compaction), `none`
    * is a no-op. Single-writer contract as for every compaction. */
  def indexMaintenanceApply(spark: org.apache.spark.sql.SparkSession,
                            dir: String, action: String,
                            corpus: Option[DataFrame] = None,
                            maxRecordsPerFile: Long = 0L, seed: Long = 7L,
                            kmeansMaxIter: Int = 20): Unit = {
    val snap = Manifest.snapshot(spark, dir)
    val codesP = new org.apache.hadoop.fs.Path(snap.path("codes"))
    val isPq = codesP.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(codesP)
    action match {
      case "none" => ()
      case "compact" =>
        if (isPq) ivfPqCompact(spark, dir, maxRecordsPerFile)
        else ivfCompact(spark, dir, rebuild = false, seed, kmeansMaxIter,
          maxRecordsPerFile)
      case "rebuild" =>
        if (isPq) {
          val c = corpus.getOrElse(throw new IllegalArgumentException(
            "indexMaintenanceApply: a PQ rebuild needs the embedding " +
              "store (corpus) — codes cannot reconstruct vectors"))
          ivfPqRebuild(spark, dir, c, 1.0, seed, kmeansMaxIter)
        } else ivfCompact(spark, dir, rebuild = true, seed, kmeansMaxIter)
      case other => throw new IllegalArgumentException(
        s"indexMaintenanceApply: unknown action '$other'")
    }
  }

  /** Execute EVERY action of a fleet plan ([[indexMaintenancePlan]]'s
    * output over any mix of families) in one call — the last step of
    * the fleet loop: health union → plan → THIS. Each row's family is
    * sniffed from its manifest snapshot's on-disk tables (postings →
    * IVF, codes → IVF-PQ, bands → MinHash, sigs → SimHash, labels →
    * SemDeDup state, shingles → decontam) and the action dispatches to
    * that family's apply operator. Actions that need an input only the
    * operator can supply take it from `corpora` keyed by index dir —
    * text tables (canonical `id`/`text` columns) for the text-family
    * `dedup_prepass`, the embedding store (`id`/`v`) for a PQ rebuild.
    *
    * Per-row failure isolation: a row whose action cannot run unattended
    * (a PQ rebuild with no embedding store, a SemDeDup `rebuild` with
    * no k policy, a text-family `dedup_prepass` with no corpus) is
    * REPORTED, not thrown: fleet maintenance over a thousand indexes
    * must not abort on the one row that needs an operator. With
    * `runbookDir`, the persisted [[FleetRunbook]] answers for every
    * dir `corpora` omits — vectors/text from its side-input path, a
    * SemDeDup k from its `target_cluster_size` policy — so the
    * unattended loop executes those rows instead of skipping them
    * (q263). Returns the report: one row per plan row,
    * (dir, family, action, status, detail) with status `executed` /
    * `skipped` / `failed`. Driver-side loop over a bounded plan (the
    * fleet table is one row per index by construction); each executed
    * action is itself a distributed job under that index's writer
    * lock — which is why `parallelism > 1` is safe and what a
    * thousand-index fleet wants: the units touch disjoint lock
    * domains, so N compactions overlap their scheduling floors. Rows
    * naming the SAME dir run sequentially inside one unit (they share
    * a lock domain — racing them would fabricate `failed` rows), and
    * report order is preserved either way; `timeout` bounds the
    * parallel wait per [[fleetMap]] (overruns report `failed`, never
    * discard the fleet's report). */
  /** Sniff which index family lives at a manifest snapshot from its
    * on-disk tables — the shared dispatch key of every fleet verb
    * ([[fleetHealth]], [[fleetMaintenanceApply]], [[fleetDelete]],
    * [[fleetEraseAudit]]). Returns (family, key table). */
  private def sniffFamily(spark: org.apache.spark.sql.SparkSession,
                          snap: Manifest.Snapshot): (String, String) = {
    def has(table: String): Boolean = {
      val p = new org.apache.hadoop.fs.Path(snap.path(table))
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    }
    if (has("codes")) ("ivf_pq", "codes")
    else if (has("postings")) ("ivf", "postings")
    else if (has("bands")) ("minhash", "bands")
    else if (has("sigs")) ("simhash", "sigs")
    else if (has("labels")) ("semdedup", "labels")
    else if (has("shingles")) ("decontam", "shingles")
    else if (has("hashes")) ("exact", "hashes")
    else if (has("funnel")) ("funnel", "funnel")
    else ("unknown", "")
  }

  /** The FLEET-WIDE health sweep — the missing first step of the
    * health → [[indexMaintenancePlan]] → [[fleetMaintenanceApply]]
    * loop, which until now every caller assembled by hand (sniff each
    * family, call its health, union with missing columns): one call
    * returns one tagged row per index dir, whatever mix of families
    * the fleet holds. The vector families contribute their
    * [[ivfIndexHealthLight]] rows (layout/debt/log readings — the
    * cheap daily sweep; the recall-probing [[ivfIndexHealth]] stays a
    * per-index opt-in because it costs a brute-force pass), text/label
    * families their full health rows, the admission-funnel history its
    * fragment row, and an unrecognized dir an all-NULL row tagged
    * `unknown` (the planner's null-safe rules yield `none` — a typo'd
    * dir must not crash the fleet sweep). All flat-family rows are
    * LAZY one-plan aggregates, so planning a thousand-index fleet is
    * one collected action plus the vector families' bounded layout
    * collects. With `runbookDir` the persisted [[FleetRunbook]]
    * answers for deep-probe inputs the caller's maps omit (query
    * sample = first `probeSampleN` store rows by id; PQ exact side =
    * the store), so the scheduled sweep needs zero per-dir maps
    * (q265). */
  def fleetHealth(spark: org.apache.spark.sql.SparkSession,
                  dirs: Seq[String],
                  hotBucketCap: Int = 10000,
                  hotClusterCap: Long = 100000L,
                  deepProbes: Int = 0,
                  probeQueries: Map[String, DataFrame] = Map.empty,
                  probeCorpora: Map[String, DataFrame] = Map.empty,
                  probeK: Int = 10, probeNProbe: Int = 1,
                  probeRefineK: Int = 50,
                  probeLogDir: Option[String] = None,
                  runbookDir: Option[String] = None,
                  probeSampleN: Int = 16): DataFrame = {
    require(dirs.nonEmpty,
      "fleetHealth: dirs is empty — a health sweep needs at least one " +
        "index dir")
    // BUDGETED deep recall sweeps: `fleetHealth` always takes the
    // recall-free light reading for the vector families (the probe
    // costs a brute-force pass), which means the one-call loop can
    // never detect recall decay on its own. `deepProbes = n` spends n
    // full [[ivfIndexHealth]]/[[ivfPqIndexHealth]] readings per sweep,
    // ROUND-ROBIN BY STALENESS over the vector dirs that have probe
    // inputs (queries; plus the embedding store for PQ — its exact
    // side cannot come from codes): the persisted probe log at
    // `probeLogDir` records which sweep last deep-probed each dir, so
    // every index is eventually probed without paying brute force on
    // the whole fleet daily. Without a log dir the budget still
    // spends, deterministically by dir order — fine for a one-shot
    // sweep, but a schedule wants the log.
    //
    // Side-input resolution mirrors [[fleetMaintenanceApply]]: the
    // caller's probeQueries/probeCorpora maps win, and the persisted
    // [[FleetRunbook]] answers for every vector dir they omit — the
    // probe SAMPLE is the first `probeSampleN` rows of the dir's
    // side-input store by id (deterministic, and self-probing with
    // corpus vectors is exactly what a recall reading wants), the PQ
    // exact side is the store itself. With both the runbook and the
    // probe log supplied, the scheduled sweep needs ZERO per-dir maps.
    val runbook: Map[String, FleetRunbook.Entry] =
      runbookDir.map(FleetRunbook.entries(spark, _)).getOrElse(Map.empty)
    def sampledQueries(dir: String): Option[DataFrame] =
      probeQueries.get(dir).orElse(runbook.get(dir).map { e =>
        spark.read.parquet(e.path).orderBy(col(e.idCol))
          .limit(probeSampleN)
          .select(col(e.idCol).as("qid"),
            col(e.payloadCol).cast("array<float>").as("qv"))
      })
    def probeCorpus(dir: String): Option[DataFrame] =
      probeCorpora.get(dir).orElse(runbook.get(dir).map(e =>
        FleetRunbook.loadSideInput(spark, e, "id", "v")
          .withColumn("v", col("v").cast("array<float>"))))
    val candidates = dirs.filter { dir =>
      val (family, _) = sniffFamily(spark, Manifest.snapshot(spark, dir))
      family match {
        case "ivf" => sampledQueries(dir).isDefined
        case "ivf_pq" =>
          sampledQueries(dir).isDefined && probeCorpus(dir).isDefined
        case _ => false
      }
    }
    val lastProbed: Map[String, Long] = probeLogDir match {
      case Some(ld) => ProbeLog.lastSweep(spark, ld)
      case None => Map.empty
    }
    val pos = candidates.zipWithIndex.toMap
    val chosen: Set[String] =
      if (deepProbes <= 0) Set.empty
      else candidates
        .sortBy(d => (lastProbed.getOrElse(d, -1L), pos(d)))
        .take(deepProbes).toSet
    val frames = dirs.map { dir =>
      val snap = Manifest.snapshot(spark, dir)
      val (family, _) = sniffFamily(spark, snap)
      val h = family match {
        case "ivf" if chosen(dir) =>
          ivfIndexHealth(spark, dir, sampledQueries(dir).get, probeK,
            probeNProbe)
        case "ivf_pq" if chosen(dir) =>
          ivfPqIndexHealth(spark, dir, sampledQueries(dir).get,
            probeCorpus(dir).get, probeK, probeNProbe, probeRefineK)
        case "ivf" | "ivf_pq" => ivfIndexHealthLight(spark, dir)
        case "minhash" => Dedup.minhashIndexHealth(spark, dir,
          hotBucketCap)
        case "simhash" => Dedup.simhashIndexHealth(spark, dir,
          hotBucketCap)
        case "semdedup" => Clustering.semDedupStateHealth(spark, dir,
          hotClusterCap)
        case "decontam" => Decontamination.decontamIndexHealth(spark,
          dir)
        case "exact" => Dedup.exactIndexHealth(spark, dir)
        case "funnel" => CorpusPipeline.admissionFunnelHealth(spark,
          dir)
        case _ => spark.range(1).select(lit(dir).as("dir"),
          lit(snap.version).as("version"))
      }
      h.withColumn("family", lit(family))
    }
    if (chosen.nonEmpty) probeLogDir.foreach(ld =>
      ProbeLog.record(spark, ld, chosen.toSeq.sorted,
        lastProbed.values.foldLeft(0L)(math.max) + 1))
    frames.reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** Persisted record of which sweep last DEEP-probed each vector
    * index — [[fleetHealth]]'s staleness cursor: (dir, sweep) rows
    * under their own [[Manifest]] dir (fleet-ops metadata like the
    * [[FleetRunbook]] — one append per sweep, broadcast-class
    * forever). */
  private[operators] object ProbeLog {
    def lastSweep(spark: org.apache.spark.sql.SparkSession,
                  logDir: String): Map[String, Long] = {
      val p = Manifest.snapshot(spark, logDir).path("probe_log")
      val hp = new org.apache.hadoop.fs.Path(p)
      if (hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(hp))
        spark.read.parquet(p).groupBy("dir")
          .agg(max(col("sweep")).as("sweep"))
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      else Map.empty
    }

    def record(spark: org.apache.spark.sql.SparkSession, logDir: String,
               probed: Seq[String], sweep: Long): Unit =
      Manifest.withLock(spark, logDir) {
        import spark.implicits._
        val snap = Manifest.snapshot(spark, logDir)
        probed.map(d => (d, sweep)).toDF("dir", "sweep")
          .coalesce(1).write.mode("append").parquet(snap.path("probe_log"))
      }
  }

  /** The persisted deep-probe history ([[fleetHealth]]'s staleness
    * cursor) as (dir, sweep) rows — the ops surface for "when was
    * this index last recall-probed" (empty frame when no sweep has
    * spent a probe yet). */
  def probeLogHistory(spark: org.apache.spark.sql.SparkSession,
                      logDir: String): DataFrame = {
    import spark.implicits._
    val p = Manifest.snapshot(spark, logDir).path("probe_log")
    val hp = new org.apache.hadoop.fs.Path(p)
    if (hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(hp)) spark.read.parquet(p)
    else Seq.empty[(String, Long)].toDF("dir", "sweep")
  }

  /** Map a fleet's per-index units onto `parallelism` driver threads,
    * preserving input order in the output. Each unit drives ONE index
    * dir under that index's own writer lock, so units never contend on
    * state — exactly the property that makes fleet maintenance over a
    * thousand indexes embarrassingly parallel. parallelism = 1 (the
    * default everywhere) is plain sequential execution (no timeout —
    * every unit runs to completion on the caller's thread).
    *
    * `timeout` bounds the PARALLEL wait without discarding per-row
    * isolation: units still unfinished when it expires are reported
    * through `onTimeout` (the caller turns them into `failed` rows)
    * while every completed unit keeps its real result — a fleet whose
    * one legitimately-long compaction overruns no longer throws away
    * the whole report. A timed-out unit's thread keeps running in the
    * background until it finishes (pool.shutdown() does not interrupt
    * it); its index stays writer-locked until then, which the report
    * row says. Default Duration.Inf: an unattended fleet loop waits. */
  private def fleetMap[A, B](units: Seq[A], parallelism: Int,
                             timeout: scala.concurrent.duration.Duration =
                               scala.concurrent.duration.Duration.Inf)
                            (f: A => B)(onTimeout: A => B): Seq[B] =
    if (parallelism <= 1 || units.size <= 1) units.map(f)
    else {
      import scala.concurrent.{Await, ExecutionContext, Future}
      val pool = java.util.concurrent.Executors
        .newFixedThreadPool(math.min(parallelism, units.size))
      implicit val ec: ExecutionContext =
        ExecutionContext.fromExecutorService(pool)
      val futs = units.map(u => Future(f(u)))
      try {
        try Await.ready(Future.sequence(futs), timeout)
        catch { case _: java.util.concurrent.TimeoutException => () }
        units.zip(futs).map { case (u, fu) =>
          fu.value match {
            case Some(scala.util.Success(b)) => b
            case Some(scala.util.Failure(e)) => throw e
            case None => onTimeout(u)
          }
        }
      } finally pool.shutdown()
    }

  def fleetMaintenanceApply(spark: org.apache.spark.sql.SparkSession,
                            plan: DataFrame,
                            corpora: Map[String, DataFrame] = Map.empty,
                            parallelism: Int = 1,
                            runbookDir: Option[String] = None,
                            timeout: scala.concurrent.duration.Duration =
                              scala.concurrent.duration.Duration.Inf)
    : DataFrame = {
    import spark.implicits._
    val rows = plan.select(col("dir").cast("string"),
      col("action").cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    // side-input resolution order: the caller's corpora map wins, the
    // persisted runbook answers for every dir it omits — ONE bounded
    // collect for the whole fleet, so the unattended loop needs no
    // hand-held inputs at all
    val runbook: Map[String, FleetRunbook.Entry] =
      runbookDir.map(FleetRunbook.entries(spark, _)).getOrElse(Map.empty)
    def sideInput(dir: String, idName: String,
                  payloadName: String): Option[DataFrame] =
      corpora.get(dir).orElse(runbook.get(dir).map(e =>
        FleetRunbook.loadSideInput(spark, e, idName, payloadName)))
    def applyOne(dir: String, action: String)
      : (String, String, String, String, String) = {
      val snap = Manifest.snapshot(spark, dir)
      val (family, _) = sniffFamily(spark, snap)
      def run(f: => Unit): (String, String) =
        try { f; ("executed", "") }
        catch { case e: Exception =>
          ("failed", Option(e.getMessage).getOrElse(e.getClass.getName)
            .take(200))
        }
      val (status, detail) = (family, action) match {
        case (_, "none") => ("skipped", "no action planned")
        case ("unknown", _) =>
          ("skipped", "no recognizable index tables at dir")
        case ("ivf" | "ivf_pq", a) =>
          val corpus = sideInput(dir, "id", "v")
          if (family == "ivf_pq" && a == "rebuild" && corpus.isEmpty)
            ("skipped", "PQ rebuild needs the embedding store in " +
              "corpora or the runbook")
          else run(indexMaintenanceApply(spark, dir, a, corpus))
        case ("minhash", a) =>
          val corpus = sideInput(dir, "id", "text")
          if (a == "dedup_prepass" && corpus.isEmpty)
            ("skipped", "dedup_prepass needs the corpus text in " +
              "corpora or the runbook")
          else run(Dedup.minhashMaintenanceApply(spark, dir, a, corpus))
        case ("simhash", a) =>
          val corpus = sideInput(dir, "id", "text")
          if (a == "dedup_prepass" && corpus.isEmpty)
            ("skipped", "dedup_prepass needs the corpus text in " +
              "corpora or the runbook")
          else run(Dedup.simhashMaintenanceApply(spark, dir, a, corpus))
        case ("semdedup", "compact") =>
          run(Clustering.semDedupStateCompact(spark, dir))
        case ("exact", "compact") =>
          run(Dedup.exactIndexCompact(spark, dir))
        case ("semdedup", "rebuild") =>
          // a re-cluster needs vectors AND a k — the runbook supplies
          // both (side input + target_cluster_size → k = ⌈n/target⌉);
          // without a runbook row the modeling decision stays with the
          // operator, exactly as before
          runbook.get(dir).flatMap(e =>
            e.targetClusterSize.map(t => (e, t))) match {
            case Some((e, target)) => run {
              val vecs = FleetRunbook.loadSideInput(spark, e, "id", "vec")
              val n = vecs.count()
              val k = math.max(1L, (n + target - 1) / target).toInt
              Clustering.semDedupStateRebuild(spark, dir, vecs,
                "id", "vec", k)
            }
            case None =>
              ("skipped", "SemDeDup rebuild is a re-cluster with a " +
                "chosen k — run semDedupStateSave, or give the runbook " +
                "a side input + target_cluster_size")
          }
        case ("decontam", "rebuild") =>
          // the retraction repair [[fleetDelete]] documents: the side
          // input supplies the REMAINING benchmark suites (text column
          // convention: "text"), the pinned shingle width comes from
          // the index metadata
          sideInput(dir, "id", "text") match {
            case Some(remaining) =>
              run(Decontamination.decontamIndexRebuild(spark, dir,
                remaining, "text"))
            case None =>
              ("skipped", "decontam rebuild needs the remaining " +
                "benchmark suites in corpora or the runbook")
          }
        case ("funnel", "compact") =>
          run(CorpusPipeline.admissionFunnelCompact(spark, dir))
        case (f, a) => ("skipped", s"no $a operator for family $f")
      }
      (dir, family, action, status, detail)
    }
    // group SAME-dir plan rows into one sequential unit: two actions
    // for one index must never race that index's exclusive writer lock
    // across threads (parallelism would turn the loser into a spurious
    // `failed` where sequential execution succeeds). Units stay
    // disjoint lock domains; report order is restored by index.
    val indexed = rows.zipWithIndex
    val dirOrder = rows.map(_._1).distinct
    val byDir = indexed.groupBy(_._1._1)
    val units = dirOrder.map(byDir)
    val report = fleetMap(units, parallelism, timeout) { unit =>
      unit.map { case ((dir, action), i) => (i, applyOne(dir, action)) }
    } { unit =>
      unit.map { case ((dir, action), i) =>
        (i, (dir, "unknown", action, "failed",
          s"timed out after $timeout — the unit may still be running " +
            "in the background; its index stays writer-locked until " +
            "it finishes"))
      }
    }
    report.flatten.sortBy(_._1).map(_._2)
      .toDF("dir", "family", "action", "status", "detail")
  }

  /** Erase documents across the WHOLE persisted-index fleet in one
    * call — the compliance verb over the per-family deletes
    * ([[ivfDelete]], [[Dedup.exactIndexDelete]] and siblings): given
    * the retracted docs (ids; text too if an exact-hash index is in
    * the fleet — that family is content-keyed), each index dir's
    * family is sniffed from its manifest tables and the matching
    * delete dispatches, with [[fleetMaintenanceApply]]'s per-row
    * failure isolation (a family missing its required side input
    * reports `skipped`, never aborts the fleet). Pairs with
    * [[SnapshotDiff.diff]]: a corpus refresh's `removed` rows ARE
    * this function's input (q258/q259). Probes go silent immediately;
    * each family's next compaction folds the debt ([[Manifest]]
    * Tombstones contract). Returns one (dir, family, status, detail)
    * row per index.
    *
    * Two optional side inputs close this verb's documented sharp
    * edges:
    *   - `survivors` (the post-refresh corpus, id + `textCol`) makes
    *     the CONTENT-keyed exact family sharer-safe: a doomed hash
    *     whose exact text another LIVE doc still carries is NOT
    *     tombstoned (erasing one copy must not silence duplicate
    *     detection for the survivors — the hole a takedown would
    *     otherwise open until a manual re-append). Without it every
    *     doomed hash is tombstoned (the raw key-level contract).
    *   - `decontamRemaining` (the benchmark corpus minus the
    *     retirees) makes the shingle-keyed decontam family
    *     EXECUTABLE instead of `skipped`:
    *     [[Decontamination.decontamIndexRebuild]] swaps in the
    *     remaining suites' shingle set behind one manifest flip.
    * Audit the result with [[fleetEraseAudit]] after each family's
    * compaction folds its debt. `parallelism > 1` runs the per-index
    * deletes on that many driver threads (disjoint writer-lock
    * domains — see [[fleetMaintenanceApply]]), report order
    * preserved. */
  def fleetDelete(spark: org.apache.spark.sql.SparkSession,
                  dirs: Seq[String], docs: DataFrame,
                  idCol: String = "id",
                  textCol: Option[String] = None,
                  survivors: Option[DataFrame] = None,
                  decontamRemaining: Option[DataFrame] = None,
                  parallelism: Int = 1,
                  runbookDir: Option[String] = None,
                  timeout: scala.concurrent.duration.Duration =
                    scala.concurrent.duration.Duration.Inf)
    : DataFrame = {
    import spark.implicits._
    // the runbook answers for the decontam family's remaining-suites
    // side input when the caller omits `decontamRemaining` — the same
    // resolution order as [[fleetMaintenanceApply]]
    val runbook: Map[String, FleetRunbook.Entry] =
      runbookDir.map(FleetRunbook.entries(spark, _)).getOrElse(Map.empty)
    def deleteOne(dir: String): (String, String, String, String) = {
      val snap = Manifest.snapshot(spark, dir)
      val (family, _) = sniffFamily(spark, snap)
      def run(f: => Unit): (String, String) =
        try { f; ("executed", "") }
        catch { case e: Exception =>
          ("failed", Option(e.getMessage).getOrElse(e.getClass.getName)
            .take(200))
        }
      val (status, detail) = family match {
        case "ivf" | "ivf_pq" =>
          run(ivfDelete(spark, dir, docs.select(col(idCol)), idCol))
        case "minhash" =>
          run(Dedup.minhashIndexDelete(spark, dir,
            docs.select(col(idCol)), idCol))
        case "simhash" =>
          run(Dedup.simhashIndexDelete(spark, dir,
            docs.select(col(idCol)), idCol))
        case "semdedup" =>
          run(Clustering.semDedupStateDelete(spark, dir,
            docs.select(col(idCol)), idCol))
        case "exact" => textCol match {
          case Some(t) =>
            survivors match {
              case Some(surv) =>
                // sharer-safe: only retract docs whose exact text NO
                // live doc still carries — one broadcast-class
                // anti-join on the content hash (the doomed side is
                // the retraction batch, tiny by definition). A doomed
                // doc sharing its text with a survivor is NOT
                // tombstoned: the hash must keep flagging duplicates
                // of the still-live copy.
                run {
                  val h = org.apache.spark.sql.functions.md5(col(t))
                  val unshared = docs.withColumn("_h", h)
                    .join(surv.select(h.as("_h")).distinct(),
                      Seq("_h"), "left_anti")
                    .drop("_h")
                  // an all-shared batch tombstones nothing — do not
                  // create an empty tombstone table (probes would pay
                  // its anti-join for nothing until a compaction)
                  if (!unshared.isEmpty)
                    Dedup.exactIndexDelete(spark, dir, unshared,
                      idCol, t)
                }
              case None =>
                run(Dedup.exactIndexDelete(spark, dir, docs, idCol, t))
            }
          case None =>
            ("skipped", "exact-hash index is content-keyed — supply " +
              "textCol so the retracted hashes can be computed")
        }
        case "decontam" => decontamRemaining.orElse(
          runbook.get(dir).map(e =>
            FleetRunbook.loadSideInput(spark, e, "id", "text"))) match {
          case Some(remaining) =>
            run(Decontamination.decontamIndexRebuild(spark, dir,
              remaining, if (decontamRemaining.isDefined)
                textCol.getOrElse("text") else "text"))
          case None =>
            ("skipped", "decontam index is shingle-keyed — supply " +
              "decontamRemaining (the suites minus the retirees) or a " +
              "runbook row so the rebuild retraction can run")
        }
        case "funnel" =>
          ("skipped", "funnel history is per-(day, source) ops " +
            "metadata, not doc-keyed — nothing to retract")
        case _ =>
          ("skipped", "no recognizable index tables at dir")
      }
      (dir, family, status, detail)
    }
    // same-dir entries execute sequentially within one unit (duplicate
    // dirs must not race one writer lock across threads); report order
    // restored by input index
    val indexed = dirs.zipWithIndex
    val dirOrder = dirs.distinct
    val byDir = indexed.groupBy(_._1)
    val units = dirOrder.map(byDir)
    val report = fleetMap(units, parallelism, timeout) { unit =>
      unit.map { case (dir, i) => (i, deleteOne(dir)) }
    } { unit =>
      unit.map { case (dir, i) =>
        (i, (dir, "unknown", "failed",
          s"timed out after $timeout — the unit may still be running " +
            "in the background; its index stays writer-locked until " +
            "it finishes"))
      }
    }
    report.flatten.sortBy(_._1).map(_._2)
      .toDF("dir", "family", "status", "detail")
  }

  /** Fleet-wide point-in-time CLONE — [[IndexClone.cloneIndex]] over a
    * whole mixed-family fleet in one call: each dir clones at its own
    * consistent latest snapshot into `dstRoot/<basename>`, with the
    * same per-row failure isolation as every fleet verb (one index
    * whose copy fails — say its pin outlived the source's grace window
    * under a racing double-publish — reports `failed` and never aborts
    * the sweep). The backup/restore and blue-green verb: point probes
    * at the clone root, rebuild or experiment there, flip back — the
    * source's writer locks are never taken (clones are readers), the
    * clones' own locks make the copies embarrassingly parallel.
    * Returns (src, dst, family, status, detail, tables, files, bytes,
    * src_version) — the dated evidence row a backup schedule files. */
  def fleetClone(spark: org.apache.spark.sql.SparkSession,
                 dirs: Seq[String], dstRoot: String,
                 parallelism: Int = 1,
                 copyParallelism: Int = 64,
                 timeout: scala.concurrent.duration.Duration =
                   scala.concurrent.duration.Duration.Inf): DataFrame = {
    import spark.implicits._
    require(dirs.nonEmpty,
      "fleetClone: dirs is empty — a backup sweep needs at least one " +
        "index dir")
    def base(d: String) = new org.apache.hadoop.fs.Path(d).getName
    require(dirs.map(base).distinct.size == dirs.distinct.size,
      s"fleetClone: duplicate index basenames would collide under " +
        s"$dstRoot — pass distinct-named dirs")
    def cloneOne(dir: String)
      : (String, String, String, String, String, Long, Long, Long, Long) = {
      val dst = s"$dstRoot/${base(dir)}"
      val (family, _) = sniffFamily(spark, Manifest.snapshot(spark, dir))
      try {
        val rows = IndexClone.cloneIndex(spark, dir, dst,
          parallelism = copyParallelism)
          .select("files", "bytes", "src_version").collect()
        (dir, dst, family, "executed", "", rows.length.toLong,
          rows.map(_.getLong(0)).sum, rows.map(_.getLong(1)).sum,
          rows.headOption.map(_.getLong(2)).getOrElse(-1L))
      } catch { case e: Exception =>
        (dir, dst, family, "failed",
          Option(e.getMessage).getOrElse(e.getClass.getName).take(200),
          0L, 0L, 0L, -1L)
      }
    }
    fleetMap(dirs.distinct, parallelism, timeout)(cloneOne) { dir =>
      (dir, s"$dstRoot/${base(dir)}", "unknown", "failed",
        s"timed out after $timeout — the copy may still be running in " +
          "the background; its clone target stays writer-locked until " +
          "it finishes", 0L, 0L, 0L, -1L)
    }.toDF("src", "dst", "family", "status", "detail", "tables",
      "files", "bytes", "src_version")
  }

  /** Fleet-wide ERASURE-COMPLETION audit — the evidence artifact a
    * GDPR/takedown process actually files, composed from pieces that
    * already exist (manifest snapshots, tombstone pending counts,
    * per-family key columns): for each index dir, count the retracted
    * keys' rows PHYSICALLY PRESENT in the live files of the current
    * manifest snapshot (no tombstone filtering — this reads what is
    * on disk, which is the question a regulator asks) plus the
    * pending-tombstone debt, and pin `complete` = zero live key rows
    * AND zero pending debt. Run it after [[fleetDelete]] + each
    * family's compaction: a `complete=false` row names exactly which
    * family still carries the key (delete never ran, compaction
    * hasn't folded, or — content-keyed exact family — the hash was
    * sharer-protected and legitimately lives on).
    *
    * Key shape per family: content hash for exact (needs `textCol`),
    * the doc id for minhash/simhash/ivf/ivf_pq/semdedup, the doomed
    * docs' distinct shingles at the pinned width for decontam — where
    * a nonzero count can be LEGITIMATE residue (a remaining suite
    * shares those shingles). With `decontamRemaining` (the same
    * remaining-suites input the rebuild retraction takes) the audit
    * COMPUTES that residue — `expected_residue` = |doomed shingles ∩
    * remaining-suite shingles| — and pins the decontam `complete` to
    * `keys_live == expected_residue && deleted_pending == 0`, making
    * the verdict decidable for all eight families instead of punting
    * the judgment to the caller; without it the decontam row keeps
    * the raw zero-residue rule. Every other family's
    * `expected_residue` is 0 (-1 where unauditable). Cost: ONE
    * collected action for the whole fleet (each index contributes a
    * lazy broadcast-class semi-join aggregate to one union; the
    * retraction batch is tiny by definition); the scan is the audit —
    * reading every live file is the point. Returns one LAZY
    * (dir, family, table, keys_live, expected_residue,
    * deleted_pending, version, complete) row per index. */
  def fleetEraseAudit(spark: org.apache.spark.sql.SparkSession,
                      dirs: Seq[String], docs: DataFrame,
                      idCol: String = "id",
                      textCol: Option[String] = None,
                      decontamRemaining: Option[DataFrame] = None)
    : DataFrame = {
    require(dirs.nonEmpty,
      "fleetEraseAudit: dirs is empty — an erasure audit needs at " +
        "least one index dir")
    val frames = dirs.map { dir =>
      val snap = Manifest.snapshot(spark, dir)
      val (family, table) = sniffFamily(spark, snap)
      // every per-index reading rides ONE aggregate over a tagged
      // union of its (up to three) source tables; the whole fleet
      // report unions into ONE collected action — auditing a thousand
      // indexes must not run a thousand driver-side count jobs, and an
      // index must not pay the former keysLive × expected × pending
      // crossJoin chain's two broadcast-exchange jobs per reading
      // either (-1 = unauditable: unrecognized layout, the doc-keyless
      // funnel history, or a content/shingle-keyed family with no text
      // supplied). Tags: 1 = live key rows, 2 = expected residue,
      // 3 = pending tombstone rows (distinct via the [[OpsStats]]
      // to_json serialization).
      def tag(df: DataFrame, t: Int): DataFrame =
        df.select(lit(t).as("_t"), lit(null).cast("string").as("_v"))
      def semiRows(keys: DataFrame, on: String): DataFrame =
        tag(spark.read.parquet(snap.path(table))
          .join(keys, Seq(on), "left_semi"), 1)
      // Left(literal) or Right(tagged rows to count)
      val keysLive: Either[Long, DataFrame] = family match {
        case "unknown" | "funnel" => Left(-1L)
        case "exact" => textCol match {
          case Some(t) =>
            Right(semiRows(docs.select(md5(col(t)).as("h")).distinct(),
              "h"))
          case None => Left(-1L)
        }
        case "decontam" => textCol match {
          case Some(t) =>
            val n = Decontamination.decontamIndexN(spark, dir)
            Right(semiRows(docs.select(
              explode(graft.functions.TextFunctions
                .distinctShingles(col(t), n)).as("g")).distinct(), "g"))
          case None => Left(-1L)
        }
        case _ =>
          val idType = spark.read.parquet(snap.path(table))
            .schema("id").dataType
          Right(semiRows(docs.select(col(idCol).cast(idType).as("id"))
            .distinct(), "id"))
      }
      val expected: Either[Long, DataFrame] = family match {
        case "unknown" | "funnel" => Left(-1L)
        case "decontam" => (textCol, decontamRemaining) match {
          case (Some(t), Some(remaining)) =>
            // the legitimate residue: doomed shingles a REMAINING
            // suite also carries survive the rebuild BY DESIGN —
            // a lazy intersection count of two tiny shingle sets
            val n = Decontamination.decontamIndexN(spark, dir)
            def shingles(df: DataFrame): DataFrame = df.select(
              explode(graft.functions.TextFunctions
                .distinctShingles(col(t), n)).as("g")).distinct()
            Right(tag(shingles(docs)
              .join(shingles(remaining), Seq("g"), "left_semi"), 2))
          case (None, _) => Left(-1L)
          case _ => Left(0L)
        }
        case _ => Left(0L)
      }
      val pending: Either[Long, DataFrame] =
        if (family == "unknown" || family == "funnel") Left(-1L)
        else Tombstones.readIfAny(spark, snap) match {
          case Some(tdf) => Right(tdf.select(lit(3).as("_t"),
            to_json(struct(tdf.columns.map(col): _*)).as("_v")))
          case None => Left(0L)
        }
      val parts = Seq(keysLive, expected, pending)
        .collect { case Right(df) => df }
      val agged: DataFrame =
        if (parts.isEmpty) spark.range(1).toDF("_one")
        else parts.reduce(_ unionByName _).agg(
          count(when(col("_t") === 1, 1)).as("_c1"),
          count(when(col("_t") === 2, 1)).as("_c2"),
          count_distinct(when(col("_t") === 3, col("_v"))).as("_c3"))
      def reading(e: Either[Long, DataFrame],
                  c: String): org.apache.spark.sql.Column =
        e.fold(lit(_), _ => col(c))
      val keysCol = reading(keysLive, "_c1")
      val expCol = reading(expected, "_c2")
      val pendCol = reading(pending, "_c3")
      agged.select(lit(dir).as("dir"), lit(family).as("family"),
        lit(table).as("table"), keysCol.as("keys_live"),
        expCol.as("expected_residue"), pendCol.as("deleted_pending"),
        lit(snap.version).as("version"),
        (keysCol === greatest(expCol, lit(0L)) && pendCol === 0L)
          .as("complete"))
    }
    frames.reduce(_ unionByName _)
  }

  /** Operational health report of a persisted [[ivfBuild]] index — the
    * dashboard row a daily-append pipeline watches: physical layout
    * (lists, rows, files, skew) plus a sampled recall@k reading of the
    * production probe. One output row per index, so reports from many
    * indexes union into one fleet table:
    *   (dir, version, n_lists, total_rows, total_files,
    *    max_files_per_list, max_rows_per_list, mean_rows_per_list,
    *    row_skew, recall_at_k, k, n_probe, suggested_n_probe)
    * `max_files_per_list` rising → [[ivfCompact]] is due (small-file
    * scan cliff); `row_skew` (max/mean rows per list) rising → the
    * centroids no longer balance the data; `recall_at_k` falling below
    * the pipeline's floor → `ivfCompact(rebuild = true)` — and
    * [[indexMaintenancePlan]] turns exactly those thresholds into an
    * action column. With `suggestTargetRecall` set the report also runs
    * [[ivfSuggestNProbe]] and carries the budget in
    * `suggested_n_probe` (NULL when not requested — the tuner costs a
    * geometric ladder of probes, so it's opt-in per schedule). Cost:
    * one postings scan for the row counts, one FS listing, one
    * [[ivfRecallProbe]] over the bounded query sample. */
  def ivfIndexHealth(spark: org.apache.spark.sql.SparkSession,
                     dir: String, queries: DataFrame, k: Int,
                     nProbe: Int,
                     suggestTargetRecall: Option[Double] = None): DataFrame =
    indexHealth(spark, dir, "postings",
      Manifest.snapshot(spark, dir), Some(k), Some(nProbe),
      Some(ivfRecallProbe(spark, dir, queries, k, nProbe)),
      suggestTargetRecall.map(t =>
        ivfSuggestNProbe(spark, dir, queries, k, t)))

  /** [[ivfIndexHealth]]/[[ivfPqIndexHealth]] WITHOUT the recall probe —
    * layout, fragment, skew, tombstone-debt, and ingest-log readings
    * only, with `recall_at_k`/`k`/`n_probe` NULL ("not measured", which
    * [[indexMaintenancePlan]]'s null-safe recall rule simply skips).
    * The recall probe costs a brute-force pass over the sampled
    * queries; a schedule that gates on retraction debt or fragment
    * count alone (the q254-class tombstone lifecycle, a
    * compact-or-not cron) should not pay it on every reading. Works
    * for both layouts (codes table ⇒ IVF-PQ). */
  def ivfIndexHealthLight(spark: org.apache.spark.sql.SparkSession,
                          dir: String): DataFrame = {
    val snap = Manifest.snapshot(spark, dir)
    val codesP = new org.apache.hadoop.fs.Path(snap.path("codes"))
    val table =
      if (codesP.getFileSystem(spark.sparkContext.hadoopConfiguration)
        .exists(codesP)) "codes"
      else "postings"
    indexHealth(spark, dir, table, snap, None, None, None, None)
  }

  /** [[ivfIndexHealth]] for the compressed [[ivfPqBuild]] layout: the
    * layout stats come from the codes table; the recall sample needs the
    * embedding store (`corpus`) for its exact side. With
    * `suggestTargetRecall` set, the report also carries the
    * [[ivfPqSuggestNProbe]] budget (at the report's own refineK) — the
    * knob an operator turns when the decay demo says recall is sliding. */
  def ivfPqIndexHealth(spark: org.apache.spark.sql.SparkSession,
                       dir: String, queries: DataFrame, corpus: DataFrame,
                       k: Int, nProbe: Int, refineK: Int,
                       suggestTargetRecall: Option[Double] = None)
    : DataFrame =
    indexHealth(spark, dir, "codes",
      Manifest.snapshot(spark, dir), Some(k), Some(nProbe),
      Some(ivfPqRecallProbe(spark, dir, queries, corpus, k, nProbe,
        refineK)),
      // flatMap: an unreachable target surfaces as NULL (plus the
      // tuner's warning log), never as a budget that misses the target
      suggestTargetRecall.flatMap(t =>
        ivfPqSuggestNProbe(spark, dir, queries, corpus, k, refineK, t)))

  private def indexHealth(spark: org.apache.spark.sql.SparkSession,
                          dir: String, table: String,
                          snap: Manifest.Snapshot, k: Option[Int],
                          nProbe: Option[Int],
                          recall: Option[Double],
                          suggested: Option[Int]): DataFrame = {
    import spark.implicits._
    // lists the INDEX has (from the quantizer, so an empty list still
    // counts — k-means can leave clusters unpopulated)
    val nLists = spark.read.parquet(snap.path("centroids")).count().toInt
    // rows per list: one aggregate over the postings/codes scan —
    // bounded output (nList rows)
    val rowsPerList = spark.read.parquet(snap.path(table))
      .groupBy("list").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    // files per list: one FS listing of the partition directories
    val tableP = new org.apache.hadoop.fs.Path(snap.path(table))
    val fs = tableP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val filesPerList = fs.listStatus(tableP).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("list="))
      .map { s =>
        s.getPath.getName.stripPrefix("list=").toInt ->
          fs.listStatus(s.getPath)
            .count(_.getPath.getName.endsWith(".parquet"))
      }.toMap
    val totalRows = rowsPerList.values.sum
    val meanRows = if (nLists == 0) 0.0 else totalRows.toDouble / nLists
    // pending-tombstone and ingest-batch counts in ONE job (zero when
    // neither table exists) instead of two driver count jobs per
    // reading ([[OpsStats]])
    val (pendingN, ingestN) = OpsStats.counts(spark, snap)
    Seq((dir, snap.version, nLists, nLists - rowsPerList.size, totalRows,
      filesPerList.values.sum.toLong,
      if (filesPerList.isEmpty) 0 else filesPerList.values.max,
      if (rowsPerList.isEmpty) 0L else rowsPerList.values.max,
      meanRows,
      if (meanRows == 0.0) 0.0 else rowsPerList.values.max / meanRows,
      recall, k, nProbe, suggested,
      pendingN, ingestN))
      .toDF("dir", "version", "n_lists", "empty_lists", "total_rows",
        "total_files", "max_files_per_list", "max_rows_per_list",
        "mean_rows_per_list", "row_skew", "recall_at_k", "k", "n_probe",
        "suggested_n_probe", "deleted_pending", "ingest_batches")
  }

  /** IVF-PQ ANN: IVF coarse pruning + product-quantized candidate
    * scoring + exact refinement.
    *
    * Product quantization is the storage/IO story at 100 TB: the corpus
    * vector (dim floats, ~3 KB at dim=768) is replaced by `m` codebook
    * indices plus one norm (~m+4 bytes, a ~100× compression), so the
    * candidate-scoring scan reads codes, not vectors. Codebooks are `m`
    * independent k-means fits over subvector slices (trained on a
    * deterministic sample — at full scale you never fit on the whole
    * corpus), broadcast to executors. Scoring is asymmetric-distance:
    * approx dot(q, x) = Σⱼ dot(qⱼ, codebook_j[code_j(x)]), divided by
    * the stored ‖x‖ for cosine. The top `refineK` candidates per query
    * are re-scored EXACTLY by joining the original vectors back by id —
    * a join whose left side is ≤ |queries|·refineK rows, independent of
    * corpus size. With nProbe = nList and refineK ≥ |corpus| the result
    * is exactly brute force (the driver's oracle gate for the plumbing);
    * production settings are gated by the recall spec. */
  def ivfPq(queries: DataFrame, corpus: DataFrame, k: Int,
            nList: Int = 16, nProbe: Int = 2, m: Int = 4, nCodes: Int = 16,
            refineK: Int = 50, trainFraction: Double = 1.0,
            seed: Long = 7L, kmeansMaxIter: Int = 20): DataFrame = {
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    val av = corpus.select(col("id"), col("v"),
      array_to_vector(col("v").cast("array<double>")).as("fv"))
    // coarse quantizer: assigns every corpus vector to an inverted list
    val coarse = coarseKMeansFit(fitView(av), nList, seed, kmeansMaxIter)
    val dim = corpus.select(size(col("v")).as("d")).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subLen = dim / m
    // All m sub-codebooks train on ONE bounded driver-side sample (one
    // collect job + local Lloyd per subspace) instead of m distributed
    // k-means fits: codebook quality needs thousands of examples, not
    // the corpus, so at any scale the training input is a capped sample
    // — and m scheduler round-trips collapse into none.
    val maxTrain = 65536
    val sample: Array[Array[Double]] =
      (if (trainFraction >= 1.0) av
       else av.sample(withReplacement = false, trainFraction, seed))
        .select(col("v").cast("array<double>")).limit(maxTrain)
        .collect().map(_.getSeq[Double](0).toArray)
    val codebooks: Array[Array[Array[Double]]] = (0 until m).map { j =>
      localLloyd(sample.map(v =>
        java.util.Arrays.copyOfRange(v, j * subLen, (j + 1) * subLen)),
        nCodes, kmeansMaxIter)
    }.toArray
    val bcCb = spark.sparkContext.broadcast(codebooks)
    // same shared kernels as the persisted paths (float→double widening
    // is exact, so encoding the cast column is bit-identical)
    val encode = udf { (v: Seq[Double]) =>
      pqEncode(bcCb.value, subLen, v)
    }
    // the compressed corpus: list id + codes + norm, no vectors
    val encoded = av
      .select(col("id"), assignList(coarse)(col("fv")).as("list"),
        encode(col("v").cast("array<double>")).as("e"))
      .select(col("id"), col("list"), col("e._1").as("codes"),
        col("e._2").as("norm"))
    val centers = spark.sparkContext
      .broadcast(coarse.clusterCenters.map(_.toArray))
    val probeLists = udf { (qv: Seq[Double]) =>
      probeIdx(centers.value, qv, nProbe)
    }
    val adc = udf { (qv: Seq[Double], codes: Seq[Int], nrm: Double) =>
      adcScore(bcCb.value, subLen, qv, codes, nrm)
    }
    val q = queries.select(col("qid"),
      col("qv").cast("array<double>").as("qd"),
      explode(probeLists(col("qv").cast("array<double>"))).as("list"))
    // approx scores over probed lists only, bounded-heap per query
    val approxTop = encoded.join(broadcast(q), Seq("list"))
      .select(col("qid"), col("id"),
        adc(col("qd"), col("codes"), col("norm")).as("approx"))
      .groupBy("qid")
      .agg(AggFunctions.collectTopK(
        struct((-col("approx")).as("na"), col("id")), refineK,
        smallest = true).as("_top"))
      .select(col("qid"), explode(col("_top")).as("c"))
      .select(col("qid"), col("c.id").as("id"))
    // exact refinement: original vectors joined back for ≤ |q|·refineK ids
    topK(approxTop
      .join(corpus, Seq("id"))
      .join(broadcast(queries), Seq("qid"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
  }

  /** Plain Lloyd iterations on a local sample — PQ codebook training.
    * Deterministic: initial centers are the first k distinct points in
    * sample order; empty clusters keep their previous center. */
  private def localLloyd(pts: Array[Array[Double]], k: Int,
                         iters: Int): Array[Array[Double]] = {
    val init = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    val seen = scala.collection.mutable.HashSet.empty[Seq[Double]]
    var i = 0
    while (i < pts.length && init.length < k) {
      if (seen.add(pts(i).toSeq)) init += pts(i).clone()
      i += 1
    }
    // degenerate corpus (< k distinct points): pad with copies — extra
    // centers are simply never nearest-unique, which is harmless
    while (init.length < k) init += init(init.length % math.max(1, seen.size))
      .clone()
    val centers = init.toArray
    val d = pts.headOption.map(_.length).getOrElse(0)
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](d))
      val counts = new Array[Long](k)
      var p = 0
      while (p < pts.length) {
        val v = pts(p)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          var dist = 0.0; var t = 0
          while (t < d) { val df = centers(c)(t) - v(t); dist += df * df; t += 1 }
          if (dist < bestD) { bestD = dist; best = c }
          c += 1
        }
        var t = 0
        while (t < d) { sums(best)(t) += v(t); t += 1 }
        counts(best) += 1
        p += 1
      }
      var c = 0
      while (c < k) {
        if (counts(c) > 0) {
          var t = 0
          while (t < d) { centers(c)(t) = sums(c)(t) / counts(c); t += 1 }
        }
        c += 1
      }
      it += 1
    }
    centers
  }

  /** LSH-bucketed ANN: score only same-bucket (plus probed-bucket) pairs.
    * At 100 TB the corpus side is one scan + one shuffle on bucket id. */
  def lsh(queries: DataFrame, corpus: DataFrame, k: Int,
          nBits: Int = 8, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col("id"), col("v"),
      V.lshBucket(col("v"), nBits).as("bucket"))
    // probe: the query's own bucket plus single-bit flips (0..nProbe-1)
    val q = queries.select(col("qid"), col("qv"),
      V.lshBucket(col("qv"), nBits).as("qb"))
      .select(col("qid"), col("qv"), explode(array(
        (lit(0) +: (0 until nProbe).map(b => lit(1 << b))).map(f =>
          col("qb").bitwiseXOR(f)): _*)).as("bucket"))
    topK(c.join(broadcast(q), Seq("bucket"))
      .select(col("qid"), col("id"),
        V.cosine(col("qv"), col("v")).as("cosine")), k)
  }
}
