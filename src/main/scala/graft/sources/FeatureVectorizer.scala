package graft.sources

import org.apache.spark.ml.linalg.{Vectors, Vector}
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** Feature-bag vectorization: arrays of (name, term, value) records merged
  * into one SparseVector column per feature shard
  * (AvroDataReader.readMerged, photon-client/.../avro/AvroDataReader.scala:
  * 165-209,309-346; feature identity = name + sep + term, Utils
  * .getFeatureKey :292-295).
  *
  * The reference ships indexes to executors as off-heap PalDB stores
  * (X16); the Spark-native design is an index-map DataFrame — broadcast
  * into the vectorizing expression when it fits (the common case: feature
  * vocabularies are ≪ data), or joinable for extreme vocabularies.
  */
object FeatureVectorizer {

  val Sep = "\u0001"

  def featureKey(name: Column, term: Column): Column =
    concat_ws(Sep, coalesce(name, lit("")), coalesce(term, lit("")))

  /** Per-group union of active (nonzero) feature indices over a vector
    * column — the standalone DataFrame surface of U5 (the reference's
    * projector index-set union, RandomEffectDataset.scala:417-424,
    * computed there as a foldByKey set union). [[graft.ml.RandomEffect]]
    * runs the same union group-locally inside its per-entity solve; this
    * form serves callers that need the index sets as DATA — e.g. sizing
    * per-entity subspaces, auditing feature sparsity per shard, or
    * pre-computing projector maps.
    *
    * Scale shape: explode to (group, index) pairs, then collect_set —
    * partial aggregation dedups map-side, so the shuffle carries at most
    * |distinct indices per group per task| rows, never the raw data; no
    * group's row set ever gathers in one task before reduction. */
  def activeIndexUnion(df: DataFrame, groupCols: Seq[String],
                       vecCol: String): DataFrame = {
    val activeIdx = udf { (v: Vector) =>
      val b = scala.collection.mutable.ArrayBuffer.empty[Int]
      v.foreachActive { (j, x) => if (x != 0.0) b += j }
      b.toArray
    }
    df.select(groupCols.map(col) :+
        explode(activeIdx(col(vecCol))).as("_idx"): _*)
      .groupBy(groupCols.map(col): _*)
      .agg(sort_array(collect_set(col("_idx"))).as("active_indices"))
  }

  /** Distinct feature keys across the given bag columns → (featureKey,
    * index) with DETERMINISTIC dense indices: a range-partitioned sort by
    * key plus per-partition prefix offsets (`zipWithIndex`). Stable across
    * runs and cluster layouts AND fully distributed — no single-task
    * window stage, so the index build itself holds at the billion-key
    * vocabularies [[vectorizeByJoin]] exists for.
    *
    * `selectedFeatures` is the legacy whitelist (GLMSuite selected-
    * features file, GLMSuite.scala:140-147): a (name, term) DataFrame;
    * when given, only whitelisted keys are indexed — indices stay dense
    * over the surviving vocabulary. */
  def buildIndexMap(df: DataFrame, bagCols: Seq[String],
                    selectedFeatures: Option[DataFrame] = None): DataFrame = {
    val keys = bagCols.map(b =>
        df.select(explode(col(b)).as("f"))
          .select(featureKey(col("f.name"), col("f.term")).as("featureKey")))
      .reduce(_ unionAll _)
      .distinct()
    val kept = selectedFeatures match {
      case None => keys
      case Some(sel) =>
        keys.join(sel.select(featureKey(col("name"), col("term"))
          .as("featureKey")), Seq("featureKey"), "left_semi")
    }
    val spark = df.sparkSession
    // sort() range-partitions; zipWithIndex adds per-partition offsets in
    // one extra count job — deterministic dense indices, all distributed
    val indexed = kept.sort("featureKey").rdd.map(_.getString(0))
      .zipWithIndex()
      .map { case (k, i) =>
        // SparseVector indices are Int: past 2^31 keys the truncation
        // would wrap negative — fail loudly instead
        require(i <= Int.MaxValue,
          s"feature index $i overflows Int; vocabulary too large")
        (k, i.toInt)
      }
    spark.createDataFrame(indexed).toDF("featureKey", "index")
  }

  /** Merge `bagCols` into one SparseVector column named `outCol`.
    * Duplicate keys within a row accumulate (photon sums duplicate
    * feature occurrences); unknown keys are dropped (scoring-time
    * behavior for unseen features).
    *
    * Dispatch on vocabulary size: up to `broadcastVocabLimit` keys the
    * index map is collected and broadcast into a codegen-friendly UDF
    * (the common case — vocabularies ≪ data); above it the map is NEVER
    * collected to the driver and vectorization becomes an explode +
    * shuffle join + per-row regroup ([[vectorizeByJoin]]) — the path
    * that survives photon's "hundreds of billions of coefficients". */
  def vectorize(df: DataFrame, bagCols: Seq[String], indexMap: DataFrame,
                outCol: String,
                broadcastVocabLimit: Long = 2000000L): DataFrame = {
    // the index-map lineage (distinct → sort → zipWithIndex) is
    // expensive; count() and the collect()/join below would otherwise
    // each recompute it end to end
    val im = indexMap.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocab = im.count()
    require(vocab <= Int.MaxValue,
      s"index map has $vocab entries; vector dimensions are Int-bounded")
    if (vocab > broadcastVocabLimit)
      return vectorizeByJoin(df, bagCols, im, outCol, vocab.toInt)
    val spark = df.sparkSession
    val entries = im.collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    val dim = entries.size
    val bc = spark.sparkContext.broadcast(entries)
    // key/value extraction stays in codegen'd Catalyst expressions; the
    // UDF only assembles the SparseVector from plain arrays
    def safeBag(b: String): Column =
      coalesce(col(b), array().cast(df.schema(b).dataType))
    val keyArr = flatten(array(bagCols.map(b =>
      transform(safeBag(b), f =>
        featureKey(f.getField("name"), f.getField("term")))): _*))
    val valArr = flatten(array(bagCols.map(b =>
      transform(safeBag(b), f =>
        f.getField("value").cast("double"))): _*))
    val mkVec = udf { (keys: Seq[String], values: Seq[Double]) =>
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      var i = 0
      while (i < keys.length) {
        bc.value.get(keys(i)).foreach { idx =>
          m(idx) = m.getOrElse(idx, 0.0) + values(i)
        }
        i += 1
      }
      Vectors.sparse(dim, m.toSeq.sortBy(_._1))
    }
    df.withColumn(outCol, mkVec(keyArr, valArr))
  }

  /** Hashing-trick vectorization: index = (first 8 md5 hex digits of
    * the feature key) mod `numBuckets` — NO vocabulary build at all.
    *
    * [[buildIndexMap]] + [[vectorize]] is the exact path, but its index
    * map is a corpus-wide distinct + sort; at 100 TB that is a full
    * shuffle of every feature key before the first vector exists, and
    * the map itself must live somewhere. The hashing trick trades a
    * controlled collision rate (~ vocab / numBuckets) for a ZERO-pass,
    * zero-state, embarrassingly parallel projection — the standard
    * scale answer when per-feature interpretability isn't needed.
    * Colliding keys accumulate into the same component, which is also
    * how duplicate keys behave in [[vectorize]].
    *
    * Bucket assignment runs in codegen'd Catalyst (md5/conv/pmod — the
    * [[graft.operators.DownSampling.hashFraction]] hash family, exactly
    * reproducible in any engine with md5); only the final sparse-vector
    * assembly is a UDF over plain arrays. */
  def vectorizeHashed(df: DataFrame, bagCols: Seq[String], outCol: String,
                      numBuckets: Int): DataFrame = {
    require(numBuckets > 0 && numBuckets <= (1 << 26),
      s"numBuckets ($numBuckets) out of range")
    def safeBag(b: String): Column =
      coalesce(col(b), array().cast(df.schema(b).dataType))
    val keyArr = flatten(array(bagCols.map(b =>
      transform(safeBag(b), f =>
        featureKey(f.getField("name"), f.getField("term")))): _*))
    val idxArr = transform(keyArr, k =>
      pmod(conv(substring(md5(k), 1, 8), 16, 10).cast("long"),
        lit(numBuckets.toLong)))
    val valArr = flatten(array(bagCols.map(b =>
      transform(safeBag(b), f =>
        f.getField("value").cast("double"))): _*))
    val mkVec = udf { (idxs: Seq[Long], values: Seq[Double]) =>
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      var i = 0
      while (i < idxs.length) {
        val idx = idxs(i).toInt
        m(idx) = m.getOrElse(idx, 0.0) + values(i)
        i += 1
      }
      Vectors.sparse(numBuckets, m.toSeq.sortBy(_._1))
    }
    df.withColumn(outCol, mkVec(idxArr, valArr))
  }

  /** Join-based vectorization for vocabularies too large to broadcast:
    * explode every row's feature keys, equi-join the index map (a shuffle
    * keyed by featureKey — Catalyst/AQE pick the join strategy), regroup
    * per row, and reattach. The index map stays distributed end to end. */
  private[sources] def vectorizeByJoin(df: DataFrame, bagCols: Seq[String],
                                       indexMap: DataFrame, outCol: String,
                                       dim: Int): DataFrame = {
    def safeBag(b: String): Column =
      coalesce(col(b), array().cast(df.schema(b).dataType))
    // the generated row ids feed BOTH sides of the self-join below;
    // without materialization the two evaluations of an upstream
    // shuffle could enumerate rows in different orders and attach
    // vectors to the wrong rows
    val withId = df.withColumn("__rid", monotonically_increasing_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val exploded = withId.select(col("__rid"),
      explode(flatten(array(bagCols.map(b => transform(safeBag(b), f =>
        struct(featureKey(f.getField("name"), f.getField("term"))
          .as("featureKey"),
          f.getField("value").cast("double").as("value")))): _*))).as("f"))
      .select(col("__rid"), col("f.featureKey"), col("f.value"))
    val grouped = exploded.join(indexMap, "featureKey")
      .groupBy("__rid")
      .agg(collect_list(struct(col("index"), col("value"))).as("__fs"))
    val mkVec = udf { (fs: Seq[Row]) =>
      val m = scala.collection.mutable.HashMap.empty[Int, Double]
      if (fs != null) fs.foreach { r =>
        val i = r.getInt(0)
        m(i) = m.getOrElse(i, 0.0) + r.getDouble(1)
      }
      Vectors.sparse(dim, m.toSeq.sortBy(_._1))
    }
    withId.join(grouped, Seq("__rid"), "left_outer")
      .withColumn(outCol, mkVec(col("__fs")))
      .drop("__rid", "__fs")
  }

  /** Full readMerged equivalent: build (or reuse) index maps per shard and
    * vectorize each shard's bags. shards: shardName → bag columns. */
  def readMerged(df: DataFrame, shards: Map[String, Seq[String]],
                 indexMaps: Map[String, DataFrame] = Map.empty)
  : (DataFrame, Map[String, DataFrame]) = {
    val maps = shards.map { case (shard, bags) =>
      shard -> indexMaps.getOrElse(shard, buildIndexMap(df, bags))
    }
    val out = shards.foldLeft(df) { case (acc, (shard, bags)) =>
      vectorize(acc, bags, maps(shard), shard)
    }
    (out.drop(shards.values.flatten.toSeq.distinct: _*), maps)
  }

  /** De-vectorize back to a feature bag (S9's inverse transform), given
    * the index map. */
  def devectorize(df: DataFrame, vecCol: String, indexMap: DataFrame,
                  outCol: String): DataFrame = {
    val spark = df.sparkSession
    val rev = indexMap.collect().map(r => r.getInt(1) -> r.getString(0))
      .toMap
    val bc = spark.sparkContext.broadcast(rev)
    val unpack = udf { (v: Vector) =>
      val buf = scala.collection.mutable.ArrayBuffer.empty[(String, String, Double)]
      v.foreachActive { (i, x) =>
        bc.value.get(i).foreach { key =>
          val parts = key.split(Sep, -1)
          buf += ((parts(0), if (parts.length > 1) parts(1) else "", x))
        }
      }
      buf.toSeq
    }
    df.withColumn(outCol, unpack(col(vecCol))
      .cast("array<struct<name:string,term:string,value:double>>"))
  }
}
