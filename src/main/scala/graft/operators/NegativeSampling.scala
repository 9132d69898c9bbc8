package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic negative sampling for pairwise / contrastive training
  * data: for every user in a positives table, draw up to `k` items from
  * the catalog that the user has NOT interacted with.
  *
  * `rand()`-based sampling is partitioning-dependent and irreproducible
  * across retries; here candidate draws are md5-derived from
  * (salt, user, attempt) — the [[DownSampling.hashFraction]] convention —
  * so the sample is bit-stable across runs, cluster layouts, and engines,
  * and an external SQL engine can replay it exactly.
  *
  * Scale shape (100 TB interactions, 10^8-item catalog):
  *  - The catalog index (item → dense rank in ascending item order) is
  *    built fully distributed — range-partitioned sort + per-partition
  *    offsets (`zipWithIndex`), the [[graft.sources.FeatureVectorizer
  *    .buildIndexMap]] pattern — never a single-task global window.
  *  - Candidate generation is map-side: distinct users × (k·oversample)
  *    attempt rows from one `explode(sequence(...))` projection.
  *  - The idx→item lookup broadcasts the catalog when its measured size
  *    is under `broadcastCatalogLimit` (the dispatch-on-count pattern of
  *    [[Graphs.pagerank]]); past that it falls back to a shuffle join
  *    and AQE.
  *  - The positives exclusion is one anti join keyed (user, item): the
  *    attempts side is users·k·oversample rows, orders of magnitude
  *    smaller than the interactions it joins against.
  *  - The final keep-first-k window partitions by user over AT MOST
  *    k·oversample rows per user — bounded state, no hot-key funnel.
  *
  * Under-delivery is possible by design: a user whose positives blanket
  * the catalog, or unlucky hash collisions, can leave fewer than `k`
  * survivors from the k·oversample attempt budget. Raise `oversample`
  * for dense-interaction corpora; the attempt index is emitted so
  * downstream can audit the draw order.
  *
  * Cross-engine note: the catalog index sorts on the item column itself;
  * mirroring in another engine needs an identically-ordered type
  * (integers, dates). String catalogs sort by collation — pin binary
  * collation on both sides before relying on the mirror.
  *
  * Reference context: photon-ml's down-sampling operators
  * (photon-api DownSampler.scala) reweight existing rows; synthesizing
  * explicit negatives from a catalog is the complementary operation a
  * ranking/retrieval training pipeline needs.
  */
object NegativeSampling {

  /** Up-to-`k` deterministic negatives per user.
    *
    * @param positives  interactions; only (`userCol`, `itemCol`) are read
    * @param catalog    item dimension; `catalogItemCol` must be unique
    * @return (user, item, attempt) — attempt is the 0-based draw index
    *         that first produced this item, ascending per user
    */
  def sample(positives: DataFrame, userCol: String, itemCol: String,
             catalog: DataFrame, catalogItemCol: String,
             k: Int, oversample: Int = 3, salt: String = "neg",
             broadcastCatalogLimit: Long = 10000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(oversample >= 1, "oversample must be >= 1")
    val spark = positives.sparkSession
    val items = catalog.select(col(catalogItemCol).as("item")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = items.count()
    require(m > 0, "catalog is empty")
    val itemField = items.schema.fields.head
    // dense deterministic index in ascending item order, distributed
    val indexed = spark.createDataFrame(
      items.sort("item").rdd.zipWithIndex.map { case (r, i) =>
        Row(i, r.get(0))
      },
      StructType(Seq(StructField("idx", LongType, nullable = false),
        itemField.copy(name = "item"))))
    val nAtt = k * oversample
    val users = positives.select(col(userCol).as("user")).distinct()
    val cand = users
      .select(col("user"),
        explode(sequence(lit(0), lit(nAtt - 1))).as("attempt"))
      .withColumn("idx",
        conv(substring(md5(concat_ws("\u0001", lit(salt),
          col("user").cast("string"), col("attempt").cast("string"))),
          1, 8), 16, 10).cast("long") % lit(m))
    val hint: DataFrame => DataFrame =
      if (m <= broadcastCatalogLimit) broadcast else identity
    val withItem = cand.join(hint(indexed), "idx")
    val survivors = withItem.join(
      positives.select(col(userCol).as("user"), col(itemCol).as("item")),
      Seq("user", "item"), "left_anti")
    // two attempts can hash to the same item: keep the earliest draw.
    // Within a user each attempt maps to exactly one item, so min-attempt
    // values are distinct across items and the draw order below is total
    val firstHit = survivors.groupBy("user", "item")
      .agg(min(col("attempt")).as("attempt"))
    val w = Window.partitionBy("user").orderBy("attempt")
    firstHit
      .withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= k)
      .drop("_rk")
  }
}
