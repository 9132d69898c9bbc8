package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale the sf0.1 fixture 10× into a local sf1 directory for the
  * empirical scaling proof (BENCH_SCALING.json): run the expensive
  * queries at both SFs and check the time ratio stays near-linear.
  *
  * Replication model — replica r ∈ [0, factor), r=0 is the original:
  *   - fact tables (orders, lineitem, events, customer): primary and
  *     foreign keys shift by r·10⁹, so key cardinalities scale linearly
  *     and per-key row counts (order sizes, user activity, dup-uid
  *     structure) are preserved exactly — no artificial skew, no
  *     artificial key collisions. Timestamps are untouched: 10× rows in
  *     the same window models more traffic, which keeps date-grain
  *     aggregates honest (same groups, 10× rows per group).
  *   - dimension tables (region, nation, part, supplier) stay fixed:
  *     broadcast sides don't grow with corpus size in production either.
  *   - documents: doc ids shift; replica text keeps the original word
  *     ORDER but substitutes every 3rd token with a replica-suffixed
  *     variant (`w~r`). Every 3-gram window contains exactly one
  *     substituted position, so NO shingle survives across replicas
  *     (or against the originals) — cross-replica similarity is zero —
  *     while exact-dup texts within a replica stay exact dups and ~2/3
  *     of tokens keep language/stopword signal, so cleaning rules and
  *     language ID behave. Two earlier designs failed: naive copies put
  *     10 identical docs in every LSH bucket (quadratic pair blow-up),
  *     and a per-replica hash-SORT of the words CANONICALIZED word
  *     order, making every pair of same-vocabulary docs look like
  *     near-dups (4.3M candidate pairs at sf1, dedup collapsed 43k docs
  *     to 5k keepers, and decontamination emptied the corpus).
  *   - embeddings: ids shift; vectors get a small deterministic
  *     per-replica perturbation so ANN buckets/centroids see 10×
  *     distinct points rather than 10 coincident copies.
  *
  * Output is written as multi-file parquet (unlike the single-row-group
  * fixtures) so scans split naturally and `Tables.fanOut` is a no-op —
  * i.e. sf1 also exercises the at-scale plan shape.
  */
object ScaleGen {
  private val STRIDE = 1000000000L

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "sfgen/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = graft.util.SessionTuning(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String, files: Int): Unit = {
      df.repartition(files).write.mode("overwrite")
        .parquet(s"$out/$t.parquet")
      println(s"wrote $t x$factor -> $out/$t.parquet ($files files)")
    }
    // replicas as a broadcast one-column cross: each source row appears
    // once per replica with `_r` attached
    val reps = broadcast(
      spark.range(factor.toLong).select(col("id").as("_r")))
    def shift(c: String): Column = col(c) + col("_r") * STRIDE

    write(read("orders").crossJoin(reps)
      .withColumn("o_orderkey", shift("o_orderkey"))
      .withColumn("o_custkey", shift("o_custkey"))
      .drop("_r"), "orders", 32)

    write(read("lineitem").crossJoin(reps)
      .withColumn("l_orderkey", shift("l_orderkey"))
      .drop("_r"), "lineitem", 64)

    write(read("events").crossJoin(reps)
      .withColumn("event_id", shift("event_id"))
      .withColumn("user_id", shift("user_id"))
      .drop("_r"), "events", 32)

    write(read("customer").crossJoin(reps)
      .withColumn("c_custkey", shift("c_custkey"))
      .withColumn("c_name",
        when(col("_r") === 0, col("c_name"))
          .otherwise(concat(col("c_name"), lit("#"), col("_r"))))
      .drop("_r"), "customer", 16)

    // positional substitution: order preserved, every 3rd token gets a
    // replica suffix — each 3-gram covers exactly one substituted slot,
    // so no shingle crosses replicas; see the scaladoc for why neither
    // plain copies nor a word sort work
    write(read("documents").crossJoin(reps)
      .withColumn("doc_id", shift("doc_id"))
      .withColumn("text",
        when(col("_r") === 0, col("text")).otherwise(
          expr("""array_join(transform(split(text, ' '),
                 |  (w, i) -> CASE WHEN i % 3 = 0
                 |    THEN concat(w, '~', CAST(_r AS STRING))
                 |    ELSE w END), ' ')""".stripMargin)))
      .drop("_r"), "documents", 32)

    write(read("embeddings").crossJoin(reps)
      .withColumn("vec_id", shift("vec_id"))
      .withColumn("embedding",
        when(col("_r") === 0, col("embedding")).otherwise(
          expr("""transform(embedding, (x, i) -> CAST(x +
                 |  0.001 * (xxhash64(vec_id, _r, i) % 1000) / 1000.0
                 |  AS FLOAT))""".stripMargin)))
      .drop("_r"), "embeddings", 16)

    Seq("region", "nation", "part", "supplier")
      .foreach(t => write(read(t), t, 1))
    spark.stop()
  }
}
