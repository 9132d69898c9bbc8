package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * In production these would be date-partitioned external tables; here each
  * scale-factor directory holds one parquet file per table. All queries go
  * through this single entry point so that partition pruning / predicate
  * pushdown behavior is uniform and testable.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables whose scans feed CPU-dense map work or wide partial
    * aggregates — these get the [[fanOut]] treatment on load, spread by
    * their natural key. The pure dimension tables (region…part) stay
    * direct: they end up broadcast anyway and fanning a 5-row table is
    * pure overhead. */
  private val fanOutKeys = Map(
    "lineitem" -> "l_orderkey", "orders" -> "o_orderkey",
    "events" -> "user_id", "documents" -> "doc_id",
    "embeddings" -> "vec_id")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    fanOutKeys.get(name) match {
      case Some(k) => fanOut(df, k)
      case None    => df
    }
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** The events table's `ts` encoding has varied across testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark's reader rejects
    * without the legacy nanos-as-long conf) vs plain TIMESTAMP(MICROS).
    * Adapt to whichever is on disk: nanos arrive as LongType under the
    * legacy conf and are truncated to micros with exact integer division
    * (the same truncation DuckDB applies); micros pass through untouched. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // naive (no-tz) micros: interpret the wall clock as UTC so
        // unix_micros(ts) returns the same integer DuckDB's epoch_us
        // reads off the raw parquet value — tz-independent on both sides.
        // The UTC session tz makes the NTZ→LTZ cast that interpretation.
        s.conf.set("spark.sql.session.timeZone", "UTC")
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Fan an under-split scan out to the session's parallelism before
    * CPU-dense map work (md5 keys, shingling, tokenization, feature
    * hashing) and wide partial aggregates. The sf fixtures are
    * single-row-group files, so every scan is ONE task and everything
    * upstream of the first exchange runs on one of 32 cores — r7
    * measured q18's md5 admission keys at ~0.8s/pass single-threaded vs
    * ~0.05s fanned out, and the whole suite paid the same tax.
    *
    * Scale shape: the repartition only fires when the source produced
    * fewer splits than half the default parallelism — a 100 TB input
    * carries thousands of row groups, so at scale this is a plan-time
    * no-op and no shuffle is added. Catalyst pushes column pruning
    * through the Repartition node, so the fixture-scale shuffle carries
    * only the columns the query reads.
    *
    * The spread is HASH partitioning on the table's natural key, not
    * round-robin: round-robin repartition locally SORTS every row first
    * (`spark.sql.execution.sortBeforeRepartition`, needed for retry
    * determinism) — a serial ~0.4s stage per query on the one-split
    * fixture — while a key hash is one cheap expression, forces only
    * the key column into the scan, and hands downstream same-key
    * aggregates a distribution they can sometimes reuse.
    *
    * `spark.graft.fanout` (default true) turns it off — the plan-gate
    * suites (ShuffleBudgetSpec, PlanShapeSpec) disable it so their
    * exchange budgets and 0-shuffle proofs keep pinning what the
    * OPERATORS do, independent of this input-layout adaptation. */
  def fanOut(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    if (!spark.conf.get("spark.graft.fanout", "true").toBoolean) return df
    val target = spark.sparkContext.defaultParallelism
    // gate on the FILE count (a catalog listing the scan already did),
    // not df.rdd.getNumPartitions — the latter compiles a throwaway
    // physical plan per table load. A many-splits single file slips
    // through as 1, which only means one redundant (cheap, hash-keyed)
    // repartition; the decision is about rescuing one-split fixtures
    val files = df.inputFiles
    if (files.length == 0 || files.length >= math.max(2, target / 2))
      return df
    // SIZE the fan-out to the scan, don't always use full parallelism:
    // r7's unconditional 32-way spread taxed ~20 sub-second queries
    // +0.3-0.5s each — a 2k-row table's whole runtime is one tiny stage,
    // and 32 task launches cost more than the stage. Scale the target
    // with total scan bytes (one file-status metadata call per file, no
    // data read): below `minBytes` skip the repartition entirely; above
    // it, one partition per `bytesPerPartition`, capped at the session
    // parallelism. CPU-dense text work expands ~4× off compressed
    // parquet, so the per-partition unit is small (256 KB). At
    // production layout any scan worth fanning has enough splits to
    // fail the file-count gate above, so none of this ever fires.
    val minBytes = spark.conf
      .get("spark.graft.fanout.minBytes", (128L << 10).toString).toLong
    val perPart = spark.conf
      .get("spark.graft.fanout.bytesPerPartition", (256L << 10).toString)
      .toLong
    val hconf = spark.sparkContext.hadoopConfiguration
    // an unreadable file status means SKIP the adaptation, not "assume
    // huge": a Long.MaxValue-scale sentinel would force maximum fan-out
    // on a transient FS error, and summing it across several failing
    // files overflows negative and silently disables the gate below
    val totalBytes =
      try files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      }.sum
      catch { case _: java.io.IOException => return df }
    val sized = math.min(target.toLong,
      (totalBytes + perPart - 1) / math.max(1L, perPart)).toInt
    if (totalBytes >= minBytes && sized > files.length)
      df.repartition(sized, col(keyCol))
    else df
  }
}
