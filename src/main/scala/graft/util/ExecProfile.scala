package graft.util

import org.apache.spark.sql.SparkSession
import scala.util.Try

/** Input-size-derived shuffle width for a bounded execution scope —
  * the scale-adaptive pattern [[graft.ml.CoordinateDescent]] introduced
  * for its descent loop, shared so the iterative graph family can key
  * each round's shuffle width on its measured edge count the same way.
  *
  * The adaptation is NOT a local-core-count tune: `derived =
  * min(sessionWidth, rows / rowsPerPartition + 1)`, so at production
  * row counts (rows ≥ rowsPerPartition × the session's configured
  * width) `derived == sessionWidth` and the scope is a no-op — AQE
  * stays on, partitions stay the cluster's. Only when the measured
  * input is small relative to the configured parallelism does the
  * scope narrow the shuffles and disable AQE (whose per-materialization
  * stage jobs and near-empty task launches dwarf the data work at that
  * size).
  */
object ExecProfile {

  private val SpKey = "spark.sql.shuffle.partitions"
  private val AqeKey = "spark.sql.adaptive.enabled"

  /** The width the scope would run at: `min(session, rows/rpp + 1)`,
    * or None when the session width is not a plain integer (e.g.
    * "auto" on AQE auto-optimized-shuffle builds — then no adaptation,
    * not a crash). */
  def derivedWidth(spark: SparkSession, rows: Long,
                   rowsPerPartition: Long): Option[Int] =
    spark.conf.getOption(SpKey)
      .flatMap(v => Try(v.trim.toInt).toOption)
      .map(sp => math.min(sp.toLong,
        rows / math.max(1L, rowsPerPartition) + 1L).toInt)

  private val WscKey = "spark.sql.codegen.wholeStage"
  private val CgfKey = "spark.sql.codegen.factoryMode"

  /** Run `body` with the derived shuffle width and AQE off when (and
    * only when) the derived width is below the session's; otherwise the
    * body runs untouched. All confs are restored afterwards to the
    * exact values the session observed before the scope (captured with
    * `getOption`, never hardcoded defaults; a key `getOption` could not
    * read is unset again).
    *
    * `codegenOff = true` additionally disables whole-stage codegen
    * inside an ACTIVE scope — for loops that materialize many DISTINCT
    * one-shot plans over an input this small, janino-compiling
    * kilobytes of Java per plan costs far more than interpreting the
    * rows (measured on the GAME descent loop: 25 materializations,
    * 9.3 s compiled vs 4.0 s interpreted at sf0.1). Same scale honesty
    * as the width: at production row counts the scope never activates
    * and codegen stays on.
    *
    * Session-global conf mutation: the scope must not run concurrently
    * with other queries on the same session — all in-repo callers drive
    * their scope sequentially from one driver thread. Callers that
    * overlap independent jobs do so OUTSIDE any derived-shuffle scope. */
  def withDerivedShuffle[T](spark: SparkSession, rows: Long,
                            rowsPerPartition: Long = 25000L,
                            codegenOff: Boolean = false)
                           (body: => T): T = {
    val sessionParts = spark.conf.getOption(SpKey)
      .flatMap(v => Try(v.trim.toInt).toOption)
    val derived = derivedWidth(spark, rows, rowsPerPartition)
    val active = (sessionParts, derived) match {
      case (Some(sp), Some(d)) => d < sp
      case _ => false
    }
    if (!active) body
    else {
      val keys = Seq(SpKey, AqeKey) ++
        (if (codegenOff) Seq(WscKey, CgfKey) else Nil)
      val saved = keys.map(k => k -> spark.conf.getOption(k))
      spark.conf.set(SpKey, derived.get.toString)
      spark.conf.set(AqeKey, "false")
      if (codegenOff) {
        spark.conf.set(WscKey, "false")
        spark.conf.set(CgfKey, "NO_CODEGEN")
      }
      try body
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }
}
