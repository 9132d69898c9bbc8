package graft

import graft.functions.{AggFunctions, CosineSim, IndexUnionAgg, TokenCount}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggShims
import org.apache.spark.sql.execution.aggregate.GraftUdafShims

/** SparkSessionExtensions hook: registers the library's native Catalyst
  * expressions as SQL functions, so pure-SQL users (spark-sql shells,
  * JDBC, notebooks) get them without touching the Scala API.
  *
  * Activate per cluster with
  * `--conf spark.sql.extensions=graft.GraftExtensions`, or imperatively
  * on an existing session via [[GraftExtensions.register]].
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {
  private val functions: Seq[(String, ExpressionInfo,
    Seq[Expression] => Expression)] = Seq(
    ("token_count",
      new ExpressionInfo(classOf[TokenCount].getName, "token_count"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "token_count(text) takes one argument")
        TokenCount(args.head)
      }),
    ("cosine_sim",
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2,
          "cosine_sim(a, b) takes two array<double> arguments")
        // explicit element-type coercion (array<int> literals etc.):
        // the expression itself REJECTS non-double arrays because its
        // kernel reads raw double buffers; un-castable arguments fail
        // in the analyzer instead
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, DoubleType}
        CosineSim(Cast(args.head, ArrayType(DoubleType)),
          Cast(args(1), ArrayType(DoubleType)))
      }),
    ("collect_top_k",
      new ExpressionInfo("org.apache.spark.sql.catalyst.expressions." +
        "aggregate.CollectTopK", "collect_top_k"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "collect_top_k(expr, k, smallest) takes three arguments")
        // k and smallest parameterize the aggregate's bounded heap, so
        // they must be plan-time constants — same contract as Spark's
        // own approx_percentile(accuracy)
        GraftAggShims.collectTopKFn(args.head,
          intArg(args(1), "collect_top_k", "k"),
          boolArg(args(2), "collect_top_k", "smallest"))
      }),
    ("index_set_union",
      new ExpressionInfo(IndexUnionAgg.getClass.getName, "index_set_union"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "index_set_union(indices) takes one array<int> argument")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, IntegerType}
        // the BARE ScalaAggregator (not the Aggregator's Column form —
        // on Spark 4 classic that unwraps to an Unevaluable
        // ColumnNodeExpression): the analyzer does its own
        // AggregateExpression wrapping, which honors SQL DISTINCT/FILTER
        GraftUdafShims.scalaAggregator(AggFunctions.indexUnionUdaf,
          Seq(Cast(args.head, ArrayType(IntegerType))))
      }))

  /** Evaluate a parameter that must be a non-null plan-time constant. */
  private def foldableArg(e: Expression, fn: String, name: String): Any = {
    require(e.foldable, s"$fn: $name must be a literal, got ${e.sql}")
    val v = e.eval()
    require(v != null, s"$fn: $name must be a non-null literal")
    v
  }

  /** An integral literal parameter — fractional numerics (2.5, 2.0) are
    * rejected rather than silently truncated. */
  private def intArg(e: Expression, fn: String, name: String): Int =
    foldableArg(e, fn, name) match {
      case n: java.lang.Integer => n.intValue()
      case n: java.lang.Short   => n.intValue()
      case n: java.lang.Byte    => n.intValue()
      case n: java.lang.Long =>
        require(n.longValue() == n.intValue().toLong,
          s"$fn: $name overflows Int: $n")
        n.intValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be an integral literal, got $other")
    }

  private def boolArg(e: Expression, fn: String, name: String): Boolean =
    foldableArg(e, fn, name) match {
      case b: java.lang.Boolean => b.booleanValue()
      case other => throw new IllegalArgumentException(
        s"$fn: $name must be a boolean literal, got $other")
    }

  /** Imperative registration on an already-built session (tests, REPLs —
    * `spark.sql.extensions` only applies at session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
