package graft

import graft.functions.{AggFunctions, CosineSim, IndexUnionAgg, TokenCount}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.GraftAggShims
import org.apache.spark.sql.classic.GraftColumnShims

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
          foldableArg[Number](args(1), "collect_top_k", "k").intValue(),
          foldableArg[Boolean](args(2), "collect_top_k", "smallest"))
      }),
    ("index_set_union",
      new ExpressionInfo(IndexUnionAgg.getClass.getName, "index_set_union"),
      (args: Seq[Expression]) => {
        require(args.length == 1,
          "index_set_union(indices) takes one array<int> argument")
        import org.apache.spark.sql.catalyst.expressions.Cast
        import org.apache.spark.sql.types.{ArrayType, IntegerType}
        // unwrap the Aggregator's column form back to the BARE
        // ScalaAggregator so the analyzer's own wrapping (which honors
        // SQL DISTINCT / FILTER) applies
        import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
        val c = AggFunctions.indexSetUnion(GraftColumnShims.column(
          Cast(args.head, ArrayType(IntegerType))))
        GraftColumnShims.expression(c) match {
          case ae: AggregateExpression => ae.aggregateFunction
          case other => other
        }
      }))

  /** Evaluate a parameter that must be a plan-time constant. */
  private def foldableArg[T](e: Expression, fn: String, name: String): T = {
    require(e.foldable, s"$fn: $name must be a literal, got ${e.sql}")
    e.eval().asInstanceOf[T]
  }

  /** Imperative registration on an already-built session (tests, REPLs —
    * `spark.sql.extensions` only applies at session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
