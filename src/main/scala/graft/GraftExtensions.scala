package graft

import graft.functions.{CosineSim, TokenCount}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

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
      }))

  /** Imperative registration on an already-built session (tests, REPLs —
    * `spark.sql.extensions` only applies at session construction). */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(
        FunctionIdentifier(name), info, builder)
    }
}
