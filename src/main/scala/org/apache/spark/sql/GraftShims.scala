// Bridge shims: the Catalyst aggregate CollectTopK and the classic
// Column<->Expression converters are package-private in Spark 4. Exposing
// them from inside the package namespace is the standard Spark-extension
// pattern (the alternative — reimplementing a bounded-heap
// TypedImperativeAggregate — would duplicate battle-tested Spark code).
package org.apache.spark.sql.catalyst.expressions.aggregate {

  import org.apache.spark.sql.catalyst.expressions.Expression

  object GraftAggShims {
    /** CollectTopK(child, k, reverse).toAggregateExpression(): a
      * partial-aggregation-capable bounded priority queue — `reverse=true`
      * keeps the k smallest values, eval returns them ascending. */
    def collectTopK(child: Expression, num: Int,
                    reverse: Boolean): Expression =
      CollectTopK(child, num, reverse).toAggregateExpression()
  }
}

package org.apache.spark.sql.classic {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.catalyst.expressions.Expression

  object GraftColumnShims {
    def column(e: Expression): Column = ExpressionUtils.column(e)
    def expression(c: Column): Expression = ExpressionUtils.expression(c)
  }
}
