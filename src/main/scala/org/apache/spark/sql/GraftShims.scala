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

    /** The BARE aggregate function, for FunctionRegistry builders: the
      * analyzer wraps a registered AggregateFunction in its own
      * AggregateExpression (and that path is what honors SQL-side
      * DISTINCT / FILTER clauses), so the SQL registration must NOT
      * pre-wrap. */
    def collectTopKFn(child: Expression, num: Int,
                      reverse: Boolean): Expression =
      CollectTopK(child, num, reverse)
  }
}

package org.apache.spark.sql.catalyst.expressions {

  import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

  /** BloomFilterAggregate / BloomFilterMightContain power Spark's own
    * runtime row-group filtering but are not SQL-registered; exposing
    * them gives the library the explicit semi-join-pruning pattern
    * (build a bloom of the small side's keys, pre-filter the big scan)
    * without reimplementing a sketch Spark already ships. */
  object GraftBloomShims {
    /** Aggregate: bloom filter over xxhash64 values (LongType child). */
    def bloomAgg(child: Expression, estimatedItems: Long,
                 numBits: Long): Expression =
      new BloomFilterAggregate(child, Literal(estimatedItems),
        Literal(numBits)).toAggregateExpression()

    /** Predicate: membership probe against a built bloom filter.
      * `might_contain` requires the bloom side to be constant-foldable,
      * so the one-row bloom aggregate rides in as a scalar subquery —
      * exactly how Spark's own InjectRuntimeFilter wires it. */
    def mightContain(bloomAgg: org.apache.spark.sql.Dataset[_],
                     value: Expression): Expression =
      BloomFilterMightContain(
        ScalarSubquery(bloomAgg.queryExecution.analyzed), value)
  }
}

package org.apache.spark.sql.execution.aggregate {

  import org.apache.spark.sql.catalyst.expressions.Expression
  import org.apache.spark.sql.expressions.{UserDefinedAggregator, UserDefinedFunction}

  object GraftUdafShims {
    /** The BARE ScalaAggregator for a typed Aggregator UDAF, for
      * FunctionRegistry builders. Round-tripping through `Column`
      * (`udaf(...).apply(col)` then unwrapping) does NOT work on Spark 4
      * classic: the converter hands back a lazy Unevaluable
      * ColumnNodeExpression, which dies at codegen if registered verbatim.
      * `ScalaAggregator(uda, children)` is the converter Spark's own
      * `UDFRegistration.register(name, udaf)` path uses; returning the
      * bare function lets the analyzer do its own AggregateExpression
      * wrapping, which is the path that honors SQL DISTINCT / FILTER. */
    def scalaAggregator(udf: UserDefinedFunction,
                        children: Seq[Expression]): Expression = udf match {
      case uda: UserDefinedAggregator[_, _, _] =>
        ScalaAggregator(uda, children)
      case other => throw new IllegalArgumentException(
        s"scalaAggregator expects a UserDefinedAggregator, got " +
          s"${other.getClass.getName}")
    }
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
