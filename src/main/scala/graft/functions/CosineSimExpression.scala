package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native Catalyst expression: cosine similarity of two
  * `array<double>` columns in one compiled pass.
  *
  * Replaces the Scala-UDF kernel behind [[VectorOps.cosine]]: a UDF
  * breaks whole-stage codegen and pays an ArrayData→Seq[Double]
  * conversion (one boxed element per dimension) on EVERY scored pair —
  * on the ANN and semantic-dedup candidate joins that conversion is
  * pure overhead on the hottest loop in the repo. This expression reads
  * the unsafe array buffer directly (`getDouble(i)`) and participates
  * in whole-stage codegen, so the scoring join compiles into one fused
  * loop with no allocation per pair.
  *
  * Arithmetic is IDENTICAL to the UDF it replaces — the three
  * accumulators (dot, ‖a‖², ‖b‖²) are independent left-to-right double
  * sums and the result is `d / sqrt(na·nb)` — so every oracle hash
  * downstream is unchanged (spec-pinned equal to the HOF formulation).
  * Mismatched lengths yield NULL, matching the UDF's guard; a null
  * ELEMENT also yields NULL — `getDouble` on a null slot would read
  * undefined buffer bytes and emit silent garbage scores, a worse
  * failure than the loud NPE the UDF it replaced produced (dense
  * embedding columns never hit this branch, so the check costs one
  * predictable test per element inside the fused loop).
  */
case class CosineSim(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  // the kernel reads raw 8-byte doubles off the array buffer — a
  // mistyped child would yield garbage values, not an error, so the
  // analyzer must REJECT anything but array<double> here (the
  // Column-API wrapper casts explicitly; the SQL registration wraps
  // its arguments in Cast for the same coercion)
  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "cosine_sim requires array<double> inputs, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var d = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        if (x.isNullAt(i) || y.isNullAt(i)) return null
        val xi = x.getDouble(i); val yi = y.getDouble(i)
        d += xi * yi; na += xi * xi; nb += yi * yi
        i += 1
      }
      java.lang.Double.valueOf(d / math.sqrt(na * nb))
    }
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $d = 0.0; double $na = 0.0; double $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true; break;
         |    }
         |    final double $x = $a.getDouble($i);
         |    final double $y = $b.getDouble($i);
         |    $d += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $d / java.lang.Math.sqrt($na * $nb);
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}
