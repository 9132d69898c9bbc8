package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: whitespace-token count in one byte scan.
  *
  * Exactly `size(split(trim(s), "\\s+"))` — including Java split's
  * retained leading/trailing empty fields and `trim`'s space-only
  * stripping — but without compiling a regex, materializing the token
  * array, or leaving whole-stage codegen. All of `\s` is ASCII, so a
  * byte scan is correct on UTF-8 (multi-byte codepoints never collide
  * with ASCII values). This is the hot primitive under token counting,
  * shingle-count arithmetic, and corpus length filters: at 100 TB the
  * difference between "scan the bytes once" and "regex-split into an
  * array per row" is the scan's whole materialization cost.
  */
case class TokenCount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "token_count"

  override protected def nullSafeEval(input: Any): Any =
    TokenCountImpl.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TokenCountImpl.count($c)")

  override protected def withNewChildInternal(newChild: Expression)
  : TokenCount = copy(child = newChild)
}

object TokenCountImpl {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** Field count of `split(trim(s), "\\s+")`: non-whitespace runs, plus
    * one empty field if the space-trimmed string starts (ends) with a
    * non-space whitespace char; 0 for the empty trimmed string. */
  def count(s: UTF8String): Int = {
    val n = s.numBytes()
    var from = 0
    var to = n
    // trim() strips 0x20 only
    while (from < to && s.getByte(from) == ' ') from += 1
    while (to > from && s.getByte(to - 1) == ' ') to -= 1
    if (from >= to) return 0
    var c = 0
    if (isWs(s.getByte(from))) c += 1 // leading empty field
    if (isWs(s.getByte(to - 1))) c += 1 // trailing empty field
    var i = from
    var inRun = false
    while (i < to) {
      val ws = isWs(s.getByte(i))
      if (!ws && !inRun) { c += 1; inRun = true }
      else if (ws) inRun = false
      i += 1
    }
    c
  }
}
