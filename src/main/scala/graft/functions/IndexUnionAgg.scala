package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** U5: distributed union of per-row integer index sets, as a standalone
  * DataFrame aggregate — the same fold the random-effect subspace
  * projection (P4/A8) performs group-locally when it unions each entity's
  * active feature indices (reference RandomEffectDataset.scala:417-424
  * folds per-sample index sets into one entity-level set).
  *
  * The buffer is a growable bitmap (`Array[Byte]`): `reduce` sets one bit
  * per index, `merge` is a byte-wise OR, `finish` walks the bytes once and
  * emits the sorted distinct indices. A partial (map-side) buffer is
  * ceil(maxIndex/8) bytes regardless of the group's row count, so a hot
  * group shuffles one vocabulary-sized bitmap per task — never its row
  * set. `collect_set` by contrast carries every element of every partial
  * buffer through the shuffle; at a 10⁶-feature vocabulary the bitmap is a
  * fixed 125 KB while the set grows with the data.
  *
  * Indices must be non-negative (feature indices are); nulls — the row and
  * individual elements — are ignored, matching SQL aggregate semantics.
  */
object IndexUnionAgg extends Aggregator[Seq[Integer], Array[Byte], Array[Int]] {

  override def zero: Array[Byte] = Array.emptyByteArray

  private def grown(buf: Array[Byte], idx: Int): Array[Byte] = {
    val need = (idx >> 3) + 1
    if (buf.length >= need) buf
    else {
      // double instead of exact-fit so n inserts cost O(n), not O(n²)
      val next = new Array[Byte](math.max(need, buf.length * 2))
      System.arraycopy(buf, 0, next, 0, buf.length)
      next
    }
  }

  override def reduce(buf: Array[Byte], row: Seq[Integer]): Array[Byte] = {
    if (row == null) return buf
    var b = buf
    row.foreach { boxed =>
      if (boxed != null) {
        val i = boxed.intValue()
        require(i >= 0, s"indexSetUnion: negative index $i")
        b = grown(b, i)
        b(i >> 3) = (b(i >> 3) | (1 << (i & 7))).toByte
      }
    }
    b
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val (hi, lo) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < lo.length) { hi(i) = (hi(i) | lo(i)).toByte; i += 1 }
    hi
  }

  override def finish(buf: Array[Byte]): Array[Int] = {
    val out = Array.newBuilder[Int]
    var w = 0
    while (w < buf.length) {
      var bits = buf(w) & 0xff
      while (bits != 0) {
        out += (w << 3) + java.lang.Integer.numberOfTrailingZeros(bits)
        bits &= bits - 1
      }
      w += 1
    }
    out.result()
  }

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder()
}
