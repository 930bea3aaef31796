package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** bytea byte-level functions (reference
  * `src/backend/utils/adt/varlena.c:1878-2239` — byteaoctetlen,
  * byteapos, byteaGetByte, byteaSetByte; `encode.c` for hex/base64):
  * Spark's BinaryType supports length/substring/overlay/hex/base64
  * natively; the byte accessors compose them — a one-byte substring
  * read back through hex, an overlay for the write. All codegen
  * builtins, per-row constant work.
  *
  * Indexes are 0-based, PG's bytea convention (unlike its 1-based
  * strings — `get_byte('\x1234', 0)` is 0x12).
  */
object Bytea {

  /** `get_byte(b, i)` — the i-th byte as int (0-based). */
  def getByte(b: Column, i: Int): Column =
    conv(hex(substring(b, i + 1, 1)), 16, 10).cast("int")

  /** `set_byte(b, i, v)` — b with byte i replaced (0-based). */
  def setByte(b: Column, i: Int, v: Int): Column = {
    require(v >= 0 && v <= 255, s"byte value out of range: $v")
    overlay(b, unhex(lit(f"$v%02X")), lit(i + 1))
  }

  /** `position(sub IN b)` — 1-based offset of the first occurrence,
    * 0 if absent (byteapos). Codegen-native expression (was a
    * filter-over-sequence HOF — interpreted per row). */
  def bytePosition(b: Column, sub: Column): Column =
    call_function("byte_position", b, sub)

  /** Runtime of [[BytePosition]] — a plain byte-window search. */
  def bytePositionData(b: Array[Byte], sub: Array[Byte]): Int = {
    val span = b.length - sub.length
    var i = 0
    while (i <= span) {
      var j = 0
      while (j < sub.length && b(i + j) == sub(j)) j += 1
      if (j == sub.length) return i + 1
      i += 1
    }
    0
  }
}

/** `position(sub IN bytea)` as a codegen-native binary expression. */
case class BytePosition(
    left: org.apache.spark.sql.catalyst.expressions.Expression,
    right: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "byte_position"

  override protected def nullSafeEval(b: Any, sub: Any): Any =
    Bytea.bytePositionData(
      b.asInstanceOf[Array[Byte]], sub.asInstanceOf[Array[Byte]])

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, (b, s) =>
      s"graft.functions.Bytea.bytePositionData($b, $s)")

  override protected def withNewChildrenInternal(
      newLeft: org.apache.spark.sql.catalyst.expressions.Expression,
      newRight: org.apache.spark.sql.catalyst.expressions.Expression): BytePosition =
    copy(left = newLeft, right = newRight)
}
