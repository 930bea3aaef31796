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
    * 0 if absent (byteapos). Byte-aligned compare of each candidate
    * window; the sequence is empty when sub is longer than b. */
  def bytePosition(b: Column, sub: Column): Column = {
    val span = octet_length(b) - octet_length(sub) + 1
    coalesce(
      try_element_at(
        filter(
          when(span >= 1, sequence(lit(1), span))
            .otherwise(array().cast("array<int>")),
          i => call_function("substring", b, i, octet_length(sub)) === sub),
        lit(1)),
      lit(0))
  }
}
