package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Name-based UUIDs (reference `contrib/uuid-ossp/uuid-ossp.c:127-129,
  * 505` uuid_generate_v3/v5; RFC 4122 §4.3): hash the namespace
  * UUID's 16 bytes followed by the name, then stamp the version
  * nibble and the RFC variant bits. Deterministic — the property that
  * makes name-based UUIDs the stable-key tool for ETL — and pure
  * codegen column algebra: md5/sha1 builtins, hex-string surgery for
  * the two stamped nibbles. Pinned against the RFC's published
  * example vectors in ExpressionSpec.
  */
object UuidOssp {

  /** The RFC 4122 DNS namespace (uuid-ossp's uuid_ns_dns()). */
  val NamespaceDns = "6ba7b810-9dad-11d1-80b4-00c04fd430c8"

  private def hexNibble(h: Column, pos1: Int): Column =
    lower(conv(
      (conv(substring(h, pos1, 1), 16, 10).cast("int")
        .bitwiseAND(3).bitwiseOR(8)).cast("string"), 10, 16))

  private def stamp(h: Column, version: Char): Column =
    concat_ws("-",
      substring(h, 1, 8),
      substring(h, 9, 4),
      concat(lit(version.toString), substring(h, 14, 3)),
      concat(hexNibble(h, 17), substring(h, 18, 3)),
      substring(h, 21, 12))

  private def nsBytes(nsUuid: String): Column = {
    val hex = nsUuid.replace("-", "").toLowerCase
    require(hex.length == 32 && hex.forall(c =>
      (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f')),
      s"not a UUID: $nsUuid")
    unhex(lit(hex))
  }

  /** `uuid_generate_v3(namespace, name)` — md5-based. */
  def uuidV3(nsUuid: String, name: Column): Column =
    stamp(md5(concat(nsBytes(nsUuid), name.cast("binary"))), '3')

  /** `uuid_generate_v5(namespace, name)` — sha1-based (the RFC's
    * preferred variant; first 16 of the 20 digest bytes). */
  def uuidV5(nsUuid: String, name: Column): Column =
    stamp(sha1(concat(nsBytes(nsUuid), name.cast("binary"))), '5')
}
