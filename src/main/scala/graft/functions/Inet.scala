package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** IPv4 inet/cidr type surface (reference
  * `src/backend/utils/adt/network.c:309-816` — inet_set_masklen,
  * network_sub/subeq, network_host, network_broadcast, network_network,
  * network_hostmask): addresses travel as their PG text form
  * (`a.b.c.d` or `a.b.c.d/len`) and every operator is pure codegen
  * column algebra — parse to a 32-bit integer riding in a LONG, mask
  * with shifts, format back. No UDF, no state; at any scale these are
  * per-row constants inside whole-stage codegen.
  *
  * IPv6 is out of scope (the fixtures and the operator algebra are
  * IPv4); `family` returns 4 to make the limitation explicit.
  */
object Inet {

  /** Address part before any '/', as a string column. */
  def host(ip: Column): Column = substring_index(ip, "/", 1)

  /** Mask length: the '/n' suffix, or 32 for a bare address
    * (network.c ip_maskbits default for AF_INET). */
  def masklen(ip: Column): Column =
    when(ip.contains("/"), substring_index(ip, "/", -1).cast("int"))
      .otherwise(lit(32))

  /** Dotted quad -> 32-bit value in a LONG (unsigned-safe). */
  def ipLong(ip: Column): Column =
    aggregate(split(host(ip), "\\."), lit(0L),
      (acc, oct) => acc * 256L + oct.cast("long"))

  /** 32-bit value -> dotted quad. */
  def longIp(v: Column): Column =
    concat_ws(".",
      shiftright(v, 24).bitwiseAND(255L).cast("string"),
      shiftright(v, 16).bitwiseAND(255L).cast("string"),
      shiftright(v, 8).bitwiseAND(255L).cast("string"),
      v.bitwiseAND(255L).cast("string"))

  /** Network mask of a masklen as a 32-bit LONG (len 0 -> 0). */
  def maskOf(len: Column): Column =
    when(len === 0, lit(0L))
      .otherwise(call_function("shiftleft", lit(0xffffffffL),
        (lit(32) - len).cast("int")).bitwiseAND(lit(0xffffffffL)))

  /** `network(inet)` — the address masked to its network, with the
    * mask length retained (network_network). */
  def network(ip: Column): Column = {
    val len = masklen(ip)
    concat(longIp(ipLong(ip).bitwiseAND(maskOf(len))), lit("/"),
      len.cast("string"))
  }

  /** `broadcast(inet)` — host bits set (network_broadcast). */
  def broadcast(ip: Column): Column = {
    val len = masklen(ip)
    concat(longIp(ipLong(ip)
        .bitwiseOR(maskOf(len).bitwiseXOR(lit(0xffffffffL)))),
      lit("/"), len.cast("string"))
  }

  /** `hostmask(inet)` (network_hostmask). */
  def hostmask(ip: Column): Column =
    longIp(maskOf(masklen(ip)).bitwiseXOR(lit(0xffffffffL)))

  /** `netmask(inet)`. */
  def netmask(ip: Column): Column = longIp(maskOf(masklen(ip)))

  /** `set_masklen(inet, n)` (inet_set_masklen: address bits kept). */
  def setMasklen(ip: Column, len: Int): Column =
    concat(host(ip), lit(s"/$len"))

  /** `inet << cidr` strict containment (network_sub): the left address
    * falls inside the right network AND the right mask is shorter. */
  def containedIn(ip: Column, net: Column): Column =
    containedInEq(ip, net) && masklen(net) < masklen(ip)

  /** `inet <<= cidr` (network_subeq). */
  def containedInEq(ip: Column, net: Column): Column = {
    val m = maskOf(masklen(net))
    masklen(net) <= masklen(ip) &&
      ipLong(ip).bitwiseAND(m) === ipLong(net).bitwiseAND(m)
  }

  /** `family(inet)` — 4; IPv6 unsupported (documented above). */
  def family(ip: Column): Column = lit(4)
}
