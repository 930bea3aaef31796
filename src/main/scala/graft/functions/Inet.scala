package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** inet/cidr type surface, both address families (reference
  * `src/backend/utils/adt/network.c:309-816` — inet_set_masklen,
  * network_sub/subeq, network_host, network_broadcast, network_network,
  * network_hostmask; the C code is family-generic over `ip_bits()`, and
  * so is [[InetOps]] here): addresses travel as their PG text form
  * (`a.b.c.d[/len]` or RFC-4291 `h:h::h[/len]`) and every operator is a
  * native codegen expression calling the static family-generic algebra —
  * parse to 128/32 bits, mask, format back (v6 output follows the
  * inet_net_ntop rules: lowercase hex, longest ≥2 zero-group run
  * compressed to `::`, `::a.b.c.d` / `::ffff:a.b.c.d` forms kept). No
  * UDF, no state; per-row constants inside whole-stage codegen.
  */
object Inet {

  /** Address part before any '/', as a string column. */
  def host(ip: Column): Column = {
    import org.apache.spark.sql.functions.substring_index
    substring_index(ip, "/", 1)
  }

  /** Mask length: the '/n' suffix, or the family width (32 / 128) for a
    * bare address (network.c ip_maskbits default). */
  def masklen(ip: Column): Column = call_function("inet_masklen", ip)

  /** `network(inet)` — the address masked to its network, with the
    * mask length retained (network_network). */
  def network(ip: Column): Column = call_function("inet_network", ip)

  /** `broadcast(inet)` — host bits set (network_broadcast). */
  def broadcast(ip: Column): Column = call_function("inet_broadcast", ip)

  /** `hostmask(inet)` (network_hostmask). */
  def hostmask(ip: Column): Column = call_function("inet_hostmask", ip)

  /** `netmask(inet)`. */
  def netmask(ip: Column): Column = call_function("inet_netmask", ip)

  /** `set_masklen(inet, n)` (inet_set_masklen: address bits kept). */
  def setMasklen(ip: Column, len: Int): Column = {
    import org.apache.spark.sql.functions.{concat, lit}
    concat(host(ip), lit(s"/$len"))
  }

  /** `inet << cidr` strict containment (network_sub): the left address
    * falls inside the right network AND the right mask is shorter. */
  def containedIn(ip: Column, net: Column): Column =
    call_function("inet_sub", ip, net)

  /** `inet <<= cidr` (network_subeq). */
  def containedInEq(ip: Column, net: Column): Column =
    call_function("inet_subeq", ip, net)

  /** `family(inet)` — 4 or 6 (network_family). */
  def family(ip: Column): Column = call_function("inet_family", ip)
}

/** Family-generic address algebra over the PG text form. Addresses are
  * 16-byte values (IPv4 occupies the low 4 bytes with nBytes = 4) —
  * the same shape as the reference's `inet_struct` + `ip_bits()`
  * dispatch. All methods are static so codegen calls them directly. */
object InetOps {

  private final case class Addr(bytes: Array[Byte], bits: Int, masklen: Int)

  private def parse(ip: String): Addr = {
    val slash = ip.indexOf('/')
    val host = if (slash < 0) ip else ip.substring(0, slash)
    val v6 = host.indexOf(':') >= 0
    val bits = if (v6) 128 else 32
    val len = if (slash < 0) bits else ip.substring(slash + 1).toInt
    require(len >= 0 && len <= bits, s"invalid mask length $len for: $ip")
    Addr(if (v6) parse6(host) else parse4(host), bits, len)
  }

  private def parse4(h: String): Array[Byte] = {
    val parts = h.split("\\.")
    require(parts.length == 4, s"invalid IPv4 address: $h")
    parts.map { p =>
      val v = p.toInt
      require(v >= 0 && v <= 255, s"invalid IPv4 octet in: $h")
      v.toByte
    }
  }

  /** RFC 4291 text → 16 bytes: `::` zero-compression and an embedded
    * dotted-quad tail both accepted (inet_net_pton_ipv6). */
  private def parse6(h: String): Array[Byte] = {
    def words(s: String): Array[Int] =
      if (s.isEmpty) Array.empty
      else s.split(":", -1).flatMap { g =>
        require(g.nonEmpty, s"invalid IPv6 address: $h")
        if (g.indexOf('.') >= 0) {
          val b = parse4(g)
          Array(((b(0) & 0xff) << 8) | (b(1) & 0xff),
            ((b(2) & 0xff) << 8) | (b(3) & 0xff))
        } else {
          val v = Integer.parseInt(g, 16)
          require(v >= 0 && v <= 0xffff, s"invalid IPv6 group in: $h")
          Array(v)
        }
      }
    val dc = h.indexOf("::")
    val (lw, rw) =
      if (dc >= 0) (words(h.substring(0, dc)), words(h.substring(dc + 2)))
      else (words(h), Array.empty[Int])
    val total = lw.length + rw.length
    require(if (dc >= 0) total < 8 || (total == 8 && lw.isEmpty && rw.isEmpty)
            else total == 8, s"invalid IPv6 address: $h")
    val w = new Array[Int](8)
    lw.copyToArray(w, 0)
    rw.copyToArray(w, 8 - rw.length)
    val out = new Array[Byte](16)
    var i = 0
    while (i < 8) {
      out(2 * i) = (w(i) >> 8).toByte
      out(2 * i + 1) = w(i).toByte
      i += 1
    }
    out
  }

  /** inet_net_ntop formatting: dotted quad, or RFC-5952-style hex with
    * the longest (leftmost on tie) run of ≥2 zero groups compressed and
    * the `::a.b.c.d` / `::ffff:a.b.c.d` embedded forms preserved. */
  private def format(a: Addr): String =
    if (a.bits == 32) a.bytes.map(b => (b & 0xff).toString).mkString(".")
    else {
      val w = (0 until 8).map(i =>
        ((a.bytes(2 * i) & 0xff) << 8) | (a.bytes(2 * i + 1) & 0xff))
      var bestBase = -1; var bestLen = 0
      var curBase = -1; var curLen = 0
      for (i <- 0 until 8) {
        if (w(i) == 0) {
          if (curBase < 0) { curBase = i; curLen = 1 } else curLen += 1
          if (curLen > bestLen) { bestBase = curBase; bestLen = curLen }
        } else curBase = -1
      }
      if (bestLen < 2) bestBase = -1
      val sb = new StringBuilder
      var i = 0
      while (i < 8) {
        if (bestBase == i) {
          sb ++= "::"
          i += bestLen
        } else {
          if (sb.nonEmpty && sb.charAt(sb.length - 1) != ':') sb += ':'
          // encapsulated IPv4 tail (inet_net_ntop_ipv6's special case)
          if (i == 6 && bestBase == 0 &&
              (bestLen == 6 || (bestLen == 5 && w(5) == 0xffff))) {
            sb ++= a.bytes.slice(12, 16).map(b => (b & 0xff).toString)
              .mkString(".")
            i = 8
          } else {
            sb ++= Integer.toHexString(w(i))
            i += 1
          }
        }
      }
      sb.toString
    }

  private def withLen(a: Addr, s: String): String = s + "/" + a.masklen

  /** Is bit `i` (MSB-first over the whole address) inside the mask? */
  private def maskedBytes(a: Addr, network: Boolean): Array[Byte] = {
    val n = a.bytes.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val bitsHere = math.min(8, math.max(0, a.masklen - 8 * i))
      val m = if (bitsHere == 0) 0 else (0xff << (8 - bitsHere)) & 0xff
      out(i) =
        if (network) (a.bytes(i) & m).toByte
        else (a.bytes(i) | (~m & 0xff)).toByte
      i += 1
    }
    out
  }

  private def maskBytes(a: Addr, inverted: Boolean): Array[Byte] = {
    val n = a.bytes.length
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val bitsHere = math.min(8, math.max(0, a.masklen - 8 * i))
      val m = if (bitsHere == 0) 0 else (0xff << (8 - bitsHere)) & 0xff
      out(i) = (if (inverted) ~m & 0xff else m).toByte
      i += 1
    }
    out
  }

  // ---- static entry points (called from generated code) ----

  def host(ip: String): String = {
    val slash = ip.indexOf('/')
    if (slash < 0) ip else ip.substring(0, slash)
  }

  def masklen(ip: String): Int = parse(ip).masklen

  def family(ip: String): Int = if (parse(ip).bits == 128) 6 else 4

  def network(ip: String): String = {
    val a = parse(ip)
    withLen(a, format(a.copy(bytes = maskedBytes(a, network = true))))
  }

  def broadcast(ip: String): String = {
    val a = parse(ip)
    withLen(a, format(a.copy(bytes = maskedBytes(a, network = false))))
  }

  def netmask(ip: String): String = {
    val a = parse(ip)
    format(a.copy(bytes = maskBytes(a, inverted = false)))
  }

  def hostmask(ip: String): String = {
    val a = parse(ip)
    format(a.copy(bytes = maskBytes(a, inverted = true)))
  }

  /** network_sub/subeq: same family, left mask not shorter (strictly
    * longer for `<<`), left address inside the right network. */
  def contains(ip: String, net: String, strict: Boolean): Boolean = {
    val a = parse(ip)
    val n = parse(net)
    if (a.bits != n.bits) return false // cross-family: never contained
    if (if (strict) n.masklen >= a.masklen else n.masklen > a.masklen)
      return false
    val netMasked = maskedBytes(n, network = true)
    val ipMasked = maskedBytes(a.copy(masklen = n.masklen), network = true)
    java.util.Arrays.equals(netMasked, ipMasked)
  }
}

/** String→string inet operator as a codegen-native unary expression. */
case class InetStrOp(child: Expression, name: String) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = name

  override protected def nullSafeEval(v: Any): Any = UTF8String.fromString(
    eval0(v.asInstanceOf[UTF8String].toString))

  private def eval0(s: String): String = name match {
    case "host" => InetOps.host(s)
    case "network" => InetOps.network(s)
    case "broadcast" => InetOps.broadcast(s)
    case "netmask" => InetOps.netmask(s)
    case "hostmask" => InetOps.hostmask(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.InetOps.$name($c.toString()))")

  override protected def withNewChildInternal(newChild: Expression): InetStrOp =
    copy(child = newChild)
}

/** String→int inet operator (masklen, family). */
case class InetIntOp(child: Expression, name: String) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = name

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    if (name == "masklen") InetOps.masklen(s) else InetOps.family(s)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.InetOps.$name($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): InetIntOp =
    copy(child = newChild)
}

/** `<<` / `<<=` containment (network_sub / network_subeq). */
case class InetContains(left: Expression, right: Expression, strict: Boolean)
  extends BinaryExpression {
  override def dataType: DataType = BooleanType
  override def prettyName: String = if (strict) "inet_sub" else "inet_subeq"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    InetOps.contains(a.asInstanceOf[UTF8String].toString,
      b.asInstanceOf[UTF8String].toString, strict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.InetOps.contains($a.toString(), $b.toString(), $strict)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): InetContains =
    copy(left = newLeft, right = newRight)
}
