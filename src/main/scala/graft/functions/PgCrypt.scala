package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, LeafExpression, Nondeterministic}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** pgcrypto password hashing — `crypt()` / `gen_salt()` (reference
  * `contrib/pgcrypto/pgcrypto.c:203` pg_gen_salt, `crypt-md5.c`): the
  * MD5-crypt scheme (`$1$<salt>$<hash>`), re-derived from the published
  * algorithm (Poul-Henning Kamp's md5crypt, as shipped in glibc and
  * pgcrypto) and pinned in ExpressionSpec against glibc's own crypt(3)
  * output. `crypt(pw, stored_hash)` re-hashes with the stored salt, so
  * the verify idiom `crypt(pw, h) = h` works unchanged.
  *
  * Scale posture: pure per-row CPU (1000 MD5 rounds — the scheme's
  * deliberate work factor), no shuffle, embarrassingly parallel.
  */
object Md5Crypt {

  private val itoa64 =
    "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  /** `$1$` MD5-crypt of `pw` with up to 8 salt chars (salt may be a
    * full stored hash — parsing stops at the next `$`). */
  def crypt(pw: String, saltSpec: String): String = {
    require(saltSpec.startsWith("$1$"),
      s"crypt: only the MD5 scheme ($$1$$) is supported, got: $saltSpec")
    val rest = saltSpec.substring(3)
    val salt = rest.substring(0, math.min(8,
      if (rest.indexOf('$') >= 0) rest.indexOf('$') else rest.length))
    val p = pw.getBytes(StandardCharsets.UTF_8)
    val s = salt.getBytes(StandardCharsets.UTF_8)
    val md = MessageDigest.getInstance("MD5")

    // alternate digest: md5(pw + salt + pw)
    md.update(p); md.update(s); md.update(p)
    val alt = md.digest()

    // main: pw + "$1$" + salt, then len(pw) bytes of alt, then the
    // bit-walk of len(pw) appending NUL or pw[0]
    md.reset()
    md.update(p)
    md.update("$1$".getBytes(StandardCharsets.UTF_8))
    md.update(s)
    var i = p.length
    while (i > 0) { md.update(alt, 0, math.min(16, i)); i -= 16 }
    i = p.length
    while (i > 0) {
      if ((i & 1) != 0) md.update(0.toByte)
      else md.update(if (p.nonEmpty) p(0) else 0.toByte)
      i >>= 1
    }
    var digest = md.digest()

    // 1000 strengthening rounds with the published update schedule
    var r = 0
    while (r < 1000) {
      md.reset()
      if ((r & 1) != 0) md.update(p) else md.update(digest)
      if (r % 3 != 0) md.update(s)
      if (r % 7 != 0) md.update(p)
      if ((r & 1) != 0) md.update(digest) else md.update(p)
      digest = md.digest()
      r += 1
    }

    def b(j: Int): Int = digest(j) & 0xff
    val out = new StringBuilder("$1$").append(salt).append('$')
    def to64(v0: Long, n: Int): Unit = {
      var v = v0
      var k = 0
      while (k < n) { out.append(itoa64((v & 0x3f).toInt)); v >>= 6; k += 1 }
    }
    to64((b(0) << 16) | (b(6) << 8) | b(12), 4)
    to64((b(1) << 16) | (b(7) << 8) | b(13), 4)
    to64((b(2) << 16) | (b(8) << 8) | b(14), 4)
    to64((b(3) << 16) | (b(9) << 8) | b(15), 4)
    to64((b(4) << 16) | (b(10) << 8) | b(5), 4)
    to64(b(11).toLong, 2)
    out.toString
  }

  /** `gen_salt('md5')`: `$1$` + 8 random chars of the crypt alphabet. */
  def genSalt(rng: java.util.Random): String = {
    val sb = new StringBuilder("$1$")
    var k = 0
    while (k < 8) { sb.append(itoa64(rng.nextInt(64))); k += 1 }
    sb.append('$').toString
  }
}

/** `crypt(password, salt_or_hash)` expression, dispatching on the salt
  * prefix like the reference's px-crypt.c:86-110 scheme table: `$1$` →
  * MD5-crypt, `$2a/b/y$` → bcrypt, `_` → BSDi extended DES, anything
  * else → traditional DES crypt (the table's fallback row). Digest
  * rounds dominate the cost, so interpreted eval (CodegenFallback) is
  * not the bottleneck. */
case class Crypt(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "crypt"

  override def nullSafeEval(pw: Any, salt: Any): Any = {
    val p = pw.asInstanceOf[UTF8String].toString
    val s = salt.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      if (s.startsWith("$2")) BcryptAlg.crypt(p, s)
      else if (s.startsWith("$1$")) Md5Crypt.crypt(p, s)
      else if (s.startsWith("_")) DesCrypt.xcrypt(p, s)
      else DesCrypt.crypt(p, s))
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Crypt =
    copy(left = newLeft, right = newRight)
}

/** `gen_salt('des' | 'xdes' | 'md5' | 'bf')` — nondeterministic, like
  * pgcrypto's (each call draws a fresh salt; results are validated via
  * the roundtrip idiom, never by value). */
case class GenSalt(scheme: String) extends LeafExpression
    with Nondeterministic with CodegenFallback {

  require(Set("des", "xdes", "md5", "bf").contains(scheme),
    s"gen_salt: supported schemes are 'des', 'xdes', 'md5', 'bf', got: $scheme")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "gen_salt"

  @transient private var rng: java.util.Random = _

  override protected def initializeInternal(partitionIndex: Int): Unit =
    rng = new java.security.SecureRandom()

  override protected def evalInternal(input: InternalRow): Any =
    UTF8String.fromString(scheme match {
      case "bf" => BcryptAlg.genSalt(rng)
      case "md5" => Md5Crypt.genSalt(rng)
      case "xdes" => DesCrypt.genSaltExtended(rng)
      case _ => DesCrypt.genSalt(rng)
    })
}
