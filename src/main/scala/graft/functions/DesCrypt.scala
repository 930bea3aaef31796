package graft.functions

import java.nio.charset.StandardCharsets

/** Traditional DES-crypt and BSDi extended (`_`-prefixed, "XDES")
  * crypt(3) schemes — the two remaining entries of the reference's
  * scheme dispatch table (`contrib/pgcrypto/px-crypt.c:86-110`,
  * implemented there by `crypt-des.c`, itself derived from FreeSec).
  *
  * Re-derived here from public specifications only: FIPS 46-3 DES
  * (tables below are the published IP/E/P/S/PC1/PC2 values) plus the
  * documented crypt(3) modifications — password bytes shifted left one
  * bit form the key, the 12-bit (traditional) or 24-bit (extended)
  * salt swaps paired E-expansion bit columns, and the all-zero block
  * is encrypted 25 (or the setting's encoded count) times. Output is
  * the 64-bit result in 11 six-bit crypt-alphabet chars, MSB first.
  * Pinned against libcrypt known-answer vectors in ExpressionSpec.
  *
  * Scale posture: pure per-row CPU, no shuffle; the bit-permutation
  * DES here favors obvious-correctness over table-fused speed — the
  * scheme's work factor (25–725 block encryptions) dominates either
  * way, exactly as in the reference.
  */
object DesCrypt {

  private val itoa64 =
    "./0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"

  private def a64(c: Char): Int = {
    val i = itoa64.indexOf(c)
    require(i >= 0, s"crypt: invalid salt character '$c'")
    i
  }

  // FIPS 46-3 tables; entries are 1-based input bit positions, MSB = 1.
  private val IP = Array(
    58, 50, 42, 34, 26, 18, 10, 2, 60, 52, 44, 36, 28, 20, 12, 4,
    62, 54, 46, 38, 30, 22, 14, 6, 64, 56, 48, 40, 32, 24, 16, 8,
    57, 49, 41, 33, 25, 17, 9, 1, 59, 51, 43, 35, 27, 19, 11, 3,
    61, 53, 45, 37, 29, 21, 13, 5, 63, 55, 47, 39, 31, 23, 15, 7)
  private val FP = Array(
    40, 8, 48, 16, 56, 24, 64, 32, 39, 7, 47, 15, 55, 23, 63, 31,
    38, 6, 46, 14, 54, 22, 62, 30, 37, 5, 45, 13, 53, 21, 61, 29,
    36, 4, 44, 12, 52, 20, 60, 28, 35, 3, 43, 11, 51, 19, 59, 27,
    34, 2, 42, 10, 50, 18, 58, 26, 33, 1, 41, 9, 49, 17, 57, 25)
  private val EXP = Array(
    32, 1, 2, 3, 4, 5, 4, 5, 6, 7, 8, 9, 8, 9, 10, 11, 12, 13,
    12, 13, 14, 15, 16, 17, 16, 17, 18, 19, 20, 21, 20, 21, 22, 23, 24, 25,
    24, 25, 26, 27, 28, 29, 28, 29, 30, 31, 32, 1)
  private val PBOX = Array(
    16, 7, 20, 21, 29, 12, 28, 17, 1, 15, 23, 26, 5, 18, 31, 10,
    2, 8, 24, 14, 32, 27, 3, 9, 19, 13, 30, 6, 22, 11, 4, 25)
  private val PC1 = Array(
    57, 49, 41, 33, 25, 17, 9, 1, 58, 50, 42, 34, 26, 18,
    10, 2, 59, 51, 43, 35, 27, 19, 11, 3, 60, 52, 44, 36,
    63, 55, 47, 39, 31, 23, 15, 7, 62, 54, 46, 38, 30, 22,
    14, 6, 61, 53, 45, 37, 29, 21, 13, 5, 28, 20, 12, 4)
  private val PC2 = Array(
    14, 17, 11, 24, 1, 5, 3, 28, 15, 6, 21, 10,
    23, 19, 12, 4, 26, 8, 16, 7, 27, 20, 13, 2,
    41, 52, 31, 37, 47, 55, 30, 40, 51, 45, 33, 48,
    44, 49, 39, 56, 34, 53, 46, 42, 50, 36, 29, 32)
  private val SHIFTS = Array(1, 1, 2, 2, 2, 2, 2, 2, 1, 2, 2, 2, 2, 2, 2, 1)
  // S-boxes, row-major (row * 16 + column)
  private val SBOX: Array[Array[Int]] = Array(
    Array(14, 4, 13, 1, 2, 15, 11, 8, 3, 10, 6, 12, 5, 9, 0, 7,
      0, 15, 7, 4, 14, 2, 13, 1, 10, 6, 12, 11, 9, 5, 3, 8,
      4, 1, 14, 8, 13, 6, 2, 11, 15, 12, 9, 7, 3, 10, 5, 0,
      15, 12, 8, 2, 4, 9, 1, 7, 5, 11, 3, 14, 10, 0, 6, 13),
    Array(15, 1, 8, 14, 6, 11, 3, 4, 9, 7, 2, 13, 12, 0, 5, 10,
      3, 13, 4, 7, 15, 2, 8, 14, 12, 0, 1, 10, 6, 9, 11, 5,
      0, 14, 7, 11, 10, 4, 13, 1, 5, 8, 12, 6, 9, 3, 2, 15,
      13, 8, 10, 1, 3, 15, 4, 2, 11, 6, 7, 12, 0, 5, 14, 9),
    Array(10, 0, 9, 14, 6, 3, 15, 5, 1, 13, 12, 7, 11, 4, 2, 8,
      13, 7, 0, 9, 3, 4, 6, 10, 2, 8, 5, 14, 12, 11, 15, 1,
      13, 6, 4, 9, 8, 15, 3, 0, 11, 1, 2, 12, 5, 10, 14, 7,
      1, 10, 13, 0, 6, 9, 8, 7, 4, 15, 14, 3, 11, 5, 2, 12),
    Array(7, 13, 14, 3, 0, 6, 9, 10, 1, 2, 8, 5, 11, 12, 4, 15,
      13, 8, 11, 5, 6, 15, 0, 3, 4, 7, 2, 12, 1, 10, 14, 9,
      10, 6, 9, 0, 12, 11, 7, 13, 15, 1, 3, 14, 5, 2, 8, 4,
      3, 15, 0, 6, 10, 1, 13, 8, 9, 4, 5, 11, 12, 7, 2, 14),
    Array(2, 12, 4, 1, 7, 10, 11, 6, 8, 5, 3, 15, 13, 0, 14, 9,
      14, 11, 2, 12, 4, 7, 13, 1, 5, 0, 15, 10, 3, 9, 8, 6,
      4, 2, 1, 11, 10, 13, 7, 8, 15, 9, 12, 5, 6, 3, 0, 14,
      11, 8, 12, 7, 1, 14, 2, 13, 6, 15, 0, 9, 10, 4, 5, 3),
    Array(12, 1, 10, 15, 9, 2, 6, 8, 0, 13, 3, 4, 14, 7, 5, 11,
      10, 15, 4, 2, 7, 12, 9, 5, 6, 1, 13, 14, 0, 11, 3, 8,
      9, 14, 15, 5, 2, 8, 12, 3, 7, 0, 4, 10, 1, 13, 11, 6,
      4, 3, 2, 12, 9, 5, 15, 10, 11, 14, 1, 7, 6, 0, 8, 13),
    Array(4, 11, 2, 14, 15, 0, 8, 13, 3, 12, 9, 7, 5, 10, 6, 1,
      13, 0, 11, 7, 4, 9, 1, 10, 14, 3, 5, 12, 2, 15, 8, 6,
      1, 4, 11, 13, 12, 3, 7, 14, 10, 15, 6, 8, 0, 5, 9, 2,
      6, 11, 13, 8, 1, 4, 10, 7, 9, 5, 0, 15, 14, 2, 3, 12),
    Array(13, 2, 8, 4, 6, 15, 11, 1, 10, 9, 3, 14, 5, 0, 12, 7,
      1, 15, 13, 8, 10, 3, 7, 4, 12, 5, 6, 11, 0, 14, 9, 2,
      7, 11, 4, 1, 9, 12, 14, 2, 0, 6, 10, 13, 15, 3, 5, 8,
      2, 1, 14, 7, 4, 10, 8, 13, 15, 12, 9, 0, 3, 5, 6, 11))

  /** Gather `table.length` output bits from `in` (`inBits` wide). */
  private def permute(in: Long, table: Array[Int], inBits: Int): Long = {
    var out = 0L
    var i = 0
    while (i < table.length) {
      out <<= 1
      if (((in >>> (inBits - table(i))) & 1L) != 0) out |= 1L
      i += 1
    }
    out
  }

  /** 16 48-bit round subkeys from the 64-bit key. */
  private def subkeys(key: Long): Array[Long] = {
    val cd = permute(key, PC1, 64)
    var c = (cd >>> 28) & 0xfffffffL
    var d = cd & 0xfffffffL
    val ks = new Array[Long](16)
    var r = 0
    while (r < 16) {
      val sh = SHIFTS(r)
      c = ((c << sh) | (c >>> (28 - sh))) & 0xfffffffL
      d = ((d << sh) | (d >>> (28 - sh))) & 0xfffffffL
      ks(r) = permute((c << 28) | d, PC2, 56)
      r += 1
    }
    ks
  }

  /** crypt's salt perturbation mask: salt bit i (LSB-first) swaps
    * E-output bit i+1 with bit i+25 (FIPS MSB-first numbering) — as a
    * 24-bit column mask over the two expansion halves. */
  private def saltMask(salt: Int): Long = {
    var m = 0L
    var i = 0
    while (i < 24) {
      if (((salt >> i) & 1) != 0) m |= 0x800000L >>> i
      i += 1
    }
    m
  }

  /** `count` chained DES encryptions of `block` (crypt iterates the
    * full cipher; IP/FP cancel between iterations so this is the
    * reference's single-IP loop, spelled plainly). */
  private def encrypt(block: Long, ks: Array[Long], mask: Long,
                      count: Int): Long = {
    var b = block
    var c = count
    while (c > 0) {
      val ip = permute(b, IP, 64)
      var l = (ip >>> 32).toInt
      var r = ip.toInt
      var round = 0
      while (round < 16) {
        var e = permute(r.toLong & 0xffffffffL, EXP, 32)
        val swap = ((e >>> 24) ^ e) & mask // salt column swap
        e ^= (swap << 24) | swap
        e ^= ks(round)
        var sOut = 0
        var j = 0
        while (j < 8) {
          val six = ((e >>> (42 - 6 * j)) & 0x3f).toInt
          val row = ((six & 0x20) >>> 4) | (six & 1)
          val colv = (six >>> 1) & 0xf
          sOut = (sOut << 4) | SBOX(j)(row * 16 + colv)
          j += 1
        }
        val fOut = permute(sOut.toLong & 0xffffffffL, PBOX, 32).toInt
        val nl = r
        r = l ^ fOut
        l = nl
        round += 1
      }
      val pre = ((r.toLong & 0xffffffffL) << 32) | (l.toLong & 0xffffffffL)
      b = permute(pre, FP, 64)
      c -= 1
    }
    b
  }

  private def bytesToLong(b: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    v
  }

  /** 64-bit result → 11 crypt-alphabet chars, 6 bits at a time MSB
    * first (two zero bits pad the tail). */
  private def encode11(v: Long, sb: StringBuilder): Unit = {
    var k = 0
    while (k < 10) { sb.append(itoa64(((v >>> (58 - 6 * k)) & 0x3f).toInt)); k += 1 }
    sb.append(itoa64(((v & 0xf) << 2).toInt))
  }

  /** Traditional DES crypt: 2-char salt setting (the scheme every
    * settings string that matches no `$`/`_` prefix falls back to). */
  def crypt(pw: String, setting: String): String = {
    require(setting.length >= 2, s"crypt: DES salt needs 2 chars: $setting")
    val salt = a64(setting(0)) | (a64(setting(1)) << 6)
    val p = pw.getBytes(StandardCharsets.UTF_8)
    val keyBytes = new Array[Byte](8)
    var i = 0
    while (i < 8) {
      keyBytes(i) = if (i < p.length) ((p(i) & 0xff) << 1).toByte else 0
      i += 1
    }
    val out = new StringBuilder(setting.substring(0, 2))
    encode11(encrypt(0L, subkeys(bytesToLong(keyBytes)), saltMask(salt), 25), out)
    out.toString
  }

  /** BSDi extended crypt: `_` + 4 count chars + 4 salt chars (both
    * little-endian base-64); passwords longer than 8 bytes fold in via
    * encrypt-then-XOR key strengthening, unlike traditional DES crypt
    * which silently truncates. */
  def xcrypt(pw: String, setting: String): String = {
    require(setting.length >= 9 && setting(0) == '_',
      s"crypt: extended DES setting needs '_'+8 chars: $setting")
    var count = 0
    var salt = 0
    var i = 0
    while (i < 4) {
      count |= a64(setting(1 + i)) << (6 * i)
      salt |= a64(setting(5 + i)) << (6 * i)
      i += 1
    }
    require(count > 0, s"crypt: extended DES count must be positive: $setting")
    val p = pw.getBytes(StandardCharsets.UTF_8)
    val keyBytes = new Array[Byte](8)
    var pos = 0
    i = 0
    while (i < 8) {
      keyBytes(i) = if (pos < p.length) ((p(pos) & 0xff) << 1).toByte else 0
      if (pos < p.length) pos += 1
      i += 1
    }
    var ks = subkeys(bytesToLong(keyBytes))
    while (pos < p.length) {
      // fold the next ≤8 password bytes into the key: encrypt the key
      // with itself, XOR in the shifted bytes, reschedule
      val enc = encrypt(bytesToLong(keyBytes), ks, 0L, 1)
      i = 0
      while (i < 8) {
        keyBytes(i) = (enc >>> (56 - 8 * i)).toByte
        i += 1
      }
      i = 0
      while (i < 8) {
        // unmasked shift: a 0x80 byte yields t=0x100 — advances but
        // XORs nothing, matching the published algorithm's quirk
        val t = if (pos < p.length) (p(pos) & 0xff) << 1 else 0
        if (t != 0) pos += 1
        keyBytes(i) = (keyBytes(i) ^ t).toByte
        i += 1
      }
      ks = subkeys(bytesToLong(keyBytes))
    }
    val out = new StringBuilder(setting.substring(0, 9))
    encode11(encrypt(0L, ks, saltMask(salt), count), out)
    out.toString
  }

  /** `gen_salt('des')`: 2 random crypt-alphabet chars. */
  def genSalt(rng: java.util.Random): String =
    s"${itoa64(rng.nextInt(64))}${itoa64(rng.nextInt(64))}"

  /** `gen_salt('xdes')`: `_` + the reference's default 725 rounds +
    * 4 random salt chars (pgcrypto PX_XDES_ROUNDS). */
  def genSaltExtended(rng: java.util.Random): String = {
    val sb = new StringBuilder("_")
    var c = 725
    var i = 0
    while (i < 4) { sb.append(itoa64(c & 0x3f)); c >>= 6; i += 1 }
    i = 0
    while (i < 4) { sb.append(itoa64(rng.nextInt(64))); i += 1 }
    sb.toString
  }
}
