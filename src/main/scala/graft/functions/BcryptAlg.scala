package graft.functions

import java.math.BigInteger
import java.nio.charset.StandardCharsets

/** bcrypt (`$2a$` Blowfish crypt) — re-derived from the published
  * algorithm (Provos & Mazières, "A Future-Adaptable Password Scheme",
  * USENIX ATC 1999: eksblowfish key schedule + 64× ECB encryption of
  * "OrpheanBeholderScryDoubt"), the scheme behind pgcrypto's
  * `gen_salt('bf')` (reference `contrib/pgcrypto/px-crypt.c:86-110`
  * dispatch table, `crypt-blowfish.c`).
  *
  * The Blowfish P-array and S-boxes are, by definition, the leading
  * hexadecimal digits of π's fractional part — so instead of embedding
  * 1042 opaque constants they are COMPUTED once per JVM from Machin's
  * formula (π = 16·atan(1/5) − 4·atan(1/239)) in fixed-point BigInteger
  * arithmetic, and spot-pinned in the spec against the two first
  * published words (0x243f6a88, 0xd1310ba6).
  *
  * Minor versions `a`/`b`/`y` are accepted and identical here (they
  * differ only in historic sign-extension bugs for 8-bit chars, which
  * this UTF-8 implementation never had); `$2x$` (the deliberately buggy
  * variant) is rejected loudly.
  */
object BcryptAlg {

  private val alphabet =
    "./ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"

  private val P_LEN = 18
  private val S_LEN = 1024

  /** First 1042 32-bit words of π's fractional hex expansion. */
  private[graft] lazy val piWords: Array[Int] = {
    val bits = (P_LEN + S_LEN) * 32 + 128 // 128 guard bits
    val one = BigInteger.ONE.shiftLeft(bits)
    def atanInv(x: Long): BigInteger = {
      val bx = BigInteger.valueOf(x)
      val bx2 = bx.multiply(bx)
      var term = one.divide(bx)
      var sum = term
      var n = 1L
      while (term.signum() != 0) {
        term = term.divide(bx2)
        n += 2
        val t = term.divide(BigInteger.valueOf(n))
        // (-1)^k with n = 2k+1: subtract when n ≡ 3 (mod 4)
        sum = if ((n & 2) != 0) sum.subtract(t) else sum.add(t)
      }
      sum
    }
    val pi = atanInv(5).multiply(BigInteger.valueOf(16))
      .subtract(atanInv(239).multiply(BigInteger.valueOf(4)))
    val frac = pi.subtract(BigInteger.valueOf(3).shiftLeft(bits))
    val mask = BigInteger.valueOf(0xffffffffL)
    Array.tabulate(P_LEN + S_LEN) { i =>
      frac.shiftRight(bits - 32 * (i + 1)).and(mask).intValue()
    }
  }

  /** bcrypt's base64 variant (its own alphabet, no padding). */
  private[functions] def encode64(d: Array[Byte], len: Int): String = {
    val sb = new StringBuilder
    var off = 0
    while (off < len) {
      var c1 = d(off) & 0xff; off += 1
      sb.append(alphabet(c1 >> 2)); c1 = (c1 & 0x03) << 4
      if (off >= len) sb.append(alphabet(c1))
      else {
        val c2 = d(off) & 0xff; off += 1
        c1 |= c2 >> 4; sb.append(alphabet(c1)); c1 = (c2 & 0x0f) << 2
        if (off >= len) sb.append(alphabet(c1))
        else {
          val c3 = d(off) & 0xff; off += 1
          c1 |= c3 >> 6; sb.append(alphabet(c1)); sb.append(alphabet(c3 & 0x3f))
        }
      }
    }
    sb.toString
  }

  private[functions] def decode64(s: String, maxLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(maxLen)
    def idx(c: Char): Int = {
      val i = alphabet.indexOf(c)
      require(i >= 0, s"bcrypt: invalid base64 char '$c'")
      i
    }
    var off = 0
    while (off < s.length - 1 && out.size < maxLen) {
      val c1 = idx(s.charAt(off)); off += 1
      val c2 = idx(s.charAt(off)); off += 1
      out.write(((c1 << 2) | (c2 >> 4)) & 0xff)
      if (off < s.length && out.size < maxLen) {
        val c3 = idx(s.charAt(off)); off += 1
        out.write((((c2 & 0x0f) << 4) | (c3 >> 2)) & 0xff)
        if (off < s.length && out.size < maxLen) {
          val c4 = idx(s.charAt(off)); off += 1
          out.write((((c3 & 0x03) << 6) | c4) & 0xff)
        }
      }
    }
    out.toByteArray
  }

  /** Blowfish state: 18-word P-array + 4×256 S-boxes (flattened). */
  private final class State {
    val P = java.util.Arrays.copyOfRange(piWords, 0, P_LEN)
    val S = java.util.Arrays.copyOfRange(piWords, P_LEN, P_LEN + S_LEN)

    @inline private def f(x: Int): Int =
      ((S(x >>> 24) + S(0x100 | ((x >>> 16) & 0xff))) ^
        S(0x200 | ((x >>> 8) & 0xff))) + S(0x300 | (x & 0xff))

    /** 16-round Feistel encipher of (lr(off), lr(off+1)) in place. */
    def encipher(lr: Array[Int], off: Int): Unit = {
      var l = lr(off) ^ P(0)
      var r = lr(off + 1)
      var i = 1
      while (i <= 16) {
        r ^= f(l) ^ P(i); i += 1
        l ^= f(r) ^ P(i); i += 1
      }
      lr(off) = r ^ P(17)
      lr(off + 1) = l
    }

    /** Big-endian 32-bit word from a cyclic byte stream. */
    private def streamWord(data: Array[Byte], offp: Array[Int]): Int = {
      var word = 0
      var off = offp(0)
      var i = 0
      while (i < 4) {
        word = (word << 8) | (data(off) & 0xff)
        off = (off + 1) % data.length
        i += 1
      }
      offp(0) = off
      word
    }

    /** ExpandKey(state, salt, key); pass salt = null for the zero-salt
      * form used inside the cost loop (expand0state). */
    def expandKey(salt: Array[Byte], key: Array[Byte]): Unit = {
      val koff = Array(0)
      val soff = Array(0)
      var i = 0
      while (i < P_LEN) { P(i) ^= streamWord(key, koff); i += 1 }
      val lr = Array(0, 0)
      i = 0
      while (i < P_LEN) {
        if (salt != null) {
          lr(0) ^= streamWord(salt, soff)
          lr(1) ^= streamWord(salt, soff)
        }
        encipher(lr, 0)
        P(i) = lr(0); P(i + 1) = lr(1)
        i += 2
      }
      i = 0
      while (i < S_LEN) {
        if (salt != null) {
          lr(0) ^= streamWord(salt, soff)
          lr(1) ^= streamWord(salt, soff)
        }
        encipher(lr, 0)
        S(i) = lr(0); S(i + 1) = lr(1)
        i += 2
      }
    }
  }

  private val saltRe = "^\\$2([abxy])\\$(\\d{2})\\$([./A-Za-z0-9]{22})".r

  /** `crypt(pw, '$2a$NN$<22-char salt>...')` — salt may be a full
    * stored hash; the verify idiom `crypt(pw, h) = h` works. */
  def crypt(pw: String, saltSpec: String): String = {
    val m = saltRe.findFirstMatchIn(saltSpec).getOrElse(
      throw new IllegalArgumentException(
        s"bcrypt: cannot parse salt spec: $saltSpec"))
    val minor = m.group(1)
    require(minor != "x",
      "bcrypt: the $2x$ (buggy sign-extension) variant is not supported")
    val cost = m.group(2).toInt
    require(cost >= 4 && cost <= 31, s"bcrypt: cost $cost out of range [4,31]")
    val salt = decode64(m.group(3), 16)

    // a/b/y: password + NUL terminator, cycled; 72-byte key cap
    val pwb = pw.getBytes(StandardCharsets.UTF_8)
    val key = java.util.Arrays.copyOf(pwb, math.min(pwb.length + 1, 72))

    val st = new State
    st.expandKey(salt, key)
    var rounds = 1L << cost
    while (rounds > 0) {
      st.expandKey(null, key)
      st.expandKey(null, salt)
      rounds -= 1
    }

    // 64× ECB over the 192-bit magic value
    val magic = "OrpheanBeholderScryDoubt".getBytes(StandardCharsets.US_ASCII)
    val cdata = Array.tabulate(6) { i =>
      ((magic(4 * i) & 0xff) << 24) | ((magic(4 * i + 1) & 0xff) << 16) |
        ((magic(4 * i + 2) & 0xff) << 8) | (magic(4 * i + 3) & 0xff)
    }
    var j = 0
    while (j < 64) {
      st.encipher(cdata, 0); st.encipher(cdata, 2); st.encipher(cdata, 4)
      j += 1
    }
    val ct = new Array[Byte](24)
    for (i <- 0 until 6) {
      ct(4 * i) = (cdata(i) >>> 24).toByte
      ct(4 * i + 1) = (cdata(i) >>> 16).toByte
      ct(4 * i + 2) = (cdata(i) >>> 8).toByte
      ct(4 * i + 3) = cdata(i).toByte
    }
    s"$$2$minor$$%02d$$".format(cost) + encode64(salt, 16) + encode64(ct, 23)
  }

  /** `gen_salt('bf'[, rounds])`: `$2a$NN$` + 22 chars of a random
    * 128-bit salt (pgcrypto's default log-rounds is 6). */
  def genSalt(rng: java.util.Random, rounds: Int = 6): String = {
    require(rounds >= 4 && rounds <= 31, s"bcrypt rounds out of range: $rounds")
    val salt = new Array[Byte](16)
    rng.nextBytes(salt)
    s"$$2a$$%02d$$".format(rounds) + encode64(salt, 16)
  }
}
