package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.security.MessageDigest
import java.util.zip.{Deflater, Inflater}

import javax.crypto.Cipher
import javax.crypto.spec.SecretKeySpec

/** pgcrypto's OpenPGP symmetric-message family — `armor`/`dearmor`
  * (reference `contrib/pgcrypto/pgp-armor.c:181-370`), and
  * `pgp_sym_encrypt[_bytea]` / `pgp_sym_decrypt[_bytea]`
  * (`pgp-encrypt.c`, `pgp-decrypt.c`, options in `pgp-pgsql.c:160-190`,
  * S2K in `pgp-s2k.c`, the OpenPGP CFB variants in `pgp-cfb.c`).
  *
  * Everything is re-derived from RFC 4880 (the public OpenPGP spec the
  * reference implements) with pgcrypto's defaults: AES-128,
  * iterated+salted SHA-1 S2K, MDC on, no compression. Correctness is
  * pinned against the reference's own test vectors
  * (`contrib/pgcrypto/sql/pgp-decrypt.sql` — fixed armored messages
  * whose decryption under 'foobar' must yield known plaintext across
  * every cipher / S2K mode / hash / MDC combination), plus
  * encrypt→decrypt round-trips for the writer side.
  *
  * Block ciphers come from the JCE (`AES`, `Blowfish`, `DESede` — all
  * JDK-standard); CAST5 has no JDK provider and is rejected with
  * pgcrypto's own error message. Scale posture: per-row CPU, no
  * shuffle; the work factor (65536-byte S2K hash) is the scheme's own.
  */
object PgpAlg {

  // ---------------------------------------------------------------- armor

  private val b64chars =
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789+/"

  /** CRC24 from RFC 2440 (pgp-armor.c:184-204). */
  def crc24(data: Array[Byte]): Int = {
    var crc = 0x00b704ce
    var i = 0
    while (i < data.length) {
      crc ^= (data(i) & 0xff) << 16
      var j = 0
      while (j < 8) {
        crc <<= 1
        if ((crc & 0x1000000) != 0) crc ^= 0x01864cfb
        j += 1
      }
      i += 1
    }
    crc & 0xffffff
  }

  private def crcB64(crc: Int): String =
    new String(Array(b64chars((crc >> 18) & 0x3f), b64chars((crc >> 12) & 0x3f),
      b64chars((crc >> 6) & 0x3f), b64chars(crc & 0x3f)))

  /** base64 at 76 chars/line, trailing newline only if content exists
    * (pg_base64_encode via pgp_armor_encode). */
  def armor(data: Array[Byte]): String = {
    val b = new StringBuilder("-----BEGIN PGP MESSAGE-----\n\n")
    val enc = java.util.Base64.getEncoder.encodeToString(data)
    var i = 0
    while (i < enc.length) {
      b.append(enc.substring(i, math.min(i + 76, enc.length))).append('\n')
      i += 76
    }
    // empty input: no base64 line at all (armor('') emits blank body)
    b.append('=').append(crcB64(crc24(data)))
    b.append("\n-----END PGP MESSAGE-----\n")
    b.toString
  }

  private def corrupt() =
    throw new IllegalArgumentException("Corrupt ascii-armor")

  /** pgp_armor_decode (pgp-armor.c:311-370): first BEGIN/END block
    * whose separators start a line; headers skipped up to the first
    * empty line; CRC line found by scanning back for '='. */
  def dearmor(text: String): Array[Byte] = {
    val data = text
    def findHeader(from: Int, sep: String): (Int, Int) = {
      // returns (sepStart, afterLineEnd); separator must begin a line
      var p = data.indexOf(sep, from)
      while (p >= 0 && !(p == 0 || data.charAt(p - 1) == '\n'))
        p = data.indexOf(sep, p + sep.length)
      if (p < 0) corrupt()
      var q = p + sep.length
      while (q < data.length && data.charAt(q) != '-') {
        if (data.charAt(q) < ' ') corrupt()
        q += 1
      }
      if (q + 5 > data.length || data.substring(q, q + 5) != "-----") corrupt()
      q += 5
      if (q < data.length) {
        if (data.charAt(q) != '\n' && data.charAt(q) != '\r') corrupt()
        if (data.charAt(q) == '\r') q += 1
        if (q < data.length && data.charAt(q) == '\n') q += 1
      }
      (p, q)
    }
    val (_, afterBegin) = findHeader(0, "-----BEGIN")
    val (endStart, _) = findHeader(afterBegin, "-----END")
    // skip armor headers: advance whole lines until an empty one
    var p = afterBegin
    while (p < endStart && data.charAt(p) != '\n' && data.charAt(p) != '\r') {
      val nl = data.indexOf('\n', p)
      if (nl < 0 || nl >= endStart) corrupt()
      p = nl + 1
    }
    val base64Start = p
    // scan back from the END header for the CRC's '='
    var c = endStart - 1
    var crcPos = -1
    while (c >= base64Start && crcPos < 0) {
      if (data.charAt(c) == '=') crcPos = c
      c -= 1
    }
    if (crcPos < 0) corrupt()
    val dec = try {
      java.util.Base64.getMimeDecoder.decode(
        data.substring(base64Start, crcPos).replaceAll("[\\s]", ""))
    } catch { case _: IllegalArgumentException => corrupt() }
    val crcBytes = try {
      java.util.Base64.getMimeDecoder.decode(
        data.substring(crcPos + 1, math.min(crcPos + 6, data.length))
          .replaceAll("[\\s]", "").take(4))
    } catch { case _: IllegalArgumentException => corrupt() }
    if (crcBytes.length != 3) corrupt()
    val crc = ((crcBytes(0) & 0xff) << 16) | ((crcBytes(1) & 0xff) << 8) |
      (crcBytes(2) & 0xff)
    if (crc24(dec) != crc) corrupt()
    dec
  }

  // ------------------------------------------------------ algorithm tables

  /** (JCE transform base, key bytes, block bytes) per PGP cipher id
    * (pgp.h:75-85). */
  private def cipherSpec(id: Int): (String, Int, Int) = id match {
    case 2 => ("DESede", 24, 8) // 3des
    case 4 => ("Blowfish", 16, 8) // bf
    case 7 => ("AES", 16, 16) // aes128
    case 8 => ("AES", 24, 16) // aes192
    case 9 => ("AES", 32, 16) // aes256
    case 3 => throw new IllegalArgumentException(
      "Unsupported cipher algorithm: cast5 (no JDK provider)")
    case other => throw new IllegalArgumentException(
      s"Unsupported cipher algorithm: code $other")
  }

  def cipherCode(name: String): Int = name.trim.toLowerCase match {
    case "3des" => 2
    case "cast5" => 3
    case "bf" | "blowfish" => 4
    case "aes" | "aes128" | "aes-128" => 7
    case "aes192" | "aes-192" => 8
    case "aes256" | "aes-256" => 9
    case other => throw new IllegalArgumentException(
      s"Unsupported cipher algorithm: $other")
  }

  def keyLen(cipherId: Int): Int = cipherSpec(cipherId)._2
  def blockLen(cipherId: Int): Int = cipherSpec(cipherId)._3

  private def digestName(id: Int): String = id match {
    case 1 => "MD5"
    case 2 => "SHA-1"
    case 8 => "SHA-256"
    case 9 => "SHA-384"
    case 10 => "SHA-512"
    case other => throw new IllegalArgumentException(
      s"Unsupported digest algorithm: code $other")
  }

  def digestCode(name: String): Int = name.trim.toLowerCase match {
    case "md5" => 1
    case "sha1" | "sha-1" => 2
    case "sha256" | "sha-256" => 8
    case "sha384" | "sha-384" => 9
    case "sha512" | "sha-512" => 10
    case other => throw new IllegalArgumentException(
      s"Unsupported digest algorithm: $other")
  }

  // ----------------------------------------------------------------- S2K

  /** String-to-key (pgp-s2k.c): mode 0 simple, 1 salted, 3
    * iterated+salted. Long keys re-run the digest with an increasing
    * zero-byte preload (the standard RFC 4880 multi-context trick). */
  def s2kDerive(mode: Int, digestAlgo: Int, salt: Array[Byte], iterByte: Int,
                psw: Array[Byte], outLen: Int): Array[Byte] = {
    val md = MessageDigest.getInstance(digestName(digestAlgo))
    val out = new Array[Byte](outLen)
    var got = 0
    var preload = 0
    while (got < outLen) {
      md.reset()
      var z = 0
      while (z < preload) { md.update(0.toByte); z += 1 }
      preload += 1
      mode match {
        case 0 => md.update(psw)
        case 1 => md.update(salt); md.update(psw)
        case 3 =>
          val count = (16 + (iterByte & 15)) << ((iterByte >> 4) + 6)
          // initial salt+key always hashed in full, then alternate
          // salt/key chunks until `count` bytes total (pgp-s2k.c:123-150)
          md.update(salt); md.update(psw)
          var cur = salt.length + psw.length
          var done = false
          while (cur < count && !done) {
            var c = if (cur + salt.length < count) salt.length else count - cur
            md.update(salt, 0, c)
            cur += c
            if (cur + psw.length < count) c = psw.length
            else if (cur < count) c = count - cur
            else { c = 0; done = true }
            if (c > 0) { md.update(psw, 0, c); cur += c }
          }
        case other => throw new IllegalArgumentException(
          s"Unsupported S2K mode: $other")
      }
      val d = md.digest()
      val take = math.min(d.length, outLen - got)
      System.arraycopy(d, 0, out, got, take)
      got += take
    }
    out
  }

  // ------------------------------------------------------------ PGP CFB

  /** The two OpenPGP CFB variants (pgp-cfb.c): `resync=false` is
    * plain CFB (tag-18 MDC packets and session-key wrapping);
    * `resync=true` is the classic PGP mode for tag-9 packets, where
    * "block 2" is the 2 repeat bytes and the feedback register then
    * reloads from ciphertext bytes [2, bs+2). */
  final class Cfb(cipherId: Int, key: Array[Byte], resync: Boolean) {
    private val (jce, _, bs) = cipherSpec(cipherId)
    private val ecb = Cipher.getInstance(s"$jce/ECB/NoPadding")
    ecb.init(Cipher.ENCRYPT_MODE, new SecretKeySpec(key, jce))
    private val fr = new Array[Byte](bs)
    private var fre = new Array[Byte](bs)
    private val encbuf = new Array[Byte](bs)
    private var pos = 0
    private var blockNo = 0

    private def process(data: Array[Byte], decrypt: Boolean): Array[Byte] = {
      val out = new Array[Byte](data.length)
      var i = 0
      while (i < data.length) {
        if (pos == 0) {
          fre = ecb.doFinal(fr)
          if (blockNo < 5) blockNo += 1
        }
        if (decrypt) {
          encbuf(pos) = data(i)
          out(i) = (fre(pos) ^ data(i)).toByte
        } else {
          val ct = (fre(pos) ^ data(i)).toByte
          encbuf(pos) = ct
          out(i) = ct
        }
        pos += 1
        i += 1
        val limit = if (resync && blockNo == 2) 2 else bs
        if (pos == limit) {
          if (resync && blockNo == 2) {
            // fr := ct[2..bs) of block 1 ++ the 2 repeat-ct bytes
            val nfr = new Array[Byte](bs)
            System.arraycopy(fr, 2, nfr, 0, bs - 2)
            nfr(bs - 2) = encbuf(0); nfr(bs - 1) = encbuf(1)
            System.arraycopy(nfr, 0, fr, 0, bs)
          } else {
            System.arraycopy(encbuf, 0, fr, 0, bs)
          }
          pos = 0
        }
      }
      out
    }

    def encrypt(data: Array[Byte]): Array[Byte] = process(data, decrypt = false)
    def decrypt(data: Array[Byte]): Array[Byte] = process(data, decrypt = true)
  }

  // -------------------------------------------------------------- options

  /** pgp_sym_* option string (pgp-pgsql.c:160-190 set_arg). */
  final case class Options(
      cipher: Int = 7,
      s2kCipher: Int = -1,
      s2kMode: Int = 3,
      s2kDigest: Int = 2,
      compress: Int = 0,
      compressLevel: Int = 6,
      disableMdc: Boolean = false,
      useSessKey: Boolean = false,
      convertCrlf: Boolean = false,
      unicodeMode: Boolean = false) {
    def s2kCipherOrDefault: Int = if (s2kCipher < 0) cipher else s2kCipher
  }

  def parseOptions(args: String): Options = {
    var o = Options()
    for (kv <- args.split(",").map(_.trim).filter(_.nonEmpty)) {
      val Array(k, v) = kv.split("=", 2).map(_.trim)
      k.toLowerCase match {
        case "cipher-algo" => o = o.copy(cipher = cipherCode(v))
        case "s2k-cipher-algo" => o = o.copy(s2kCipher = cipherCode(v))
        case "s2k-mode" =>
          val m = v.toInt
          require(m == 0 || m == 1 || m == 3, s"Unsupported S2K mode: $m")
          o = o.copy(s2kMode = m)
        case "s2k-digest-algo" => o = o.copy(s2kDigest = digestCode(v))
        case "compress-algo" =>
          val c = v.toInt
          require(c >= 0 && c <= 2,
            s"Unsupported compression algorithm: code $c")
          o = o.copy(compress = c)
        case "compress-level" =>
          val l = v.toInt
          require(l >= 0 && l <= 9, s"Unsupported compression level: $l")
          o = o.copy(compressLevel = l)
        case "disable-mdc" => o = o.copy(disableMdc = v.toInt != 0)
        case "sess-key" => o = o.copy(useSessKey = v.toInt != 0)
        case "convert-crlf" => o = o.copy(convertCrlf = v.toInt != 0)
        case "unicode-mode" => o = o.copy(unicodeMode = v.toInt != 0)
        case "debug" => // accepted; debug notices are not surfaced
        case other => throw new IllegalArgumentException(
          s"Unknown parameter: '$other'")
      }
    }
    o
  }

  // ------------------------------------------------------- packet reader

  private final class In(val data: Array[Byte]) {
    var p = 0
    def hasNext: Boolean = p < data.length
    def u8(): Int = {
      if (p >= data.length) wrongKey()
      val v = data(p) & 0xff; p += 1; v
    }
    def take(n: Int): Array[Byte] = {
      if (p + n > data.length) wrongKey()
      val out = java.util.Arrays.copyOfRange(data, p, p + n); p += n; out
    }
  }

  private def wrongKey(): Nothing =
    throw new IllegalArgumentException("Wrong key or corrupt data")

  /** Read one packet (old/new format, definite or partial lengths;
    * RFC 4880 §4.2, parse_new_len/parse_old_len in pgp-decrypt.c).
    * Returns (tag, body). */
  private def readPacket(in: In): (Int, Array[Byte]) = {
    val hdr = in.u8()
    if ((hdr & 0x80) == 0) wrongKey()
    if ((hdr & 0x40) != 0) {
      // new format
      val tag = hdr & 0x3f
      val body = new ByteArrayOutputStream()
      var partial = true
      while (partial) {
        val c = in.u8()
        if (c < 192) { body.write(in.take(c)); partial = false }
        else if (c < 224) {
          val len = ((c - 192) << 8) + in.u8() + 192
          body.write(in.take(len)); partial = false
        } else if (c == 255) {
          val len = (in.u8() << 24) | (in.u8() << 16) | (in.u8() << 8) | in.u8()
          body.write(in.take(len)); partial = false
        } else {
          body.write(in.take(1 << (c & 0x1f))) // partial chunk, keep going
        }
      }
      (tag, body.toByteArray)
    } else {
      val tag = (hdr >> 2) & 0x0f
      val body = (hdr & 3) match {
        case 0 => in.take(in.u8())
        case 1 => val l = (in.u8() << 8) | in.u8(); in.take(l)
        case 2 =>
          val l = (in.u8() << 24) | (in.u8() << 16) | (in.u8() << 8) | in.u8()
          in.take(l)
        case 3 => in.take(in.data.length - in.p) // indeterminate: to EOF
      }
      (tag, body)
    }
  }

  // ------------------------------------------------------- packet writer

  private def writeOldHeader(out: ByteArrayOutputStream, tag: Int, len: Int): Unit = {
    // pgcrypto's write_normal_header: old format, smallest length type
    if (len < 256) { out.write(0x80 | (tag << 2)); out.write(len) }
    else if (len < 65536) {
      out.write(0x80 | (tag << 2) | 1); out.write(len >> 8); out.write(len & 0xff)
    } else {
      out.write(0x80 | (tag << 2) | 2)
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
    }
  }

  private def writeNewHeader(out: ByteArrayOutputStream, tag: Int, len: Int): Unit = {
    out.write(0xc0 | tag)
    if (len < 192) out.write(len)
    else if (len < 8384) {
      val l = len - 192
      out.write((l >> 8) + 192); out.write(l & 0xff)
    } else {
      out.write(255)
      out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
      out.write((len >> 8) & 0xff); out.write(len & 0xff)
    }
  }

  // -------------------------------------------------------------- encrypt

  private def lfToCrlf(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length + 16)
    var i = 0
    while (i < data.length) {
      if (data(i) == '\n') out.write('\r')
      out.write(data(i))
      i += 1
    }
    out.toByteArray
  }

  private def crlfToLf(data: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(data.length)
    var i = 0
    while (i < data.length) {
      if (!(data(i) == '\r' && i + 1 < data.length && data(i + 1) == '\n'))
        out.write(data(i))
      i += 1
    }
    out.toByteArray
  }

  private def deflate(data: Array[Byte], algo: Int, level: Int): Array[Byte] = {
    val d = new Deflater(level, algo == 1) // 1=zip: raw deflate; 2=zlib
    d.setInput(data); d.finish()
    val out = new ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(data: Array[Byte], raw: Boolean): Array[Byte] = {
    val inf = new Inflater(raw)
    inf.setInput(data)
    val out = new ByteArrayOutputStream(data.length * 2 + 64)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished() && !inf.needsDictionary() &&
        !(inf.needsInput() && inf.getRemaining == 0)) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) wrongKey()
        out.write(buf, 0, n)
      }
    } catch { case _: java.util.zip.DataFormatException => wrongKey() }
    finally inf.end()
    out.toByteArray
  }

  def symEncrypt(data: Array[Byte], psw: Array[Byte], opts: Options,
                 textMode: Boolean,
                 rng: java.security.SecureRandom): Array[Byte] = {
    val s2kCipherId = opts.s2kCipherOrDefault
    val s2kSalt = new Array[Byte](8)
    if (opts.s2kMode > 0) rng.nextBytes(s2kSalt)
    val iterByte = 0x60 // 65536 hashed bytes — pgcrypto's decide_count midrange
    val s2kKey = s2kDerive(opts.s2kMode, opts.s2kDigest, s2kSalt, iterByte,
      psw, keyLen(s2kCipherId))

    // session key: either the S2K key itself, or a random key wrapped
    // in the ESK body (pgp-encrypt.c:521 write_symenc_sesskey)
    val (dataCipherId, sessKey, eskTail) =
      if (opts.useSessKey) {
        val sk = new Array[Byte](keyLen(opts.cipher))
        rng.nextBytes(sk)
        val cfb = new Cfb(s2kCipherId, s2kKey, resync = false)
        val wrapped = cfb.encrypt((opts.cipher.toByte +: sk))
        (opts.cipher, sk, wrapped)
      } else (s2kCipherId, s2kKey, Array.emptyByteArray)

    // ESK packet (tag 3, old-format header like pgcrypto)
    val esk = new ByteArrayOutputStream()
    esk.write(4) // version
    esk.write(s2kCipherId)
    esk.write(opts.s2kMode)
    esk.write(opts.s2kDigest)
    if (opts.s2kMode > 0) esk.write(s2kSalt)
    if (opts.s2kMode == 3) esk.write(iterByte)
    esk.write(eskTail)
    val eskBody = esk.toByteArray

    // literal packet (tag 11): type, no filename, zero date
    val payload0 =
      if (textMode && opts.convertCrlf) lfToCrlf(data) else data
    val lit = new ByteArrayOutputStream()
    lit.write(if (textMode) { if (opts.unicodeMode) 'u' else 't' } else 'b')
    lit.write(0) // filename length
    lit.write(0); lit.write(0); lit.write(0); lit.write(0) // date
    lit.write(payload0)
    val litBytes = new ByteArrayOutputStream()
    writeNewHeader(litBytes, 11, lit.size()); lit.writeTo(litBytes)

    // optional compressed packet (tag 8) around the literal
    val inner =
      if (opts.compress > 0) {
        val comp = deflate(litBytes.toByteArray, opts.compress, opts.compressLevel)
        val c = new ByteArrayOutputStream()
        writeNewHeader(c, 8, comp.length + 1)
        c.write(opts.compress); c.write(comp)
        c.toByteArray
      } else litBytes.toByteArray

    val bs = blockLen(dataCipherId)
    val prefix = new Array[Byte](bs + 2)
    rng.nextBytes(prefix)
    prefix(bs) = prefix(bs - 2); prefix(bs + 1) = prefix(bs - 1)

    val out = new ByteArrayOutputStream()
    writeOldHeader(out, 3, eskBody.length); out.write(eskBody)
    if (opts.disableMdc) {
      // tag 9: classic resync CFB over prefix ++ inner
      val cfb = new Cfb(dataCipherId, sessKey, resync = true)
      val ct = cfb.encrypt(prefix ++ inner)
      writeNewHeader(out, 9, ct.length); out.write(ct)
    } else {
      // tag 18: version 1, plain CFB over prefix ++ inner ++ MDC pkt
      val md = MessageDigest.getInstance("SHA-1")
      md.update(prefix); md.update(inner)
      md.update(0xd3.toByte); md.update(0x14.toByte)
      val mdc = md.digest()
      val pt = new ByteArrayOutputStream()
      pt.write(prefix); pt.write(inner)
      pt.write(0xd3); pt.write(0x14); pt.write(mdc)
      val cfb = new Cfb(dataCipherId, sessKey, resync = false)
      val ct = cfb.encrypt(pt.toByteArray)
      writeNewHeader(out, 18, ct.length + 1)
      out.write(1) // SEIPD version
      out.write(ct)
    }
    out.toByteArray
  }

  // -------------------------------------------------------------- decrypt

  /** Inner plaintext walk: literal (tag 11) and compressed (tag 8)
    * packets (process_data_packets, pgp-decrypt.c). Returns the
    * concatenated literal payloads and the literal type byte. */
  private def readContents(data: Array[Byte], textMode: Boolean,
                           opts: Options,
                           allowCompressed: Boolean = true): Array[Byte] = {
    val in = new In(data)
    val out = new ByteArrayOutputStream()
    var sawLiteral = false
    while (in.hasNext) {
      val (tag, body) = readPacket(in)
      tag match {
        case 11 =>
          val b = new In(body)
          val tpe = b.u8()
          if (textMode && tpe != 't' && tpe != 'u')
            throw new IllegalArgumentException("Not text data")
          val fnameLen = b.u8()
          b.take(fnameLen)
          b.take(4) // date
          var payload = b.take(body.length - b.p)
          if (textMode && opts.convertCrlf) payload = crlfToLf(payload)
          out.write(payload)
          sawLiteral = true
        case 8 if allowCompressed =>
          val algo = body(0) & 0xff
          val rest = java.util.Arrays.copyOfRange(body, 1, body.length)
          val decompressed = algo match {
            case 0 => rest
            case 1 => inflate(rest, raw = true)
            case 2 => inflate(rest, raw = false)
            case other => throw new IllegalArgumentException(
              s"Unsupported compression algorithm: code $other")
          }
          out.write(readContents(decompressed, textMode, opts,
            allowCompressed = false))
          sawLiteral = true
        case _ => wrongKey()
      }
    }
    if (!sawLiteral) wrongKey()
    out.toByteArray
  }

  def symDecrypt(msg: Array[Byte], psw: Array[Byte], opts: Options,
                 textMode: Boolean): Array[Byte] = {
    val in = new In(msg)
    val (eskTag, eskBody) = readPacket(in)
    if (eskTag != 3) wrongKey()
    val esk = new In(eskBody)
    if (esk.u8() != 4) wrongKey()
    val s2kCipherId = esk.u8()
    val mode = esk.u8()
    val digest = esk.u8()
    val salt = if (mode > 0) esk.take(8) else new Array[Byte](8)
    val iterByte = if (mode == 3) esk.u8() else 0
    val s2kKey = s2kDerive(mode, digest, salt, iterByte, psw,
      keyLen(s2kCipherId))
    val (cipherId, sessKey) =
      if (esk.p < eskBody.length) {
        // wrapped session key: plain CFB under the S2K key
        val wrapped = esk.take(eskBody.length - esk.p)
        val cfb = new Cfb(s2kCipherId, s2kKey, resync = false)
        val dec = cfb.decrypt(wrapped)
        val algo = dec(0) & 0xff
        val sk = java.util.Arrays.copyOfRange(dec, 1, dec.length)
        if (keyLen(algo) != sk.length) wrongKey()
        (algo, sk)
      } else (s2kCipherId, s2kKey)

    val (dataTag, dataBody) = readPacket(in)
    val bs = blockLen(cipherId)
    val plain = dataTag match {
      case 18 =>
        if ((dataBody(0) & 0xff) != 1) wrongKey()
        val ct = java.util.Arrays.copyOfRange(dataBody, 1, dataBody.length)
        val cfb = new Cfb(cipherId, sessKey, resync = false)
        val pt = cfb.decrypt(ct)
        if (pt.length < bs + 2 + 22) wrongKey()
        if (pt(bs) != pt(bs - 2) || pt(bs + 1) != pt(bs - 1)) wrongKey()
        // MDC trailer: 0xD3 0x14 + SHA1(everything before the hash)
        val mdcStart = pt.length - 22
        if ((pt(mdcStart) & 0xff) != 0xd3 || (pt(mdcStart + 1) & 0xff) != 0x14)
          wrongKey()
        val md = MessageDigest.getInstance("SHA-1")
        md.update(pt, 0, mdcStart + 2)
        if (!java.util.Arrays.equals(md.digest(),
          java.util.Arrays.copyOfRange(pt, mdcStart + 2, pt.length)))
          wrongKey()
        java.util.Arrays.copyOfRange(pt, bs + 2, mdcStart)
      case 9 =>
        val cfb = new Cfb(cipherId, sessKey, resync = true)
        val pt = cfb.decrypt(dataBody)
        if (pt.length < bs + 2) wrongKey()
        if (pt(bs) != pt(bs - 2) || pt(bs + 1) != pt(bs - 1)) wrongKey()
        java.util.Arrays.copyOfRange(pt, bs + 2, pt.length)
      case _ => wrongKey()
    }
    readContents(plain, textMode, opts)
  }

  /** pgp_key_id (pgp-info.c): symmetric messages report SYMKEY. */
  def keyId(msg: Array[Byte]): String = {
    val in = new In(msg)
    val (tag, body) = readPacket(in)
    tag match {
      case 3 => "SYMKEY"
      case 1 =>
        // pubkey ESK: version byte + 8-byte key id
        body.slice(1, 9).map(b => f"${b & 0xff}%02X").mkString
      case _ => wrongKey()
    }
  }

  // string convenience used by the Catalyst expressions
  def encryptText(data: String, psw: String, args: String): Array[Byte] =
    symEncrypt(data.getBytes(StandardCharsets.UTF_8),
      psw.getBytes(StandardCharsets.UTF_8), parseOptions(args),
      textMode = true, new java.security.SecureRandom())

  def encryptBytea(data: Array[Byte], psw: String, args: String): Array[Byte] =
    symEncrypt(data, psw.getBytes(StandardCharsets.UTF_8), parseOptions(args),
      textMode = false, new java.security.SecureRandom())

  def decryptText(msg: Array[Byte], psw: String, args: String): String =
    new String(symDecrypt(msg, psw.getBytes(StandardCharsets.UTF_8),
      parseOptions(args), textMode = true), StandardCharsets.UTF_8)

  def decryptBytea(msg: Array[Byte], psw: String, args: String): Array[Byte] =
    symDecrypt(msg, psw.getBytes(StandardCharsets.UTF_8),
      parseOptions(args), textMode = false)
}
