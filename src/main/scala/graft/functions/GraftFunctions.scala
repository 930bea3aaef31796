package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** PG `chr(n)` (reference src/backend/utils/adt/oracle_compat.c chr):
  * in a UTF-8 database n is a Unicode CODE POINT — chr(1000) is U+03E8.
  * Spark's builtin wraps to n % 256 above 255 (MySQL semantics), a
  * silent wrong answer; this expression replaces it at registration. */
case class PgChr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(n: Any): Any =
    UTF8String.fromString(PgChr.str(n.asInstanceOf[Long]))
  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.PgChr.str($c))")
  override protected def withNewChildInternal(newChild: Expression): PgChr =
    copy(child = newChild)
}

object PgChr {
  def str(n: Long): String = {
    require(n != 0, "null character not permitted")
    require(n >= 0 && n <= 0x10FFFF, s"requested character too large: $n")
    new String(Character.toChars(n.toInt))
  }
}

/** `pg_lcm(array(n1, n2, ...))` — least common multiple of the
  * set-returning-function result lengths: GP's pre-PG10 target-list
  * SRF semantics cycle every set to the LCM (ExecTargetList,
  * execQual.c). Zero anywhere → 0 (one empty set empties the row
  * set, as PG does). */
case class PgLcm(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = LongType
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    var acc = 1L
    var i = 0
    while (i < arr.numElements()) {
      val n = arr.getLong(i)
      if (n <= 0) return 0L
      acc = acc / java.math.BigInteger.valueOf(acc)
        .gcd(java.math.BigInteger.valueOf(n)).longValue * n
      i += 1
    }
    acc
  }
  override protected def withNewChildInternal(n: Expression): PgLcm =
    copy(child = n)
}

/** Pure helpers invoked from both interpreted eval and generated code.
  * (An `object` with no companion class gets static forwarders, so
  * codegen can call `graft.functions.GraftStrings.m(...)` directly.)
  */
object GraftStrings {

  // PG regexp_replace (reference src/backend/utils/adt/regexp.c
  // textregexreplace + parse_re_flags): compiled patterns cached per
  // (pattern, flags) — regex tests re-use a handful of patterns over
  // many rows
  private val pgReCache =
    new java.util.concurrent.ConcurrentHashMap[(String, String),
      java.util.regex.Pattern]()

  private def compilePgRe(pat: String,
                          flags: String): java.util.regex.Pattern =
    pgReCache.computeIfAbsent((pat, flags), { _ =>
      import java.util.regex.Pattern
      var fl = 0
      // PG default matching is NON-newline-sensitive: `.` crosses
      // lines (Java needs DOTALL for that); n/m select line mode
      var dotAll = true
      var multiline = false
      flags.foreach {
        case 'g' | 'c' => ()
        case 'i' => fl |= Pattern.CASE_INSENSITIVE | Pattern.UNICODE_CASE
        case 'n' | 'm' => dotAll = false; multiline = true
        case 's' => dotAll = true; multiline = false
        case 'p' => dotAll = false; multiline = false
        case 'w' => dotAll = true; multiline = true
        case 'q' => fl |= Pattern.LITERAL
        case 'x' => fl |= Pattern.COMMENTS
        case other => throw new IllegalArgumentException(
          s"invalid regular expression option: $other")
      }
      if (dotAll) fl |= Pattern.DOTALL
      if (multiline) fl |= Pattern.MULTILINE
      // PG's multiline ^ also matches at END of input when the last
      // char is a newline (the empty final line); Java's MULTILINE ^
      // never matches at end of input — translate explicitly
      val pat1 =
        if (multiline) translateMultilineCaret(pat) else pat
      Pattern.compile(adjustGreediness(pat1), fl)
    })

  private def translateMultilineCaret(pat: String): String = {
    val sb = new StringBuilder
    var inClass = false
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (c == '\\' && i + 1 < pat.length) {
        sb.append(c).append(pat.charAt(i + 1)); i += 2
      } else if (inClass) {
        sb.append(c); if (c == ']') inClass = false; i += 1
      } else if (c == '[') { inClass = true; sb.append(c); i += 1 }
      else if (c == '^') { sb.append("(?:\\A|(?<=\\n))"); i += 1 }
      else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** PG's ARE engine gives the WHOLE match the preference of the RE's
    * FIRST quantifier (regex docs, regcomp.c): `Y*?([0-9]{1,3})`
    * matches the SHORTEST total text, so the group yields "1", not
    * "123". Java quantifiers are independent — emulate by making every
    * greedy quantifier lazy when the first one is lazy. */
  private def adjustGreediness(pat: String): String = {
    var firstLazy = false
    var found = false
    var inClass = false
    var i = 0
    while (i < pat.length && !found) {
      val c = pat.charAt(i)
      if (c == '\\') i += 2
      else if (inClass) { if (c == ']') inClass = false; i += 1 }
      else c match {
        case '[' => inClass = true; i += 1
        case '?' if i > 0 && pat.charAt(i - 1) == '(' =>
          i += 1 // (?: / (?= group syntax, not a quantifier
        case '*' | '+' | '?' =>
          found = true
          firstLazy = i + 1 < pat.length && pat.charAt(i + 1) == '?'
        case '{' =>
          val close = pat.indexOf('}', i)
          if (close > 0 && pat.substring(i + 1, close).matches("\\d+(,\\d*)?")) {
            found = true
            firstLazy = close + 1 < pat.length && pat.charAt(close + 1) == '?'
          }
          i += 1
        case _ => i += 1
      }
    }
    if (!firstLazy) pat
    else {
      // flip every remaining greedy quantifier to lazy
      val sb = new StringBuilder
      inClass = false
      i = 0
      while (i < pat.length) {
        val c = pat.charAt(i)
        if (c == '\\' && i + 1 < pat.length) {
          sb.append(c).append(pat.charAt(i + 1)); i += 2
        } else if (inClass) {
          sb.append(c); if (c == ']') inClass = false; i += 1
        } else c match {
          case '[' => inClass = true; sb.append(c); i += 1
          case '?' if i > 0 && pat.charAt(i - 1) == '(' =>
            sb.append(c); i += 1 // group syntax
          case '*' | '+' | '?' =>
            sb.append(c)
            if (i + 1 < pat.length && pat.charAt(i + 1) == '?') {
              sb.append('?'); i += 2
            } else { sb.append('?'); i += 1 }
          case '{' =>
            val close = pat.indexOf('}', i)
            if (close > 0 &&
              pat.substring(i + 1, close).matches("\\d+(,\\d*)?")) {
              sb.append(pat.substring(i, close + 1))
              if (close + 1 < pat.length && pat.charAt(close + 1) == '?') {
                sb.append('?'); i = close + 2
              } else { sb.append('?'); i = close + 1 }
            } else { sb.append(c); i += 1 }
          case _ => sb.append(c); i += 1
        }
      }
      sb.toString
    }
  }

  /** PG replacement text (`\1`..`\9`, `\&` whole match) → Java
    * replacement (`$1`, `$0`; `$` escaped). */
  private def pgReplacement(r: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < r.length) {
      val c = r.charAt(i)
      if (c == '\\' && i + 1 < r.length) {
        val n = r.charAt(i + 1)
        if (n.isDigit) { sb += '$' += n; i += 2 }
        else if (n == '&') { sb ++= "$0"; i += 2 }
        else if (n == '\\') { sb ++= "\\\\"; i += 2 }
        else { sb += '\\' += n; i += 2 }
      } else if (c == '$') { sb ++= "\\$"; i += 1 }
      else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** regexp.c textregexreplace: WITHOUT 'g' only the FIRST match is
    * replaced (Spark's builtin is always-global — a silent wrong
    * answer for ported scripts). */
  def pgRegexpReplace(s: UTF8String, p: UTF8String, r: UTF8String,
                      f: UTF8String): UTF8String = {
    val flags = f.toString
    val m = compilePgRe(p.toString, flags).matcher(s.toString)
    val rep =
      if (flags.contains('q'))
        java.util.regex.Matcher.quoteReplacement(r.toString)
      else pgReplacement(r.toString)
    UTF8String.fromString(
      if (flags.contains('g')) m.replaceAll(rep) else m.replaceFirst(rep))
  }

  /** regexp.c regexp_matches: capture-group text[] per match — one
    * row without 'g', every non-overlapping match with it. Whole
    * match when the pattern has no groups; NULL elements for
    * non-participating groups. Returned as array<array<string>>; the
    * SQL registration explodes it (setof text[]). */
  def pgRegexpMatches(s: UTF8String, p: UTF8String,
                      f: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val flags = f.toString
    val m = compilePgRe(p.toString, flags.replace("g", "")).matcher(str)
    val global = flags.contains('g')
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var from = 0
    var go = true
    while (go && from <= str.length && m.find(from)) {
      val row: Array[Any] =
        if (m.groupCount == 0)
          Array(UTF8String.fromString(m.group(0)))
        else (1 to m.groupCount).map { g =>
          val v = m.group(g)
          if (v == null) null else UTF8String.fromString(v)
        }.toArray
      out += new org.apache.spark.sql.catalyst.util.GenericArrayData(row)
      if (!global) go = false
      else from = if (m.end == m.start) m.end + 1 else m.end
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** regexp.c regexp_split_to_array/table field scan: zero-length
    * matches at the start of the string, at its end, or immediately
    * after a previous match are IGNORED (they would make empty
    * fields); non-zero adjacent separators still yield empty fields,
    * exactly PG's documented contract. */
  def pgRegexpSplit(s: UTF8String, p: UTF8String,
                    f: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
    val str = s.toString
    val flags = f.toString
    if (flags.contains('g')) throw new IllegalArgumentException(
      "regexp_split_to_table() does not support the \"global\" option")
    val m = compilePgRe(p.toString, flags).matcher(str)
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var start = 0
    var from = 0
    while (from <= str.length && m.find(from)) {
      if (m.end == m.start) {
        if (m.start != start && m.start != str.length) {
          out += UTF8String.fromString(str.substring(start, m.start))
          start = m.start
        }
        from = m.start + 1
      } else {
        out += UTF8String.fromString(str.substring(start, m.start))
        start = m.end
        from = m.end
      }
    }
    out += UTF8String.fromString(str.substring(start))
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  /** regexp.c textregexsubstr — `substring(string, pattern)`: the
    * first match's text, or capture group 1 when the pattern declares
    * one, NULL when nothing matches (or the group didn't participate). */
  def pgRegexpSubstr(s: UTF8String, p: UTF8String): UTF8String = {
    val m = compilePgRe(p.toString, "").matcher(s.toString)
    if (!m.find()) null
    else {
      val v = if (m.groupCount > 0) m.group(1) else m.group(0)
      if (v == null) null else UTF8String.fromString(v)
    }
  }

  // SQL:1999 SIMILAR substring pattern → compiled java regex, cached
  // per (pattern, escape)
  private val similarSubstrCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Char),
      java.util.regex.Pattern]()

  /** regexp.c similar_escape for the 3-argument substring form
    * (`substring(s FROM pat FOR esc)`): the SIMILAR TO language with
    * `esc"` marking the reported section. The whole string must match
    * the whole pattern; user parens become non-capturing so the
    * marked section is always group 1. */
  private def similarSubstrRegex(pat: String,
                                 esc: Char): java.util.regex.Pattern =
    similarSubstrCache.computeIfAbsent((pat, esc), { _ =>
      val sb = new StringBuilder("^")
      var inClass = false
      var markers = 0
      var i = 0
      while (i < pat.length) {
        val c = pat.charAt(i)
        if (inClass) {
          sb.append(c)
          if (c == ']') inClass = false
          i += 1
        } else if (c == esc && i + 1 < pat.length &&
          pat.charAt(i + 1) == '"') {
          markers += 1
          sb.append(if (markers % 2 == 1) "(" else ")")
          i += 2
        } else if (c == esc && i + 1 < pat.length) {
          sb.append(java.util.regex.Pattern.quote(
            pat.charAt(i + 1).toString))
          i += 2
        } else {
          c match {
            case '%' => sb.append(".*")
            case '_' => sb.append('.')
            case '[' => inClass = true; sb.append('[')
            case '(' => sb.append("(?:")
            case '|' | '*' | '+' | '?' | ')' | '{' | '}' | ',' =>
              sb.append(c)
            case d if d.isLetterOrDigit || d == ' ' => sb.append(d)
            case other => sb.append('\\').append(other)
          }
          i += 1
        }
      }
      sb.append('$')
      java.util.regex.Pattern.compile(sb.toString,
        java.util.regex.Pattern.DOTALL)
    })

  def pgSimilarSubstr(s: UTF8String, pat: UTF8String,
                      escS: UTF8String): UTF8String = {
    val e = escS.toString
    val esc = if (e.isEmpty) '\\' else e.charAt(0)
    val m = similarSubstrRegex(pat.toString, esc).matcher(s.toString)
    if (!m.matches()) null
    else {
      val v = if (m.groupCount > 0) m.group(1) else m.group(0)
      if (v == null) null else UTF8String.fromString(v)
    }
  }

  /** arrayfuncs.c array_in — parse a `{...}` literal into nested
    * arrays of strings (NULL keyword → null; double-quoted elements
    * keep whitespace/commas; backslash escapes). PG array VALUES carry
    * their own dimensionality regardless of the declared type, so the
    * result is wrapped to `depth` when the literal is shallower. */
  def pgArrayIn(s0: UTF8String,
                depth: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val s = s0.toString.trim
    var i = 0
    def skipWs(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    def parseElem(): Any = {
      if (s.charAt(i) == '"') {
        i += 1
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != '"') {
          if (s.charAt(i) == '\\' && i + 1 < s.length) {
            sb += s.charAt(i + 1); i += 2
          } else { sb += s.charAt(i); i += 1 }
        }
        i += 1
        UTF8String.fromString(sb.toString)
      } else {
        val sb = new StringBuilder
        while (i < s.length && s.charAt(i) != ',' && s.charAt(i) != '}') {
          if (s.charAt(i) == '\\' && i + 1 < s.length) {
            sb += s.charAt(i + 1); i += 2
          } else { sb += s.charAt(i); i += 1 }
        }
        val t = sb.toString.trim
        if (t.equalsIgnoreCase("null")) null else UTF8String.fromString(t)
      }
    }
    def parseArr(): GenericArrayData = {
      if (i >= s.length || s.charAt(i) != '{')
        throw new IllegalArgumentException(
          s"""malformed array literal: "$s"""")
      i += 1
      skipWs()
      val out = scala.collection.mutable.ArrayBuffer.empty[Any]
      if (i < s.length && s.charAt(i) == '}') {
        i += 1
        return new GenericArrayData(out.toArray)
      }
      var done = false
      while (!done) {
        skipWs()
        if (i < s.length && s.charAt(i) == '{') out += parseArr()
        else out += parseElem()
        skipWs()
        if (i >= s.length) throw new IllegalArgumentException(
          s"""malformed array literal: "$s"""")
        s.charAt(i) match {
          case ',' => i += 1
          case '}' => i += 1; done = true
          case c => throw new IllegalArgumentException(
            s"""malformed array literal: "$s" at '$c'""")
        }
      }
      new GenericArrayData(out.toArray)
    }
    // explicit-bounds prefix [lo:hi]= — bounds drop (Spark arrays are
    // 1-based); the braces body follows
    if (s.startsWith("[")) i = s.indexOf('=') + 1
    skipWs()
    var v = parseArr()
    def depthOf(a: Any): Int = a match {
      case g: GenericArrayData =>
        1 + (if (g.numElements() > 0) depthOf(g.array(0)) else 0)
      case _ => 0
    }
    var d = depthOf(v)
    while (d < depth) {
      v = new GenericArrayData(Array[Any](v))
      d += 1
    }
    v
  }

  /** varlena.c byteain: `\x...` hex input (whitespace between pairs
    * allowed) or PG escape format (`\\` backslash, `\nnn` octal,
    * anything else its own byte — non-ASCII via UTF-8). */
  def byteaIn(s0: UTF8String): Array[Byte] = {
    val s = s0.toString
    if (s.length >= 2 && s.charAt(0) == '\\' &&
      (s.charAt(1) == 'x' || s.charAt(1) == 'X')) {
      val out = new java.io.ByteArrayOutputStream(s.length / 2)
      var hi = -1
      var i = 2
      while (i < s.length) {
        val c = s.charAt(i)
        if (!Character.isWhitespace(c)) {
          val d = Character.digit(c, 16)
          if (d < 0) throw new IllegalArgumentException(
            s"""invalid hexadecimal digit: "$c"""")
          if (hi < 0) hi = d else { out.write(hi * 16 + d); hi = -1 }
        }
        i += 1
      }
      if (hi >= 0) throw new IllegalArgumentException(
        "invalid hexadecimal data: odd number of digits")
      out.toByteArray
    } else {
      val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val out = new java.io.ByteArrayOutputStream(bytes.length)
      var i = 0
      while (i < bytes.length) {
        if (bytes(i) == '\\') {
          if (i + 1 < bytes.length && bytes(i + 1) == '\\') {
            out.write('\\'); i += 2
          } else if (i + 3 < bytes.length &&
            bytes(i + 1) >= '0' && bytes(i + 1) <= '3' &&
            bytes(i + 2) >= '0' && bytes(i + 2) <= '7' &&
            bytes(i + 3) >= '0' && bytes(i + 3) <= '7') {
            out.write((bytes(i + 1) - '0') * 64 +
              (bytes(i + 2) - '0') * 8 + (bytes(i + 3) - '0'))
            i += 4
          } else throw new IllegalArgumentException(
            "invalid input syntax for type bytea")
        } else { out.write(bytes(i)); i += 1 }
      }
      out.toByteArray
    }
  }

  /** varlena.c byteaout, escape mode: printable ASCII as-is,
    * backslash doubled, everything else 3-digit octal. */
  def byteaOutEscape(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val u = b(i) & 0xff
      if (u == 0x5c) sb.append("\\\\")
      else if (u >= 0x20 && u <= 0x7e) sb.append(u.toChar)
      else {
        sb.append('\\')
        sb.append(('0' + (u >> 6)).toChar)
        sb.append(('0' + ((u >> 3) & 7)).toChar)
        sb.append(('0' + (u & 7)).toChar)
      }
      i += 1
    }
    sb.toString
  }

  /** encode.c esc_encode — bytea → text: NUL and high-bit bytes as
    * `\nnn` octal, backslash doubled, EVERYTHING else raw (control
    * chars included — unlike byteaout's escape mode). */
  def escEncode(b: Array[Byte]): String = {
    val sb = new StringBuilder(b.length)
    var i = 0
    while (i < b.length) {
      val u = b(i) & 0xff
      if (u == 0 || u >= 0x80) {
        sb.append('\\')
        sb.append(('0' + (u >> 6)).toChar)
        sb.append(('0' + ((u >> 3) & 7)).toChar)
        sb.append(('0' + (u & 7)).toChar)
      } else if (u == 0x5c) sb.append("\\\\")
      else sb.append(u.toChar)
      i += 1
    }
    sb.toString
  }

  /** varlena.c byteatrim: strip from both ends every byte present in
    * the set; the empty set strips nothing. */
  def byteaTrim(b: Array[Byte], set: Array[Byte]): Array[Byte] = {
    if (set.isEmpty) return b
    val s = new java.util.HashSet[Byte]()
    set.foreach(x => s.add(x))
    var lo = 0
    var hi = b.length
    while (lo < hi && s.contains(b(lo))) lo += 1
    while (hi > lo && s.contains(b(hi - 1))) hi -= 1
    java.util.Arrays.copyOfRange(b, lo, hi)
  }

  /** Character-trigram Jaccard similarity, our analog of pg_trgm's
    * `similarity()` (reference `contrib/pg_trgm/trgm_op.c`). Semantics
    * (documented, matched by the SQL oracle): lowercase the string, pad
    * with two leading and one trailing space, take all distinct char
    * 3-grams, jaccard = |A∩B| / |A∪B|.
    */
  def trigramSimilarity(a: String, b: String): Double = {
    val ga = trigrams(a)
    val gb = trigrams(b)
    var inter = 0
    val it = ga.iterator()
    while (it.hasNext) { if (gb.contains(it.next())) inter += 1 }
    val union = ga.size + gb.size - inter
    if (union == 0) 0.0 else inter.toDouble / union
  }

  private def trigrams(s: String): java.util.HashSet[String] = {
    val p = "  " + s.toLowerCase(java.util.Locale.ROOT) + " "
    val out = new java.util.HashSet[String](math.max(8, p.length * 2))
    var i = 0
    while (i + 3 <= p.length) { out.add(p.substring(i, i + 3)); i += 1 }
    out
  }

  /** 64-bit SimHash over whitespace tokens (FNV-1a token hashes, bitwise
    * majority vote). Standard construction (Charikar 2002); near-dup docs
    * yield small Hamming distance. Deterministic, no external hash deps.
    */
  def simhash64(s: String): Long = {
    val votes = new Array[Int](64)
    var start = 0
    val n = s.length
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
          var j = start
          while (j < i) { h ^= s.charAt(j).toLong; h *= 0x100000001b3L; j += 1 }
          var bit = 0
          while (bit < 64) {
            if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
            bit += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (votes(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  private val stopwords: Seq[(String, Set[String])] = Seq(
    "en" -> Set("the", "and", "of", "to", "a", "in", "is", "that", "with", "for"),
    "es" -> Set("el", "la", "de", "que", "y", "en", "un", "una", "los", "con"),
    "fr" -> Set("le", "la", "de", "et", "les", "des", "un", "une", "du", "est"),
    "de" -> Set("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "eine"))

  /** Winnowed rolling-hash document fingerprints (Schleimer et al. 2003,
    * the MOSS scheme): Rabin-Karp polynomial hashes over character
    * k-grams, then the minimum hash of each window of w consecutive
    * k-grams (deduped) — position-robust fingerprints whose overlap count
    * approximates local similarity. Pure JVM (wrapping arithmetic). */
  def winnow(s: String, k: Int, w: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array(fpHash(s, 0, n))
    val m = n - k + 1
    val hs = new Array[Long](m)
    var i = 0
    while (i < m) { hs(i) = fpHash(s, i, k); i += 1 }
    if (m <= w) return Array(hs.min)
    val out = new scala.collection.mutable.ArrayBuffer[Long](m / w + 4)
    var lastPos = -1
    var start = 0
    while (start + w <= m) {
      var best = start
      var j = start + 1
      while (j < start + w) { if (hs(j) <= hs(best)) best = j; j += 1 }
      if (best != lastPos) { out += hs(best); lastPos = best }
      start += 1
    }
    out.toArray
  }

  private def fpHash(s: String, from: Int, len: Int): Long = {
    var h = 0L
    var i = from
    val end = from + len
    while (i < end) { h = h * 1000003L + s.charAt(i).toLong; i += 1 }
    h
  }

  /** Tiny n-gram/stopword language-ID heuristic (en/es/fr/de + zh via CJK
    * codepoints). Capability analog of text classifiers a training-data
    * pipeline runs; deliberately dependency-free.
    */
  def langId(s: String): UTF8String = {
    var cjk = 0; var total = 0
    var i = 0
    while (i < s.length && i < 4000) {
      val c = s.charAt(i)
      if (Character.isLetter(c)) {
        total += 1
        if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      }
      i += 1
    }
    if (total > 0 && cjk * 5 >= total) return UTF8String.fromString("zh")
    val toks = s.toLowerCase(java.util.Locale.ROOT).split("\\s+")
    var best = "en"; var bestScore = -1
    stopwords.foreach { case (lang, words) =>
      val score = toks.count(words.contains)
      if (score > bestScore) { bestScore = score; best = lang }
    }
    UTF8String.fromString(best)
  }

  /** ONE byte-level pass over a document for the q85 quality features:
    * character count, whitespace-run token count, punctuation count
    * ([.,;:!?]), and split-on-single-space stopword hits — replacing
    * three separate regex passes (semantics pinned by the q85 oracle:
    * tokens are `\s+` runs of the trimmed text, stop tokens are exact
    * matches between single spaces / string ends). Every tested byte
    * is ASCII and UTF-8 continuation bytes can never equal an ASCII
    * byte, so multi-byte codepoints simply count as non-space — the
    * same classification the regexes made. */
  def qualityFeatures(s: UTF8String)
      : org.apache.spark.sql.catalyst.InternalRow = {
    val b = s.getBytes
    val n = b.length
    var nPunct = 0
    var nTokens = 0
    var inTok = false
    var stop = 0
    var tokStart = 0 // current split-on-single-space token start
    def checkStop(from: Int, to: Int): Unit = {
      val hit = (to - from) match {
        case 1 => b(from) == 'a'
        case 2 =>
          val c0 = b(from); val c1 = b(from + 1)
          (c0 == 'o' && c1 == 'f') || (c0 == 't' && c1 == 'o') ||
            (c0 == 'i' && (c1 == 'n' || c1 == 's'))
        case 3 =>
          val c0 = b(from); val c1 = b(from + 1); val c2 = b(from + 2)
          (c0 == 't' && c1 == 'h' && c2 == 'e') ||
            (c0 == 'a' && c1 == 'n' && c2 == 'd') ||
            (c0 == 'f' && c1 == 'o' && c2 == 'r')
        case 4 =>
          val c0 = b(from); val c1 = b(from + 1)
          val c2 = b(from + 2); val c3 = b(from + 3)
          (c0 == 't' && c1 == 'h' && c2 == 'a' && c3 == 't') ||
            (c0 == 'w' && c1 == 'i' && c2 == 't' && c3 == 'h')
        case _ => false
      }
      if (hit) stop += 1
    }
    var i = 0
    while (i < n) {
      val c = b(i)
      if (c == '.' || c == ',' || c == ';' || c == ':' || c == '!' ||
        c == '?') nPunct += 1
      val ws = c == ' ' || c == '\t' || c == '\n' || c == 0x0B ||
        c == '\f' || c == '\r'
      if (!ws && !inTok) { nTokens += 1; inTok = true }
      else if (ws) inTok = false
      if (c == ' ') { checkStop(tokStart, i); tokStart = i + 1 }
      i += 1
    }
    checkStop(tokStart, n)
    new GenericInternalRow(
      Array[Any](s.numChars(), nTokens, nPunct, stop))
  }
}

/** `quality_features(text)` — the q85 feature struct in one
  * whole-stage-codegen pass (see GraftStrings.qualityFeatures). */
case class QualityFeatures(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_punct", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false)))
  override def prettyName: String = "quality_features"

  override protected def nullSafeEval(v: Any): Any =
    GraftStrings.qualityFeatures(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftStrings.qualityFeatures($c)")

  override protected def withNewChildInternal(newChild: Expression): QualityFeatures =
    copy(child = newChild)
}

/** `str SIMILAR TO pattern` (reference `src/backend/utils/adt/
  * regexp.c` similar_escape): SQL:1999's pattern language translated
  * to a POSIX regex — `%`→`.*`, `_`→`.`, the regex metacharacters
  * SIMILAR TO admits (`| * + ? {m,n} () [...]`) pass through,
  * everything else (`. ^ $` …) is a LITERAL, the escape character
  * protects the next character, and the whole pattern is anchored.
  * Compiled driver-side once; matching is Spark's codegen RLIKE. */
/** fuzzystrmatch soundex/difference (reference `contrib/fuzzystrmatch/
  * fuzzystrmatch.c` soundex/difference). The engine-side soundex is
  * Spark's codegen builtin; [[soundexRef]] is an INDEPENDENT
  * implementation of the published American Soundex rules (Knuth TAOCP
  * vol. 3 §6 / the algorithm fuzzystrmatch documents) used to generate
  * oracle expectations and cross-check the builtin — pinned against the
  * canonical published examples in ExpressionSpec. */
object Soundex {

  def soundexRef(s: String): String = {
    val u = s.toUpperCase.filter(c => c >= 'A' && c <= 'Z')
    if (u.isEmpty) ""
    else {
      def code(c: Char): Char = c match {
        case 'B' | 'F' | 'P' | 'V' => '1'
        case 'C' | 'G' | 'J' | 'K' | 'Q' | 'S' | 'X' | 'Z' => '2'
        case 'D' | 'T' => '3'
        case 'L' => '4'
        case 'M' | 'N' => '5'
        case 'R' => '6'
        case _ => '0' // vowels + H/W/Y
      }
      val sb = new StringBuilder
      sb += u.head
      var prev = code(u.head)
      for (c <- u.tail if sb.length < 4) {
        val d = code(c)
        if (d != '0' && d != prev) sb += d
        // H and W are transparent: they do NOT break a digit run
        if (c != 'H' && c != 'W') prev = d
      }
      sb.toString.padTo(4, '0')
    }
  }

  import org.apache.spark.sql.Column

  /** `difference(a, b)`: matching positions of the two soundex codes,
    * 0..4 (fuzzystrmatch.c difference). */
  def difference(a: Column, b: Column): Column = {
    val sa = org.apache.spark.sql.functions.soundex(a)
    val sb = org.apache.spark.sql.functions.soundex(b)
    (0 until 4).map { i =>
      org.apache.spark.sql.functions
        .when(org.apache.spark.sql.functions.substring(sa, i + 1, 1) ===
          org.apache.spark.sql.functions.substring(sb, i + 1, 1), 1)
        .otherwise(0)
    }.reduce(_ + _)
  }
}

/** contrib/earthdistance great-circle distance (reference
  * `contrib/earthdistance/earthdistance.c:17,60-77` geo_distance): the
  * exact published formula — half-angle haversine with the longitude
  * difference wrapped below pi and the sine clamped to 1, on the
  * EARTH_RADIUS = 3958.747716 statute-mile sphere. Pure codegen math
  * builtins; the multiplication shapes mirror the C so an oracle
  * spelling the same expression reproduces it to 1 ulp. */
object EarthDistance {
  import org.apache.spark.sql.Column

  private val EarthRadiusMiles = 3958.747716

  /** Distance in statute miles; arguments in degrees (x=longitude,
    * y=latitude, the `point` convention geo_distance documents). */
  def geoDistance(lon1: Column, lat1: Column,
                  lon2: Column, lat2: Column): Column = {
    import org.apache.spark.sql.functions._
    val (l1, t1) = (radians(lon1), radians(lat1))
    val (l2, t2) = (radians(lon2), radians(lat2))
    val rawDiff = abs(l1 - l2)
    val longdiff =
      when(rawDiff > math.Pi, lit(2 * math.Pi) - rawDiff).otherwise(rawDiff)
    val sinLat = sin(abs(t1 - t2) / 2)
    val sinLon = sin(longdiff / 2)
    val sino = sqrt(sinLat * sinLat + cos(t1) * cos(t2) * sinLon * sinLon)
    lit(2 * EarthRadiusMiles) * asin(least(sino, lit(1.0)))
  }
}

object SimilarTo {

  def similarToRegex(pat: String, esc: Char = '\\'): String = {
    val sb = new StringBuilder("^(?:")
    var inClass = false
    var i = 0
    while (i < pat.length) {
      val c = pat.charAt(i)
      if (inClass) {
        sb.append(c)
        if (c == ']') inClass = false
        i += 1
      } else if (c == esc && i + 1 < pat.length) {
        sb.append(java.util.regex.Pattern.quote(pat.charAt(i + 1).toString))
        i += 2
      } else {
        c match {
          case '%' => sb.append(".*")
          case '_' => sb.append('.')
          case '[' => inClass = true; sb.append('[')
          case '|' | '*' | '+' | '?' | '(' | ')' | '{' | '}' | ',' =>
            sb.append(c)
          case d if d.isLetterOrDigit || d == ' ' || d == '-' || d == '#' =>
            sb.append(d)
          case other => sb.append('\\').append(other)
        }
        i += 1
      }
    }
    sb.append(")$").toString
  }

  def similarTo(c: org.apache.spark.sql.Column, pattern: String): org.apache.spark.sql.Column =
    c.rlike(similarToRegex(pattern))
}

/** contrib/unaccent's dictionary (unaccent/unaccent.rules) as one
  * codegen `translate()` for the 1:1 Latin accent mappings plus
  * `replace()` chains for the multi-char ligatures — no UDF. */
object Unaccent {
  // built from (accented-group → base) pairs so from/to stay aligned
  // by construction
  private val groups: Seq[(String, String)] = Seq(
    "àáâãäåāăą" -> "a", "èéêëēĕėęě" -> "e", "ìíîïĩīĭįı" -> "i",
    "òóôõöōŏő" -> "o", "ùúûüũūŭůűų" -> "u", "ýÿ" -> "y", "ñ" -> "n",
    "çćč" -> "c", "š" -> "s", "žźż" -> "z", "đð" -> "d",
    "ÀÁÂÃÄÅĀĂĄ" -> "A", "ÈÉÊËĒĔĖĘĚ" -> "E", "ÌÍÎÏĨĪĬĮ" -> "I",
    "ÒÓÔÕÖŌŎŐ" -> "O", "ÙÚÛÜŨŪŬŮŰŲ" -> "U", "ÝŸ" -> "Y", "Ñ" -> "N",
    "ÇĆČ" -> "C", "Š" -> "S", "ŽŹŻ" -> "Z", "Đ" -> "D")
  private val from = groups.map(_._1).mkString
  private val to = groups.map { case (g, b) => b.toString * g.length }.mkString

  def unaccent(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val lig = Seq("æ" -> "ae", "Æ" -> "AE", "œ" -> "oe", "Œ" -> "OE",
      "ß" -> "ss", "ﬁ" -> "fi", "ﬂ" -> "fl")
    lig.foldLeft(translate(c, from, to)) { case (acc, (a, b)) =>
      regexp_replace(acc, a, b)
    }
  }
}

/** PG `format(fmt, args...)` (utils/adt/varlena.c text_format) with
  * `%s` / `%I` / `%L` / `%%` and positional `%n$s` forms, parsed
  * driver-side into ONE concat expression — per-row work is just the
  * quoting conditionals, fully codegen. quote_ident quotes only when
  * the identifier needs it, as PG does; quote_literal maps NULL to the
  * unquoted keyword NULL (PG's format %L). Divergence: PG raises on a
  * NULL %I argument; this compile yields SQL NULL. */
object PgFormat {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  def quoteIdent(c: Column): Column =
    when(c.rlike("^[a-z_][a-z0-9_]*$"), c)
      .otherwise(concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\"")))

  def quoteLiteral(c: Column): Column =
    when(c.isNull, lit("NULL"))
      .otherwise(concat(lit("'"), regexp_replace(c, "'", "''"), lit("'")))

  /** One parse shared by the Column and Expression renderers: a token
    * is literal text, or (argIndex, spec) for %s / %I / %L. */
  private[functions] def parseFmt(fmt: String,
                                  nArgs: Int): Seq[scala.util.Either[String, (Int, Char)]] = {
    val parts = Seq.newBuilder[scala.util.Either[String, (Int, Char)]]
    val sb = new StringBuilder
    var next = 0 // next implicit argument index
    var i = 0
    def flush(): Unit =
      if (sb.nonEmpty) { parts += scala.Left(sb.toString); sb.clear() }
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c != '%') { sb.append(c); i += 1 }
      else {
        require(i + 1 < fmt.length, s"format ends with a lone %: $fmt")
        var j = i + 1
        var idx = -1
        val digits = fmt.drop(j).takeWhile(_.isDigit)
        if (digits.nonEmpty && j + digits.length < fmt.length &&
          fmt.charAt(j + digits.length) == '$') {
          idx = digits.toInt - 1
          j += digits.length + 1
        }
        fmt.charAt(j) match {
          case '%' => sb.append('%')
          case spec @ ('s' | 'I' | 'L') =>
            // PG: a %n$ reference also repositions the implicit counter
            // to n+1 (text_format's arg tracking)
            val k =
              if (idx >= 0) { next = idx + 1; idx }
              else { val n = next; next += 1; n }
            require(k < nArgs,
              s"format placeholder ${'%'}$spec needs argument ${k + 1} ($nArgs given)")
            flush()
            parts += scala.Right((k, spec))
          case other => throw new IllegalArgumentException(
            s"unsupported format specifier %$other in: $fmt")
        }
        i = j + 1
      }
    }
    flush()
    parts.result()
  }

  def format(fmt: String, args: Column*): Column = {
    val ps = parseFmt(fmt, args.length).map {
      case scala.Left(s) => lit(s)
      case scala.Right((k, 's')) => coalesce(args(k).cast("string"), lit(""))
      case scala.Right((k, 'I')) => quoteIdent(args(k).cast("string"))
      case scala.Right((k, 'L')) => quoteLiteral(args(k).cast("string"))
      case scala.Right((_, sp)) => throw new IllegalStateException(sp.toString)
    }
    if (ps.isEmpty) lit("") else concat(ps: _*)
  }

  /** Catalyst renderer for the SQL front door's FunctionRegistry entry
    * (a Column built from unresolved functions cannot resolve there). */
  def formatExpr(fmt: String, args: Seq[Expression]): Expression = {
    def str(e: Expression) = Cast(e, StringType)
    def qi(e: Expression): Expression = {
      val s = str(e)
      CaseWhen(Seq((RLike(s, Literal("^[a-z_][a-z0-9_]*$")), s)),
        Concat(Seq(Literal("\""),
          StringReplace(s, Literal("\""), Literal("\"\"")), Literal("\""))))
    }
    def ql(e: Expression): Expression = {
      val s = str(e)
      If(IsNull(s), Literal("NULL"),
        Concat(Seq(Literal("'"),
          StringReplace(s, Literal("'"), Literal("''")), Literal("'"))))
    }
    val ps: Seq[Expression] = parseFmt(fmt, args.length).map {
      case scala.Left(s) => Literal(s)
      case scala.Right((k, 's')) => Coalesce(Seq(str(args(k)), Literal("")))
      case scala.Right((k, 'I')) => qi(args(k))
      case scala.Right((k, 'L')) => ql(args(k))
      case scala.Right((_, sp)) => throw new IllegalStateException(sp.toString)
    }
    if (ps.isEmpty) Literal("") else Concat(ps)
  }
}

/** PG `date_bin(stride, ts, origin)` (utils/adt/timestamp.c
  * timestamp_bin) and `width_bucket` (utils/adt/numeric.c
  * width_bucket_float8) — pure column arithmetic, fully codegen. */
object PgBin {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.functions._

  /** Floor `ts` to the stride grid anchored at `origin`; pmod keeps the
    * floor correct for timestamps before the origin. */
  def dateBin(strideSeconds: Long, ts: Column, origin: Column): Column = {
    val us = unix_micros(ts)
    val stride = lit(strideSeconds * 1000000L)
    timestamp_micros(us - pmod(us - unix_micros(origin), stride))
  }

  /** `width_bucket(x, lo, hi, n)`: 0 below the histogram, n+1 at/above
    * the upper bound, else 1 + floor((x−lo)/(hi−lo)·n). */
  def widthBucket(x: Column, lo: Double, hi: Double, n: Int): Column =
    when(x < lo, lit(0))
      .when(x >= hi, lit(n + 1))
      .otherwise((floor((x - lit(lo)) / lit(hi - lo) * lit(n)) + 1).cast("int"))
}

/** `linear_interpolate(x, x0, y0, x1, y1)` — gap-fill interpolation, the
  * reference's `linear_interpolate` (`src/backend/utils/adt/interpolate.c:234`).
  * RuntimeReplaceable: rewrites to built-in arithmetic so it rides
  * whole-stage codegen for free. Degenerate x0==x1 → y0 (matches the
  * reference's `linear_interpolate` returning y0 when the abscissas
  * coincide).
  */
/** Interval → seconds for the interpolation domains (PgIntervalOps
  * calendar assumptions). */
case class IntervalSecs(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "interval_secs"
  override protected def nullSafeEval(v: Any): Any =
    PgIntervalOps.toSeconds(v)
  override protected def withNewChildInternal(c: Expression): IntervalSecs =
    copy(child = c)
}

/** GP timeseries linear_interpolate(x, x0, y0, x1, y1) — the reference
  * `src/backend/utils/adt/float.c` linear_interpolate family: every
  * abscissa/ordinate type collapses to a double domain (timestamps →
  * epoch seconds, dates → days-as-seconds, intervals → seconds), the
  * result converts back to the ordinate type. Equal abscissas return
  * NULL (the reference's two-point contract); NaN anywhere propagates
  * (the `x1-x0 = 0` spelling keeps Spark's NaN==NaN equality from
  * turning the NaN case into NULL). Replacement is LAZY so the type
  * dispatch sees resolved children. */
case class LinearInterpolate(
    x: Expression, x0: Expression, y0: Expression,
    x1: Expression, y1: Expression)
  extends RuntimeReplaceable {

  override def children: Seq[Expression] = Seq(x, x0, y0, x1, y1)
  override def prettyName: String = "linear_interpolate"

  private def toD(e: Expression): Expression = e.dataType match {
    // UnixDate avoids a date→timestamp cast, which would need a
    // resolved time zone this lazily-built tree does not get
    case DateType => Multiply(Cast(UnixDate(e), DoubleType),
      Literal(86400.0))
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
         CalendarIntervalType => IntervalSecs(e)
    case _ => Cast(e, DoubleType)
  }

  private def fromD(e: Expression, like: DataType): Expression = like match {
    case TimestampType | TimestampNTZType => Cast(e, like)
    case DateType => DateFromUnixDate(Cast(
      Round(Divide(e, Literal(86400.0)), Literal(0)), IntegerType))
    case _: DayTimeIntervalType | CalendarIntervalType =>
      MakeDTInterval(Literal(0), Literal(0), Literal(0),
        Cast(e, DecimalType(18, 6)))
    case ByteType | ShortType | IntegerType | LongType =>
      Round(e, Literal(0)) // linterp_int* round() to the ordinate grid
    case _ => e
  }

  override lazy val replacement: Expression = {
    val xd = toD(x)
    val x0d = toD(x0)
    val x1d = toD(x1)
    val y0d = toD(y0)
    val y1d = toD(y1)
    // interpolate.c linterp_abscissa + linterp_*: x0 == x1 (C float
    // compare — NaN unequal to NaN, hence the IsNaN guards against
    // Spark's NaN==NaN semantics) is "equal bounds": the result is y0
    // when x == x0 AND y0 == y1, else NULL. Otherwise the standard
    // two-point form.
    val eqBounds = And(EqualTo(x1d, x0d), Not(IsNaN(x0d)))
    val eqAbscissas = And(EqualTo(xd, x0d), Not(IsNaN(xd)))
    val eqOrdinates = And(EqualTo(y0d, y1d), Not(IsNaN(y0d)))
    val p = Divide(Subtract(xd, x0d), Subtract(x1d, x0d))
    val value = Add(y0d, Multiply(p, Subtract(y1d, y0d)))
    val out = fromD(value, y0.dataType)
    If(eqBounds,
      If(And(eqAbscissas, eqOrdinates),
        fromD(y0d, y0.dataType), Literal.create(null, out.dataType)),
      out)
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): LinearInterpolate =
    copy(x = c(0), x0 = c(1), y0 = c(2), x1 = c(3), y1 = c(4))
}

/** `similarity(a, b)` — trigram similarity as a native binary expression
  * with codegen (preferred over a Scala UDF: stays inside whole-stage
  * codegen, null-safe for free).
  */
case class TrigramSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "similarity"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    GraftStrings.trigramSimilarity(
      a.asInstanceOf[UTF8String].toString, b.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.GraftStrings.trigramSimilarity($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TrigramSimilarity =
    copy(left = newLeft, right = newRight)
}

/** PG regexp_matches(s, pat, flags) match array — array<array<string>>
  * of capture groups per match; the SQL registration wraps it in
  * Explode for the setof-text[] surface (regexp.c:904 regexp_matches). */
case class PgRegexpMatches(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {
  override def dataType: DataType =
    ArrayType(ArrayType(StringType, containsNull = true),
      containsNull = false)
  override def prettyName: String = "regexp_matches"
  override protected def nullSafeEval(s: Any, p: Any, f: Any): Any =
    GraftStrings.pgRegexpMatches(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, f) =>
      s"graft.functions.GraftStrings.pgRegexpMatches($s, $p, $f)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PgRegexpMatches =
    copy(first = f, second = s, third = t)
}

/** PG regexp_split field array with the zero-length-match rules
  * (regexp.c regexp_split_to_array). */
case class PgRegexpSplitArr(first: Expression, second: Expression,
                            third: Expression) extends TernaryExpression {
  override def dataType: DataType =
    ArrayType(StringType, containsNull = false)
  override def prettyName: String = "regexp_split_to_array"
  override protected def nullSafeEval(s: Any, p: Any, f: Any): Any =
    GraftStrings.pgRegexpSplit(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], f.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, p, f) =>
      s"graft.functions.GraftStrings.pgRegexpSplit($s, $p, $f)")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PgRegexpSplitArr =
    copy(first = f, second = s, third = t)
}

/** PG 4-argument regexp_replace with PG's flag language and its
  * replace-FIRST-only default (regexp.c:600 textregexreplace). */
case class PgRegexpReplaceExpr(s: Expression, p: Expression,
                               r: Expression, f: Expression)
  extends QuaternaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "regexp_replace"
  override def first: Expression = s
  override def second: Expression = p
  override def third: Expression = r
  override def fourth: Expression = f
  override protected def nullSafeEval(a: Any, b: Any, c: Any, d: Any): Any =
    GraftStrings.pgRegexpReplace(a.asInstanceOf[UTF8String],
      b.asInstanceOf[UTF8String], c.asInstanceOf[UTF8String],
      d.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b, c, d) =>
      s"graft.functions.GraftStrings.pgRegexpReplace($a, $b, $c, $d)")
  override protected def withNewChildrenInternal(
      a: Expression, b: Expression, c: Expression,
      d: Expression): PgRegexpReplaceExpr =
    copy(s = a, p = b, r = c, f = d)
}

/** `substring(string, pattern)` regex form (regexp.c textregexsubstr). */
case class PgRegexpSubstr(left: Expression, right: Expression)
  extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // NULL on no match
  override def prettyName: String = "pg_regexp_substr"
  override protected def nullSafeEval(s: Any, p: Any): Any =
    GraftStrings.pgRegexpSubstr(
      s.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p) => s"""
      ${ev.value} = graft.functions.GraftStrings.pgRegexpSubstr($s, $p);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PgRegexpSubstr =
    copy(left = l, right = r)
}

/** `substring(string FROM similar_pattern FOR escape)` (SQL:1999,
  * regexp.c similar_escape + textregexsubstr_escape). */
case class PgSimilarSubstr(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true // NULL on no match
  override def prettyName: String = "pg_similar_substr"
  override protected def nullSafeEval(s: Any, p: Any, e: Any): Any =
    GraftStrings.pgSimilarSubstr(s.asInstanceOf[UTF8String],
      p.asInstanceOf[UTF8String], e.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, e) => s"""
      ${ev.value} = graft.functions.GraftStrings.pgSimilarSubstr($s, $p, $e);
      ${ev.isNull} = ${ev.value} == null;""")
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PgSimilarSubstr =
    copy(first = f, second = s, third = t)
}

/** arrayfuncs.c array_in — `{...}` text → nested array<string> of
  * the requested depth; an outer CAST converts elements to the
  * target type. */
case class PgArrayInExpr(child: Expression, depth: Int)
  extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    (1 to depth).foldLeft(StringType: DataType)((t, _) =>
      ArrayType(t, containsNull = true))
  override def prettyName: String = "pg_array_in"
  override protected def nullSafeEval(v: Any): Any =
    GraftStrings.pgArrayIn(v.asInstanceOf[UTF8String], depth)
  override protected def withNewChildInternal(c: Expression): PgArrayInExpr =
    copy(child = c)
}

/** arrayfuncs.c array_ndims / array_dims helpers over Spark's typed
  * arrays: the dimension count is the TYPE's nesting depth (values
  * store at the declared depth here); an empty array reports NULL,
  * PG's contract. */
case class PgArrayNdims(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  private lazy val depth: Int = {
    def d(t: DataType): Int = t match {
      case ArrayType(e, _) => 1 + d(e)
      case _ => 0
    }
    d(child.dataType)
  }
  override def prettyName: String = "array_ndims"
  override protected def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (a.numElements() == 0) null else depth
  }
  override protected def withNewChildInternal(c: Expression): PgArrayNdims =
    copy(child = c)
}

/** arrayfuncs.c cardinality — TOTAL element count across all
  * dimensions (Spark's builtin counts only the top level). */
case class PgCardinality(child: Expression) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "cardinality"
  override protected def nullSafeEval(v: Any): Any = {
    def count(a: org.apache.spark.sql.catalyst.util.ArrayData,
              t: DataType): Int = t match {
      case ArrayType(inner: ArrayType, _) =>
        (0 until a.numElements()).map { i =>
          if (a.isNullAt(i)) 0 else count(a.getArray(i), inner)
        }.sum
      case _ => a.numElements()
    }
    count(v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData],
      child.dataType match { case ArrayType(e, _) => ArrayType(e)
        case other => other })
  }
  override protected def withNewChildInternal(c: Expression): PgCardinality =
    copy(child = c)
}

/** arrayfuncs.c array_length(anyarray, dim): the requested
  * dimension's extent (walking first elements); out-of-range or
  * empty dimensions are NULL. */
case class PgArrayLength(left: Expression, right: Expression)
  extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "array_length"
  override protected def nullSafeEval(v: Any, d0: Any): Any = {
    val dim = d0.asInstanceOf[Number].intValue()
    var t = left.dataType
    var a = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    if (dim < 1) return null
    var level = 1
    while (level < dim) {
      t match {
        case ArrayType(inner: ArrayType, _) =>
          if (a.numElements() == 0 || a.isNullAt(0)) return null
          a = a.getArray(0)
          t = inner
          level += 1
        case _ => return null
      }
    }
    if (a.numElements() == 0) null else a.numElements()
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PgArrayLength = copy(left = l, right = r)
}

/** arrayfuncs.c array_fill(value, dims): a dims-shaped array filled
  * with value (lower-bound arrays are accepted and ignored — Spark
  * arrays are 1-based). The dims argument must be foldable so the
  * result TYPE is known at plan time. */
case class PgArrayFill(value: Expression, dims: Seq[Int])
  extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def child: Expression = value
  override def dataType: DataType =
    if (dims.isEmpty) ArrayType(value.dataType, containsNull = true)
    else dims.foldLeft(value.dataType)((t, _) =>
      ArrayType(t, containsNull = true))
  override def nullable: Boolean = false
  override def prettyName: String = "array_fill"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = value.eval(input)
    if (dims.isEmpty) // array_fill(v, '{}') → the empty array
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    def build(ds: Seq[Int]): Any = ds match {
      case Seq() => v
      case head +: tail =>
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array.fill[Any](head)(build(tail)))
    }
    build(dims)
  }
  override protected def withNewChildInternal(c: Expression): PgArrayFill =
    copy(value = c)
}

/** arrayfuncs.c array_cat + the `||` operator's element forms: equal
  * depths concatenate; a depth-(n-1) operand pushes/prepends as ONE
  * element (PG's array || element and matrix || row semantics). */
case class PgArrayConcat(left: Expression, right: Expression)
  extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  private def depth(t: DataType): Int = t match {
    case ArrayType(e, _) => 1 + depth(e)
    case _ => 0
  }
  private lazy val mode: String = {
    val dl = depth(left.dataType)
    val dr = depth(right.dataType)
    if (dl == dr && dl > 0) "cat"
    else if (dl == dr + 1) "append"
    else if (dr == dl + 1) "prepend"
    else throw new IllegalArgumentException(
      s"cannot concatenate ${left.dataType} and ${right.dataType}")
  }
  override def dataType: DataType =
    if (mode == "prepend") right.dataType else left.dataType
  override def prettyName: String = "array_cat"
  override protected def nullSafeEval(l: Any, r: Any): Any = {
    import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
    def elems(a: Any, t: DataType): Array[Any] = {
      val ad = a.asInstanceOf[ArrayData]
      val et = t.asInstanceOf[ArrayType].elementType
      ad.toObjectArray(et).asInstanceOf[Array[Any]]
    }
    mode match {
      case "cat" =>
        new GenericArrayData(
          elems(l, left.dataType) ++ elems(r, right.dataType))
      case "append" =>
        new GenericArrayData(elems(l, left.dataType) :+ r)
      case _ =>
        new GenericArrayData(l +: elems(r, right.dataType))
    }
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PgArrayConcat = copy(left = l, right = r)
}

/** varlena.c text_to_array — PG's exact edge semantics: NULL
  * delimiter → one element per CHARACTER; empty delimiter → the whole
  * string as a single element; a third argument is the null-string
  * marker (fields equal to it become NULL). */
case class PgStringToArray(first: Expression, second: Expression,
                           third: Expression) extends TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def nullable: Boolean = true
  override def prettyName: String = "string_to_array"
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s0 = first.eval(input)
    if (s0 == null) return null
    val s = s0.asInstanceOf[UTF8String].toString
    val delim0 = second.eval(input)
    val nullStr = Option(third.eval(input)).map(_.toString)
    if (s.isEmpty) // text_to_array: empty input → empty array
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.empty[Any])
    val parts: Seq[String] =
      if (delim0 == null) s.map(_.toString)
      else {
        val d = delim0.toString
        if (d.isEmpty) Seq(s)
        else {
          val out = scala.collection.mutable.ArrayBuffer.empty[String]
          var from = 0
          var at = s.indexOf(d, from)
          while (at >= 0) {
            out += s.substring(from, at)
            from = at + d.length
            at = s.indexOf(d, from)
          }
          out += s.substring(from)
          out.toSeq
        }
      }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      parts.map { p =>
        if (nullStr.contains(p)) null else UTF8String.fromString(p)
      }.toArray[Any])
  }
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): PgStringToArray =
    copy(first = f, second = s, third = t)
}

/** varlena.c byteain — text → bytea honoring PG's hex (`\x...`) and
  * escape (`\\`, `\nnn`) input formats. A binary child passes
  * through so `col::bytea` on an already-binary column is identity. */
case class PgByteaIn(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BinaryType
  override def prettyName: String = "byteain"
  override protected def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType => v
    case _ => GraftStrings.byteaIn(v.asInstanceOf[UTF8String])
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    child.dataType match {
      case BinaryType => defineCodeGen(ctx, ev, c => c)
      case _ => defineCodeGen(ctx, ev,
        c => s"graft.functions.GraftStrings.byteaIn($c)")
    }
  override protected def withNewChildInternal(c: Expression): PgByteaIn =
    copy(child = c)
}

/** GP timeseries interval/interval arithmetic (reference
  * `src/backend/utils/adt/timestamp.c` interval_interval_div /
  * interval_interval_mod): both operands collapse to seconds with
  * PG's calendar assumptions (month = 30 days, day = 24 h); div is
  * the double ratio, mod the truncated remainder as a day-time
  * interval. Cold path — interpreted eval. */
object PgIntervalOps {
  def toSeconds(v: Any): Double = v match {
    case d: java.time.Duration => d.toNanos / 1e9
    case p: java.time.Period =>
      (p.toTotalMonths * 30L * 86400L + p.getDays * 86400L).toDouble
    case c: org.apache.spark.unsafe.types.CalendarInterval =>
      c.months * 30.0 * 86400 + c.days * 86400.0 + c.microseconds / 1e6
    case l: java.lang.Long => l.toDouble / 1e6 // DayTimeIntervalType micros
    case i: java.lang.Integer => i.toDouble * 30 * 86400 // YM months
    case other => throw new IllegalArgumentException(
      s"not an interval: $other")
  }
}

case class PgIntervalDiv(left: Expression, right: Expression)
  extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "interval_interval_div"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PgIntervalOps.toSeconds(a) / PgIntervalOps.toSeconds(b)
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PgIntervalDiv = copy(left = l, right = r)
}

case class PgIntervalMod(left: Expression, right: Expression)
  extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType =
    DayTimeIntervalType(DayTimeIntervalType.DAY, DayTimeIntervalType.SECOND)
  override def prettyName: String = "interval_interval_mod"
  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = PgIntervalOps.toSeconds(a)
    val y = PgIntervalOps.toSeconds(b)
    val rem = x - (x / y).toLong * y // trunc toward zero, PG's C '/'
    (rem * 1e6).toLong // DayTimeIntervalType internal micros
  }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PgIntervalMod = copy(left = l, right = r)
}

/** GP timeseries interval_bound(value, width[, shift[, reg]]) —
  * reference `utils/adt/timestamp.c:328` timestamp_interval_bound_common
  * and `numeric.c:2335` numeric_interval_bound_common. The largest
  * multiple of `width` (registered to `reg`, default the 1970 epoch /
  * zero) not above `value`, plus `shift` widths. Numeric: NaN
  * propagates, floor arithmetic. Timestamps: the C convergence search
  * with calendar-aware stepping — month/day components step wall-clock
  * time (NTZ naive; LTZ in the session zone), exactly
  * timestamp_offset_multiple. NULL value/width → NULL; NULL
  * shift → 0; NULL reg → the default. */
case class PgIntervalBound(children: Seq[Expression]) extends Expression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def nullable: Boolean = true
  override def dataType: DataType = children.head.dataType match {
    case TimestampType => TimestampType
    case TimestampNTZType => TimestampNTZType
    case _ => DoubleType
  }

  private def numD(v: Any): Double = v match {
    case n: Number => n.doubleValue()
    case d: Decimal => d.toDouble
    case other => other.toString.toDouble
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val vv = children(0).eval(input)
    val ww = children(1).eval(input)
    if (vv == null || ww == null) return null
    val sh = if (children.length > 2) children(2).eval(input) else null
    val shift = if (sh == null) 0L else sh.asInstanceOf[Number].longValue()
    val rg = if (children.length > 3) children(3).eval(input) else null
    children.head.dataType match {
      case TimestampType | TimestampNTZType =>
        val naive = children.head.dataType == TimestampNTZType
        val valMicros = vv.asInstanceOf[Long]
        val (months, days, micros) = ww match {
          case ci: org.apache.spark.unsafe.types.CalendarInterval =>
            (ci.months.toLong, ci.days.toLong, ci.microseconds)
          case l: java.lang.Long => (0L, 0L, l.longValue) // DT micros
          case i: java.lang.Integer => (i.longValue, 0L, 0L) // YM months
        }
        val widthSecs = months * 30.0 * 86400 + days * 86400.0 + micros / 1e6
        if (widthSecs <= 0) throw new IllegalArgumentException(
          "width of time interval not positive")
        val regMicros = if (rg == null) 0L else rg.asInstanceOf[Long]
        val zone =
          if (naive) java.time.ZoneOffset.UTC
          else org.apache.spark.sql.catalyst.util.DateTimeUtils.getZoneId(
            org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        def offsetMultiple(n: Long): Long =
          if (months == 0 && days == 0) regMicros + n * micros
          else {
            val zdt = java.time.Instant.ofEpochSecond(
              Math.floorDiv(regMicros, 1000000L),
              Math.floorMod(regMicros, 1000000L) * 1000L).atZone(zone)
            val stepped = zdt.plusMonths(n * months).plusDays(n * days)
              .plus(n * micros, java.time.temporal.ChronoUnit.MICROS)
            stepped.toEpochSecond * 1000000L + stepped.getNano / 1000L
          }
        var index = ((valMicros - regMicros) / 1e6 / widthSecs).toLong
        var safety = 64
        var low = 0L
        var done = false
        while (!done) {
          safety -= 1
          if (safety <= 0) throw new IllegalStateException(
            "interval_bound failed to converge")
          low = offsetMultiple(index)
          val high = offsetMultiple(index + 1)
          if (valMicros >= high) {
            val quo = ((valMicros - high) / 1e6 / widthSecs).toLong
            index += (if (quo > 0) quo else 1)
          } else if (valMicros < low) {
            val quo = ((low - valMicros) / 1e6 / widthSecs).toLong
            index -= (if (quo > 0) quo else 1)
          } else done = true
        }
        if (shift != 0) offsetMultiple(index + shift) else low
      case _ =>
        val vd = numD(vv)
        val wd = numD(ww)
        val rd = if (rg == null) 0.0 else numD(rg)
        if (vd.isNaN || wd.isNaN || rd.isNaN) Double.NaN
        else {
          if (wd <= 0) throw new IllegalArgumentException(
            "width of numeric interval not positive")
          math.floor((vd - rd) / wd) * wd + shift * wd + rd
        }
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PgIntervalBound = copy(children = c)
}

/** encode.c esc_encode — the `encode(bytea, 'escape')` form (octal
  * only for NUL/high-bit; control bytes pass raw). */
case class PgEscEncode(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "esc_encode"
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      GraftStrings.escEncode(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GraftStrings.escEncode($c))")
  override protected def withNewChildInternal(c: Expression): PgEscEncode =
    copy(child = c)
}

/** PG btrim over EITHER type family (varlena.c btrim / byteatrim):
  * binary children trim by byte set; everything else trims chars as
  * text. Dispatch is on the resolved child type, so the one SQL name
  * serves both — cold path, interpreted eval. */
case class PgBtrim(left: Expression, right: Expression)
  extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = left.dataType match {
    case BinaryType => BinaryType
    case _ => StringType
  }
  override def prettyName: String = "btrim"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    (a, b) match {
      case (x: Array[Byte], y: Array[Byte]) =>
        GraftStrings.byteaTrim(x, y)
      case _ =>
        val s = a.asInstanceOf[UTF8String].toString
        val set = b.asInstanceOf[UTF8String].toString.toSet
        var lo = 0
        var hi = s.length
        while (lo < hi && set.contains(s.charAt(lo))) lo += 1
        while (hi > lo && set.contains(s.charAt(hi - 1))) hi -= 1
        UTF8String.fromString(s.substring(lo, hi))
    }
  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): PgBtrim =
    copy(left = l, right = r)
}

/** varlena.c byteaout, escape mode — bytea → text with printable
  * ASCII as-is, `\\` for backslash, `\nnn` octal otherwise. */
case class PgByteaOutEscape(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "byteaout_escape"
  override protected def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      GraftStrings.byteaOutEscape(v.asInstanceOf[Array[Byte]]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.GraftStrings.byteaOutEscape($c))")
  override protected def withNewChildInternal(c: Expression): PgByteaOutEscape =
    copy(child = c)
}

/** `simhash64(text)` — 64-bit SimHash fingerprint (near-dup detection at
  * hamming distance ≤ k). Codegen-native unary expression. */
case class SimHash64(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    GraftStrings.simhash64(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftStrings.simhash64($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `winnow(text, k, w)` — winnowed rolling-hash fingerprints. */
case class Winnow(child: Expression, k: Int, w: Int)
  extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      GraftStrings.winnow(v.asInstanceOf[UTF8String].toString, k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.GraftStrings.winnow($c.toString(), $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): Winnow =
    copy(child = newChild)
}

/** `lang_id(text)` — heuristic language identification. */
case class LangId(child: Expression)
  extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(v: Any): Any =
    GraftStrings.langId(v.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GraftStrings.langId($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): LangId =
    copy(child = newChild)
}

/** Weighted average as a typed Aggregator — the parity surface for the
  * reference's `CREATE AGGREGATE (sfunc, combinefunc, finalfunc)`
  * (`src/include/catalog/pg_aggregate.h:33-61`): `reduce` == sfunc,
  * `merge` == combinefn (2-stage distributed agg), `finish` == finalfn.
  * Accumulates in exact decimal so the distributed merge order cannot
  * perturb the double result.
  */
class WeightedAvg extends org.apache.spark.sql.expressions.Aggregator[
    (Double, Double), (java.math.BigDecimal, java.math.BigDecimal), Double] {
  import java.math.BigDecimal
  private def dec(d: Double) = BigDecimal.valueOf(d).setScale(6, java.math.RoundingMode.HALF_UP)
  override def zero: (BigDecimal, BigDecimal) = (BigDecimal.ZERO, BigDecimal.ZERO)
  override def reduce(b: (BigDecimal, BigDecimal), in: (Double, Double)): (BigDecimal, BigDecimal) =
    (b._1.add(dec(in._1).multiply(dec(in._2))), b._2.add(dec(in._2)))
  override def merge(a: (BigDecimal, BigDecimal), b: (BigDecimal, BigDecimal)): (BigDecimal, BigDecimal) =
    (a._1.add(b._1), a._2.add(b._2))
  override def finish(r: (BigDecimal, BigDecimal)): Double =
    if (r._2.signum() == 0) Double.NaN else r._1.doubleValue() / r._2.doubleValue()
  override def bufferEncoder = org.apache.spark.sql.Encoders.tuple(
    org.apache.spark.sql.Encoders.DECIMAL, org.apache.spark.sql.Encoders.DECIMAL)
  override def outputEncoder = org.apache.spark.sql.Encoders.scalaDouble
}

/** Registration: exposes the custom expressions to SQL + DataFrame
  * (`expr("similarity(a,b)")`). Also usable as a SparkSessionExtensions
  * hook via [[GraftExtensions]].
  */
object GraftFunctions {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft", null, name, usage, "")

  def register(spark: SparkSession): Unit = {
    TsDictionaries.refresh(spark) // ts_lexize over the dictionary registry
    val reg = spark.sessionState.functionRegistry
    reg.registerFunction(
      FunctionIdentifier("linear_interpolate"),
      info("linear_interpolate", "linear_interpolate(x, x0, y0, x1, y1)"),
      (args: Seq[Expression]) => new LinearInterpolate(args(0), args(1), args(2), args(3), args(4)))
    reg.registerFunction(
      FunctionIdentifier("similarity"),
      info("similarity", "similarity(a, b) - trigram jaccard similarity"),
      (args: Seq[Expression]) => TrigramSimilarity(args(0), args(1)))
    // the PG median CREATE AGGREGATE idiom (array_append transition +
    // avg-of-middle final): continuous-interpolation percentile at 0.5
    // is value-for-value the same result (odd n → middle, even n →
    // mean of the two middles) — PgAggregates.create aliases to this
    // PG chr(): code-point semantics above 255 (oracle_compat.c) —
    // replaces Spark's MySQL-style n % 256 builtin
    reg.registerFunction(
      FunctionIdentifier("chr"),
      info("chr", "chr(n) - the character with Unicode code point n"),
      (args: Seq[Expression]) => PgChr(Cast(args(0), LongType)))
    // geometric text I/O (geo_ops.c): lseg_in/box_in canonical forms,
    // box_area for PG's area-based box comparison; textout = text cast
    reg.registerFunction(
      FunctionIdentifier("lseg_in"),
      info("lseg_in", "lseg_in(text) - canonical [(x1,y1),(x2,y2)]"),
      (args: Seq[Expression]) => PgLsegIn(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("box_in"),
      info("box_in", "box_in(text) - canonical (hi),(lo) box"),
      (args: Seq[Expression]) => PgBoxIn(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("box_area"),
      info("box_area", "box_area(box) - width * height"),
      (args: Seq[Expression]) => PgBoxArea(Cast(args(0), StringType)))
    // array_lower/array_upper over plain (1-based) SQL arrays
    // (arrayfuncs.c): NULL for an empty array, as PG returns
    reg.registerFunction(
      FunctionIdentifier("pg_lcm"),
      info("pg_lcm", "pg_lcm(array<bigint>) - LCM, 0 if any is 0"),
      (args: Seq[Expression]) =>
        PgLcm(Cast(args(0), ArrayType(LongType))))
    reg.registerFunction(
      FunctionIdentifier("array_lower"),
      info("array_lower", "array_lower(a, dim) - 1, NULL when empty"),
      (args: Seq[Expression]) =>
        If(GreaterThan(Size(args(0)), Literal(0)),
          Literal(1), Literal(null, IntegerType)))
    reg.registerFunction(
      FunctionIdentifier("array_upper"),
      info("array_upper", "array_upper(a, dim) - size, NULL when empty"),
      (args: Seq[Expression]) =>
        If(GreaterThan(Size(args(0)), Literal(0)),
          Size(args(0)), Literal(null, IntegerType)))
    reg.registerFunction(
      FunctionIdentifier("textout"),
      info("textout", "textout(x) - the text form of x"),
      (args: Seq[Expression]) => Cast(args(0), StringType))
    reg.registerFunction(
      FunctionIdentifier("pg_median"),
      info("pg_median", "pg_median(x) - median (percentile_cont 0.5)"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.Percentile(
          args(0), org.apache.spark.sql.catalyst.expressions.Literal(0.5)))
    reg.registerFunction(
      FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(text) - 64-bit simhash fingerprint"),
      (args: Seq[Expression]) => SimHash64(args(0)))
    reg.registerFunction(
      FunctionIdentifier("lang_id"),
      info("lang_id", "lang_id(text) - heuristic language id"),
      (args: Seq[Expression]) => LangId(args(0)))
    reg.registerFunction(
      FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - sequential-fold dot product"),
      (args: Seq[Expression]) => VecDot(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("jsonb_contains"),
      info("jsonb_contains", "jsonb_contains(doc, needle) - PG @> recursive containment"),
      (args: Seq[Expression]) => JsonbContains(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("jsonb_set"),
      info("jsonb_set", "jsonb_set(doc, '{a,1,b}', newval) - PG setPath update"),
      (args: Seq[Expression]) => JsonbSet(Cast(args(0), StringType),
        Cast(args(1), StringType), Cast(args(2), StringType)))
    // the PG JSON constructor/utility spellings users actually write
    // (json.c/jsonfuncs.c) — thin trees over codegen built-ins where
    // possible; text output is the engine's compact normal form
    // PG keeps explicit nulls in built JSON (json_strip_nulls exists
    // to remove them) — pin ignoreNullFields off
    val keepNulls = Map("ignoreNullFields" -> "false")
    reg.registerFunction(
      FunctionIdentifier("json_build_object"),
      info("json_build_object", "json_build_object(k1, v1, ...) - object from pairs"),
      (args: Seq[Expression]) => StructsToJson(keepNulls, CreateNamedStruct(args)))
    reg.registerFunction(
      FunctionIdentifier("jsonb_build_object"),
      info("jsonb_build_object", "jsonb_build_object(k1, v1, ...) - object from pairs"),
      (args: Seq[Expression]) => StructsToJson(keepNulls, CreateNamedStruct(args)))
    reg.registerFunction(
      FunctionIdentifier("json_build_array"),
      info("json_build_array", "json_build_array(v1, ...) - array from values"),
      (args: Seq[Expression]) => StructsToJson(keepNulls, CreateArray(args)))
    reg.registerFunction(
      FunctionIdentifier("json_agg"),
      info("json_agg", "json_agg(x) - aggregate values into one JSON array"),
      (args: Seq[Expression]) => StructsToJson(keepNulls,
        aggregate.CollectList(args(0)).toAggregateExpression()))
    reg.registerFunction(
      FunctionIdentifier("json_object_agg"),
      info("json_object_agg", "json_object_agg(k, v) - aggregate pairs into one object"),
      (args: Seq[Expression]) => StructsToJson(keepNulls,
        MapFromEntries(aggregate.CollectList(
          CreateStruct(Seq(Cast(args(0), StringType), args(1))))
          .toAggregateExpression())))
    reg.registerFunction(
      FunctionIdentifier("jsonb_pretty"),
      info("jsonb_pretty", "jsonb_pretty(doc) - 4-space indented form"),
      (args: Seq[Expression]) => JsonbPretty(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("json_strip_nulls"),
      info("json_strip_nulls", "json_strip_nulls(doc) - drop null object fields"),
      (args: Seq[Expression]) => JsonStripNulls(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("json_array_elements"),
      info("json_array_elements", "json_array_elements(doc) - one row per array element"),
      (args: Seq[Expression]) => Explode(JsonArrayElements(Cast(args(0), StringType))))
    reg.registerFunction(
      FunctionIdentifier("jsonb_set_all"),
      info("jsonb_set_all",
        "jsonb_set_all(doc, p1, v1, ...) - every jsonb_set with one parse"),
      (args: Seq[Expression]) => JsonbSetAll(args.map(Cast(_, StringType))))
    reg.registerFunction(
      FunctionIdentifier("to_char_pg"),
      info("to_char_pg", "to_char_pg(num, fmt) - PG numeric template formatting"),
      (args: Seq[Expression]) => ToChar(Cast(args(0), DoubleType), args(1)))
    // COMPLEX builtin surface (complex_type.c) — constructor, field
    // accessors, conjugate/negate/magnitude — over the re/im struct.
    // The constructor takes PG float8in spellings ('infinity', 'nan')
    // through the same template the typed literal uses.
    locally {
      import org.apache.spark.sql.catalyst.analysis.UnresolvedExtractValue
      import org.apache.spark.sql.catalyst.parser.CatalystSqlParser
      def cfield(e: Expression, f: String): Expression =
        UnresolvedExtractValue(e, Literal(UTF8String.fromString(f), StringType))
      def pgFloat(e: Expression): Expression = {
        val tmpl = CatalystSqlParser.parseExpression(
          graft.operators.PgComplex.pgFloatSql("__arg0"))
        tmpl.transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.name.equalsIgnoreCase("__arg0") => e
        }
      }
      def mkComplex(re0: Expression, im0: Expression): Expression =
        CreateNamedStruct(Seq(
          Literal(UTF8String.fromString("re"), StringType), re0,
          Literal(UTF8String.fromString("im"), StringType), im0))
      reg.registerFunction(
        FunctionIdentifier("complex"),
        info("complex", "complex(re, im) - complex constructor"),
        (args: Seq[Expression]) =>
          mkComplex(pgFloat(args(0)), pgFloat(args(1))))
      reg.registerFunction(
        FunctionIdentifier("re"),
        info("re", "re(z) - real part"),
        (args: Seq[Expression]) => cfield(args(0), "re"))
      reg.registerFunction(
        FunctionIdentifier("im"),
        info("im", "im(z) - imaginary part"),
        (args: Seq[Expression]) => cfield(args(0), "im"))
      reg.registerFunction(
        FunctionIdentifier("conj"),
        info("conj", "conj(z) - complex conjugate"),
        (args: Seq[Expression]) => mkComplex(cfield(args(0), "re"),
          UnaryMinus(cfield(args(0), "im"))))
      reg.registerFunction(
        FunctionIdentifier("complex_neg"),
        info("complex_neg", "complex_neg(z) - unary minus"),
        (args: Seq[Expression]) => mkComplex(
          UnaryMinus(cfield(args(0), "re")),
          UnaryMinus(cfield(args(0), "im"))))
      reg.registerFunction(
        FunctionIdentifier("complex_abs"),
        info("complex_abs", "complex_abs(z) - magnitude (hypot)"),
        (args: Seq[Expression]) => Hypot(cfield(args(0), "re"),
          cfield(args(0), "im")))
      // complex_dot_product (complex_type.c): Σ a[i]·b[i] under
      // complex multiplication — pure HOF expressions (a Column
      // round-trip would leave an un-codegen-able ColumnNode wrapper,
      // so the tree is parsed directly)
      def tpl2(sqlText: String, a0: Expression, a1: Expression): Expression =
        CatalystSqlParser.parseExpression(sqlText).transformUp {
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.name.equalsIgnoreCase("__arg0") => a0
          case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
              if a.name.equalsIgnoreCase("__arg1") => a1
        }
      // a NULL element nulls a field of the running sum; the whole
      // result then collapses to NULL (PG's strict-function behavior)
      val dotAgg =
        """aggregate(
          |  zip_with(__arg0, __arg1, (x, y) -> named_struct(
          |    're', x.re * y.re - x.im * y.im,
          |    'im', x.re * y.im + x.im * y.re)),
          |  named_struct('re', CAST(0 AS DOUBLE), 'im', CAST(0 AS DOUBLE)),
          |  (acc, p) -> named_struct(
          |    're', acc.re + p.re, 'im', acc.im + p.im))""".stripMargin
      val dotSql =
        s"""CASE WHEN ($dotAgg).re IS NULL OR ($dotAgg).im IS NULL
           |THEN CAST(NULL AS STRUCT<re: DOUBLE, im: DOUBLE>)
           |ELSE $dotAgg END""".stripMargin
      for (n <- Seq("dot_product", "dotproduct"))
        reg.registerFunction(
          FunctionIdentifier(n),
          info(n, s"$n(complex[], complex[]) - complex dot product"),
          (args: Seq[Expression]) => tpl2(dotSql, args(0), args(1)))
      // nextval('seq') in expression position (sequence.c): the name
      // must be a literal — each call site reserves its own id block
      reg.registerFunction(
        FunctionIdentifier("nextval"),
        info("nextval", "nextval('seq') - next block of sequence ids"),
        (args: Seq[Expression]) => {
          val base = graft.operators.GreengageDdl.nextvalBase0(
            args(0).eval().toString)
          CatalystSqlParser.parseExpression(
            s"CASE WHEN spark_partition_id() < 2048 " +
              s"THEN monotonically_increasing_id() + ${base}L " +
              "ELSE CAST(raise_error('nextval: >2047 partitions " +
              "overflows the reserved id block') AS BIGINT) END")
        })
    }
    // PG decode(text, format) → bytea (utils/adt/encode.c): base64 /
    // hex / escape. Fires ONLY on the 2-arg form with one of PG's
    // three format literals; every other shape delegates to Spark's
    // own Decode (which carries both the Oracle-style CASE form the
    // reference ships as DECODE and the charset form).
    reg.registerFunction(
      FunctionIdentifier("decode"),
      info("decode", "decode(text, fmt) - PG base64/hex/escape to binary; else Spark decode"),
      (args: Seq[Expression]) => {
        val fmt = try {
          if (args.length == 2 && args(1).foldable)
            Option(args(1).eval()).map(_.toString.toLowerCase)
          else None
        } catch { case _: Exception => None }
        fmt match {
          case Some("base64") => UnBase64(args(0))
          case Some("hex") => Unhex(args(0))
          case Some("escape") => PgByteaIn(args(0)) // byteain semantics
          case _ => new Decode(args.toIndexedSeq.toSeq)
        }
      })
    // PG encode(bytea, format) → text (encode.c): base64 / hex /
    // escape. Other shapes delegate to Spark's charset Encode.
    reg.registerFunction(
      FunctionIdentifier("encode"),
      info("encode", "encode(bytea, fmt) - PG base64/hex/escape to text; else Spark encode"),
      (args: Seq[Expression]) => {
        val fmt = try {
          if (args.length == 2 && args(1).foldable)
            Option(args(1).eval()).map(_.toString.toLowerCase)
          else None
        } catch { case _: Exception => None }
        fmt match {
          case Some("base64") => Base64(args(0))
          case Some("hex") => Lower(Hex(args(0)))
          case Some("escape") => PgEscEncode(args(0))
          case _ => new Encode(args(0), args(1))
        }
      })
    // btrim over bytea OR text children (the bytea form would
    // otherwise silently cast to string and trim chars)
    reg.registerFunction(
      FunctionIdentifier("btrim"),
      info("btrim", "btrim(s[, chars]) - PG both-ends trim, text or bytea"),
      (args: Seq[Expression]) =>
        if (args.length >= 2) PgBtrim(args(0), args(1))
        else StringTrim(args(0)))
    // PG ltrim/rtrim argument order is (string, characters) —
    // varlena.c ltrim; Spark's own 2-arg spelling is REVERSED
    // (trimStr first). pg_-prefixed for the same name-routing reason
    // as pg_regexp_replace; the front door renames the calls.
    reg.registerFunction(
      FunctionIdentifier("pg_ltrim"),
      info("pg_ltrim", "ltrim(s[, chars]) - PG argument order"),
      (args: Seq[Expression]) =>
        if (args.length >= 2) StringTrimLeft(args(0), Some(args(1)))
        else StringTrimLeft(args(0)))
    reg.registerFunction(
      FunctionIdentifier("pg_rtrim"),
      info("pg_rtrim", "rtrim(s[, chars]) - PG argument order"),
      (args: Seq[Expression]) =>
        if (args.length >= 2) StringTrimRight(args(0), Some(args(1)))
        else StringTrimRight(args(0)))
    // PG text_substr bound clamping (varlena.c:854): a start below 1
    // shifts INTO the string — substr('abc', -1, 5) reads positions
    // -1..3 → 'abc'; Spark's negative start counts from the END
    reg.registerFunction(
      FunctionIdentifier("substr"),
      info("substr", "substr(s, start[, len]) - PG bound clamping"),
      (args: Seq[Expression]) => {
        val s = args(0)
        val st = Cast(args(1), IntegerType)
        if (args.length >= 3) {
          val len = Cast(args(2), IntegerType)
          val lenAdj = Add(len,
            Least(Seq(Subtract(st, Literal(1)), Literal(0))))
          If(LessThanOrEqual(lenAdj, Literal(0)),
            Literal(UTF8String.fromString(""), StringType),
            Substring(s, Greatest(Seq(st, Literal(1))), lenAdj))
        } else
          Substring(s, Greatest(Seq(st, Literal(1))),
            Literal(Int.MaxValue))
      })
    // substring(s, from, count) shares text_substr's clamping
    // (varlena.c:854): from=0 reads positions 0..count-1, so the
    // result is count-1 chars — Spark's builtin treats 0 as 1
    reg.registerFunction(
      FunctionIdentifier("substring"),
      info("substring", "substring(s, from[, count]) - PG clamping"),
      (args: Seq[Expression]) => {
        val s = args(0)
        val st = Cast(args(1), IntegerType)
        if (args.length >= 3) {
          val len = Cast(args(2), IntegerType)
          val lenAdj = Add(len,
            Least(Seq(Subtract(st, Literal(1)), Literal(0))))
          If(LessThanOrEqual(lenAdj, Literal(0)),
            Literal(UTF8String.fromString(""), StringType),
            Substring(s, Greatest(Seq(st, Literal(1))), lenAdj))
        } else
          Substring(s, Greatest(Seq(st, Literal(1))),
            Literal(Int.MaxValue))
      })
    // 1-arg trunc(numeric): truncate toward zero (numeric.c trunc);
    // the 2-arg form stays Spark's trunc(date, fmt)
    reg.registerFunction(
      FunctionIdentifier("trunc"),
      info("trunc", "trunc(x) - toward zero; trunc(date, fmt) - Spark"),
      (args: Seq[Expression]) =>
        if (args.length == 1)
          If(GreaterThanOrEqual(args(0), Literal(0)),
            Floor(args(0)), Ceil(args(0)))
        else TruncDate(args(0), args(1)))
    for (n <- Seq("network", "broadcast", "netmask", "hostmask"))
      reg.registerFunction(
        FunctionIdentifier(s"inet_$n"),
        info(s"inet_$n", s"inet_$n(inet) - network.c $n, both families"),
        (args: Seq[Expression]) => InetStrOp(args(0), n))
    for (n <- Seq("masklen", "family"))
      reg.registerFunction(
        FunctionIdentifier(s"inet_$n"),
        info(s"inet_$n", s"inet_$n(inet) - network.c $n, both families"),
        (args: Seq[Expression]) => InetIntOp(args(0), n))
    reg.registerFunction(
      FunctionIdentifier("inet_sub"),
      info("inet_sub", "inet_sub(ip, net) - PG << strict containment"),
      (args: Seq[Expression]) => InetContains(args(0), args(1), strict = true))
    reg.registerFunction(
      FunctionIdentifier("inet_subeq"),
      info("inet_subeq", "inet_subeq(ip, net) - PG <<= containment"),
      (args: Seq[Expression]) => InetContains(args(0), args(1), strict = false))
    reg.registerFunction(
      FunctionIdentifier("winnow"),
      info("winnow", "winnow(text, k, w) - winnowed rolling-hash fingerprints"),
      (args: Seq[Expression]) => Winnow(args(0),
        args(1).eval().asInstanceOf[Number].intValue(),
        args(2).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, k) - distinct word k-grams"),
      (args: Seq[Expression]) => WordShingles(args(0),
        args(1).eval().asInstanceOf[Number].intValue()))
    reg.registerFunction(
      FunctionIdentifier("lsh_buckets"),
      info("lsh_buckets", "lsh_buckets(vec, nTables, nPlanes, dim, seed) - sign-LSH bucket keys"),
      (args: Seq[Expression]) => {
        def i(n: Int) = args(n).eval().asInstanceOf[Number]
        LshBuckets(args(0), i(1).intValue(), i(2).intValue(),
          i(3).intValue(), i(4).longValue())
      })
    reg.registerFunction(
      FunctionIdentifier("to_char_dt"),
      info("to_char_dt", "to_char_dt(ts, fmt) - PG DCH date/time templates"),
      (args: Seq[Expression]) => ToCharDt(Cast(args(0), TimestampNTZType), args(1)))
    // `to_char` itself overrides Spark's builtin (Spark keeps a zero
    // integer digit under a 9-mask where PG blanks it). PG dispatches
    // on the VALUE's type; unresolved args force dispatching on the
    // format literal instead — DCH tokens → datetime, else numeric
    // masks. A non-literal format falls to the numeric side.
    reg.registerFunction(
      FunctionIdentifier("to_char"),
      info("to_char", "to_char(value, fmt) - PG numeric masks + DCH templates"),
      (args: Seq[Expression]) => {
        val fmt = try {
          if (args(1).foldable) Option(args(1).eval()).map(_.toString)
          else None
        } catch { case _: Exception => None }
        val isDch = fmt.exists(f => ("(?i)(YY|MM|DD|HH|SS|MS|US|TZ|" +
          "AM|PM|A\\.M|P\\.M|DAY|DY|MON|IW|ID|[JQW])").r
          .findFirstIn(f).isDefined)
        if (isDch) ToCharDt(Cast(args(0), TimestampNTZType), args(1))
        else ToChar(Cast(args(0), DoubleType), args(1))
      })
    reg.registerFunction(
      FunctionIdentifier("plpgsql_catch"),
      info("plpgsql_catch", "plpgsql_catch(body, handler, cond) - EXCEPTION block"),
      (args: Seq[Expression]) => PlpgsqlCatch(args(0), args(1),
        args(2).eval().toString))
    reg.registerFunction(
      FunctionIdentifier("porter_stem"),
      info("porter_stem", "porter_stem(word) - Porter suffix-stripping stemmer"),
      (args: Seq[Expression]) => PorterStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("byte_position"),
      info("byte_position", "byte_position(bytea, sub) - PG position(sub IN b)"),
      (args: Seq[Expression]) => BytePosition(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("adjacent_uniq"),
      info("adjacent_uniq", "adjacent_uniq(int[]) - intarray uniq(): adjacent dedup"),
      (args: Seq[Expression]) => AdjacentUniq(args(0)))
    reg.registerFunction(
      FunctionIdentifier("german_stem"),
      info("german_stem", "german_stem(word) - snowball German stemmer"),
      (args: Seq[Expression]) => GermanStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("french_stem"),
      info("french_stem", "french_stem(word) - snowball French stemmer"),
      (args: Seq[Expression]) => FrenchStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("spanish_stem"),
      info("spanish_stem", "spanish_stem(word) - snowball Spanish stemmer"),
      (args: Seq[Expression]) => SpanishStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("italian_stem"),
      info("italian_stem", "italian_stem(word) - snowball Italian stemmer"),
      (args: Seq[Expression]) => ItalianStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("portuguese_stem"),
      info("portuguese_stem", "portuguese_stem(word) - snowball Portuguese stemmer"),
      (args: Seq[Expression]) => PortugueseStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("russian_stem"),
      info("russian_stem", "russian_stem(word) - snowball Russian stemmer"),
      (args: Seq[Expression]) => RussianStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("dutch_stem"),
      info("dutch_stem", "dutch_stem(word) - snowball Dutch stemmer"),
      (args: Seq[Expression]) => DutchStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("danish_stem"),
      info("danish_stem", "danish_stem(word) - snowball Danish stemmer"),
      (args: Seq[Expression]) => DanishStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("norwegian_stem"),
      info("norwegian_stem", "norwegian_stem(word) - snowball Norwegian stemmer"),
      (args: Seq[Expression]) => NorwegianStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("swedish_stem"),
      info("swedish_stem", "swedish_stem(word) - snowball Swedish stemmer"),
      (args: Seq[Expression]) => SwedishStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("finnish_stem"),
      info("finnish_stem", "finnish_stem(word) - snowball Finnish stemmer"),
      (args: Seq[Expression]) => FinnishStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("hungarian_stem"),
      info("hungarian_stem", "hungarian_stem(word) - snowball Hungarian stemmer"),
      (args: Seq[Expression]) => HungarianStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("romanian_stem"),
      info("romanian_stem", "romanian_stem(word) - snowball Romanian stemmer"),
      (args: Seq[Expression]) => RomanianStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("turkish_stem"),
      info("turkish_stem", "turkish_stem(word) - snowball Turkish stemmer"),
      (args: Seq[Expression]) => TurkishStem(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("to_number_pg"),
      info("to_number_pg", "to_number_pg(text, fmt) - PG numeric template parsing"),
      (args: Seq[Expression]) => ToNumberPg(Cast(args(0), StringType), args(1)))
    reg.registerFunction(
      FunctionIdentifier("to_date_pg"),
      info("to_date_pg", "to_date_pg(text, fmt) - PG DCH date parsing"),
      (args: Seq[Expression]) => ToDatePg(Cast(args(0), StringType), args(1)))
    reg.registerFunction(
      FunctionIdentifier("to_timestamp_pg"),
      info("to_timestamp_pg", "to_timestamp_pg(text, fmt) - PG DCH timestamp parsing"),
      (args: Seq[Expression]) => ToTimestampPg(Cast(args(0), StringType), args(1)))
    reg.registerFunction(
      FunctionIdentifier("age_pg"),
      info("age_pg", "age_pg(t1, t2) - PG symbolic timestamp difference"),
      (args: Seq[Expression]) => AgePg(
        Cast(args(0), TimestampType), Cast(args(1), TimestampType)))
    reg.registerFunction(
      FunctionIdentifier("age"),
      info("age", "age([t1,] t2) - PG age; one-arg form is vs current_date"),
      (args: Seq[Expression]) =>
        if (args.length == 2)
          AgePg(Cast(args(0), TimestampType), Cast(args(1), TimestampType))
        else
          AgePg(Cast(org.apache.spark.sql.catalyst.expressions.CurrentDate(),
            TimestampType), Cast(args(0), TimestampType)))
    Seq("days", "hours", "interval").foreach { mode =>
      reg.registerFunction(
        FunctionIdentifier(s"justify_$mode"),
        info(s"justify_$mode", s"justify_$mode(months, days, us) - PG interval normalization"),
        (args: Seq[Expression]) => JustifyParts(
          Cast(args(0), IntegerType), Cast(args(1), IntegerType),
          Cast(args(2), LongType), mode))
    }
    reg.registerFunction(
      FunctionIdentifier("best_centroid"),
      info("best_centroid", "best_centroid(vec, cids, cents) - IVF argmax-dot cell id"),
      (args: Seq[Expression]) => {
        val cids = args(1).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
        val m = args(2).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cents = Array.tabulate(m.numElements())(i => m.getArray(i).toDoubleArray())
        BestCentroid(args(0), cids, cents)
      })
    reg.registerFunction(
      FunctionIdentifier("top_centroids"),
      info("top_centroids", "top_centroids(vec, nProbe, cids, cents) - IVF probe cell ids"),
      (args: Seq[Expression]) => {
        val nProbe = args(1).eval().asInstanceOf[Number].intValue()
        val cids = args(2).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray()
        val m = args(3).eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val cents = Array.tabulate(m.numElements())(i => m.getArray(i).toDoubleArray())
        TopCentroids(args(0), nProbe, cids, cents)
      })
    reg.registerFunction(
      FunctionIdentifier("crypt"),
      info("crypt", "crypt(pw, salt_or_hash) - pgcrypto MD5-crypt or bcrypt password hash"),
      (args: Seq[Expression]) => Crypt(Cast(args(0), StringType),
        Cast(args(1), StringType)))
    // pgcrypto PGP symmetric family (contrib/pgcrypto/pgp-encrypt.c,
    // pgp-armor.c) — RFC 4880 S2K + OpenPGP CFB, pinned against the
    // reference's own pgp-decrypt.sql armored vectors
    reg.registerFunction(
      FunctionIdentifier("armor"),
      info("armor", "armor(bytea) - OpenPGP ASCII armor with CRC24"),
      (args: Seq[Expression]) => PgpArmor(Cast(args(0), BinaryType)))
    reg.registerFunction(
      FunctionIdentifier("dearmor"),
      info("dearmor", "dearmor(text) - decode OpenPGP ASCII armor"),
      (args: Seq[Expression]) => PgpDearmor(Cast(args(0), StringType)))
    reg.registerFunction(
      FunctionIdentifier("pgp_key_id"),
      info("pgp_key_id", "pgp_key_id(bytea) - key id of a PGP message (SYMKEY for symmetric)"),
      (args: Seq[Expression]) => PgpKeyId(Cast(args(0), BinaryType)))
    def pgpArgs(args: Seq[Expression]): Expression =
      if (args.length > 2) Cast(args(2), StringType)
      else Literal(UTF8String.fromString(""), StringType)
    reg.registerFunction(
      FunctionIdentifier("pgp_sym_encrypt"),
      info("pgp_sym_encrypt", "pgp_sym_encrypt(text, psw[, options]) - OpenPGP symmetric encryption"),
      (args: Seq[Expression]) => PgpSymEncrypt(Cast(args(0), StringType),
        Cast(args(1), StringType), pgpArgs(args), textMode = true))
    reg.registerFunction(
      FunctionIdentifier("pgp_sym_encrypt_bytea"),
      info("pgp_sym_encrypt_bytea", "pgp_sym_encrypt_bytea(bytea, psw[, options])"),
      (args: Seq[Expression]) => PgpSymEncrypt(Cast(args(0), BinaryType),
        Cast(args(1), StringType), pgpArgs(args), textMode = false))
    reg.registerFunction(
      FunctionIdentifier("pgp_sym_decrypt"),
      info("pgp_sym_decrypt", "pgp_sym_decrypt(bytea, psw[, options]) - OpenPGP symmetric decryption"),
      (args: Seq[Expression]) => PgpSymDecrypt(Cast(args(0), BinaryType),
        Cast(args(1), StringType), pgpArgs(args), textMode = true))
    reg.registerFunction(
      FunctionIdentifier("pgp_sym_decrypt_bytea"),
      info("pgp_sym_decrypt_bytea", "pgp_sym_decrypt_bytea(bytea, psw[, options])"),
      (args: Seq[Expression]) => PgpSymDecrypt(Cast(args(0), BinaryType),
        Cast(args(1), StringType), pgpArgs(args), textMode = false))
    // Spark's runtime-filter bloom machinery, exposed as callable
    // functions (the engine uses them for InjectRuntimeFilter already;
    // registering them lets operators build explicit broadcast filters
    // — Dedup.bloomAntiJoin's decontamination path)
    reg.registerFunction(
      FunctionIdentifier("bloom_filter_agg"),
      info("bloom_filter_agg", "bloom_filter_agg(xxhash64(x), items, bits) - build a bloom filter"),
      (args: Seq[Expression]) =>
        new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
          args(0), args(1), args(2)).toAggregateExpression())
    reg.registerFunction(
      FunctionIdentifier("might_contain"),
      info("might_contain", "might_contain(bloom, xxhash64(x)) - bloom membership probe"),
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0), args(1)))
    // PG string SRFs + variadic null counters (utils/adt/varlena.c
    // text_to_table, regexp.c regexp_split_*, misc.c num_nulls) — all
    // compose from codegen builtins: literal-delimiter splits use the
    // non-regex StringSplitSQL, the regexp forms Spark's StringSplit
    def s2aArgs(args: Seq[Expression]): PgStringToArray =
      PgStringToArray(args(0), args(1),
        if (args.length > 2) args(2) else Literal(null, StringType))
    reg.registerFunction(
      FunctionIdentifier("string_to_table"),
      info("string_to_table", "string_to_table(s, delim[, nullstr]) - one row per literal-delimited part"),
      (args: Seq[Expression]) => Explode(s2aArgs(args)))
    reg.registerFunction(
      FunctionIdentifier("string_to_array"),
      info("string_to_array", "string_to_array(s, delim[, nullstr]) - varlena.c text_to_array"),
      (args: Seq[Expression]) => s2aArgs(args))
    // PG unnest as a select-list SRF (FROM-position unnest rewrites
    // to explode earlier, in PgSql.unnestFrom)
    reg.registerFunction(
      FunctionIdentifier("unnest"),
      info("unnest", "unnest(anyarray) - one row per element"),
      (args: Seq[Expression]) => Explode(args(0)))
    reg.registerFunction(
      FunctionIdentifier("pg_array_in"),
      info("pg_array_in", "pg_array_in(text, depth) - array_in literal parse"),
      (args: Seq[Expression]) => PgArrayInExpr(args(0),
        args(1).eval() match {
          case n: Number => n.intValue()
          case other => other.toString.toInt
        }))
    reg.registerFunction(
      FunctionIdentifier("array_ndims"),
      info("array_ndims", "array_ndims(arr) - dimension count, NULL for empty"),
      (args: Seq[Expression]) => PgArrayNdims(args(0)))
    reg.registerFunction(
      FunctionIdentifier("cardinality"),
      info("cardinality", "cardinality(arr) - total element count, all dims"),
      (args: Seq[Expression]) => PgCardinality(args(0)))
    reg.registerFunction(
      FunctionIdentifier("array_length"),
      info("array_length", "array_length(arr, dim) - extent of one dimension"),
      (args: Seq[Expression]) => PgArrayLength(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("array_fill"),
      info("array_fill", "array_fill(value, dims[, lbounds]) - filled array"),
      (args: Seq[Expression]) => {
        val dims = args(1).eval() match {
          case a: org.apache.spark.sql.catalyst.util.ArrayData =>
            a.toIntArray().toSeq
          case s: UTF8String => // '{3,3}' literal spelling
            GraftStrings.pgArrayIn(s, 1).toObjectArray(StringType)
              .map(_.toString.toInt).toSeq
          case other => throw new IllegalArgumentException(
            s"array_fill dims must be a literal int array, got $other")
        }
        PgArrayFill(args(0), dims)
      })
    reg.registerFunction(
      FunctionIdentifier("array_cat"),
      info("array_cat", "array_cat(a, b) - PG concatenation incl. matrix||row"),
      (args: Seq[Expression]) => PgArrayConcat(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("pg_array_cat"),
      info("pg_array_cat", "the || operator's array concatenation forms"),
      (args: Seq[Expression]) => PgArrayConcat(args(0), args(1)))
    // PG array_prepend takes (element, array) — Spark's builtin is
    // reversed
    reg.registerFunction(
      FunctionIdentifier("array_prepend"),
      info("array_prepend", "array_prepend(elem, arr) - PG argument order"),
      (args: Seq[Expression]) => ArrayPrepend(args(1), args(0)))
    reg.registerFunction(
      FunctionIdentifier("array_to_string"),
      info("array_to_string", "array_to_string(arr, delim[, nullstr])"),
      (args: Seq[Expression]) => {
        // a NULL null-string behaves like the 2-arg form (text_to_array
        // is not strict on this argument: NULL elements are skipped)
        val nullStr = args.lift(2).filter {
          case Literal(null, _) => false
          case _ => true
        }
        ArrayJoin(args(0), args(1), nullStr)
      })
    def flagArg(args: Seq[Expression], at: Int): Expression =
      if (args.length > at) args(at)
      else Literal(UTF8String.fromString(""), StringType)
    reg.registerFunction(
      FunctionIdentifier("regexp_split_to_array"),
      info("regexp_split_to_array", "regexp_split_to_array(s, re[, flags]) - PG regex split"),
      (args: Seq[Expression]) =>
        PgRegexpSplitArr(args(0), args(1), flagArg(args, 2)))
    reg.registerFunction(
      FunctionIdentifier("regexp_split_to_table"),
      info("regexp_split_to_table", "regexp_split_to_table(s, re[, flags]) - one row per regex-delimited part"),
      (args: Seq[Expression]) =>
        Explode(PgRegexpSplitArr(args(0), args(1), flagArg(args, 2))))
    // PG regexp_matches: setof text[] — a generator in Spark terms, so
    // a bare select-list call explodes natively (regexp.c:904)
    reg.registerFunction(
      FunctionIdentifier("regexp_matches"),
      info("regexp_matches", "regexp_matches(s, re[, flags]) - setof capture-group text[]"),
      (args: Seq[Expression]) =>
        Explode(PgRegexpMatches(args(0), args(1), flagArg(args, 2))))
    // PG regexp_replace: flags string as the 4th argument and PG's
    // replace-FIRST-only default (Spark's builtin is always-global —
    // a silent wrong answer for migrated SQL, regexp.c:600).
    // Registered under pg_regexp_replace and renamed at the SQL front
    // door: in this Spark, functions.regexp_replace resolves BY NAME
    // through this registry, so overriding the builtin name would
    // silently flip every internal DataFrame call site to
    // first-match semantics.
    reg.registerFunction(
      FunctionIdentifier("pg_regexp_replace"),
      info("pg_regexp_replace", "regexp_replace(s, re, rep[, flags]) - PG semantics (first match unless 'g')"),
      (args: Seq[Expression]) =>
        PgRegexpReplaceExpr(args(0), args(1), args(2), flagArg(args, 3)))
    reg.registerFunction(
      FunctionIdentifier("pg_regexp_substr"),
      info("pg_regexp_substr", "pg_regexp_substr(s, re) - substring(s, pattern) regex form"),
      (args: Seq[Expression]) => PgRegexpSubstr(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("pg_similar_substr"),
      info("pg_similar_substr", "pg_similar_substr(s, pat, esc) - SQL:1999 substring w/ escape"),
      (args: Seq[Expression]) => PgSimilarSubstr(args(0), args(1), args(2)))
    reg.registerFunction(
      FunctionIdentifier("byteain"),
      info("byteain", "byteain(text) - PG bytea input (hex or escape format)"),
      (args: Seq[Expression]) => PgByteaIn(args(0)))
    reg.registerFunction(
      FunctionIdentifier("interval_interval_div"),
      info("interval_interval_div", "interval / interval - double ratio (GP timeseries)"),
      (args: Seq[Expression]) => PgIntervalDiv(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("interval_interval_mod"),
      info("interval_interval_mod", "interval % interval - truncated remainder interval"),
      (args: Seq[Expression]) => PgIntervalMod(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("interval_bound"),
      info("interval_bound",
        "interval_bound(v, w[, shift[, reg]]) - GP timeseries bucket lower bound"),
      (args: Seq[Expression]) => PgIntervalBound(args))
    reg.registerFunction(
      FunctionIdentifier("starts_with"),
      info("starts_with", "starts_with(s, prefix) - PG spelling of startswith"),
      (args: Seq[Expression]) => StartsWith(args(0), args(1)))
    // PG format(fmt, args...) for the SQL front door (varlena.c
    // text_format): the fmt string must be foldable — PgFormat compiles
    // it driver-side into ONE codegen concat over the argument columns
    reg.registerFunction(
      FunctionIdentifier("format"),
      info("format", "format(fmt, args...) - PG text_format (%s/%I/%L/%n$)"),
      (args: Seq[Expression]) => {
        val fmt = args.head.eval() match {
          case null => throw new IllegalArgumentException(
            "format() requires a non-NULL literal format string")
          case v => v.toString
        }
        PgFormat.formatExpr(fmt, args.tail)
      })
    // bool comparison operator functions (bool.c booleq/boolne + the
    // btree ops) — callable-by-name spellings the regress suites use
    reg.registerFunction(
      FunctionIdentifier("booleq"),
      info("booleq", "booleq(a, b) - bool ="),
      (args: Seq[Expression]) => EqualTo(args(0), args(1)))
    for (alias <- Seq("boolne", "boolneq"))
      reg.registerFunction(
        FunctionIdentifier(alias),
        info(alias, s"$alias(a, b) - bool <>"),
        (args: Seq[Expression]) => Not(EqualTo(args(0), args(1))))
    reg.registerFunction(
      FunctionIdentifier("boollt"),
      info("boollt", "boollt(a, b) - bool <"),
      (args: Seq[Expression]) => LessThan(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("boolgt"),
      info("boolgt", "boolgt(a, b) - bool >"),
      (args: Seq[Expression]) => GreaterThan(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("boolle"),
      info("boolle", "boolle(a, b) - bool <="),
      (args: Seq[Expression]) => LessThanOrEqual(args(0), args(1)))
    reg.registerFunction(
      FunctionIdentifier("boolge"),
      info("boolge", "boolge(a, b) - bool >="),
      (args: Seq[Expression]) => GreaterThanOrEqual(args(0), args(1)))
    // array_dims (arrayfuncs.c): '[1:n]' text for a 1-D array, NULL
    // for NULL/empty — type-generic via a catalyst builder
    reg.registerFunction(
      FunctionIdentifier("array_dims"),
      info("array_dims", "array_dims(arr) - '[1:n]' dimension text"),
      (args: Seq[Expression]) => {
        val a = args.head
        If(Or(IsNull(a), EqualTo(Size(a), Literal(0))),
          Literal.create(null, StringType),
          Concat(Seq(Literal("[1:"), Cast(Size(a), StringType),
            Literal("]"))))
      })
    reg.registerFunction(
      FunctionIdentifier("num_nulls"),
      info("num_nulls", "num_nulls(a, b, ...) - how many arguments are NULL"),
      (args: Seq[Expression]) => args.map(a =>
        If(IsNull(a), Literal(1), Literal(0)): Expression).reduce(Add(_, _)))
    reg.registerFunction(
      FunctionIdentifier("num_nonnulls"),
      info("num_nonnulls", "num_nonnulls(a, b, ...) - how many arguments are not NULL"),
      (args: Seq[Expression]) => args.map(a =>
        If(IsNull(a), Literal(0), Literal(1)): Expression).reduce(Add(_, _)))
    // (quote_nullable now defined as a SQL function over quote_literal
    // at the end of register, sharing its E-backslash form)
    // PG's three timestamp readings (xact.c GetCurrentTransactionStart
    // Timestamp / timestamp.c): transaction/statement time both map to
    // the query-constant now(); clock_timestamp stays volatile per row
    reg.registerFunction(
      FunctionIdentifier("transaction_timestamp"),
      info("transaction_timestamp", "transaction_timestamp() - query-constant now"),
      (_: Seq[Expression]) => CurrentTimestamp())
    reg.registerFunction(
      FunctionIdentifier("statement_timestamp"),
      info("statement_timestamp", "statement_timestamp() - query-constant now"),
      (_: Seq[Expression]) => CurrentTimestamp())
    reg.registerFunction(
      FunctionIdentifier("clock_timestamp"),
      info("clock_timestamp", "clock_timestamp() - wall clock, advances within a query"),
      (_: Seq[Expression]) => ClockTimestamp())
    reg.registerFunction(
      FunctionIdentifier("gp_segment_id"),
      info("gp_segment_id", "gp_segment_id() - this row's segment (Spark partition id)"),
      (_: Seq[Expression]) => SparkPartitionID())
    reg.registerFunction(
      FunctionIdentifier("version"),
      info("version", "version() - server version string (PG compat)"),
      (_: Seq[Expression]) => Literal.create(
        "PostgreSQL 9.4 compatible graft engine on Apache Spark " +
          org.apache.spark.SPARK_VERSION,
        org.apache.spark.sql.types.StringType))
    reg.registerFunction(
      FunctionIdentifier("current_schema"),
      info("current_schema", "current_schema() - always 'public' (PG compat)"),
      (_: Seq[Expression]) => Literal.create("public",
        org.apache.spark.sql.types.StringType))
    reg.registerFunction(
      FunctionIdentifier("gen_salt"),
      info("gen_salt", "gen_salt('des'|'xdes'|'md5'|'bf') - random crypt salt"),
      (args: Seq[Expression]) => GenSalt(args(0).eval().toString))
    reg.registerFunction(
      FunctionIdentifier("xpath_all"),
      info("xpath_all", "xpath_all(xml, path, ...) - one parse, every XPath as a struct of node-text arrays"),
      (args: Seq[Expression]) => XpathAll(args.head,
        args.tail.map(_.eval().toString)))
    reg.registerFunction(
      FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, n) - minhash signature array"),
      (args: Seq[Expression]) => MinHashSig(args(0),
        args(1).eval().asInstanceOf[Number].intValue()))
    spark.udf.register("wavg", org.apache.spark.sql.functions.udaf(
      new WeightedAvg, org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.scalaDouble, org.apache.spark.sql.Encoders.scalaDouble)))

    // PG misc builtins Spark lacks, as inlined SQL scalar functions
    // (quote.c quote_literal/quote_ident/quote_nullable; varlena.c
    // string_to_array / array_to_string / strpos; numutils.c to_hex;
    // uuid.c gen_random_uuid). chr(39)/chr(92) sidestep quote/escape
    // layering; \Q..\E quotes the delimiter so split's regex matches
    // it literally.
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION quote_literal(s STRING)
      RETURNS STRING RETURN CASE
        WHEN s IS NULL THEN NULL
        WHEN instr(s, chr(92)) > 0 THEN concat('E', chr(39),
          replace(replace(s, chr(92), repeat(chr(92), 2)),
                  chr(39), repeat(chr(39), 2)), chr(39))
        ELSE concat(chr(39),
          replace(s, chr(39), repeat(chr(39), 2)), chr(39)) END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION quote_nullable(s STRING)
      RETURNS STRING RETURN coalesce(quote_literal(s), 'NULL')""")
    // bool_and/bool_or transition functions (bool.c booland_statefunc):
    // STRICT in PG — any NULL argument yields NULL, unlike plain AND's
    // three-valued FALSE-dominance
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION booland_statefunc(
        a BOOLEAN, b BOOLEAN)
      RETURNS BOOLEAN RETURN CASE
        WHEN a IS NULL OR b IS NULL THEN CAST(NULL AS BOOLEAN)
        ELSE a AND b END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION boolor_statefunc(
        a BOOLEAN, b BOOLEAN)
      RETURNS BOOLEAN RETURN CASE
        WHEN a IS NULL OR b IS NULL THEN CAST(NULL AS BOOLEAN)
        ELSE a OR b END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION quote_ident(s STRING)
      RETURNS STRING RETURN CASE
        WHEN s RLIKE '^[a-z_][a-z0-9_]*$' THEN s
        ELSE concat('"', replace(s, '"', '""'), '"') END""")
    // string_to_array / array_to_string are registry expressions now
    // (PgStringToArray / ArrayJoin) — the old SQL temp-function forms
    // lacked the 3-arg null-marker variants
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION strpos(s STRING, sub STRING)
      RETURNS INT RETURN instr(s, sub)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION to_hex(n BIGINT)
      RETURNS STRING RETURN lower(hex(n))""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION gen_random_uuid()
      RETURNS STRING RETURN uuid()""")
    // PG array helpers (arrayfuncs.c): element replace (string-typed;
    // array_length / array_cat are typed registry expressions now)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION array_replace(
        a ARRAY<STRING>, f STRING, t STRING)
      RETURNS ARRAY<STRING> RETURN
        transform(a, x -> CASE WHEN x <=> f THEN t ELSE x END)""")
    // jsonb aliases over the json implementations (jsonfuncs.c)
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION jsonb_array_length(
        j STRING) RETURNS INT RETURN json_array_length(j)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION jsonb_typeof(j STRING)
      RETURNS STRING RETURN CASE
        WHEN j IS NULL THEN NULL
        WHEN ltrim(j) LIKE '{%' THEN 'object'
        WHEN ltrim(j) LIKE '[%' THEN 'array'
        WHEN ltrim(j) LIKE concat(chr(34), '%') THEN 'string'
        WHEN trim(j) IN ('true', 'false') THEN 'boolean'
        WHEN trim(j) = 'null' THEN 'null'
        ELSE 'number' END""")
    spark.sql("""CREATE OR REPLACE TEMPORARY FUNCTION json_typeof(j STRING)
      RETURNS STRING RETURN jsonb_typeof(j)""")
    // script-compat side-effect functions (misc.c pg_sleep, xact.c
    // txid_current): a sleep can't inline; a txid is epoch-micros
    spark.udf.register("pg_sleep", (sec: Double) => {
      Thread.sleep(math.max(0L, (sec * 1000).toLong)); ""
    })
    spark.udf.register("txid_current",
      () => System.currentTimeMillis() * 1000L)
    // PG interval text → micros (datetime.c DecodeInterval) — the
    // INSERT projection path turns '14 hours' into a day-time
    // interval through this (null = unparsable, the caller raises)
    spark.udf.register("pg_interval_us", (s: String) =>
      if (s == null) null
      else PgIntervalLiteralRule.parsePgInterval(s)
        .map(java.lang.Long.valueOf).orNull)
  }
}

/** `--conf spark.sql.extensions=graft.functions.GraftExtensions` entry
  * point (idiomatic library packaging; Verify/Bench call
  * [[GraftFunctions.register]] directly).
  */
/** PG datetime arithmetic (timestamp.c date_pl_interval via an
  * implicit date→timestamp cast): `date + interval` ALWAYS yields a
  * timestamp — `'1401-01-01'::date + interval '5 days'` prints
  * `1401-01-06 00:00:00`. Spark's coercion keeps DATE for day and
  * year-month intervals (dropping any sub-day component); this rule
  * re-types those to TIMESTAMP_NTZ arithmetic. date_add(d, n) and
  * d + n (integer days) stay DATE in both systems — untouched. */
object PgDateIntervalRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case DateAdd(d, ExtractANSIIntervalDays(iv))
            if d.resolved && iv.resolved && d.dataType == DateType =>
          TimestampAddInterval(Cast(d, TimestampNTZType), iv)
        case DateAdd(d, UnaryMinus(ExtractANSIIntervalDays(iv), fail))
            if d.resolved && iv.resolved && d.dataType == DateType =>
          TimestampAddInterval(Cast(d, TimestampNTZType),
            UnaryMinus(iv, fail))
        case DateAddYMInterval(d, ym)
            if d.resolved && ym.resolved && d.dataType == DateType =>
          TimestampAddYMInterval(Cast(d, TimestampNTZType), ym)
        // a sub-day interval coerces the date to LTZ timestamp in
        // Spark; PG's result is timestamp WITHOUT time zone
        case TimestampAddInterval(Cast(d, TimestampType, tz, mode), iv, _)
            if d.resolved && iv.resolved && d.dataType == DateType =>
          TimestampAddInterval(Cast(d, TimestampNTZType, tz, mode), iv)
      }
    }
}

/** PG interval input (datetime.c DecodeInterval): a bare STRING
  * literal compared against a day-time interval column parses with
  * PG's unit-list grammar ('14 hours', '1 day 2 hours', '00:00:10') —
  * Spark's own coercion refuses string↔interval comparisons outright,
  * and its ANSI cast takes only the `D HH:MM:SS` form. Literal-only:
  * the value folds at analysis time. */
object PgIntervalLiteralRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {

  /** '…units…' text → micros; None when unparsable or month-bearing. */
  private[graft] def parsePgInterval(s0: String): Option[Long] = {
    var s = s0.trim.stripPrefix("@").trim
    val neg = s.endsWith(" ago")
    if (neg) s = s.stripSuffix(" ago").trim
    if (s.isEmpty) return None
    var micros = 0L
    var matched = false
    if ("(?i)\\d+\\s*(mon(th)?s?|years?|yrs?)\\b".r.findFirstIn(s).isDefined)
      return None // month/year intervals don't fit day-time
    val term = "(?i)([+-]?\\d+(?:\\.\\d+)?)\\s*(weeks?|w\\b|days?|d\\b|hours?|hrs?|h\\b|minutes?|mins?|m\\b|seconds?|secs?|s\\b)".r
    term.findAllMatchIn(s).foreach { m =>
      matched = true
      val n = m.group(1).toDouble
      val unit = m.group(2).toLowerCase
      val us =
        if (unit.startsWith("w")) n * 7 * 86400e6
        else if (unit.startsWith("d")) n * 86400e6
        else if (unit.startsWith("h")) n * 3600e6
        else if (unit.startsWith("m")) n * 60e6
        else n * 1e6
      micros += us.toLong
    }
    "([+-]?)(\\d+):(\\d{1,2})(?::(\\d{1,2})(\\.\\d+)?)?".r
      .findFirstMatchIn(s).foreach { m =>
        matched = true
        val sign = if (m.group(1) == "-") -1 else 1
        val frac = Option(m.group(5)).map(_.toDouble).getOrElse(0.0)
        micros += sign * (m.group(2).toLong * 3600e6.toLong +
          m.group(3).toLong * 60e6.toLong +
          Option(m.group(4)).map(_.toLong).getOrElse(0L) * 1000000L +
          (frac * 1e6).toLong)
      }
    if (!matched) {
      // a bare number is seconds (DecodeInterval default unit)
      if (s.matches("[+-]?\\d+(\\.\\d+)?")) {
        micros = (s.toDouble * 1e6).toLong; matched = true
      }
    }
    if (matched) Some(if (neg) -micros else micros) else None
  }

  private def conv(e: Expression, dt: DataType): Option[Expression] = e match {
    case Literal(s: UTF8String, StringType) =>
      parsePgInterval(s.toString).map(us => Literal(us, dt))
    case Cast(Literal(s: UTF8String, StringType), StringType, _, _) =>
      parsePgInterval(s.toString).map(us => Literal(us, dt))
    case _ => None
  }

  override def apply(
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    plan.resolveOperatorsUp { case p =>
      p.transformExpressionsUp {
        case b: BinaryComparison
            if b.left.resolved && b.right.resolved &&
              b.left.dataType.isInstanceOf[DayTimeIntervalType] &&
              b.right.dataType == StringType =>
          conv(b.right, b.left.dataType)
            .map(r => b.withNewChildren(Seq(b.left, r))).getOrElse(b)
        case b: BinaryComparison
            if b.left.resolved && b.right.resolved &&
              b.right.dataType.isInstanceOf[DayTimeIntervalType] &&
              b.left.dataType == StringType =>
          conv(b.left, b.right.dataType)
            .map(l => b.withNewChildren(Seq(l, b.right))).getOrElse(b)
        case in @ In(v, list)
            if v.resolved && v.dataType.isInstanceOf[DayTimeIntervalType] &&
              list.forall(x => x.resolved && x.dataType == StringType) =>
          val conved = list.map(x => conv(x, v.dataType))
          if (conved.forall(_.isDefined)) In(v, conved.map(_.get)) else in
      }
    }
}

class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(_ => PgDateIntervalRule)
    ext.injectResolutionRule(_ => PgIntervalLiteralRule)
    ext.injectFunction((
      FunctionIdentifier("linear_interpolate"),
      new ExpressionInfo("graft", null, "linear_interpolate", "linear_interpolate(x, x0, y0, x1, y1)", ""),
      (args: Seq[Expression]) => new LinearInterpolate(args(0), args(1), args(2), args(3), args(4))))
    ext.injectFunction((
      FunctionIdentifier("similarity"),
      new ExpressionInfo("graft", null, "similarity", "similarity(a, b)", ""),
      (args: Seq[Expression]) => TrigramSimilarity(args(0), args(1))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo("graft", null, "simhash64", "simhash64(text)", ""),
      (args: Seq[Expression]) => SimHash64(args(0))))
    ext.injectFunction((
      FunctionIdentifier("lang_id"),
      new ExpressionInfo("graft", null, "lang_id", "lang_id(text)", ""),
      (args: Seq[Expression]) => LangId(args(0))))
  }
}

/** `clock_timestamp()` (timestamp.c): the wall clock DURING execution —
  * volatile per evaluation, unlike the query-constant now(). */
case class ClockTimestamp() extends LeafExpression
    with Nondeterministic with codegen.CodegenFallback {
  override def dataType: DataType = TimestampType
  override def nullable: Boolean = false
  override def prettyName: String = "clock_timestamp"
  override protected def initializeInternal(partitionIndex: Int): Unit = ()
  override protected def evalInternal(
      input: org.apache.spark.sql.catalyst.InternalRow): Any =
    System.currentTimeMillis() * 1000L // micros since epoch
}
