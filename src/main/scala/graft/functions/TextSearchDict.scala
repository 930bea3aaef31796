package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stemming + stopword dictionary for the tsvector pipeline
  * (reference `src/backend/snowball/dict_snowball.c` snowball dictionary
  * lookup + `src/backend/tsearch/ts_utils.c` stopword lists; the
  * algorithm itself is M.F. Porter, "An algorithm for suffix stripping",
  * Program 14(3), 1980 — implemented here from the published rule
  * tables, original variant). PG's `english` text-search configuration
  * = lowercase → drop stopwords → stem; [[TsLexize.lexize]] is that
  * lexize chain as one declarative Column over a word array, with the
  * stem step a codegen expression (no UDF).
  */
object PorterStemmer {

  /** Vowel test with positional y: a,e,i,o,u always; y when preceded by
    * a consonant (so "sky"/"happy" end in a vowel, "yellow" starts with
    * a consonant). */
  private def isVowel(s: CharSequence, i: Int): Boolean = s.charAt(i) match {
    case 'a' | 'e' | 'i' | 'o' | 'u' => true
    case 'y' => i > 0 && !isVowel(s, i - 1)
    case _ => false
  }

  /** The measure m of a stem: number of VC sequences in [C](VC)^m[V]. */
  private def m(s: String): Int = {
    var count = 0
    var prevV = false
    var i = 0
    while (i < s.length) {
      val v = isVowel(s, i)
      if (!v && prevV) count += 1
      prevV = v
      i += 1
    }
    count
  }

  private def hasVowel(s: String): Boolean =
    (0 until s.length).exists(isVowel(s, _))

  /** *d — ends with a double consonant. */
  private def endsCC(s: String): Boolean =
    s.length >= 2 && s.charAt(s.length - 1) == s.charAt(s.length - 2) &&
      !isVowel(s, s.length - 1)

  /** *o — ends cvc where the second c is not w, x or y. */
  private def endsCvc(s: String): Boolean =
    s.length >= 3 && !isVowel(s, s.length - 3) && isVowel(s, s.length - 2) &&
      !isVowel(s, s.length - 1) && "wxy".indexOf(s.charAt(s.length - 1)) < 0

  // rule tables, longest suffix first (the paper: of a rule set, only
  // the longest matching S1 is obeyed — even if its condition fails)
  private val step2 = Seq(
    "ational" -> "ate", "ization" -> "ize", "iveness" -> "ive",
    "fulness" -> "ful", "ousness" -> "ous", "tional" -> "tion",
    "biliti" -> "ble", "entli" -> "ent", "ousli" -> "ous",
    "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "iviti" -> "ive",
    "enci" -> "ence", "anci" -> "ance", "izer" -> "ize", "abli" -> "able",
    "alli" -> "al", "ator" -> "ate", "eli" -> "e")

  private val step3 = Seq(
    "icate" -> "ic", "ative" -> "", "alize" -> "al", "iciti" -> "ic",
    "ical" -> "ic", "ful" -> "", "ness" -> "")

  private val step4 = Seq( // all condition m > 1; "ion" additionally *S/*T
    "ement", "ance", "ence", "able", "ible", "ment", "ant", "ent", "ion",
    "ism", "ate", "iti", "ous", "ive", "ize", "al", "er", "ic", "ou")

  def stem(word: String): String = {
    var s = word.toLowerCase
    if (s.length <= 2) return s

    // step 1a: plurals
    if (s.endsWith("sses")) s = s.dropRight(2)
    else if (s.endsWith("ies")) s = s.dropRight(2)
    else if (s.endsWith("ss")) ()
    else if (s.endsWith("s")) s = s.dropRight(1)

    // step 1b: -ed / -ing, with the at/bl/iz + *d + *o cleanup
    var cleanup = false
    if (s.endsWith("eed")) { if (m(s.dropRight(3)) > 0) s = s.dropRight(1) }
    else if (s.endsWith("ed") && hasVowel(s.dropRight(2))) {
      s = s.dropRight(2); cleanup = true
    } else if (s.endsWith("ing") && hasVowel(s.dropRight(3))) {
      s = s.dropRight(3); cleanup = true
    }
    if (cleanup) {
      if (s.endsWith("at") || s.endsWith("bl") || s.endsWith("iz")) s += "e"
      else if (endsCC(s) && "lsz".indexOf(s.charAt(s.length - 1)) < 0)
        s = s.dropRight(1)
      else if (m(s) == 1 && endsCvc(s)) s += "e"
    }

    // step 1c: y → i after a vowel-bearing stem
    if (s.endsWith("y") && hasVowel(s.dropRight(1))) s = s.dropRight(1) + "i"

    // step 2 (m > 0) and step 3 (m > 0)
    for ((suf, by) <- step2.find(p => s.endsWith(p._1))) {
      val st = s.dropRight(suf.length)
      if (m(st) > 0) s = st + by
    }
    for ((suf, by) <- step3.find(p => s.endsWith(p._1))) {
      val st = s.dropRight(suf.length)
      if (m(st) > 0) s = st + by
    }

    // step 4 (m > 1; ion only after s/t)
    for (suf <- step4.find(s.endsWith(_))) {
      val st = s.dropRight(suf.length)
      val ok =
        if (suf == "ion") st.nonEmpty && "st".indexOf(st.charAt(st.length - 1)) >= 0
        else true
      if (ok && m(st) > 1) s = st
    }

    // step 5a: drop final e when m > 1, or m = 1 and not *o
    if (s.endsWith("e")) {
      val st = s.dropRight(1)
      val mm = m(st)
      if (mm > 1 || (mm == 1 && !endsCvc(st))) s = st
    }
    // step 5b: -ll → -l when m > 1
    if (s.endsWith("ll") && m(s) > 1) s = s.dropRight(1)
    s
  }

  def stemUtf8(s: UTF8String): UTF8String = UTF8String.fromString(stem(s.toString))
}

/** `porter_stem(word)` codegen expression. */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "porter_stem"

  override protected def nullSafeEval(v: Any): Any =
    PorterStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)
}

/** Snowball German stemmer (reference `src/backend/snowball/german.sbl`
  * compiles the same published algorithm; re-implemented here from the
  * snowballstem.org German-stemmer description: mark u/y between vowels,
  * R1/R2 regions with the 3-letter R1 floor, three longest-match suffix
  * steps, then unmark and strip umlauts). Proves the dictionary plumbing
  * generalizes beyond Porter `english` — the lexize chain is shared. */
object GermanStemmer {

  private val vowels = "aeiouyäöü"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  /** Region start: after the first non-vowel following a vowel, scanning
    * from `from` (snowball gopast v, gopast non-v). */
  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private val sEndings = "bdfghklmnrt" // valid s-endings
  private val stEndings = "bdfghklmnt" // valid st-endings (no r)

  def stem(word: String): String = {
    var s = word.toLowerCase.replace("ß", "ss")
    // u/y between vowels are consonants for region purposes: mark upper
    if (s.length >= 3) {
      val cs = s.toCharArray
      var i = 1
      while (i < s.length - 1) {
        val c = s.charAt(i)
        if ((c == 'u' || c == 'y') && isV(s.charAt(i - 1)) && isV(s.charAt(i + 1)))
          cs(i) = c.toUpper
        i += 1
      }
      s = new String(cs)
    }
    val r1raw = region(s, 0)
    val r1 = math.max(r1raw, 3) // region before R1 must hold ≥3 letters
    val r2 = region(s, r1raw)

    def inR1(sufLen: Int) = s.length - sufLen >= r1
    def inR2(sufLen: Int) = s.length - sufLen >= r2

    // step 1: longest of ern/em/er | e/en/es (niss proviso) | s
    Seq("ern", "em", "er", "en", "es", "e", "s").find(s.endsWith) match {
      case Some("s") =>
        if (s.length >= 2 && sEndings.indexOf(s.charAt(s.length - 2)) >= 0 &&
            inR1(1)) s = s.dropRight(1)
      case Some(suf @ ("e" | "en" | "es")) =>
        if (inR1(suf.length)) {
          s = s.dropRight(suf.length)
          if (s.endsWith("niss")) s = s.dropRight(1)
        }
      case Some(suf) => if (inR1(suf.length)) s = s.dropRight(suf.length)
      case None =>
    }

    // step 2: longest of est/en/er | st (valid st-ending)
    Seq("est", "en", "er", "st").find(s.endsWith) match {
      case Some("st") =>
        if (s.length >= 3 && stEndings.indexOf(s.charAt(s.length - 3)) >= 0 &&
            inR1(2)) s = s.dropRight(2)
      case Some(suf) => if (inR1(suf.length)) s = s.dropRight(suf.length)
      case None =>
    }

    // step 3: d-suffixes, longest match
    def notPrecededByE(sufLen: Int) =
      s.length - sufLen - 1 < 0 || s.charAt(s.length - sufLen - 1) != 'e'
    Seq("isch", "lich", "heit", "keit", "end", "ung", "ig", "ik")
      .find(s.endsWith) match {
      case Some(suf @ ("end" | "ung")) =>
        if (inR2(suf.length)) {
          s = s.dropRight(suf.length)
          if (s.endsWith("ig") && notPrecededByE(2) && inR2(2))
            s = s.dropRight(2)
        }
      case Some(suf @ ("ig" | "ik" | "isch")) =>
        if (inR2(suf.length) && notPrecededByE(suf.length))
          s = s.dropRight(suf.length)
      case Some(suf @ ("lich" | "heit")) =>
        if (inR2(suf.length)) {
          s = s.dropRight(suf.length)
          Seq("er", "en").find(s.endsWith).foreach { p =>
            if (inR1(p.length)) s = s.dropRight(p.length)
          }
        }
      case Some("keit") =>
        if (inR2(4)) {
          s = s.dropRight(4)
          Seq("lich", "ig").find(s.endsWith).foreach { p =>
            if (inR2(p.length)) s = s.dropRight(p.length)
          }
        }
      case _ =>
    }

    // unmark U/Y, strip umlauts
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      sb += (s.charAt(i) match {
        case 'U' => 'u'
        case 'Y' => 'y'
        case 'ä' => 'a'
        case 'ö' => 'o'
        case 'ü' => 'u'
        case c => c
      })
      i += 1
    }
    sb.toString
  }

  def stemUtf8(s: UTF8String): UTF8String = UTF8String.fromString(stem(s.toString))
}

/** `german_stem(word)` codegen expression. */
case class GermanStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "german_stem"

  override protected def nullSafeEval(v: Any): Any =
    GermanStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GermanStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): GermanStem =
    copy(child = newChild)
}

/** Snowball French stemmer (reference `src/backend/snowball/french.sbl`
  * compiles the same published algorithm; re-implemented here from the
  * snowballstem.org French-stemmer description: u/i/y/qu marking, RV
  * with the two-vowel and par/col/tap provisos, R1/R2, the standard-
  * suffix table with its per-group chains, the i-verb and other-verb
  * steps, residual step 4, undoubling and un-accenting). */
object FrenchStemmer {

  private val vowels = "aeiouyâàëéêèïîôûù"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  def stem(word: String): String = {
    var s = word.toLowerCase

    // prelude: u/i between vowels -> U/I, y beside a vowel -> Y, qu -> qU.
    // Branch order matches the published cursor walk: standing at a
    // VOWEL, the FOLLOWING u/i/y converts first (y unconditionally);
    // only at a non-converted position does "y before a vowel" fire.
    // So "yu<vowel>" marks the u (not the y), and in "hyya" only the
    // second y converts — the first y's follower is a consonant by
    // the time its own rule is tried.
    {
      val cs = s.toCharArray
      var p = 0
      while (p < cs.length) {
        if (isV(cs(p)) && p + 1 < cs.length) {
          val n = cs(p + 1)
          if ((n == 'u' || n == 'i') && p + 2 < cs.length && isV(cs(p + 2)))
            cs(p + 1) = n.toUpper
          else if (n == 'y') cs(p + 1) = 'Y'
        }
        if (cs(p) == 'y' && p + 1 < cs.length && isV(cs(p + 1))) cs(p) = 'Y'
        else if (cs(p) == 'q' && p + 1 < cs.length && cs(p + 1) == 'u')
          cs(p + 1) = 'U'
        p += 1
      }
      s = new String(cs)
    }

    // RV: after the third letter when the word begins with two vowels
    // or par/col/tap; else after the first vowel not at position 0
    val rv: Int = {
      if (s.length >= 3 && ((isV(s.charAt(0)) && isV(s.charAt(1))) ||
          Seq("par", "col", "tap").exists(s.startsWith))) 3
      else {
        var i = 1
        while (i < s.length && !isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      }
    }
    val r1 = region(s, 0)
    val r2 = region(s, r1)

    def inRV(sufLen: Int) = s.length - sufLen >= rv
    def inR1(sufLen: Int) = s.length - sufLen >= r1
    def inR2(sufLen: Int) = s.length - sufLen >= r2
    def endsIn(suffix: String, reg: Int): Boolean = // helper for chains
      s.endsWith(suffix) && s.length - suffix.length >= reg

    // ---- step 1: standard suffixes, longest match over the whole set
    var step1Changed = false
    var mnoFound = false
    val st1 = Seq(
      "issements", "issement", "atrices", "atrice", "ateurs", "ations",
      "logies", "usions", "utions", "ements", "amment", "emment",
      "ments", "ances", "iqUes", "ismes", "ables", "istes", "ateur",
      "ation", "logie", "usion", "ution", "ences", "ement", "euses",
      "ance", "iqUe", "isme", "able", "iste", "ence", "eaux", "ités",
      "ives", "euse", "ment", "eux", "ité", "ifs", "ive", "aux", "if")
    st1.find(s.endsWith) match {
      case Some(suf) =>
        val L = suf.length
        suf match {
          case "ance" | "iqUe" | "isme" | "able" | "iste" | "eux" |
               "ances" | "iqUes" | "ismes" | "ables" | "istes" =>
            if (inR2(L)) { s = s.dropRight(L); step1Changed = true }
          case "atrice" | "ateur" | "ation" | "atrices" | "ateurs" |
               "ations" =>
            if (inR2(L)) {
              s = s.dropRight(L); step1Changed = true
              if (s.endsWith("ic")) {
                if (inR2(2)) s = s.dropRight(2) else s = s.dropRight(2) + "iqU"
              }
            }
          case "logie" | "logies" =>
            if (inR2(L)) { s = s.dropRight(L) + "log"; step1Changed = true }
          case "usion" | "ution" | "usions" | "utions" =>
            if (inR2(L)) { s = s.dropRight(L) + "u"; step1Changed = true }
          case "ence" | "ences" =>
            if (inR2(L)) { s = s.dropRight(L) + "ent"; step1Changed = true }
          case "ement" | "ements" =>
            if (inRV(L)) {
              s = s.dropRight(L); step1Changed = true
              if (endsIn("iv", r2)) {
                s = s.dropRight(2)
                if (endsIn("at", r2)) s = s.dropRight(2)
              } else if (s.endsWith("eus")) {
                if (inR2(3)) s = s.dropRight(3)
                else if (inR1(3)) s = s.dropRight(3) + "eux"
              } else if (endsIn("abl", r2) || endsIn("iqU", r2))
                s = s.dropRight(3)
              else if (endsIn("ièr", rv) || endsIn("Ièr", rv))
                s = s.dropRight(3) + "i"
            }
          case "ité" | "ités" =>
            if (inR2(L)) {
              s = s.dropRight(L); step1Changed = true
              if (s.endsWith("abil")) {
                if (inR2(4)) s = s.dropRight(4) else s = s.dropRight(4) + "abl"
              } else if (s.endsWith("ic")) {
                if (inR2(2)) s = s.dropRight(2) else s = s.dropRight(2) + "iqU"
              } else if (endsIn("iv", r2)) s = s.dropRight(2)
            }
          case "if" | "ive" | "ifs" | "ives" =>
            if (inR2(L)) {
              s = s.dropRight(L); step1Changed = true
              if (endsIn("at", r2)) {
                s = s.dropRight(2)
                if (s.endsWith("ic")) {
                  if (inR2(2)) s = s.dropRight(2)
                  else s = s.dropRight(2) + "iqU"
                }
              }
            }
          case "eaux" =>
            s = s.dropRight(4) + "eau"; step1Changed = true
          case "aux" =>
            if (inR1(3)) { s = s.dropRight(3) + "al"; step1Changed = true }
          case "euse" | "euses" =>
            if (inR2(L)) { s = s.dropRight(L); step1Changed = true }
            else if (inR1(L)) { s = s.dropRight(L) + "eux"; step1Changed = true }
          case "issement" | "issements" =>
            if (inR1(L) && s.length > L && !isV(s.charAt(s.length - L - 1))) {
              s = s.dropRight(L); step1Changed = true
            }
          case "amment" =>
            mnoFound = true
            if (inRV(6)) s = s.dropRight(6) + "ant"
          case "emment" =>
            mnoFound = true
            if (inRV(6)) s = s.dropRight(6) + "ent"
          case "ment" | "ments" =>
            mnoFound = true
            if (s.length > L && isV(s.charAt(s.length - L - 1)) &&
                s.length - L - 1 >= rv) s = s.dropRight(L)
        }
      case None =>
    }

    // ---- step 2a: i-verb suffixes (when step 1 removed nothing, or a
    // ment-family ending was found)
    var step2Changed = false
    if (!step1Changed || mnoFound) {
      // steps 2a/2b run inside setlimit(RV): the among only SEES the
      // RV slice, so a long suffix straddling the RV boundary is not
      // a failed match — the longest suffix that FITS in RV matches
      // instead (e.g. "tera": "era" starts before RV, so "a" matches)
      val st2a = Seq(
        "issaIent", "issantes", "issante", "issants", "issions",
        "iraIent", "issais", "issait", "issant", "issent", "issiez",
        "issons", "irions", "irais", "irait", "irent", "iriez",
        "irons", "iront", "isses", "issez", "îmes", "îtes", "isse",
        "irai", "iras", "irez", "ies", "ira", "ît", "ie", "ir", "is",
        "it", "i")
      val did2a = st2a.find(x => s.endsWith(x) && inRV(x.length)) match {
        case Some(suf) =>
          val L = suf.length
          val p = s.length - L - 1 // preceding char, inside the limit
          if (p >= rv && !isV(s.charAt(p))) {
            s = s.dropRight(L); step2Changed = true; true
          } else false
        case None => false
      }
      // ---- step 2b: other verb suffixes (2a ran but removed nothing)
      if (!did2a) {
        val eGroup = Set("eraIent", "erions", "èrent", "erais", "erait",
          "eriez", "erons", "eront", "erai", "eras", "erez", "era",
          "iez", "ées", "ez", "er", "és", "ée", "é")
        val aGroup = Set("assions", "assiez", "assent", "asses",
          "aIent", "antes", "âmes", "âtes", "asse", "ante", "ants",
          "ais", "ait", "ant", "as", "ai", "ât", "a")
        val all = (eGroup ++ aGroup + "ions").toSeq.sortBy(-_.length)
        all.find(x => s.endsWith(x) && inRV(x.length)) match {
          case Some("ions") =>
            if (inR2(4)) { s = s.dropRight(4); step2Changed = true }
          case Some(suf) if eGroup.contains(suf) =>
            { s = s.dropRight(suf.length); step2Changed = true }
          case Some(suf) => // aGroup
            s = s.dropRight(suf.length); step2Changed = true
            if (s.endsWith("e") && s.length - 1 >= rv) s = s.dropRight(1)
          case None =>
        }
      }
    }

    if (step1Changed || step2Changed) {
      // ---- step 3
      if (s.endsWith("Y")) s = s.dropRight(1) + "i"
      else if (s.endsWith("ç")) s = s.dropRight(1) + "c"
    } else {
      // ---- step 4: residual suffixes. The s-removal is unlimited;
      // the ion/ier/e among runs inside setlimit(RV) — longest suffix
      // FITTING in RV matches (see the step-2 note)
      if (s.endsWith("s") && s.length >= 2 &&
          "aiouès".indexOf(s.charAt(s.length - 2)) < 0)
        s = s.dropRight(1)
      Seq("Ière", "ière", "Ier", "ier", "ion", "ë", "e")
        .find(x => s.endsWith(x) && inRV(x.length))
        .foreach {
          case "ion" =>
            if (inR2(3) && s.length > 3 && s.length - 4 >= rv &&
                "st".indexOf(s.charAt(s.length - 4)) >= 0)
              s = s.dropRight(3)
          case suf @ ("ier" | "ière" | "Ier" | "Ière") =>
            s = s.dropRight(suf.length) + "i"
          case "e" =>
            s = s.dropRight(1)
          case "ë" =>
            if (s.length >= 3 && s.length - 3 >= rv &&
                s.substring(s.length - 3, s.length - 1) == "gu")
              s = s.dropRight(1)
          case _ =>
        }
    }

    // ---- step 5: undouble
    if (Seq("enn", "onn", "ett", "ell", "eill").exists(s.endsWith))
      s = s.dropRight(1)

    // ---- step 6: un-accent é/è before a trailing non-vowel run
    {
      var i = s.length - 1
      var run = 0
      while (i >= 0 && !isV(s.charAt(i))) { i -= 1; run += 1 }
      if (run >= 1 && i >= 0 && (s.charAt(i) == 'é' || s.charAt(i) == 'è'))
        s = s.substring(0, i) + 'e' + s.substring(i + 1)
    }

    // unmark
    s.map {
      case 'I' => 'i'
      case 'U' => 'u'
      case 'Y' => 'y'
      case c => c
    }
  }

  def stemUtf8(s: UTF8String): UTF8String = UTF8String.fromString(stem(s.toString))
}

/** `french_stem(word)` codegen expression. */
case class FrenchStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "french_stem"

  override protected def nullSafeEval(v: Any): Any =
    FrenchStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FrenchStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): FrenchStem =
    copy(child = newChild)
}

/** Snowball Spanish stemmer (reference `src/backend/snowball/
  * spanish.sbl` compiles the same published algorithm; re-implemented
  * here from the snowballstem.org Spanish-stemmer description: RV with
  * the three starting-pattern cases, R1/R2, attached-pronoun step 0,
  * the standard-suffix table with per-group chains, y-verb and other-
  * verb steps, the residual step, final acute-accent removal). */
object SpanishStemmer {

  private val vowels = "aeiouáéíóúü"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private def unaccent(s: String): String = s.map {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case c => c
  }

  def stem(word: String): String = {
    var s = word.toLowerCase
    if (s.length <= 2) return unaccent(s)

    // RV: second letter consonant → after the next vowel; first two
    // vowels → after the next consonant; consonant-vowel → after the
    // third letter (end of word when the position does not exist)
    val rv: Int =
      if (!isV(s.charAt(1))) {
        var i = 2
        while (i < s.length && !isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      } else if (isV(s.charAt(0)) && isV(s.charAt(1))) {
        var i = 2
        while (i < s.length && isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      } else 3
    val r1 = region(s, 0)
    val r2 = region(s, r1)
    def inRV(n: Int) = s.length - n >= rv
    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2

    // ---- step 0: attached pronoun after a gerund/infinitive base
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    val accented = Seq("iéndo", "ándo", "ár", "ér", "ír")
    val plain = Seq("iendo", "ando", "ar", "er", "ir")
    pronouns.find(s.endsWith).foreach { p =>
      val rvText = s.substring(rv.min(s.length))
      if (rvText.endsWith(p)) {
        val before = rvText.dropRight(p.length)
        accented.find(before.endsWith) match {
          case Some(a) =>
            s = s.dropRight(p.length)
            s = s.dropRight(a.length) + unaccent(a)
          case None =>
            if (plain.exists(before.endsWith)) s = s.dropRight(p.length)
            else if (before.endsWith("yendo") &&
              s.length > p.length + 5 &&
              s.charAt(s.length - p.length - 6) == 'u')
              s = s.dropRight(p.length)
        }
      }
    }

    // ---- step 1: standard suffixes, longest match then group rule
    var removed = false
    val st1 = Seq(
      "amientos", "imientos", "amiento", "imiento", "aciones", "uciones",
      "logías", "encias", "idades", "adoras", "adores", "ancias",
      "amente", "logía", "encia", "ación", "ución", "antes", "ancia",
      "mente", "adora", "anzas", "icos", "icas", "ismos", "ables",
      "ibles", "istas", "osos", "osas", "idad", "ivas", "ivos", "ador",
      "ante", "anza", "ico", "ica", "ismo", "able", "ible", "ista",
      "oso", "osa", "iva", "ivo").sortBy(-_.length)
    st1.find(s.endsWith).foreach { suf =>
      val L = suf.length
      suf match {
        case "anza" | "anzas" | "ico" | "ica" | "icos" | "icas" |
             "ismo" | "ismos" | "able" | "ables" | "ible" | "ibles" |
             "ista" | "istas" | "oso" | "osa" | "osos" | "osas" |
             "amiento" | "amientos" | "imiento" | "imientos" =>
          if (inR2(L)) { s = s.dropRight(L); removed = true }
        case "adora" | "ador" | "ación" | "adoras" | "adores" |
             "aciones" | "ante" | "antes" | "ancia" | "ancias" =>
          if (inR2(L)) {
            s = s.dropRight(L); removed = true
            if (s.endsWith("ic") && inR2(2)) s = s.dropRight(2)
          }
        case "logía" | "logías" =>
          if (inR2(L)) { s = s.dropRight(L) + "log"; removed = true }
        case "ución" | "uciones" =>
          if (inR2(L)) { s = s.dropRight(L) + "u"; removed = true }
        case "encia" | "encias" =>
          if (inR2(L)) { s = s.dropRight(L) + "ente"; removed = true }
        case "amente" =>
          if (inR1(L)) {
            s = s.dropRight(L); removed = true
            if (s.endsWith("iv") && inR2(2)) {
              s = s.dropRight(2)
              if (s.endsWith("at") && inR2(2)) s = s.dropRight(2)
            } else if ((s.endsWith("os") || s.endsWith("ic") ||
                s.endsWith("ad")) && inR2(2)) s = s.dropRight(2)
          }
        case "mente" =>
          if (inR2(L)) {
            s = s.dropRight(L); removed = true
            if ((s.endsWith("ante") || s.endsWith("able") ||
              s.endsWith("ible")) && inR2(4)) s = s.dropRight(4)
          }
        case "idad" | "idades" =>
          if (inR2(L)) {
            s = s.dropRight(L); removed = true
            if (s.endsWith("abil") && inR2(4)) s = s.dropRight(4)
            else if ((s.endsWith("ic") || s.endsWith("iv")) && inR2(2))
              s = s.dropRight(2)
          }
        case "iva" | "ivo" | "ivas" | "ivos" =>
          if (inR2(L)) {
            s = s.dropRight(L); removed = true
            if (s.endsWith("at") && inR2(2)) s = s.dropRight(2)
          }
        case _ =>
      }
    }

    // ---- step 2a: verb suffixes beginning with y, after u
    if (!removed) {
      val ySuf = Seq("yeron", "yendo", "yamos", "yais", "yas", "yes",
        "yan", "yen", "ya", "ye", "yo", "yó").sortBy(-_.length)
      ySuf.find(suf => s.endsWith(suf) && inRV(suf.length) &&
        s.length > suf.length &&
        s.charAt(s.length - suf.length - 1) == 'u').foreach { suf =>
        s = s.dropRight(suf.length); removed = true
      }
    }

    // ---- step 2b: other verb suffixes
    if (!removed) {
      val guGroup = Seq("éis", "emos", "en", "es")
      val vb = (guGroup ++ Seq(
        "aríamos", "eríamos", "iríamos", "iéramos", "iésemos", "aríais",
        "aremos", "eríais", "eremos", "iríais", "iremos", "ierais",
        "ieseis", "asteis", "isteis", "ábamos", "áramos", "ásemos",
        "arían", "arías", "aréis", "erían", "erías", "eréis", "irían",
        "irías", "iréis", "ieran", "iesen", "ieron", "iendo", "ieras",
        "ieses", "abais", "arais", "aseis", "íamos", "arán", "arás",
        "aría", "erán", "erás", "ería", "irán", "irás", "iría", "iera",
        "iese", "aste", "iste", "aban", "aran", "asen", "aron", "ando",
        "abas", "adas", "idas", "aras", "ases", "íais", "ados", "idos",
        "amos", "imos", "ará", "aré", "erá", "eré", "irá", "iré", "aba",
        "ada", "ida", "ara", "ase", "ían", "ado", "ido", "ías", "áis",
        "ía", "ad", "ed", "id", "an", "ió", "ar", "er", "ir", "as",
        "ís")).distinct.sortBy(-_.length)
      vb.find(suf => s.endsWith(suf) && inRV(suf.length)).foreach { suf =>
        s = s.dropRight(suf.length)
        if (guGroup.contains(suf) && s.endsWith("gu") &&
          s.length - 1 >= rv) s = s.dropRight(1)
      }
    }

    // ---- step 3: residual suffix
    val res1 = Seq("os", "a", "o", "á", "í", "ó")
    val res2 = Seq("e", "é")
    res1.find(suf => s.endsWith(suf) && inRV(suf.length)) match {
      case Some(suf) => s = s.dropRight(suf.length)
      case None =>
        res2.find(suf => s.endsWith(suf) && inRV(suf.length)).foreach { suf =>
          s = s.dropRight(suf.length)
          if (s.endsWith("gu") && s.length - 1 >= rv) s = s.dropRight(1)
        }
    }

    unaccent(s)
  }

  def stemUtf8(v: UTF8String): UTF8String =
    UTF8String.fromString(stem(v.toString))
}

/** `spanish_stem(word)` codegen expression. */
case class SpanishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "spanish_stem"

  override def nullSafeEval(v: Any): Any =
    SpanishStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SpanishStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SpanishStem =
    copy(child = newChild)
}

/** Snowball Italian stemmer — the published algorithm (snowball
  * `italian.sbl`; suffix tables cross-checked against the compiled
  * `src/backend/snowball/libstemmer/stem_UTF_8_italian.c` amongs
  * a_2..a_7). Prelude: acute → grave accents, `qu` → `qU`, and i/u
  * between vowels marked I/U so they read as consonants through the
  * region logic; step 0 strips attached pronouns after gerund or
  * infinitive stems (the ar/er/ir case restores an `e`). */
object ItalianStemmer {

  private val vowels = "aeiouàèìòù"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  private val pronouns = Seq("gliela", "gliele", "gliene", "glieli",
    "glielo", "cela", "cele", "cene", "celi", "celo", "mela", "mele",
    "mene", "meli", "melo", "sene", "tela", "tele", "tene", "teli",
    "telo", "vela", "vele", "vene", "veli", "velo", "gli", "la", "le",
    "ne", "ci", "li", "mi", "si", "ti", "vi", "lo").sortBy(-_.length)

  // step-1 standard suffixes with rule codes (a_6): 1 delete-R2,
  // 2 azione/atore(+ic)-R2, 3 logia→log, 4 uzione/usione→u,
  // 5 enza→ente, 6 amento/imento delete-RV, 7 amente-R1, 8 ità-R2,
  // 9 iva/ivo-R2(+at+ic)
  private val st1: Seq[(String, Int)] = Seq(
    "atrice" -> 1, "atrici" -> 1, "azione" -> 2, "azioni" -> 2,
    "uzione" -> 4, "uzioni" -> 4, "usione" -> 4, "usioni" -> 4,
    "amento" -> 6, "amenti" -> 6, "imento" -> 6, "imenti" -> 6,
    "amente" -> 7, "abile" -> 1, "abili" -> 1, "ibile" -> 1,
    "ibili" -> 1, "mente" -> 1, "atore" -> 2, "atori" -> 2,
    "logia" -> 3, "logie" -> 3, "anza" -> 1, "anze" -> 1, "enza" -> 5,
    "enze" -> 5, "iche" -> 1, "ichi" -> 1, "ismi" -> 1, "ismo" -> 1,
    "ista" -> 1, "iste" -> 1, "isti" -> 1, "istà" -> 1, "istè" -> 1,
    "istì" -> 1, "ante" -> 1, "anti" -> 1, "ica" -> 1, "ice" -> 1,
    "ici" -> 1, "ico" -> 1, "osa" -> 1, "ose" -> 1, "osi" -> 1,
    "oso" -> 1, "iva" -> 9, "ive" -> 9, "ivi" -> 9, "ivo" -> 9,
    "ità" -> 8).sortBy(-_._1.length)

  // step-2 verb suffixes (a_7), delete in RV
  private val verbs: Seq[String] = Seq(
    "erebbero", "irebbero", "assero", "essero", "issero", "eranno",
    "iranno", "erebbe", "irebbe", "iscano", "iscono", "assimo",
    "eremmo", "iremmo", "avamo", "evamo", "ivamo", "avano", "evano",
    "ivano", "eremo", "iremo", "ereste", "ireste", "eresti", "iresti",
    "avate", "evate", "ivate", "erete", "irete", "arono", "erono",
    "irono", "isca", "enda", "isce", "ende", "asse", "isci", "endi",
    "erei", "irei", "assi", "isco", "ando", "endo", "Yamo", "iamo",
    "ammo", "emmo", "immo", "erai", "irai", "erà", "irà", "erò",
    "irò", "ata", "ita", "uta", "ava", "eva", "iva", "are", "ere",
    "ire", "ate", "ete", "ite", "ute", "ati", "iti", "uti", "avi",
    "evi", "ivi", "ano", "ono", "ato", "ito", "uto", "avo", "evo",
    "ivo", "ar", "ir").sortBy(-_.length)

  def stem(word: String): String = {
    var s = word.toLowerCase
      .map { case 'á' => 'à'; case 'é' => 'è'; case 'í' => 'ì'
             case 'ó' => 'ò'; case 'ú' => 'ù'; case c => c }
    // mark intervocalic i/u and the u of qu as consonants. The
    // preceding char reads from the MARKED prefix: an already
    // converted I/U is a consonant for the next decision, exactly the
    // in-place cursor walk of the published algorithm ("oiia" marks
    // only the first i)
    val marked = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if ((c == 'i' || c == 'u') && i > 0 && i + 1 < s.length &&
        isV(marked.charAt(i - 1)) && isV(s.charAt(i + 1)))
        marked.append(if (c == 'i') 'I' else 'U')
      else if (c == 'u' && i > 0 && marked.charAt(i - 1) == 'q')
        marked.append('U')
      else marked.append(c)
      i += 1
    }
    s = marked.toString
    if (s.length < 2) return s.toLowerCase

    val rv: Int =
      if (!isV(s.charAt(1))) {
        var j = 2
        while (j < s.length && !isV(s.charAt(j))) j += 1
        if (j < s.length) j + 1 else s.length
      } else if (isV(s.charAt(0)) && isV(s.charAt(1))) {
        var j = 2
        while (j < s.length && isV(s.charAt(j))) j += 1
        if (j < s.length) j + 1 else s.length
      } else 3
    val r1 = region(s, 0)
    val r2 = region(s, r1)
    def inRV(n: Int) = s.length - n >= rv
    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2

    // ---- step 0: attached pronoun after gerund/infinitive, in RV
    pronouns.find(p => s.endsWith(p) && inRV(p.length)).foreach { p =>
      val before = s.dropRight(p.length)
      if ((before.endsWith("ando") || before.endsWith("endo")) &&
        s.length - p.length - 4 >= rv)
        s = before
      else if ((before.endsWith("ar") || before.endsWith("er") ||
        before.endsWith("ir")) && s.length - p.length - 2 >= rv)
        s = before + "e"
    }
    // ---- step 1: strict among — longest match, then its rule
    var changed = false
    st1.find { case (suf, _) => s.endsWith(suf) }.foreach { case (suf, code) =>
      val L = suf.length
      code match {
        case 1 => if (inR2(L)) { s = s.dropRight(L); changed = true }
        case 2 => if (inR2(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("ic") && inR2(2)) s = s.dropRight(2)
        }
        case 3 => if (inR2(L)) { s = s.dropRight(L) + "log"; changed = true }
        case 4 => if (inR2(L)) { s = s.dropRight(L) + "u"; changed = true }
        case 5 => if (inR2(L)) { s = s.dropRight(L) + "ente"; changed = true }
        case 6 => if (inRV(L)) { s = s.dropRight(L); changed = true }
        case 7 => if (inR1(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("iv") && inR2(2)) {
            s = s.dropRight(2)
            if (s.endsWith("at") && inR2(2)) s = s.dropRight(2)
          } else if ((s.endsWith("os") || s.endsWith("ic") ||
            s.endsWith("abil")) && inR2(if (s.endsWith("abil")) 4 else 2))
            s = s.dropRight(if (s.endsWith("abil")) 4 else 2)
        }
        case 8 => if (inR2(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("abil") && inR2(4)) s = s.dropRight(4)
          else if ((s.endsWith("ic") || s.endsWith("iv")) && inR2(2))
            s = s.dropRight(2)
        }
        case 9 => if (inR2(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("at") && inR2(2)) {
            s = s.dropRight(2)
            if (s.endsWith("ic") && inR2(2)) s = s.dropRight(2)
          }
        }
        case _ =>
      }
    }
    // ---- step 2: verb suffixes inside RV
    if (!changed)
      verbs.find(v => s.endsWith(v) && inRV(v.length))
        .foreach(v => s = s.dropRight(v.length))
    // ---- step 3a: final vowel (then a preceding i), in RV
    Seq("a", "e", "i", "o", "à", "è", "ì", "ò")
      .find(x => s.endsWith(x) && inRV(1)).foreach { x =>
        s = s.dropRight(1)
        if (s.endsWith("i") && inRV(1)) s = s.dropRight(1)
      }
    // ---- step 3b: ch → c, gh → g, in RV
    if ((s.endsWith("ch") || s.endsWith("gh")) && inRV(2))
      s = s.dropRight(1)
    s.toLowerCase
  }

  def stemUtf8(v: UTF8String): UTF8String =
    UTF8String.fromString(stem(v.toString))
}

/** `italian_stem(word)` codegen expression. */
case class ItalianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "italian_stem"

  override def nullSafeEval(v: Any): Any =
    ItalianStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ItalianStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): ItalianStem =
    copy(child = newChild)
}

/** Snowball Portuguese stemmer — the published algorithm (snowball
  * `portuguese.sbl`; suffix tables cross-checked against the compiled
  * `src/backend/snowball/libstemmer/stem_UTF_8_portuguese.c` amongs
  * a_2..a_8). Nasalized ã/õ ride through the steps as the internal
  * `a~`/`o~` pair exactly as the spec prescribes; step 1 follows strict
  * among semantics (longest match, then its rule — no backtracking),
  * step 2 matches the longest verb suffix lying inside RV. */
object PortugueseStemmer {

  private val vowels = "aeiouáéíóúâêô"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  // step-1 standard suffixes with their rule codes (a_5): 1 delete-R2,
  // 2 logía→log, 3 ución→u, 4 ência→ente, 5 amente-R1, 6 mente-R2,
  // 7 idade-R2, 8 iva-R2(+at), 9 ira→ir after e in RV
  private val st1: Seq[(String, Int)] = Seq(
    "uciones" -> 3, "amentos" -> 1, "imentos" -> 1,
    "aço~es" -> 1, "logías" -> 2, "ências" -> 4, "amente" -> 5,
    "adoras" -> 1, "adores" -> 1, "amento" -> 1, "imento" -> 1,
    "ância" -> 1, "ência" -> 4, "adora" -> 1, "logía" -> 2,
    "idade" -> 7, "mente" -> 6, "ución" -> 3, "aça~o" -> 1,
    "icas" -> 1, "iras" -> 9, "osas" -> 1, "istas" -> 1, "ivas" -> 8,
    "ezas" -> 1, "idades" -> 7, "antes" -> 1, "icos" -> 1,
    "ismos" -> 1, "osos" -> 1, "ivos" -> 8, "ável" -> 1, "ível" -> 1,
    "ica" -> 1, "ira" -> 9, "osa" -> 1, "ista" -> 1, "iva" -> 8,
    "eza" -> 1, "ante" -> 1, "ico" -> 1, "ismo" -> 1, "oso" -> 1,
    "ivo" -> 8).sortBy(-_._1.length)

  // step-2 verb suffixes (a_6), all delete-in-RV
  private val verbs: Seq[String] = Seq(
    "ada", "ida", "ia", "aria", "eria", "iria", "ara", "era", "ira",
    "ava", "asse", "esse", "isse", "aste", "este", "iste", "ei",
    "arei", "erei", "irei", "am", "iam", "ariam", "eriam", "iriam",
    "aram", "eram", "iram", "avam", "em", "arem", "erem", "irem",
    "assem", "essem", "issem", "ado", "ido", "ando", "endo", "indo",
    "ara~o", "era~o", "ira~o", "ar", "er", "ir", "as", "adas", "idas",
    "ias", "arias", "erias", "irias", "aras", "eras", "iras", "avas",
    "es", "ardes", "erdes", "irdes", "ares", "eres", "ires", "asses",
    "esses", "isses", "astes", "estes", "istes", "is", "ais", "eis",
    "areis", "ereis", "ireis", "áreis", "éreis", "íreis", "ásseis",
    "ésseis", "ísseis", "áveis", "íeis", "aríeis", "eríeis", "iríeis",
    "ados", "idos", "amos", "áramos", "éramos", "íramos", "ávamos",
    "íamos", "aríamos", "eríamos", "iríamos", "emos", "aremos",
    "eremos", "iremos", "ássemos", "êssemos", "íssemos", "imos",
    "armos", "ermos", "irmos", "ámos", "arás", "erás", "irás", "eu",
    "iu", "ou", "ará", "erá", "irá").sortBy(-_.length)

  private val residual = Seq("os", "a", "i", "o", "á", "í", "ó")

  def stem(word: String): String = {
    var s = word.toLowerCase.replace("ã", "a~").replace("õ", "o~")
    val rv: Int =
      if (s.length < 3) s.length
      else if (!isV(s.charAt(1))) {
        var i = 2
        while (i < s.length && !isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      } else if (isV(s.charAt(0)) && isV(s.charAt(1))) {
        var i = 2
        while (i < s.length && isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      } else 3
    val r1 = region(s, 0)
    val r2 = region(s, r1)
    def inRV(n: Int) = s.length - n >= rv
    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2

    // ---- step 1: strict among — longest match, then its single rule
    var changed = false
    st1.find { case (suf, _) => s.endsWith(suf) }.foreach { case (suf, code) =>
      val L = suf.length
      code match {
        case 1 => if (inR2(L)) { s = s.dropRight(L); changed = true }
        case 2 => if (inR2(L)) { s = s.dropRight(L) + "log"; changed = true }
        case 3 => if (inR2(L)) { s = s.dropRight(L) + "u"; changed = true }
        case 4 => if (inR2(L)) { s = s.dropRight(L) + "ente"; changed = true }
        case 5 => if (inR1(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("iv") && inR2(2)) {
            s = s.dropRight(2)
            if (s.endsWith("at") && inR2(2)) s = s.dropRight(2)
          } else if ((s.endsWith("os") || s.endsWith("ic") ||
            s.endsWith("ad")) && inR2(2)) s = s.dropRight(2)
        }
        case 6 => if (inR2(L)) {
          s = s.dropRight(L); changed = true
          if ((s.endsWith("ante") || s.endsWith("avel")) && inR2(4))
            s = s.dropRight(4)
          else if (s.endsWith("ível") && inR2(4)) s = s.dropRight(4)
        }
        case 7 => if (inR2(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("abil") && inR2(4)) s = s.dropRight(4)
          else if ((s.endsWith("ic") || s.endsWith("iv")) && inR2(2))
            s = s.dropRight(2)
        }
        case 8 => if (inR2(L)) {
          s = s.dropRight(L); changed = true
          if (s.endsWith("at") && inR2(2)) s = s.dropRight(2)
        }
        case 9 => if (inRV(L) && s.length > L &&
          s.charAt(s.length - L - 1) == 'e') {
          s = s.dropRight(L) + "ir"; changed = true
        }
        case _ =>
      }
    }
    // ---- step 2: verb suffixes, longest lying inside RV
    if (!changed)
      verbs.find(v => s.endsWith(v) && inRV(v.length)).foreach { v =>
        s = s.dropRight(v.length); changed = true
      }
    if (changed) {
      // ---- step 3: i after c
      if (s.endsWith("i") && inRV(1) && s.length > 1 &&
        s.charAt(s.length - 2) == 'c') s = s.dropRight(1)
    } else {
      // ---- step 4: residual suffix
      residual.find(x => s.endsWith(x) && inRV(x.length))
        .foreach(x => s = s.dropRight(x.length))
    }
    // ---- step 5: residual e/é/ê, then guarded u/i; ç → c
    val e5 = Seq("e", "é", "ê").find(x => s.endsWith(x) && inRV(1))
    e5 match {
      case Some(x) =>
        s = s.dropRight(x.length)
        if (s.endsWith("gu") && inRV(1)) s = s.dropRight(1)
        else if (s.endsWith("ci") && inRV(1)) s = s.dropRight(1)
      case None =>
        if (s.endsWith("ç")) s = s.dropRight(1) + "c"
    }
    s.replace("a~", "ã").replace("o~", "õ")
  }

  def stemUtf8(v: UTF8String): UTF8String =
    UTF8String.fromString(stem(v.toString))
}

/** `portuguese_stem(word)` codegen expression. */
case class PortugueseStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "portuguese_stem"

  override def nullSafeEval(v: Any): Any =
    PortugueseStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PortugueseStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PortugueseStem =
    copy(child = newChild)
}

/** Snowball Russian stemmer — the published algorithm (snowball
  * `russian.sbl`; the reference compiles the same spec into
  * `src/backend/snowball/libstemmer/stem_UTF_8_russian.c` — suffix
  * tables cross-checked against its symbol arrays s_0..s_7). Structure:
  * within RV, step 1 removes a perfective gerund OR (reflexive, then
  * adjectival | verb | noun); step 2 drops a trailing и; step 3 removes
  * the derivational ость/ост in R2; step 4 undoubles нн, or removes
  * the superlative ейш(е) then undoubles, or drops a soft sign. */
object RussianStemmer {

  private val vowels = "аеиоуыэюя"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  // suffix groups, longest-first (stem_UTF_8_russian.c s_0..s_7)
  private val gerund1 = Seq("вшись", "вши", "в")
  private val gerund2 = Seq("ывшись", "ившись", "ывши", "ивши", "ыв", "ив")
  private val adjective = Seq("ими", "ыми", "его", "ого", "ему", "ому",
    "ее", "ие", "ые", "ое", "ей", "ий", "ый", "ой", "ем", "им", "ым",
    "ом", "их", "ых", "ую", "юю", "ая", "яя", "ою", "ею")
  private val participle1 = Seq("ющ", "нн", "вш", "ем", "щ")
  private val participle2 = Seq("ующ", "ивш", "ывш")
  private val verb1 = Seq("ешь", "нно", "ете", "йте", "ла", "на", "ли",
    "ем", "ло", "но", "ет", "ют", "ны", "ть", "й", "л", "н")
  private val verb2 = Seq("ейте", "уйте", "ила", "ыла", "ена", "ите",
    "или", "ыли", "ило", "ыло", "ено", "ует", "уют", "ены", "ить",
    "ыть", "ишь", "ей", "уй", "ил", "ыл", "им", "ым", "ен", "ят",
    "ит", "ыт", "ую", "ю")
  private val noun = Seq("иями", "ями", "ами", "ией", "иям", "ием",
    "иях", "ии", "еи", "ей", "ой", "ий", "ям", "ем", "ам", "ом", "ах",
    "ях", "ию", "ью", "ия", "ья", "ев", "ов", "ие", "ье", "а", "е",
    "и", "й", "о", "у", "ы", "ь", "ю", "я")

  def stem(word: String): String = {
    var s = word.toLowerCase.replace('ё', 'е')
    val rv = {
      var i = 0
      while (i < s.length && !isV(s.charAt(i))) i += 1
      if (i < s.length) i + 1 else s.length
    }
    val r1 = region(s, 0)
    val r2 = region(s, r1)
    def inRV(n: Int) = s.length - n >= rv
    def inR2(n: Int) = s.length - n >= r2
    // group-1 endings require a preceding а/я (retained); the marker
    // letter must itself sit inside RV
    def g1(suf: String): Boolean = inRV(suf.length + 1) && {
      val c = s.charAt(s.length - suf.length - 1)
      c == 'а' || c == 'я'
    }

    // ---- step 1
    val ger = gerund2.find(x => s.endsWith(x) && inRV(x.length))
      .orElse(gerund1.find(x => s.endsWith(x) && g1(x)))
    ger match {
      case Some(x) => s = s.dropRight(x.length)
      case None =>
        Seq("ся", "сь").find(x => s.endsWith(x) && inRV(x.length))
          .foreach(x => s = s.dropRight(x.length))
        adjective.find(x => s.endsWith(x) && inRV(x.length)) match {
          case Some(adj) =>
            s = s.dropRight(adj.length)
            participle2.find(x => s.endsWith(x) && inRV(x.length))
              .orElse(participle1.find(x => s.endsWith(x) && g1(x)))
              .foreach(x => s = s.dropRight(x.length))
          case None =>
            verb2.find(x => s.endsWith(x) && inRV(x.length))
              .orElse(verb1.find(x => s.endsWith(x) && g1(x))) match {
              case Some(v) => s = s.dropRight(v.length)
              case None =>
                noun.find(x => s.endsWith(x) && inRV(x.length))
                  .foreach(x => s = s.dropRight(x.length))
            }
        }
    }
    // ---- step 2: trailing и
    if (s.endsWith("и") && inRV(1)) s = s.dropRight(1)
    // ---- step 3: derivational, R2 only
    Seq("ость", "ост").find(x => s.endsWith(x) && s.length - x.length >= r2)
      .foreach(x => s = s.dropRight(x.length))
    // ---- step 4
    if (s.endsWith("нн") && inRV(2)) s = s.dropRight(1)
    else {
      Seq("ейше", "ейш").find(x => s.endsWith(x) && inRV(x.length)) match {
        case Some(x) =>
          s = s.dropRight(x.length)
          if (s.endsWith("нн") && inRV(2)) s = s.dropRight(1)
        case None =>
          if (s.endsWith("ь") && inRV(1)) s = s.dropRight(1)
      }
    }
    s
  }

  def stemUtf8(v: UTF8String): UTF8String =
    UTF8String.fromString(stem(v.toString))
}

/** `russian_stem(word)` codegen expression. */
case class RussianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "russian_stem"

  override def nullSafeEval(v: Any): Any =
    RussianStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RussianStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): RussianStem =
    copy(child = newChild)
}

/** Snowball Dutch stemmer — the published algorithm (snowball
  * `dutch.sbl`; suffix tables cross-checked against the compiled
  * `src/backend/snowball/libstemmer/stem_UTF_8_dutch.c` amongs
  * a_0..a_5). Prelude removes umlaut/acute accents (è survives as a
  * vowel) and upper-cases initial/post-vocalic y and intervocalic i
  * so they read as consonants through the region logic; R1 starts no
  * earlier than position 3; undoubling trims kk/dd/tt after en/e
  * removal and one vowel of a final aa/ee/oo/uu pair. */
object DutchStemmer {

  private val vowels = "aeiouyè"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  /** gopast: index just past the first char (not) in the vowel group
    * from `from`; -1 when no such char occurs. */
  private def gopast(s: String, from: Int, inGroup: Boolean): Int = {
    var i = from
    while (i < s.length && isV(s.charAt(i)) != inGroup) i += 1
    if (i < s.length) i + 1 else -1
  }

  def stem(word: String): String = {
    var s = word.toLowerCase.map {
      case 'á' | 'ä' => 'a'; case 'é' | 'ë' => 'e'; case 'í' | 'ï' => 'i'
      case 'ó' | 'ö' => 'o'; case 'ú' | 'ü' => 'u'; case c => c
    }
    // initial y, y after a vowel, and i between vowels → consonant case
    // (the preceding char is read from the MARKED prefix: an already
    // converted Y/I is a consonant, exactly the in-place C scan)
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val prevV = i > 0 && isV(sb.charAt(i - 1))
      if (c == 'y' && (i == 0 || prevV)) sb.append('Y')
      else if (c == 'i' && prevV && i + 1 < s.length && isV(s.charAt(i + 1)))
        sb.append('I')
      else sb.append(c)
      i += 1
    }
    s = sb.toString

    // R1 (clamped to >= 3; the R2 scan continues from the UNCLAMPED
    // cursor) / R2; either stays unset when its gopast pair fails.
    // The reference engine positions its cursor in UTF-8 BYTES and the
    // R1 clamp is the raw byte constant 3 (`z->I[0] = 3`), so a word
    // opening with a two-byte è reaches R1 one LETTER earlier than a
    // char-counted clamp would allow ("èbs" → "èb"). Region
    // comparisons therefore run in byte space; every suffix this
    // stemmer touches is ASCII, and edits are tail-only, so byte
    // offsets of surviving prefixes stay valid.
    def bpos(k: Int): Int = {
      var i = 0; var bs = 0
      while (i < k) {
        val cp = s.charAt(i).toInt
        bs += (if (cp < 0x80) 1 else if (cp < 0x800) 2
               else if (Character.isHighSurrogate(s.charAt(i))) 2 else 3)
        i += 1
      }
      bs
    }
    var r1b = Int.MaxValue; var r2b = Int.MaxValue
    val a = gopast(s, 0, inGroup = true)
    val b = if (a < 0) -1 else gopast(s, a, inGroup = false)
    if (b >= 0) {
      r1b = math.max(bpos(b), 3)
      val c2 = gopast(s, b, inGroup = true)
      val d = if (c2 < 0) -1 else gopast(s, c2, inGroup = false)
      if (d >= 0) r2b = bpos(d)
    }
    def inR1(n: Int) = bpos(s.length - n) >= r1b
    def inR2(n: Int) = bpos(s.length - n) >= r2b

    def undouble(): Unit =
      if (s.endsWith("kk") || s.endsWith("dd") || s.endsWith("tt"))
        s = s.dropRight(1)

    // valid en-ending: R1, preceded by an existing non-vowel, and not
    // by the literal "gem"
    def enEnding(len: Int): Unit = {
      val stemEnd = s.length - len
      if (inR1(len) && stemEnd > 0 && !isV(s.charAt(stemEnd - 1)) &&
        !s.regionMatches(stemEnd - 3, "gem", 0, 3)) {
        s = s.substring(0, stemEnd); undouble()
      }
    }

    var eFound = false
    def eEnding(): Unit = {
      eFound = false
      if (s.endsWith("e") && inR1(1) && s.length >= 2 &&
        !isV(s.charAt(s.length - 2))) {
        s = s.dropRight(1); eFound = true; undouble()
      }
    }

    def validS(len: Int): Boolean = s.length >= len + 1 && {
      val p = s.charAt(s.length - len - 1); !isV(p) && p != 'j'
    }

    // ---- step 1: strict among (longest match, no backtracking)
    if (s.endsWith("heden")) {
      if (inR1(5)) s = s.dropRight(5) + "heid"
    } else if (s.endsWith("ene")) enEnding(3)
    else if (s.endsWith("en")) enEnding(2)
    else if (s.endsWith("se")) { if (inR1(2) && validS(2)) s = s.dropRight(2) }
    else if (s.endsWith("s")) { if (inR1(1) && validS(1)) s = s.dropRight(1) }
    // ---- step 2: suffix e
    eEnding()
    // ---- step 3a: heid (not after c), then a following en
    if (s.endsWith("heid") && inR2(4) &&
      !(s.length >= 5 && s.charAt(s.length - 5) == 'c')) {
      s = s.dropRight(4)
      if (s.endsWith("en")) enEnding(2)
    }
    // ---- step 3b: d-suffixes (longest match)
    if (s.endsWith("lijk")) {
      if (inR2(4)) { s = s.dropRight(4); eEnding() }
    } else if (s.endsWith("baar")) {
      if (inR2(4)) s = s.dropRight(4)
    } else if (s.endsWith("end") || s.endsWith("ing")) {
      if (inR2(3)) {
        s = s.dropRight(3)
        if (s.endsWith("ig") && inR2(2) &&
          !(s.length >= 3 && s.charAt(s.length - 3) == 'e')) s = s.dropRight(2)
        else undouble()
      }
    } else if (s.endsWith("bar")) {
      if (inR2(3) && eFound) s = s.dropRight(3)
    } else if (s.endsWith("ig")) {
      if (inR2(2) && !(s.length >= 3 && s.charAt(s.length - 3) == 'e'))
        s = s.dropRight(2)
    }
    // ---- step 4: undouble vowel — C V V D, D a non-vowel other than
    // I, V V in {aa, ee, oo, uu}, C a non-vowel → drop one V
    if (s.length >= 4) {
      val d = s.charAt(s.length - 1)
      val v1 = s.charAt(s.length - 2); val v2 = s.charAt(s.length - 3)
      val c0 = s.charAt(s.length - 4)
      if (!isV(d) && d != 'I' && v1 == v2 && "aeou".indexOf(v1) >= 0 &&
        !isV(c0))
        s = s.substring(0, s.length - 2) + d
    }
    // ---- postlude
    s.map { case 'I' => 'i'; case 'Y' => 'y'; case c => c }
  }

  def stemUtf8(v: UTF8String): UTF8String =
    UTF8String.fromString(stem(v.toString))
}

/** `dutch_stem(word)` codegen expression. */
case class DutchStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "dutch_stem"

  override def nullSafeEval(v: Any): Any =
    DutchStemmer.stemUtf8(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DutchStemmer.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): DutchStem =
    copy(child = newChild)
}

/** The three Scandinavian snowball stemmers share one shape
  * (danish.sbl / norwegian.sbl / swedish.sbl as compiled into the
  * reference's `src/backend/snowball/libstemmer/stem_UTF_8_danish.c`,
  * `..._norwegian.c`, `..._swedish.c`, whose among tables and grouping
  * bitmaps these suffix lists are decoded from): R1 with the
  * three-letter minimum clamp, a main-suffix among with the
  * valid-s-ending rule, a consonant-pair truncation, and an
  * other-suffix among. Danish adds the final undouble step. */
private[functions] object ScandinavianStem {

  /** R1 start: after the first non-vowel following the first vowel,
    * clamped to >= 3 (mark_regions' `hop 3` + `try`); length (empty
    * R1) when the pattern never completes or the word is short. */
  def r1(s: String, vowels: String): Int = {
    if (s.length < 3) return s.length
    var i = 0
    while (i < s.length && vowels.indexOf(s.charAt(i)) < 0) i += 1
    while (i < s.length && vowels.indexOf(s.charAt(i)) >= 0) i += 1
    if (i >= s.length) s.length else math.max(i + 1, 3)
  }
}

/** Snowball Danish stemmer. */
object DanishStemmer {
  private val vowels = "aeiouyæåø"
  private val sEndings = "abcdfghjklmnoprtvyzå"
  // a_0, longest-first (stem_UTF_8_danish.c a_0 — all delete except 's')
  private val step1 = Seq("hed", "ethed", "ered", "e", "erede", "ende",
    "erende", "ene", "erne", "ere", "en", "heden", "eren", "er", "heder",
    "erer", "s", "heds", "es", "endes", "erendes", "enes", "ernes",
    "eres", "ens", "hedens", "erens", "ers", "ets", "erets", "et",
    "eret").sortBy(-_.length)
  private val step3 = Seq("elig", "lig", "els", "ig").sortBy(-_.length)

  private def pairDrop(s: String, p1: Int): String =
    if (s.length - 2 >= p1 &&
      Seq("gd", "dt", "gt", "kt").exists(s.endsWith))
      s.substring(0, s.length - 1)
    else s

  def stem(word: String): String = {
    var s = word.toLowerCase
    val p1 = ScandinavianStem.r1(s, vowels)
    // step 1: longest suffix wholly in R1; 's' needs a valid s-ending
    // immediately before it (the s-ending char itself may sit outside R1)
    step1.find(suf => s.endsWith(suf) && s.length - suf.length >= p1)
      .foreach { suf =>
        if (suf == "s") {
          if (s.length >= 2 && sEndings.indexOf(s.charAt(s.length - 2)) >= 0)
            s = s.substring(0, s.length - 1)
        } else s = s.substring(0, s.length - suf.length)
      }
    // step 2: consonant pair gd/dt/gt/kt in R1 -> drop last letter
    s = pairDrop(s, p1)
    // step 3: igst loses st unconditionally; then ig/lig/elig/els in R1
    // delete (and re-run step 2), løst -> løs
    if (s.endsWith("igst")) s = s.substring(0, s.length - 2)
    if (s.endsWith("løst") && s.length - 4 >= p1)
      s = s.substring(0, s.length - 1)
    else step3.find(suf => s.endsWith(suf) && s.length - suf.length >= p1)
      .foreach { suf =>
        s = s.substring(0, s.length - suf.length)
        s = pairDrop(s, p1)
      }
    // step 4 (undouble): final double consonant with the last char in R1
    if (s.length >= 2 && s.length - 1 >= p1 &&
      vowels.indexOf(s.charAt(s.length - 1)) < 0 &&
      s.charAt(s.length - 1) == s.charAt(s.length - 2))
      s = s.substring(0, s.length - 1)
    s
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** Snowball Norwegian stemmer. */
object NorwegianStemmer {
  private val vowels = "aeiouyæåø"
  private val sEndings = "bcdfghjlmnoprtvyz" // k is conditional
  private val step1 = Seq("hetenes", "hetene", "hetens", "heten", "heter",
    "endes", "edes", "enes", "erte", "ande", "ende", "ane", "ene", "ens",
    "ers", "ets", "het", "ast", "ert", "ede", "en", "ar", "er", "as",
    "es", "et", "a", "e", "s").sortBy(-_.length)
  private val step3 = Seq("hetslov", "eleg", "elig", "elov", "slov",
    "leg", "eig", "lig", "els", "lov", "ig").sortBy(-_.length)

  def stem(word: String): String = {
    var s = word.toLowerCase
    val p1 = ScandinavianStem.r1(s, vowels)
    step1.find(suf => s.endsWith(suf) && s.length - suf.length >= p1)
      .foreach {
        case suf @ ("erte" | "ert") => // replace with er
          s = s.substring(0, s.length - suf.length) + "er"
        case "s" =>
          // valid s-ending, or 'k' preceded by a non-vowel
          val ok = s.length >= 2 && {
            val c = s.charAt(s.length - 2)
            sEndings.indexOf(c) >= 0 ||
              (c == 'k' && s.length >= 3 &&
                vowels.indexOf(s.charAt(s.length - 3)) < 0)
          }
          if (ok) s = s.substring(0, s.length - 1)
        case suf => s = s.substring(0, s.length - suf.length)
      }
    // step 2: dt/vt in R1 -> drop the t
    if (s.length - 2 >= p1 && (s.endsWith("dt") || s.endsWith("vt")))
      s = s.substring(0, s.length - 1)
    // step 3: delete if in R1
    step3.find(suf => s.endsWith(suf) && s.length - suf.length >= p1)
      .foreach(suf => s = s.substring(0, s.length - suf.length))
    s
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** Snowball Swedish stemmer. */
object SwedishStemmer {
  private val vowels = "aeiouyäåö"
  private val sEndings = "bcdfghjklmnoprtvy"
  private val step1 = Seq("heterna", "hetens", "arnas", "ernas", "ornas",
    "heten", "heter", "anden", "arens", "andes", "arna", "erna", "orna",
    "ande", "arne", "aste", "aren", "ades", "erns", "andet", "ad", "ade",
    "are", "ern", "ens", "het", "ast", "as", "es", "at", "en", "ar",
    "er", "or", "a", "e", "s").sortBy(-_.length)
  private val step3del = Seq("lig", "els", "ig").sortBy(-_.length)

  def stem(word: String): String = {
    var s = word.toLowerCase
    val p1 = ScandinavianStem.r1(s, vowels)
    step1.find(suf => s.endsWith(suf) && s.length - suf.length >= p1)
      .foreach { suf =>
        if (suf == "s") {
          if (s.length >= 2 && sEndings.indexOf(s.charAt(s.length - 2)) >= 0)
            s = s.substring(0, s.length - 1)
        } else s = s.substring(0, s.length - suf.length)
      }
    // step 2: dd/gd/nn/dt/gt/kt/tt in R1 -> drop last letter
    if (s.length - 2 >= p1 &&
      Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt").exists(s.endsWith))
      s = s.substring(0, s.length - 1)
    // step 3: lig/ig/els delete in R1; löst -> lös; fullt -> full
    if (s.endsWith("löst") && s.length - 4 >= p1)
      s = s.substring(0, s.length - 1)
    else if (s.endsWith("fullt") && s.length - 5 >= p1)
      s = s.substring(0, s.length - 1)
    else step3del.find(suf => s.endsWith(suf) && s.length - suf.length >= p1)
      .foreach(suf => s = s.substring(0, s.length - suf.length))
    s
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** Snowball Finnish stemmer (finnish.sbl as compiled into the
  * reference's `stem_UTF_8_finnish.c`; among tables a_0..a_9, the
  * g_V1/g_V2/g_AEI/g_particle_end groupings, and the VI/LONG
  * table-functions — with their among-fallback semantics — decoded
  * from that file and differential-tested bit-identical against the
  * compiled original). Steps: particle, possessive, case ending (sets
  * the ending_removed flag), comparative/other endings in R2, then
  * i-plural or t-plural depending on the flag, and the tidy pass
  * (long-vowel shortening, trailing AEI after consonant, oj/uj/jo, and
  * the final unbounded consonant undouble). */
object FinnishStemmer {
  private val V1 = "aeiouyäö"
  private val V2 = "aeiouäö"
  private val AEI = "aeiä"
  private val particleEnd = "aeinotuyäö"
  private val longPairs = Set("aa", "ee", "ii", "oo", "uu", "ää", "öö")

  private def regionAfter(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && V1.indexOf(s.charAt(i)) < 0) i += 1
    while (i < s.length && V1.indexOf(s.charAt(i)) >= 0) i += 1
    if (i >= s.length) s.length else i + 1
  }

  def stem(word: String): String = {
    var s = word.toLowerCase
    val p1 = regionAfter(s, 0)
    val p2 = regionAfter(s, p1)
    var endingRemoved = false
    def fitsR1(n: Int) = s.length - n >= p1
    def fitsR2(n: Int) = s.length - n >= p2
    def del(n: Int): Unit = s = s.substring(0, s.length - n)
    def endsAt(end: Int, p: String): Boolean =
      end >= p.length && s.regionMatches(end - p.length, p, 0, p.length)

    // ---- step 1: particle etc (a_0, whole suffix in R1)
    Seq("kään", "kaan", "sti", "han", "kin", "hän", "ko", "pa", "pä", "kö")
      .sortBy(-_.length)
      .find(c => s.endsWith(c) && fitsR1(c.length))
      .foreach { c =>
        if (c == "sti") { if (fitsR2(3)) del(3) }
        else {
          val pre = s.length - c.length - 1
          if (pre >= 0 && particleEnd.indexOf(s.charAt(pre)) >= 0) del(c.length)
        }
      }

    // ---- step 2: possessive (a_4 in R1; preceded-by checks unbounded)
    Seq("nsa", "nsä", "mme", "nne", "ni", "si", "an", "en", "än")
      .sortBy(-_.length)
      .find(c => s.endsWith(c) && fitsR1(c.length))
      .foreach {
        case "si" =>
          if (!(s.length >= 3 && s.charAt(s.length - 3) == 'k')) del(2)
        case "ni" =>
          del(2)
          if (s.endsWith("kse")) s = s.substring(0, s.length - 3) + "ksi"
        case "an" =>
          if (Seq("lla", "na", "ssa", "ta", "lta", "sta")
            .exists(endsAt(s.length - 2, _))) del(2)
        case "än" =>
          if (Seq("llä", "nä", "ssä", "tä", "ltä", "stä")
            .exists(endsAt(s.length - 2, _))) del(2)
        case "en" =>
          if (Seq("lle", "ine").exists(endsAt(s.length - 2, _))) del(2)
        case _ => del(3) // nsa nsä mme nne
      }

    // ---- step 3: case endings (a_6 in R1). VI/LONG are among
    // table-functions: their failure FALLS BACK to the next shorter
    // candidate; switch-body conditions (han-after-a etc.) abort.
    locally {
      // (suffix, table-cond: evaluated inside the R1 limit)
      def viCond(e: Int): Boolean =
        e - 2 >= p1 && s.charAt(e - 1) == 'i' &&
          V2.indexOf(s.charAt(e - 2)) >= 0
      def longCond(e: Int): Boolean =
        e - 2 >= p1 && longPairs.contains(s.substring(e - 2, e))
      val cands: Seq[(String, Int => Boolean)] = Seq(
        ("seen", longCond _), ("tten", viCond _), ("siin", viCond _),
        ("den", viCond _),
        ("lla", null), ("ssa", null), ("tta", null), ("lle", null),
        ("ine", null), ("ksi", null), ("han", null), ("hen", null),
        ("hin", null), ("hon", null), ("hän", null), ("hön", null),
        ("llä", null), ("ssä", null), ("ltä", null), ("stä", null),
        ("ttä", null), ("lta", null), ("sta", null),
        ("na", null), ("ta", null), ("nä", null), ("tä", null),
        ("n", null), ("a", null), ("ä", null)
      ).sortBy(-_._1.length)
      cands.find { case (c, cond) =>
        s.endsWith(c) && fitsR1(c.length) &&
          (cond == null || cond(s.length - c.length))
      }.foreach { case (c, _) =>
        val e = s.length - c.length
        def pre(ch: Char) = e >= 1 && s.charAt(e - 1) == ch
        c match {
          case "han" => if (pre('a')) { del(3); endingRemoved = true }
          case "hen" => if (pre('e')) { del(3); endingRemoved = true }
          case "hin" => if (pre('i')) { del(3); endingRemoved = true }
          case "hon" => if (pre('o')) { del(3); endingRemoved = true }
          case "hän" => if (pre('ä')) { del(3); endingRemoved = true }
          case "hön" => if (pre('ö')) { del(3); endingRemoved = true }
          case "tta" | "ttä" =>
            if (pre('e')) { del(3); endingRemoved = true }
          case "a" | "ä" =>
            // preceded by V1 preceded by non-V1 (both unbounded)
            if (e >= 2 && V1.indexOf(s.charAt(e - 1)) >= 0 &&
              V1.indexOf(s.charAt(e - 2)) < 0) {
              del(1); endingRemoved = true
            }
          case "n" =>
            del(1)
            endingRemoved = true
            // try: LONG or 'ie' before the n -> drop one more char
            val m = s.length
            if ((m >= 2 && longPairs.contains(s.substring(m - 2))) ||
              s.endsWith("ie")) del(1)
          case other =>
            del(other.length); endingRemoved = true
        }
      }
    }

    // ---- step 4: other endings (a_7, whole suffix in R2)
    Seq("impi", "impa", "impä", "immi", "imma", "immä", "eja", "ejä",
      "mpi", "mpa", "mpä", "mmi", "mma", "mmä").sortBy(-_.length)
      .find(c => s.endsWith(c) && fitsR2(c.length))
      .foreach { c =>
        if (Set("mpi", "mpa", "mpä", "mmi", "mma", "mmä").contains(c)) {
          if (!endsAt(s.length - 3, "po")) del(3)
        } else del(c.length)
      }

    // ---- step 5: i-plural (after a removed case ending) or t-plural
    if (endingRemoved) {
      if ((s.endsWith("i") || s.endsWith("j")) && fitsR1(1)) del(1)
    } else {
      // t preceded by a V1 vowel, both within R1
      if (s.endsWith("t") && fitsR1(1) && s.length - 2 >= p1 &&
        V1.indexOf(s.charAt(s.length - 2)) >= 0) {
        del(1)
        // then mma/imma in R2 (mma blocked by a preceding po)
        if (s.endsWith("imma") && fitsR2(4)) del(4)
        else if (s.endsWith("mma") && fitsR2(3)) {
          if (!endsAt(s.length - 3, "po")) del(3)
        }
      }
    }

    // ---- step 6: tidy (all but the undouble limited to R1)
    if (s.length >= 2 && s.length - 2 >= p1 &&
      longPairs.contains(s.substring(s.length - 2))) del(1)
    if (s.length >= 2 && s.length - 2 >= p1 &&
      AEI.indexOf(s.charAt(s.length - 1)) >= 0 &&
      V1.indexOf(s.charAt(s.length - 2)) < 0) del(1)
    if (s.length >= 2 && s.length - 2 >= p1 && s.endsWith("j") &&
      (s.charAt(s.length - 2) == 'o' || s.charAt(s.length - 2) == 'u'))
      del(1)
    if (s.length >= 2 && s.length - 2 >= p1 && s.endsWith("o") &&
      s.charAt(s.length - 2) == 'j') del(1)
    // unbounded final undouble: skip trailing vowels, drop one of a
    // doubled consonant pair
    var k = s.length
    while (k > 0 && V1.indexOf(s.charAt(k - 1)) >= 0) k -= 1
    if (k > 0 && k >= 2 && s.charAt(k - 2) == s.charAt(k - 1))
      s = s.substring(0, k - 1) + s.substring(k)
    s
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** Snowball Hungarian stemmer (hungarian.sbl as compiled into the
  * reference's `stem_UTF_8_hungarian.c`; among tables a_0..a_11 and
  * the result→action maps decoded from that file and differential-
  * tested bit-identical against the compiled original). R1: after the
  * first consonant UNIT (digraphs cs/dzs/gy/ly/ny/sz/ty/zs count as
  * one) for vowel-initial words, after the first vowel otherwise.
  * Note the era-faithful vowel grouping: this libstemmer revision uses
  * õ/û (Latin-1) where modern Hungarian writes ő/ű — preserved
  * bug-compatibly, as the reference engine ships exactly this table.
  * Steps (each an independent `do`): instrum, case (+v_ending),
  * case_special, case_other, factive, owned, sing_owner, plur_owner,
  * plural. */
object HungarianStemmer {
  private val V = "aeiouáéíóõöúûü"
  private val digraphs = Seq("dzs", "cs", "gy", "ly", "ny", "sz", "ty", "zs")
  private val doubles = Seq("ccs", "zzs", "ggy", "lly", "nny", "tty", "ssz",
    "bb", "cc", "dd", "ff", "gg", "jj", "kk", "ll", "mm", "nn", "pp",
    "rr", "ss", "tt", "vv", "zz")

  private def markR1(s: String): Int = {
    if (s.isEmpty) return s.length
    if (V.indexOf(s.charAt(0)) >= 0) {
      // vowel start: advance to first non-vowel, then past the
      // consonant unit (digraph counts once)
      var i = 1
      while (i < s.length && V.indexOf(s.charAt(i)) >= 0) i += 1
      if (i >= s.length) s.length
      else digraphs.find(d => s.regionMatches(i, d, 0, d.length)) match {
        case Some(d) => i + d.length
        case None => i + 1
      }
    } else {
      // consonant start: after the first vowel
      var i = 1
      while (i < s.length && V.indexOf(s.charAt(i)) < 0) i += 1
      if (i >= s.length) s.length else i + 1
    }
  }

  def stem(word: String): String = {
    var s = word.toLowerCase
    val p1 = markR1(s)
    def inR1(sufLen: Int) = s.length - sufLen >= p1
    def del(n: Int): Unit = s = s.substring(0, s.length - n)
    def repl(n: Int, c: Char): Unit =
      s = s.substring(0, s.length - n) + c
    def doubleBefore(sufLen: Int): Boolean = {
      val head = s.substring(0, s.length - sufLen)
      doubles.exists(head.endsWith)
    }
    def undouble(): Unit =
      // remove the second-to-last char (one of the doubled pair;
      // correct for 3-letter doubles like ssz -> sz too)
      s = s.substring(0, s.length - 2) + s.substring(s.length - 1)
    def vEnding(): Unit =
      if (s.endsWith("á") && inR1(1)) repl(1, 'a')
      else if (s.endsWith("é") && inR1(1)) repl(1, 'e')
    // longest unbounded match, then R1 on that one (no fallback)
    def among(cands: Seq[String])(act: String => Unit): Unit =
      cands.sortBy(-_.length).find(s.endsWith).foreach { c =>
        if (inR1(c.length)) act(c)
      }

    // instrum: al/el after a double consonant
    among(Seq("al", "el")) { c =>
      if (doubleBefore(2)) { del(2); undouble() }
    }
    // case endings: delete, then v_ending
    among(Seq("ba", "ra", "be", "re", "ig", "nak", "nek", "val", "vel",
      "ul", "nál", "nél", "ból", "ról", "tól", "bõl", "rõl", "tõl",
      "ül", "n", "an", "ban", "en", "ben", "képpen", "on", "ön",
      "képp", "kor", "t", "at", "et", "ként", "anként", "enként",
      "onként", "ot", "ért", "öt", "hez", "hoz", "höz", "vá", "vé")) { c =>
      del(c.length); vEnding()
    }
    // case_special: án -> a, én -> e, ánként -> a
    among(Seq("án", "én", "ánként")) {
      case "én" => repl(2, 'e')
      case c => repl(c.length, 'a')
    }
    // case_other: stul/stül/astul/estül delete; ástul -> a; éstül -> e
    among(Seq("stul", "astul", "ástul", "stül", "estül", "éstül")) {
      case "ástul" => repl(5, 'a')
      case "éstül" => repl(5, 'e')
      case c => del(c.length)
    }
    // factive: á/é after a double consonant
    among(Seq("á", "é")) { c =>
      if (doubleBefore(1)) { del(1); undouble() }
    }
    // owned
    among(Seq("éi", "áéi", "ééi", "é", "ké", "aké", "eké", "oké",
      "áké", "éké", "öké", "éé")) {
      case c @ ("ééi" | "éké" | "éé") => repl(c.length, 'e')
      case c @ ("áéi" | "áké") => repl(c.length, 'a')
      case c => del(c.length)
    }
    // sing_owner
    among(Seq("a", "ja", "d", "ad", "ed", "od", "ád", "éd", "öd", "e",
      "je", "nk", "unk", "ánk", "énk", "ünk", "uk", "juk", "ájuk",
      "ük", "jük", "éjük", "m", "am", "em", "om", "ám", "ém", "o",
      "á", "é")) {
      case c @ ("ád" | "ánk" | "ájuk" | "ám" | "á") => repl(c.length, 'a')
      case c @ ("éd" | "énk" | "éjük" | "ém" | "é") => repl(c.length, 'e')
      case c => del(c.length)
    }
    // plur_owner
    among(Seq("id", "aid", "jaid", "eid", "jeid", "áid", "éid", "i",
      "ai", "jai", "ei", "jei", "ái", "éi", "itek", "eitek", "jeitek",
      "éitek", "ik", "aik", "jaik", "eik", "jeik", "áik", "éik", "ink",
      "aink", "jaink", "eink", "jeink", "áink", "éink", "aitok",
      "jaitok", "áitok", "im", "aim", "jaim", "eim", "jeim", "áim",
      "éim")) {
      case c @ ("áid" | "ái" | "áik" | "áink" | "áitok" | "áim") =>
        repl(c.length, 'a')
      case c @ ("éid" | "éi" | "éitek" | "éik" | "éink" | "éim") =>
        repl(c.length, 'e')
      case c => del(c.length)
    }
    // plural: ák -> a, ék -> e, k/ak/ok/ek/ök delete
    among(Seq("k", "ak", "ek", "ok", "ák", "ék", "ök")) {
      case "ák" => repl(2, 'a')
      case "ék" => repl(2, 'e')
      case c => del(c.length)
    }
    s
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** Snowball Romanian stemmer (romanian.sbl as compiled into the
  * reference's `stem_UTF_8_romanian.c`; among tables a_0..a_5 decoded
  * from that file, differential-tested bit-identical against the
  * compiled original). Romance shape: the u/i-between-vowels prelude
  * (U/I markers), Spanish-style RV/R1/R2, step 0 plural/article
  * removal, a repeated combo-suffix pass feeding the standard-suffix
  * R2 step, verb suffixes in RV only when no standard suffix was
  * removed, the final vowel suffix, and the unmarking postlude.
  * Diacritics follow the era's cedilla forms (ş/ţ), as the reference
  * ships them. */
object RomanianStemmer {
  private val vowels = "aeiouâîă"
  @inline private def isV(c: Char): Boolean = vowels.indexOf(c) >= 0

  private def region(s: String, from: Int): Int = {
    var i = from
    while (i < s.length && !isV(s.charAt(i))) i += 1
    while (i < s.length && isV(s.charAt(i))) i += 1
    if (i < s.length) i + 1 else s.length
  }

  // verb suffixes (a_4): class 2 deletes unconditionally; class 1
  // needs a consonant or 'u' immediately before (within RV)
  private val verbClass2 = Set("se", "sese", "sei", "seşi", "seseşi",
    "aţi", "eţi", "iţi", "âţi", "serăţi", "seserăţi", "em", "sesem",
    "im", "ăm", "âm", "serăm", "seserăm", "seră", "seseră")
  private val verbSuffixes: Seq[String] = (Seq("ea", "ia", "esc", "ăsc",
    "ind", "ând", "are", "ere", "ire", "âre", "ase", "ise", "use",
    "âse", "eşte", "ăşte", "eze", "ai", "eai", "iai", "eşti", "ăşti",
    "ui", "ezi", "aşi", "aseşi", "iseşi", "useşi", "âseşi", "işi",
    "uşi", "âşi", "âi", "eaţi", "iaţi", "arăţi", "aserăţi", "iserăţi",
    "userăţi", "âserăţi", "irăţi", "urăţi", "ârăţi", "am", "eam",
    "iam", "asem", "isem", "usem", "âsem", "arăm", "aserăm",
    "iserăm", "userăm", "âserăm", "irăm", "urăm", "ârăm", "au", "eau",
    "iau", "indu", "ându", "ez", "ească", "ară", "aseră", "iseră",
    "useră", "âseră", "iră", "ură", "âră", "ează") ++ verbClass2)
    .sortBy(-_.length)

  def stem(word: String): String = {
    var s = word.toLowerCase
    // prelude: u/i between vowels -> marker U/I (state-aware scan)
    if (s.length >= 3) {
      val sb = new StringBuilder(s)
      var i = 1
      while (i + 1 < sb.length) {
        val c = sb.charAt(i)
        if ((c == 'u' || c == 'i') && isV(sb.charAt(i - 1)) &&
          isV(sb.charAt(i + 1)))
          sb.setCharAt(i, if (c == 'u') 'U' else 'I')
        i += 1
      }
      s = sb.toString
    }
    // regions on the marked string (U/I are not vowels)
    val rv: Int =
      if (s.length < 2) s.length
      else if (!isV(s.charAt(1))) {
        var i = 2
        while (i < s.length && !isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      } else if (isV(s.charAt(0))) {
        var i = 2
        while (i < s.length && isV(s.charAt(i))) i += 1
        if (i < s.length) i + 1 else s.length
      } else if (s.length > 2) 3
      else s.length
    val r1 = region(s, 0)
    val r2 = region(s, r1)
    def inR1(n: Int) = s.length - n >= r1
    def inR2(n: Int) = s.length - n >= r2
    def inRV(n: Int) = s.length - n >= rv
    def replaceSuf(sufLen: Int, repl: String): Unit =
      s = s.substring(0, s.length - sufLen) + repl

    // ---- step 0 (a_1): unbounded longest match, then R1 on it
    Seq("ea", "aţia", "aua", "iua", "aţie", "ele", "ile", "iile",
      "iei", "atei", "ii", "ului", "ul", "elor", "ilor", "iilor")
      .sortBy(-_.length).find(s.endsWith).foreach { c =>
      if (inR1(c.length)) c match {
        case "ul" | "ului" => replaceSuf(c.length, "")
        case "aua" => replaceSuf(3, "a")
        case "ea" | "ele" | "elor" => replaceSuf(c.length, "e")
        case "ile" =>
          if (!(s.length >= 5 && s.regionMatches(s.length - 5, "ab", 0, 2)))
            replaceSuf(3, "i")
        case "atei" => replaceSuf(4, "at")
        case "aţia" | "aţie" => replaceSuf(4, "aţi")
        case _ => replaceSuf(c.length, "i") // iua iile iei ii ilor iilor
      }
    }

    // ---- standard suffixes: repeated combo pass, then the R2 among
    var flag = false
    var comboAgain = true
    while (comboAgain) {
      comboAgain = false
      val combo = Seq(
        ("abilitate", "abil"), ("abilitati", "abil"), ("abilităi", "abil"),
        ("abilităţi", "abil"), ("ibilitate", "ibil"),
        ("ivitate", "iv"), ("ivitati", "iv"), ("ivităi", "iv"),
        ("ivităţi", "iv"),
        ("icala", "ic"), ("icale", "ic"), ("icali", "ic"), ("icală", "ic"),
        ("iciva", "ic"), ("icive", "ic"), ("icivi", "ic"), ("icivă", "ic"),
        ("iciv", "ic"), ("ical", "ic"),
        ("icitate", "ic"), ("icitati", "ic"), ("icităi", "ic"),
        ("icităţi", "ic"), ("icatori", "ic"), ("icator", "ic"),
        ("ativa", "at"), ("ative", "at"), ("ativi", "at"), ("ativă", "at"),
        ("ativ", "at"), ("aţiune", "at"), ("atoare", "at"), ("ătoare", "at"),
        ("atori", "at"), ("ători", "at"), ("ator", "at"), ("ător", "at"),
        ("itiva", "it"), ("itive", "it"), ("itivi", "it"), ("itivă", "it"),
        ("itiv", "it"), ("iţiune", "it"), ("itoare", "it"), ("itori", "it"),
        ("itor", "it")).sortBy(-_._1.length)
      combo.find { case (c, _) => s.endsWith(c) }.foreach { case (c, r) =>
        if (inR1(c.length)) {
          replaceSuf(c.length, r)
          flag = true
          comboAgain = true
        }
      }
    }
    Seq("ica", "abila", "ibila", "oasa", "ata", "ita", "anta", "ista",
      "uta", "iva", "ic", "ice", "abile", "ibile", "isme", "iune",
      "oase", "ate", "itate", "ite", "ante", "iste", "ute", "ive",
      "ici", "abili", "ibili", "iuni", "atori", "osi", "ati", "itati",
      "iti", "anti", "isti", "uti", "işti", "ivi", "ităi", "oşi",
      "ităţi", "abil", "ibil", "ism", "ator", "os", "at", "it", "ant",
      "ist", "ut", "iv", "ică", "abilă", "ibilă", "oasă", "ată", "ită",
      "antă", "istă", "ută", "ivă").sortBy(-_.length)
      .find(s.endsWith).foreach { c =>
      if (inR2(c.length)) c match {
        case "iune" | "iuni" =>
          if (s.length >= c.length + 1 &&
            s.charAt(s.length - c.length - 1) == 'ţ') {
            replaceSuf(c.length + 1, "t")
            flag = true
          }
        case "ism" | "isme" | "ist" | "ista" | "iste" | "isti" |
             "istă" | "işti" =>
          replaceSuf(c.length, "ist"); flag = true
        case _ => replaceSuf(c.length, ""); flag = true
      }
    }

    // ---- verb suffixes: only when nothing standard was removed;
    // the among itself is RV-limited (shorter candidates fall back)
    if (!flag) {
      verbSuffixes.find(c => s.endsWith(c) && inRV(c.length)).foreach { c =>
        if (verbClass2.contains(c)) replaceSuf(c.length, "")
        else {
          val e = s.length - c.length
          if (e - 1 >= rv &&
            (!isV(s.charAt(e - 1)) || s.charAt(e - 1) == 'u'))
            replaceSuf(c.length, "")
        }
      }
    }

    // ---- final vowel suffix (a_5 in RV)
    Seq("ie", "a", "e", "i", "ă").find(s.endsWith).foreach { c =>
      if (inRV(c.length)) replaceSuf(c.length, "")
    }

    // ---- postlude: unmark
    s.map { case 'I' => 'i'; case 'U' => 'u'; case c => c }
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** Snowball Turkish stemmer (turkish.sbl as compiled into the
  * reference's `stem_UTF_8_turkish.c`; groupings and among tables
  * a_0..a_23 decoded from the generated tables, control flow traced
  * from the generated routines; differentially tested against the
  * compiled reference stemmer over a generated suffix-chain
  * vocabulary — pinned vectors in ExpressionSpec).
  *
  * Unlike the European stemmers, Turkish has no R1/R2 regions: the
  * whole algorithm is backward suffix stripping under vowel-harmony
  * and optional-letter (y/n/s consonant, high-vowel) checks, then
  * last-consonant devoicing (b→p c→ç d→t ğ→k) and a harmony-matched
  * vowel append after a final d/g. The generated code's backtracking
  * or/try control flow is mirrored with an explicit backward cursor;
  * saves are distances from the string END (as in the generated
  * code), so suffix deletions between a save and its restore keep
  * the restored position meaningful. */
object TurkishStemmer {
  private val vowel = "aeıioöuü"
  private val highV = "ıiuü" // g_U

  private final class Env(var s: String) {
    var c: Int = s.length // backward cursor: s(c-1) is the next char
    var lb: Int = 0
    var ket: Int = 0 // right slice mark
    var bra: Int = 0 // left slice mark
    var continueNoun: Boolean = true

    def mark: Int = s.length - c
    def reset(m: Int): Unit = c = s.length - m
    def sliceDel(): Unit = { s = s.substring(0, bra) + s.substring(ket); c = bra }

    def eqSB(t: String): Boolean =
      if (c - t.length >= lb && s.startsWith(t, c - t.length)) { c -= t.length; true }
      else false

    /** longest candidate matching as a suffix at the cursor, consumed */
    def amongB(cands: Seq[String]): Boolean =
      cands.find(t => c - t.length >= lb && s.startsWith(t, c - t.length)) match {
        case Some(t) => c -= t.length; true
        case None => false
      }

    def inB(group: String): Boolean =
      if (c > lb && group.indexOf(s.charAt(c - 1)) >= 0) { c -= 1; true } else false

    /** backward goto: position the cursor so the next char is in `group` */
    def gotoB(group: String): Boolean = {
      var i = c
      while (i > lb && group.indexOf(s.charAt(i - 1)) < 0) i -= 1
      if (i > lb) { c = i; true } else false
    }

    /** the last vowel before the cursor harmonizes with an earlier
      * vowel of its front/back + rounded/unrounded class (test-only:
      * cursor restored) */
    def harmony(): Boolean = {
      val m0 = mark
      val ok = gotoB(vowel) && {
        val m1 = mark
        def alt(v: String, grp: String): Boolean = { reset(m1); eqSB(v) && gotoB(grp) }
        alt("a", "aoıu") || alt("e", "eiöü") || alt("ı", "aı") || alt("i", "ei") ||
          alt("o", "ou") || alt("ö", "öü") || alt("u", "ou") || alt("ü", "öü")
      }
      reset(m0)
      ok
    }

    /** optional suffix-initial consonant `x` (n/s/y): when present it
      * must follow a vowel and is consumed; when absent the preceding
      * char must itself follow a vowel (nothing consumed) */
    def optCons(x: Char): Boolean =
      if (c > lb && s.charAt(c - 1) == x) {
        if (c - 2 >= lb && vowel.indexOf(s.charAt(c - 2)) >= 0) { c -= 1; true } else false
      } else c - 2 >= lb && vowel.indexOf(s.charAt(c - 2)) >= 0

    /** optional suffix-initial high vowel: when present it must follow
      * a consonant and is consumed; when absent the preceding char
      * must itself follow a consonant */
    def optU(): Boolean =
      if (c > lb && highV.indexOf(s.charAt(c - 1)) >= 0) {
        if (c - 2 >= lb && vowel.indexOf(s.charAt(c - 2)) < 0) { c -= 1; true } else false
      } else c - 2 >= lb && vowel.indexOf(s.charAt(c - 2)) < 0
  }

  // among tables (longest-first within each)
  private val aPoss = Seq("miz", "niz", "muz", "nuz", "mız", "nız", "müz", "nüz", "m", "n")
  private val aYDU = Seq(
    "dik", "tik", "duk", "tuk", "dık", "tık", "dük", "tük",
    "dim", "tim", "dum", "tum", "dım", "tım", "düm", "tüm",
    "din", "tin", "dun", "tun", "dın", "tın", "dün", "tün",
    "di", "ti", "du", "tu", "dı", "tı", "dü", "tü")
  private val aYsA = Seq("sak", "sek", "sam", "sem", "san", "sen", "sa", "se")

  private def markPossessives(z: Env) = z.amongB(aPoss) && z.optU()
  private def markSU(z: Env) = z.harmony() && z.inB(highV) && z.optCons('s')
  private def markLArI(z: Env) = z.amongB(Seq("leri", "ları"))
  private def markYU(z: Env) = z.harmony() && z.inB(highV) && z.optCons('y')
  private def markNU(z: Env) = z.harmony() && z.amongB(Seq("ni", "nu", "nı", "nü"))
  private def markNUn(z: Env) =
    z.harmony() && z.amongB(Seq("in", "un", "ın", "ün")) && z.optCons('n')
  private def markYA(z: Env) = z.harmony() && z.amongB(Seq("a", "e")) && z.optCons('y')
  private def markNA(z: Env) = z.harmony() && z.amongB(Seq("na", "ne"))
  private def markDA(z: Env) = z.harmony() && z.amongB(Seq("da", "ta", "de", "te"))
  private def markNdA(z: Env) = z.harmony() && z.amongB(Seq("nda", "nde"))
  private def markDAn(z: Env) = z.harmony() && z.amongB(Seq("dan", "tan", "den", "ten"))
  private def markNdAn(z: Env) = z.harmony() && z.amongB(Seq("ndan", "nden"))
  private def markYlA(z: Env) = z.harmony() && z.amongB(Seq("la", "le")) && z.optCons('y')
  private def markKi(z: Env) = z.eqSB("ki")
  private def markNcA(z: Env) = z.harmony() && z.amongB(Seq("ca", "ce")) && z.optCons('n')
  private def markYUm(z: Env) =
    z.harmony() && z.amongB(Seq("im", "um", "ım", "üm")) && z.optCons('y')
  private def markSUn(z: Env) = z.harmony() && z.amongB(Seq("sin", "sun", "sın", "sün"))
  private def markYUz(z: Env) =
    z.harmony() && z.amongB(Seq("iz", "uz", "ız", "üz")) && z.optCons('y')
  private def markSUnUz(z: Env) = z.amongB(Seq("siniz", "sunuz", "sınız", "sünüz"))
  private def markLAr(z: Env) = z.harmony() && z.amongB(Seq("lar", "ler"))
  private def markNUz(z: Env) = z.harmony() && z.amongB(Seq("niz", "nuz", "nız", "nüz"))
  private def markDUr(z: Env) =
    z.harmony() && z.amongB(Seq("dir", "tir", "dur", "tur", "dır", "tır", "dür", "tür"))
  private def markCAsInA(z: Env) = z.amongB(Seq("casına", "cesine"))
  private def markYDU(z: Env) = z.harmony() && z.amongB(aYDU) && z.optCons('y')
  private def markYsA(z: Env) = z.amongB(aYsA) && z.optCons('y')
  private def markYmUs(z: Env) =
    z.harmony() && z.amongB(Seq("miş", "muş", "mış", "müş")) && z.optCons('y')
  private def markYken(z: Env) = z.eqSB("ken") && z.optCons('y')

  /** past/conditional/evidential copula chains off nominal predicates;
    * the -lAr branch unsets continue_stemming_noun_suffixes */
  private def stemNominalVerbSuffixes(z: Env): Boolean = {
    z.ket = z.c
    z.continueNoun = true
    val m1 = z.mark
    var matched = {
      val m2 = z.mark
      markYmUs(z) || { z.reset(m2); markYDU(z) } ||
        { z.reset(m2); markYsA(z) } || { z.reset(m2); markYken(z) }
    }
    if (!matched) {
      z.reset(m1)
      if (markCAsInA(z)) {
        val m3 = z.mark
        if (!markSUnUz(z)) { z.reset(m3)
          if (!markLAr(z)) { z.reset(m3)
            if (!markYUm(z)) { z.reset(m3)
              if (!markSUn(z)) { z.reset(m3)
                if (!markYUz(z)) z.reset(m3) } } } }
        matched = markYmUs(z)
      }
    }
    if (!matched) {
      z.reset(m1)
      if (markLAr(z)) {
        z.bra = z.c; z.sliceDel()
        val mKeep = z.mark
        z.ket = z.c
        val m4 = z.mark
        val t = markDUr(z) || { z.reset(m4); markYDU(z) } ||
          { z.reset(m4); markYsA(z) } || { z.reset(m4); markYmUs(z) }
        if (!t) z.reset(mKeep)
        z.continueNoun = false
        matched = true
      }
    }
    if (!matched) {
      z.reset(m1)
      if (markNUz(z)) {
        val m5 = z.mark
        matched = markYDU(z) || { z.reset(m5); markYsA(z) }
      }
    }
    if (!matched) {
      z.reset(m1)
      val m6 = z.mark
      val hit = markSUnUz(z) || { z.reset(m6); markYUz(z) } ||
        { z.reset(m6); markSUn(z) } || { z.reset(m6); markYUm(z) }
      if (hit) {
        z.bra = z.c; z.sliceDel()
        val mKeep = z.mark
        z.ket = z.c
        if (!markYmUs(z)) z.reset(mKeep)
        matched = true
      }
    }
    if (!matched) {
      z.reset(m1)
      if (!markDUr(z)) return false
      z.bra = z.c; z.sliceDel()
      val mKeep = z.mark
      z.ket = z.c
      val m7 = z.mark
      if (!markSUnUz(z)) { z.reset(m7)
        if (!markLAr(z)) { z.reset(m7)
          if (!markYUm(z)) { z.reset(m7)
            if (!markSUn(z)) { z.reset(m7)
              if (!markYUz(z)) z.reset(m7) } } } }
      if (!markYmUs(z)) z.reset(mKeep)
    }
    z.bra = z.c
    z.sliceDel()
    true
  }

  /** the relativizer -ki restarts the case/possessive chain */
  private def chainKi(z: Env): Boolean = {
    z.ket = z.c
    if (!markKi(z)) return false
    val m1 = z.mark
    if (markDA(z)) {
      z.bra = z.c; z.sliceDel()
      val mKeep = z.mark
      z.ket = z.c
      val m2 = z.mark
      if (markLAr(z)) {
        z.bra = z.c; z.sliceDel()
        val mk = z.mark
        if (!chainKi(z)) z.reset(mk)
      } else {
        z.reset(m2)
        if (markPossessives(z)) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          z.ket = z.c
          if (markLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainKi(z)) z.reset(mk)
          } else z.reset(mk)
        } else z.reset(mKeep)
      }
      return true
    }
    z.reset(m1)
    if (markNUn(z)) {
      z.bra = z.c; z.sliceDel()
      val mKeep = z.mark
      z.ket = z.c
      val m3 = z.mark
      if (markLArI(z)) { z.bra = z.c; z.sliceDel() }
      else {
        z.reset(m3)
        z.ket = z.c
        val m4 = z.mark
        if (markPossessives(z) || { z.reset(m4); markSU(z) }) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          z.ket = z.c
          if (markLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainKi(z)) z.reset(mk)
          } else z.reset(mk)
        } else {
          z.reset(m3)
          if (!chainKi(z)) z.reset(mKeep)
        }
      }
      return true
    }
    z.reset(m1)
    if (!markNdA(z)) return false
    val m5 = z.mark
    if (markLArI(z)) { z.bra = z.c; z.sliceDel(); true }
    else {
      z.reset(m5)
      if (markSU(z)) {
        z.bra = z.c; z.sliceDel()
        val mk = z.mark
        z.ket = z.c
        if (markLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainKi(z)) z.reset(mk)
        } else z.reset(mk)
        true
      } else {
        z.reset(m5)
        chainKi(z)
      }
    }
  }

  /** case, possessive, plural and -ki chains on nouns */
  private def stemNounSuffixes(z: Env): Boolean = {
    val m1 = z.mark
    z.ket = z.c
    if (markLAr(z)) {
      z.bra = z.c; z.sliceDel()
      val mKeep = z.mark
      if (!chainKi(z)) z.reset(mKeep)
      return true
    }
    z.reset(m1)
    z.ket = z.c
    if (markNcA(z)) {
      z.bra = z.c; z.sliceDel()
      val mKeep = z.mark
      val m2 = z.mark
      z.ket = z.c
      if (markLArI(z)) { z.bra = z.c; z.sliceDel() }
      else {
        z.reset(m2)
        z.ket = z.c
        val m3 = z.mark
        if (markPossessives(z) || { z.reset(m3); markSU(z) }) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          z.ket = z.c
          if (markLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainKi(z)) z.reset(mk)
          } else z.reset(mk)
        } else {
          z.reset(m2)
          z.ket = z.c
          if (markLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainKi(z)) z.reset(mKeep)
          } else z.reset(mKeep)
        }
      }
      return true
    }
    z.reset(m1)
    z.ket = z.c
    locally {
      val m4 = z.mark
      if (markNdA(z) || { z.reset(m4); markNA(z) }) {
        val m5 = z.mark
        if (markLArI(z)) { z.bra = z.c; z.sliceDel(); return true }
        z.reset(m5)
        if (markSU(z)) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          z.ket = z.c
          if (markLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainKi(z)) z.reset(mk)
          } else z.reset(mk)
          return true
        }
        z.reset(m5)
        if (chainKi(z)) return true
      }
    }
    z.reset(m1)
    z.ket = z.c
    locally {
      val m6 = z.mark
      if (markNdAn(z) || { z.reset(m6); markNU(z) }) {
        val m7 = z.mark
        if (markSU(z)) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          z.ket = z.c
          if (markLAr(z)) {
            z.bra = z.c; z.sliceDel()
            if (!chainKi(z)) z.reset(mk)
          } else z.reset(mk)
          return true
        }
        z.reset(m7)
        if (markLArI(z)) return true // marks only; the generated code slices nothing here
      }
    }
    z.reset(m1)
    z.ket = z.c
    if (markDAn(z)) {
      z.bra = z.c; z.sliceDel()
      val mKeep = z.mark
      z.ket = z.c
      val m8 = z.mark
      if (markPossessives(z)) {
        z.bra = z.c; z.sliceDel()
        val mk = z.mark
        z.ket = z.c
        if (markLAr(z)) {
          z.bra = z.c; z.sliceDel()
          if (!chainKi(z)) z.reset(mk)
        } else z.reset(mk)
      } else {
        z.reset(m8)
        if (markLAr(z)) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          if (!chainKi(z)) z.reset(mk)
        } else {
          z.reset(m8)
          if (!chainKi(z)) z.reset(mKeep)
        }
      }
      return true
    }
    z.reset(m1)
    z.ket = z.c
    locally {
      val m9 = z.mark
      if (markNUn(z) || { z.reset(m9); markYlA(z) }) {
        z.bra = z.c; z.sliceDel()
        val mKeep = z.mark
        val m10 = z.mark
        var inner = false
        z.ket = z.c
        if (markLAr(z)) {
          z.bra = z.c; z.sliceDel()
          inner = chainKi(z)
        }
        if (!inner) {
          z.reset(m10)
          z.ket = z.c
          val m11 = z.mark
          if (markPossessives(z) || { z.reset(m11); markSU(z) }) {
            z.bra = z.c; z.sliceDel()
            val mk = z.mark
            z.ket = z.c
            if (markLAr(z)) {
              z.bra = z.c; z.sliceDel()
              if (!chainKi(z)) z.reset(mk)
            } else z.reset(mk)
          } else {
            z.reset(m10)
            if (!chainKi(z)) z.reset(mKeep)
          }
        }
        return true
      }
    }
    z.reset(m1)
    z.ket = z.c
    if (markLArI(z)) {
      z.bra = z.c; z.sliceDel()
      return true
    }
    z.reset(m1)
    if (chainKi(z)) return true
    z.reset(m1)
    z.ket = z.c
    locally {
      val m12 = z.mark
      if (markDA(z) || { z.reset(m12); markYU(z) } || { z.reset(m12); markYA(z) }) {
        z.bra = z.c; z.sliceDel()
        val mKeep = z.mark
        z.ket = z.c
        val m13 = z.mark
        var toLab48 = false
        if (markPossessives(z)) {
          z.bra = z.c; z.sliceDel()
          val mk = z.mark
          z.ket = z.c
          if (!markLAr(z)) z.reset(mk)
          toLab48 = true
        } else {
          z.reset(m13)
          if (markLAr(z)) toLab48 = true
          else z.reset(mKeep)
        }
        if (toLab48) {
          z.bra = z.c; z.sliceDel()
          z.ket = z.c
          if (!chainKi(z)) z.reset(mKeep)
        }
        return true
      }
    }
    z.reset(m1)
    z.ket = z.c
    val m14 = z.mark
    if (!(markPossessives(z) || { z.reset(m14); markSU(z) })) return false
    z.bra = z.c; z.sliceDel()
    val mKeep = z.mark
    z.ket = z.c
    if (markLAr(z)) {
      z.bra = z.c; z.sliceDel()
      if (!chainKi(z)) z.reset(mKeep)
    } else z.reset(mKeep)
    true
  }

  /** after a final d/g, append the high vowel harmonizing with the
    * last vowel of the stem */
  private def appendUAfterDOrG(z: Env): Boolean = {
    if (z.c <= z.lb) return false
    val last = z.s.charAt(z.c - 1)
    if (last != 'd' && last != 'g') return false
    var i = z.c
    while (i > z.lb && vowel.indexOf(z.s.charAt(i - 1)) < 0) i -= 1
    if (i <= z.lb) return false
    val app = z.s.charAt(i - 1) match {
      case 'a' | 'ı' => "ı"
      case 'e' | 'i' => "i"
      case 'o' | 'u' => "u"
      case _ => "ü" // ö | ü
    }
    z.s = z.s.substring(0, z.c) + app + z.s.substring(z.c)
    true
  }

  /** final-consonant devoicing: b→p c→ç d→t ğ→k */
  private def postProcessLastConsonants(z: Env): Boolean = {
    if (z.c <= z.lb) return false
    val repl = z.s.charAt(z.c - 1) match {
      case 'b' => "p"
      case 'c' => "ç"
      case 'd' => "t"
      case 'ğ' => "k"
      case _ => return false
    }
    z.ket = z.c
    z.bra = z.c - 1
    z.s = z.s.substring(0, z.bra) + repl + z.s.substring(z.ket)
    true
  }

  def stem(word: String): String = {
    val w = word.toLowerCase
    // more_than_one_syllable_word: at least two vowels, else untouched
    if (w.count(ch => vowel.indexOf(ch) >= 0) < 2) return w
    val z = new Env(w)
    val m1 = z.mark
    stemNominalVerbSuffixes(z)
    z.reset(m1)
    // the -lAr verb branch ends stemming before noun suffixes + postlude
    if (!z.continueNoun) return z.s
    val m2 = z.mark
    stemNounSuffixes(z)
    z.reset(m2)
    // postlude: reserved words skip the whole post-processing step
    if (z.s == "ad" || z.s == "soyad") return z.s
    z.c = z.s.length
    val m3 = z.mark
    appendUAfterDOrG(z)
    z.reset(m3)
    val m4 = z.mark
    postProcessLastConsonants(z)
    z.reset(m4)
    z.s
  }

  def stemUtf8(v: UTF8String): UTF8String = UTF8String.fromString(stem(v.toString))
}

/** `romanian_stem(word)` codegen expression. */
case class RomanianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "romanian_stem"
  override def nullSafeEval(v: Any): Any =
    RomanianStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RomanianStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): RomanianStem =
    copy(child = newChild)
}

/** `turkish_stem(word)` codegen expression. */
case class TurkishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "turkish_stem"
  override def nullSafeEval(v: Any): Any =
    TurkishStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TurkishStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): TurkishStem =
    copy(child = newChild)
}

/** `hungarian_stem(word)` codegen expression. */
case class HungarianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "hungarian_stem"
  override def nullSafeEval(v: Any): Any =
    HungarianStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HungarianStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): HungarianStem =
    copy(child = newChild)
}

/** `finnish_stem(word)` codegen expression. */
case class FinnishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "finnish_stem"
  override def nullSafeEval(v: Any): Any =
    FinnishStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FinnishStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): FinnishStem =
    copy(child = newChild)
}

/** `danish_stem(word)` codegen expression. */
case class DanishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "danish_stem"
  override def nullSafeEval(v: Any): Any =
    DanishStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DanishStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): DanishStem =
    copy(child = newChild)
}

/** `norwegian_stem(word)` codegen expression. */
case class NorwegianStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "norwegian_stem"
  override def nullSafeEval(v: Any): Any =
    NorwegianStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NorwegianStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): NorwegianStem =
    copy(child = newChild)
}

/** `swedish_stem(word)` codegen expression. */
case class SwedishStem(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "swedish_stem"
  override def nullSafeEval(v: Any): Any =
    SwedishStemmer.stemUtf8(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SwedishStemmer.stemUtf8($c)")
  override protected def withNewChildInternal(newChild: Expression): SwedishStem =
    copy(child = newChild)
}

/** The `english` text-search configuration's lexize chain. */
object TsLexize {

  /** The standard snowball English stopword list PG ships as
    * `src/backend/snowball/stopwords/english.stop`. */
  val englishStopwords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "your", "yours", "yourself", "yourselves", "he", "him", "his",
    "himself", "she", "her", "hers", "herself", "it", "its", "itself",
    "they", "them", "their", "theirs", "themselves", "what", "which",
    "who", "whom", "this", "that", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had", "having",
    "do", "does", "did", "doing", "a", "an", "the", "and", "but", "if",
    "or", "because", "as", "until", "while", "of", "at", "by", "for",
    "with", "about", "against", "between", "into", "through", "during",
    "before", "after", "above", "below", "to", "from", "up", "down",
    "in", "out", "on", "off", "over", "under", "again", "further",
    "then", "once", "here", "there", "when", "where", "why", "how",
    "all", "any", "both", "each", "few", "more", "most", "other",
    "some", "such", "no", "nor", "not", "only", "own", "same", "so",
    "than", "too", "very", "s", "t", "can", "will", "just", "don",
    "should", "now")

  /** The standard snowball German stopword list PG ships as
    * `src/backend/snowball/stopwords/german.stop` (public snowball
    * project data). */
  val germanStopwords: Seq[String] = Seq(
    "aber", "alle", "allem", "allen", "aller", "alles", "als", "also",
    "am", "an", "ander", "andere", "anderem", "anderen", "anderer",
    "anderes", "anderm", "andern", "anderr", "anders", "auch", "auf",
    "aus", "bei", "bin", "bis", "bist", "da", "damit", "dann", "der",
    "den", "des", "dem", "die", "das", "daß", "derselbe", "derselben",
    "denselben", "desselben", "demselben", "dieselbe", "dieselben",
    "dasselbe", "dazu", "dein", "deine", "deinem", "deinen", "deiner",
    "deines", "denn", "derer", "dessen", "dich", "dir", "du", "dies",
    "diese", "diesem", "diesen", "dieser", "dieses", "doch", "dort",
    "durch", "ein", "eine", "einem", "einen", "einer", "eines", "einig",
    "einige", "einigem", "einigen", "einiger", "einiges", "einmal",
    "er", "ihn", "ihm", "es", "etwas", "euer", "eure", "eurem", "euren",
    "eurer", "eures", "für", "gegen", "gewesen", "hab", "habe", "haben",
    "hat", "hatte", "hatten", "hier", "hin", "hinter", "ich", "mich",
    "mir", "ihr", "ihre", "ihrem", "ihren", "ihrer", "ihres", "euch",
    "im", "in", "indem", "ins", "ist", "jede", "jedem", "jeden",
    "jeder", "jedes", "jene", "jenem", "jenen", "jener", "jenes",
    "jetzt", "kann", "kein", "keine", "keinem", "keinen", "keiner",
    "keines", "können", "könnte", "machen", "man", "manche", "manchem",
    "manchen", "mancher", "manches", "mein", "meine", "meinem",
    "meinen", "meiner", "meines", "mit", "muss", "musste", "nach",
    "nicht", "nichts", "noch", "nun", "nur", "ob", "oder", "ohne",
    "sehr", "sein", "seine", "seinem", "seinen", "seiner", "seines",
    "selbst", "sich", "sie", "ihnen", "sind", "so", "solche", "solchem",
    "solchen", "solcher", "solches", "soll", "sollte", "sondern",
    "sonst", "über", "um", "und", "uns", "unse", "unsem", "unsen",
    "unser", "unses", "unter", "viel", "vom", "von", "vor", "während",
    "war", "waren", "warst", "was", "weg", "weil", "weiter", "welche",
    "welchem", "welchen", "welcher", "welches", "wenn", "werde",
    "werden", "wie", "wieder", "will", "wir", "wird", "wirst", "wo",
    "wollen", "wollte", "würde", "würden", "zu", "zum", "zur", "zwar",
    "zwischen")

  /** The standard snowball French stopword list PG ships as
    * `src/backend/snowball/stopwords/french.stop` (public snowball
    * project data). */
  val frenchStopwords: Seq[String] = Seq(
    "au", "aux", "avec", "ce", "ces", "dans", "de", "des", "du",
    "elle", "en", "et", "eux", "il", "je", "la", "le", "leur", "lui",
    "ma", "mais", "me", "même", "mes", "moi", "mon", "ne", "nos",
    "notre", "nous", "on", "ou", "par", "pas", "pour", "qu", "que",
    "qui", "sa", "se", "ses", "son", "sur", "ta", "te", "tes", "toi",
    "ton", "tu", "un", "une", "vos", "votre", "vous", "c", "d", "j",
    "l", "à", "m", "n", "s", "t", "y", "été", "étée", "étées",
    "étés", "étant", "étante", "étants", "étantes", "suis", "es",
    "est", "sommes", "êtes", "sont", "serai", "seras", "sera",
    "serons", "serez", "seront", "serais", "serait", "serions",
    "seriez", "seraient", "étais", "était", "étions", "étiez",
    "étaient", "fus", "fut", "fûmes", "fûtes", "furent", "sois",
    "soit", "soyons", "soyez", "soient", "fusse", "fusses", "fût",
    "fussions", "fussiez", "fussent", "ayant", "ayante", "ayantes",
    "ayants", "eu", "eue", "eues", "eus", "ai", "as", "avons", "avez",
    "ont", "aurai", "auras", "aura", "aurons", "aurez", "auront",
    "aurais", "aurait", "aurions", "auriez", "auraient", "avais",
    "avait", "avions", "aviez", "avaient", "eut", "eûmes", "eûtes",
    "eurent", "aie", "aies", "ait", "ayons", "ayez", "aient", "eusse",
    "eusses", "eût", "eussions", "eussiez", "eussent")

  /** The standard snowball Spanish stopword list PG ships as
    * `src/backend/snowball/stopwords/spanish.stop` (public snowball
    * project data). */
  val spanishStopwords: Seq[String] = Seq(
    "de", "la", "que", "el", "en", "y", "a", "los", "del", "se", "las",
    "por", "un", "para", "con", "no", "una", "su", "al", "lo", "como",
    "más", "pero", "sus", "le", "ya", "o", "este", "sí", "porque",
    "esta", "entre", "cuando", "muy", "sin", "sobre", "también", "me",
    "hasta", "hay", "donde", "quien", "desde", "todo", "nos", "durante",
    "todos", "uno", "les", "ni", "contra", "otros", "ese", "eso",
    "ante", "ellos", "e", "esto", "mí", "antes", "algunos", "qué",
    "unos", "yo", "otro", "otras", "otra", "él", "tanto", "esa",
    "estos", "mucho", "quienes", "nada", "muchos", "cual", "poco",
    "ella", "estar", "estas", "algunas", "algo", "nosotros", "mi",
    "mis", "tú", "te", "ti", "tu", "tus", "ellas", "nosotras",
    "vosotros", "vosotras", "os", "mío", "mía", "míos", "mías", "tuyo",
    "tuya", "tuyos", "tuyas", "suyo", "suya", "suyos", "suyas",
    "nuestro", "nuestra", "nuestros", "nuestras", "vuestro", "vuestra",
    "vuestros", "vuestras", "esos", "esas", "estoy", "estás", "está",
    "estamos", "estáis", "están", "esté", "estés", "estemos", "estéis",
    "estén", "estaré", "estarás", "estará", "estaremos", "estaréis",
    "estarán", "estaría", "estarías", "estaríamos", "estaríais",
    "estarían", "estaba", "estabas", "estábamos", "estabais",
    "estaban", "estuve", "estuviste", "estuvo", "estuvimos",
    "estuvisteis", "estuvieron", "estuviera", "estuvieras",
    "estuviéramos", "estuvierais", "estuvieran", "estuviese",
    "estuvieses", "estuviésemos", "estuvieseis", "estuviesen",
    "estando", "estado", "estada", "estados", "estadas", "estad",
    "he", "has", "ha", "hemos", "habéis", "han", "haya", "hayas",
    "hayamos", "hayáis", "hayan", "habré", "habrás", "habrá",
    "habremos", "habréis", "habrán", "habría", "habrías", "habríamos",
    "habríais", "habrían", "había", "habías", "habíamos", "habíais",
    "habían", "hube", "hubiste", "hubo", "hubimos", "hubisteis",
    "hubieron", "hubiera", "hubieras", "hubiéramos", "hubierais",
    "hubieran", "hubiese", "hubieses", "hubiésemos", "hubieseis",
    "hubiesen", "habiendo", "habido", "habida", "habidos", "habidas",
    "soy", "eres", "es", "somos", "sois", "son", "sea", "seas",
    "seamos", "seáis", "sean", "seré", "serás", "será", "seremos",
    "seréis", "serán", "sería", "serías", "seríamos", "seríais",
    "serían", "era", "eras", "éramos", "erais", "eran", "fui",
    "fuiste", "fue", "fuimos", "fuisteis", "fueron", "fuera", "fueras",
    "fuéramos", "fuerais", "fueran", "fuese", "fueses", "fuésemos",
    "fueseis", "fuesen", "siendo", "sido", "tengo", "tienes", "tiene",
    "tenemos", "tenéis", "tienen", "tenga", "tengas", "tengamos",
    "tengáis", "tengan", "tendré", "tendrás", "tendrá", "tendremos",
    "tendréis", "tendrán", "tendría", "tendrías", "tendríamos",
    "tendríais", "tendrían", "tenía", "tenías", "teníamos", "teníais",
    "tenían", "tuve", "tuviste", "tuvo", "tuvimos", "tuvisteis",
    "tuvieron", "tuviera", "tuvieras", "tuviéramos", "tuvierais",
    "tuvieran", "tuviese", "tuvieses", "tuviésemos", "tuvieseis",
    "tuviesen", "teniendo", "tenido", "tenida", "tenidos", "tenidas",
    "tened")

  /** The standard snowball Russian stopword list PG ships as
    * `src/backend/snowball/stopwords/russian.stop` (public snowball
    * distribution). */
  val russianStopwords: Seq[String] = Seq(
    "и", "в", "во", "не", "что", "он", "на", "я", "с", "со", "как",
    "а", "то", "все", "она", "так", "его", "но", "да", "ты", "к", "у",
    "же", "вы", "за", "бы", "по", "только", "ее", "мне", "было", "вот",
    "от", "меня", "еще", "нет", "о", "из", "ему", "теперь", "когда",
    "даже", "ну", "вдруг", "ли", "если", "уже", "или", "ни", "быть",
    "был", "него", "до", "вас", "нибудь", "опять", "уж", "вам", "ведь",
    "там", "потом", "себя", "ничего", "ей", "может", "они", "тут",
    "где", "есть", "надо", "ней", "для", "мы", "тебя", "их", "чем",
    "была", "сам", "чтоб", "без", "будто", "чего", "раз", "тоже",
    "себе", "под", "будет", "ж", "тогда", "кто", "этот", "того",
    "потому", "этого", "какой", "совсем", "ним", "здесь", "этом",
    "один", "почти", "мой", "тем", "чтобы", "нее", "сейчас", "были",
    "куда", "зачем", "всех", "никогда", "можно", "при", "наконец",
    "два", "об", "другой", "хоть", "после", "над", "больше", "тот",
    "через", "эти", "нас", "про", "всего", "них", "какая", "много",
    "разве", "три", "эту", "моя", "впрочем", "хорошо", "свою", "этой",
    "перед", "иногда", "лучше", "чуть", "том", "нельзя", "такой", "им",
    "более", "всегда", "конечно", "всю", "между")

  /** The standard snowball Portuguese stopword list PG ships as
    * `src/backend/snowball/stopwords/portuguese.stop` (public snowball
    * distribution). */
  val portugueseStopwords: Seq[String] = Seq(
    "de", "a", "o", "que", "e", "do", "da", "em", "um", "para", "com",
    "não", "uma", "os", "no", "se", "na", "por", "mais", "as", "dos",
    "como", "mas", "ao", "ele", "das", "à", "seu", "sua", "ou",
    "quando", "muito", "nos", "já", "eu", "também", "só", "pelo",
    "pela", "até", "isso", "ela", "entre", "depois", "sem", "mesmo",
    "aos", "seus", "quem", "nas", "me", "esse", "eles", "você", "essa",
    "num", "nem", "suas", "meu", "às", "minha", "numa", "pelos",
    "elas", "qual", "nós", "lhe", "deles", "essas", "esses", "pelas",
    "este", "dele", "tu", "te", "vocês", "vos", "lhes", "meus",
    "minhas", "teu", "tua", "teus", "tuas", "nosso", "nossa", "nossos",
    "nossas", "dela", "delas", "esta", "estes", "estas", "aquele",
    "aquela", "aqueles", "aquelas", "isto", "aquilo", "estou", "está",
    "estamos", "estão", "estive", "esteve", "estivemos", "estiveram",
    "estava", "estávamos", "estavam", "estivera", "estivéramos",
    "esteja", "estejamos", "estejam", "estivesse", "estivéssemos",
    "estivessem", "estiver", "estivermos", "estiverem", "hei", "há",
    "havemos", "hão", "houve", "houvemos", "houveram", "houvera",
    "houvéramos", "haja", "hajamos", "hajam", "houvesse",
    "houvéssemos", "houvessem", "houver", "houvermos", "houverem",
    "houverei", "houverá", "houveremos", "houverão", "houveria",
    "houveríamos", "houveriam", "sou", "somos", "são", "era", "éramos",
    "eram", "fui", "foi", "fomos", "foram", "fora", "fôramos", "seja",
    "sejamos", "sejam", "fosse", "fôssemos", "fossem", "for", "formos",
    "forem", "serei", "será", "seremos", "serão", "seria", "seríamos",
    "seriam", "tenho", "tem", "temos", "tém", "tinha", "tínhamos",
    "tinham", "tive", "teve", "tivemos", "tiveram", "tivera",
    "tivéramos", "tenha", "tenhamos", "tenham", "tivesse",
    "tivéssemos", "tivessem", "tiver", "tivermos", "tiverem", "terei",
    "terá", "teremos", "terão", "teria", "teríamos", "teriam")

  /** The standard snowball Italian stopword list PG ships as
    * `src/backend/snowball/stopwords/italian.stop` (public snowball
    * distribution). */
  val italianStopwords: Seq[String] = Seq(
    "ad", "al", "allo", "ai", "agli", "all", "agl", "alla", "alle",
    "con", "col", "coi", "da", "dal", "dallo", "dai", "dagli", "dall",
    "dagl", "dalla", "dalle", "di", "del", "dello", "dei", "degli",
    "dell", "degl", "della", "delle", "in", "nel", "nello", "nei",
    "negli", "nell", "negl", "nella", "nelle", "su", "sul", "sullo",
    "sui", "sugli", "sull", "sugl", "sulla", "sulle", "per", "tra",
    "contro", "io", "tu", "lui", "lei", "noi", "voi", "loro", "mio",
    "mia", "miei", "mie", "tuo", "tua", "tuoi", "tue", "suo", "sua",
    "suoi", "sue", "nostro", "nostra", "nostri", "nostre", "vostro",
    "vostra", "vostri", "vostre", "mi", "ti", "ci", "vi", "lo", "la",
    "li", "le", "gli", "ne", "il", "un", "uno", "una", "ma", "ed",
    "se", "perché", "anche", "come", "dov", "dove", "che", "chi",
    "cui", "non", "più", "quale", "quanto", "quanti", "quanta",
    "quante", "quello", "quelli", "quella", "quelle", "questo",
    "questi", "questa", "queste", "si", "tutto", "tutti", "a", "c",
    "e", "i", "l", "o", "ho", "hai", "ha", "abbiamo", "avete", "hanno",
    "abbia", "abbiate", "abbiano", "avrò", "avrai", "avrà", "avremo",
    "avrete", "avranno", "avrei", "avresti", "avrebbe", "avremmo",
    "avreste", "avrebbero", "avevo", "avevi", "aveva", "avevamo",
    "avevate", "avevano", "ebbi", "avesti", "ebbe", "avemmo", "aveste",
    "ebbero", "avessi", "avesse", "avessimo", "avessero", "avendo",
    "avuto", "avuta", "avuti", "avute", "sono", "sei", "è", "siamo",
    "siete", "sia", "siate", "siano", "sarò", "sarai", "sarà",
    "saremo", "sarete", "saranno", "sarei", "saresti", "sarebbe",
    "saremmo", "sareste", "sarebbero", "ero", "eri", "era", "eravamo",
    "eravate", "erano", "fui", "fosti", "fu", "fummo", "foste",
    "furono", "fossi", "fosse", "fossimo", "fossero", "essendo",
    "faccio", "fai", "facciamo", "fanno", "faccia", "facciate",
    "facciano", "farò", "farai", "farà", "faremo", "farete", "faranno",
    "farei", "faresti", "farebbe", "faremmo", "fareste", "farebbero",
    "facevo", "facevi", "faceva", "facevamo", "facevate", "facevano",
    "feci", "facesti", "fece", "facemmo", "faceste", "fecero",
    "facessi", "facesse", "facessimo", "facessero", "facendo", "sto",
    "stai", "sta", "stiamo", "stanno", "stia", "stiate", "stiano",
    "starò", "starai", "starà", "staremo", "starete", "staranno",
    "starei", "staresti", "starebbe", "staremmo", "stareste",
    "starebbero", "stavo", "stavi", "stava", "stavamo", "stavate",
    "stavano", "stetti", "stesti", "stette", "stemmo", "steste",
    "stettero", "stessi", "stesse", "stessimo", "stessero", "stando")

  /** The standard snowball Dutch stopword list PG ships as
    * `src/backend/snowball/stopwords/dutch.stop` (public snowball
    * distribution). */
  val dutchStopwords: Seq[String] = Seq(
    "de", "en", "van", "ik", "te", "dat", "die", "in", "een", "hij",
    "het", "niet", "zijn", "is", "was", "op", "aan", "met", "als",
    "voor", "had", "er", "maar", "om", "hem", "dan", "zou", "of",
    "wat", "mijn", "men", "dit", "zo", "door", "over", "ze", "zich",
    "bij", "ook", "tot", "je", "mij", "uit", "der", "daar", "haar",
    "naar", "heb", "hoe", "heeft", "hebben", "deze", "u", "want",
    "nog", "zal", "me", "zij", "nu", "ge", "geen", "omdat", "iets",
    "worden", "toch", "al", "waren", "veel", "meer", "doen", "toen",
    "moet", "ben", "zonder", "kan", "hun", "dus", "alles", "onder",
    "ja", "eens", "hier", "wie", "werd", "altijd", "doch", "wordt",
    "wezen", "kunnen", "ons", "zelf", "tegen", "na", "reeds", "wil",
    "kon", "niets", "uw", "iemand", "geweest", "andere")

  /** The standard snowball Danish stopword list PG ships as
    * `src/backend/snowball/stopwords/danish.stop` (public snowball
    * project data). */
  val danishStopwords: Seq[String] = Seq(
    "og", "i", "jeg", "det", "at", "en", "den", "til", "er", "som",
    "på", "de", "med", "han", "af", "for", "ikke", "der", "var", "mig",
    "sig", "men", "et", "har", "om", "vi", "min", "havde", "ham",
    "hun", "nu", "over", "da", "fra", "du", "ud", "sin", "dem", "os",
    "op", "man", "hans", "hvor", "eller", "hvad", "skal", "selv",
    "her", "alle", "vil", "blev", "kunne", "ind", "når", "være", "dog",
    "noget", "ville", "jo", "deres", "efter", "ned", "skulle", "denne",
    "end", "dette", "mit", "også", "under", "have", "dig", "anden",
    "hende", "mine", "alt", "meget", "sit", "sine", "vor", "mod",
    "disse", "hvis", "din", "nogle", "hos", "blive", "mange", "ad",
    "bliver", "hendes", "været", "thi", "jer", "sådan")

  /** The standard snowball Norwegian stopword list PG ships as
    * `src/backend/snowball/stopwords/norwegian.stop` (public snowball
    * project data; includes the nynorsk forms the file carries). */
  val norwegianStopwords: Seq[String] = Seq(
    "og", "i", "jeg", "det", "at", "en", "et", "den", "til", "er",
    "som", "på", "de", "med", "han", "av", "ikke", "ikkje", "der",
    "så", "var", "meg", "seg", "men", "ett", "har", "om", "vi", "min",
    "mitt", "ha", "hadde", "hun", "nå", "over", "da", "ved", "fra",
    "du", "ut", "sin", "dem", "oss", "opp", "man", "kan", "hans",
    "hvor", "eller", "hva", "skal", "selv", "sjøl", "her", "alle",
    "vil", "bli", "ble", "blei", "blitt", "kunne", "inn", "når",
    "være", "kom", "noen", "noe", "ville", "dere", "som", "deres",
    "kun", "ja", "etter", "ned", "skulle", "denne", "for", "deg", "si",
    "sine", "sitt", "mot", "å", "meget", "hvorfor", "dette", "disse",
    "uten", "hvordan", "ingen", "din", "ditt", "blir", "samme",
    "hvilken", "hvilke", "sånn", "inni", "mellom", "vår", "hver",
    "hvem", "vors", "hvis", "både", "bare", "enn", "fordi", "før",
    "mange", "også", "slik", "vært", "være", "båe", "begge", "siden",
    "dykk", "dykkar", "dei", "deira", "deires", "deim", "di", "då",
    "eg", "ein", "eit", "eitt", "elles", "honom", "hjå", "ho", "hoe",
    "henne", "hennar", "hennes", "hoss", "hossen", "ikkje", "ingi",
    "inkje", "korleis", "korso", "kva", "kvar", "kvarhelst", "kven",
    "kvi", "kvifor", "me", "medan", "mi", "mine", "mykje", "no",
    "nokon", "noka", "nokor", "noko", "nokre", "si", "sia", "sidan",
    "so", "somt", "somme", "um", "upp", "vere", "vore", "verte",
    "vort", "varte", "vart")

  /** The standard snowball Swedish stopword list PG ships as
    * `src/backend/snowball/stopwords/swedish.stop` (public snowball
    * project data). */
  val swedishStopwords: Seq[String] = Seq(
    "och", "det", "att", "i", "en", "jag", "hon", "som", "han", "på",
    "den", "med", "var", "sig", "för", "så", "till", "är", "men",
    "ett", "om", "hade", "de", "av", "icke", "mig", "du", "henne",
    "då", "sin", "nu", "har", "inte", "hans", "honom", "skulle",
    "hennes", "där", "min", "man", "ej", "vid", "kunde", "något",
    "från", "ut", "när", "efter", "upp", "vi", "dem", "vara", "vad",
    "över", "än", "dig", "kan", "sina", "här", "ha", "mot", "alla",
    "under", "någon", "eller", "allt", "mycket", "sedan", "ju",
    "denna", "själv", "detta", "åt", "utan", "varit", "hur", "ingen",
    "mitt", "ni", "bli", "blev", "oss", "din", "dessa", "några",
    "deras", "blir", "mina", "samma", "vilken", "er", "sådan", "vår",
    "blivit", "dess", "inom", "mellan", "sådant", "varför", "varje",
    "vilka", "ditt", "vem", "vilket", "sitta", "sådana", "vart",
    "dina", "vars", "vårt", "våra", "ert", "era", "vilkas")

  /** The standard snowball Finnish stopword list PG ships as
    * `src/backend/snowball/stopwords/finnish.stop` (public snowball
    * project data). */
  val finnishStopwords: Seq[String] = Seq(
    "olla", "olen", "olet", "on", "olemme", "olette", "ovat", "ole",
    "oli", "olisi", "olisit", "olisin", "olisimme", "olisitte",
    "olisivat", "olit", "olin", "olimme", "olitte", "olivat", "ollut",
    "olleet", "en", "et", "ei", "emme", "ette", "eivät", "minä",
    "minun", "minut", "minua", "minussa", "minusta", "minuun",
    "minulla", "minulta", "minulle", "sinä", "sinun", "sinut", "sinua",
    "sinussa", "sinusta", "sinuun", "sinulla", "sinulta", "sinulle",
    "hän", "hänen", "hänet", "häntä", "hänessä", "hänestä", "häneen",
    "hänellä", "häneltä", "hänelle", "me", "meidän", "meidät", "meitä",
    "meissä", "meistä", "meihin", "meillä", "meiltä", "meille", "te",
    "teidän", "teidät", "teitä", "teissä", "teistä", "teihin",
    "teillä", "teiltä", "teille", "he", "heidän", "heidät", "heitä",
    "heissä", "heistä", "heihin", "heillä", "heiltä", "heille", "tämä",
    "tämän", "tätä", "tässä", "tästä", "tähän", "tallä", "tältä",
    "tälle", "tänä", "täksi", "tuo", "tuon", "tuotä", "tuossa",
    "tuosta", "tuohon", "tuolla", "tuolta", "tuolle", "tuona",
    "tuoksi", "se", "sen", "sitä", "siinä", "siitä", "siihen", "sillä",
    "siltä", "sille", "sinä", "siksi", "nämä", "näiden", "näitä",
    "näissä", "näistä", "näihin", "näillä", "näiltä", "näille",
    "näinä", "näiksi", "nuo", "noiden", "noita", "noissa", "noista",
    "noihin", "noilla", "noilta", "noille", "noina", "noiksi", "ne",
    "niiden", "niitä", "niissä", "niistä", "niihin", "niillä",
    "niiltä", "niille", "niinä", "niiksi", "kuka", "kenen", "kenet",
    "ketä", "kenessä", "kenestä", "keneen", "kenellä", "keneltä",
    "kenelle", "kenenä", "keneksi", "ketkä", "keiden", "ketkä",
    "keitä", "keissä", "keistä", "keihin", "keillä", "keiltä",
    "keille", "keinä", "keiksi", "mikä", "minkä", "minkä", "mitä",
    "missä", "mistä", "mihin", "millä", "miltä", "mille", "minä",
    "miksi", "mitkä", "joka", "jonka", "jota", "jossa", "josta",
    "johon", "jolla", "jolta", "jolle", "jona", "joksi", "jotka",
    "joiden", "joita", "joissa", "joista", "joihin", "joilla",
    "joilta", "joille", "joina", "joiksi", "että", "ja", "jos",
    "koska", "kuin", "mutta", "niin", "sekä", "sillä", "tai", "vaan",
    "vai", "vaikka", "kanssa", "mukaan", "noin", "poikki", "yli",
    "kun", "niin", "nyt", "itse")

  /** The standard snowball Hungarian stopword list PG ships as
    * `src/backend/snowball/stopwords/hungarian.stop` (public snowball
    * project data). */
  val hungarianStopwords: Seq[String] = Seq(
    "a", "ahogy", "ahol", "aki", "akik", "akkor", "alatt", "által",
    "általában", "amely", "amelyek", "amelyekben", "amelyeket",
    "amelyet", "amelynek", "ami", "amit", "amolyan", "amíg", "amikor",
    "át", "abban", "ahhoz", "annak", "arra", "arról", "az", "azok",
    "azon", "azt", "azzal", "azért", "aztán", "azután", "azonban",
    "bár", "be", "belül", "benne", "cikk", "cikkek", "cikkeket",
    "csak", "de", "e", "eddig", "egész", "egy", "egyes", "egyetlen",
    "egyéb", "egyik", "egyre", "ekkor", "el", "elég", "ellen", "elő",
    "először", "előtt", "első", "én", "éppen", "ebben", "ehhez",
    "emilyen", "ennek", "erre", "ez", "ezt", "ezek", "ezen", "ezzel",
    "ezért", "és", "fel", "felé", "hanem", "hiszen", "hogy", "hogyan",
    "igen", "így", "illetve", "ill.", "ill", "ilyen", "ilyenkor",
    "ison", "ismét", "itt", "jó", "jól", "jobban", "kell", "kellett",
    "keresztül", "keressünk", "ki", "kívül", "között", "közül",
    "legalább", "lehet", "lehetett", "legyen", "lenne", "lenni",
    "lesz", "lett", "maga", "magát", "majd", "majd", "már", "más",
    "másik", "meg", "még", "mellett", "mert", "mely", "melyek", "mi",
    "mit", "míg", "miért", "milyen", "mikor", "minden", "mindent",
    "mindenki", "mindig", "mint", "mintha", "mivel", "most", "nagy",
    "nagyobb", "nagyon", "ne", "néha", "nekem", "neki", "nem",
    "néhány", "nélkül", "nincs", "olyan", "ott", "össze", "ő", "ők",
    "őket", "pedig", "persze", "rá", "s", "saját", "sem", "semmi",
    "sok", "sokat", "sokkal", "számára", "szemben", "szerint",
    "szinte", "talán", "tehát", "teljes", "tovább", "továbbá", "több",
    "úgy", "ugyanis", "új", "újabb", "újra", "után", "utána", "utolsó",
    "vagy", "vagyis", "valaki", "valami", "valamint", "való", "vagyok",
    "van", "vannak", "volt", "voltam", "voltak", "voltunk", "vissza",
    "vele", "viszont", "volna")

  /** The standard snowball Turkish stopword list PG ships as
    * `src/backend/snowball/stopwords/turkish.stop` (public snowball
    * project data). */
  val turkishStopwords: Seq[String] = Seq(
    "acaba", "ama", "aslında", "az", "bazı", "belki", "biri",
    "birkaç", "birşey", "biz", "bu", "çok", "çünkü", "da", "daha",
    "de", "defa", "diye", "eğer", "en", "gibi", "hem", "hep",
    "hepsi", "her", "hiç", "için", "ile", "ise", "kez", "ki", "kim",
    "mı", "mu", "mü", "nasıl", "ne", "neden", "nerde", "nerede",
    "nereye", "niçin", "niye", "o", "sanki", "şey", "siz", "şu",
    "tüm", "ve", "veya", "ya", "yani")

  private val configs: Map[String, (Seq[String], String)] = Map(
    "english" -> (englishStopwords, "porter_stem"),
    "german" -> (germanStopwords, "german_stem"),
    "french" -> (frenchStopwords, "french_stem"),
    "spanish" -> (spanishStopwords, "spanish_stem"),
    "russian" -> (russianStopwords, "russian_stem"),
    "portuguese" -> (portugueseStopwords, "portuguese_stem"),
    "italian" -> (italianStopwords, "italian_stem"),
    "dutch" -> (dutchStopwords, "dutch_stem"),
    "danish" -> (danishStopwords, "danish_stem"),
    "norwegian" -> (norwegianStopwords, "norwegian_stem"),
    "swedish" -> (swedishStopwords, "swedish_stem"),
    "finnish" -> (finnishStopwords, "finnish_stem"),
    "hungarian" -> (hungarianStopwords, "hungarian_stem"),
    // the reference ships no romanian.stop (snowball/Makefile installs
    // stopword files only where present) — empty stopword list
    "romanian" -> (Seq.empty[String], "romanian_stem"),
    "turkish" -> (turkishStopwords, "turkish_stem"))

  /** lowercase → drop stopwords → stem, one declarative pass
    * (ts_lexize through the named configuration — `english` and
    * `german` dictionaries share this chain, like the reference's
    * config → snowball-dictionary indirection). The stopword test
    * compiles to an InSet membership check and the stem is a codegen
    * expression; the surrounding filter/transform are Spark
    * higher-order functions, which evaluate as expression islands
    * inside the stage (HOFs are CodegenFallback) — no UDF boundary, no
    * serialization, one pass. */
  def lexize(words: Column, config: String = "english"): Column = {
    val (stop, stemFn) = configs(config)
    transform(
      filter(words, w => !lower(w).isInCollection(stop)),
      w => call_function(stemFn, lower(w)))
  }

  /** The driver/executor-side stemmer for a configuration language. */
  def stemmerFor(config: String): String => String = config match {
    case "german" => GermanStemmer.stem
    case "french" => FrenchStemmer.stem
    case "spanish" => SpanishStemmer.stem
    case "russian" => RussianStemmer.stem
    case "portuguese" => PortugueseStemmer.stem
    case "italian" => ItalianStemmer.stem
    case "dutch" => DutchStemmer.stem
    case "danish" => DanishStemmer.stem
    case "norwegian" => NorwegianStemmer.stem
    case "swedish" => SwedishStemmer.stem
    case "finnish" => FinnishStemmer.stem
    case "hungarian" => HungarianStemmer.stem
    case "romanian" => RomanianStemmer.stem
    case "turkish" => TurkishStemmer.stem
    case _ => PorterStemmer.stem
  }

  /** The configuration's stopword list as a set (lowercased). */
  def stopwordSet(config: String): Set[String] = configs(config)._1.toSet

  /** Stem query terms driver-side (to_tsquery applies the same
    * dictionary to the query it applies to documents). */
  def stemTerms(terms: Seq[String], config: String = "english"): Seq[String] = {
    val (stop, _) = configs(config)
    val stemmer = stemmerFor(config)
    terms.map(_.toLowerCase).filterNot(stop.contains).map(stemmer)
  }

  /** PG `plainto_tsquery('english', text)` (to_tsany.c): lexize free
    * text, AND the surviving lexemes — returns the tsquery string for
    * [[graft.functions.Ranges.tsMatchQuery]]. */
  def plaintoTsquery(text: String): String =
    stemTerms(text.split("\\s+").toSeq.filter(_.nonEmpty)).mkString(" & ")

  /** PG `phraseto_tsquery('english', text)`: lexize and chain with the
    * phrase operator, PRESERVING original word distances across dropped
    * stopwords — `"fat of rats"` becomes `fat <2> rat`, exactly PG's
    * position accounting (to_tsany.c pushval_morph keeps the position
    * counter advancing over stopwords). */
  def phrasetoTsquery(text: String): String = {
    val words = text.split("\\s+").toSeq.filter(_.nonEmpty)
    // (lexeme, original position) with stopwords holding their slot
    val positioned = words.zipWithIndex.collect {
      case (w, i) if !englishStopwords.contains(w.toLowerCase) =>
        (PorterStemmer.stem(w.toLowerCase), i)
    }
    positioned match {
      case Seq() => ""
      case (h, _) +: _ =>
        positioned.sliding(2).collect {
          case Seq((_, pi), (l, ci)) =>
            val d = ci - pi
            (if (d == 1) " <-> " else s" <$d> ") + l
        }.mkString(h, "", "")
    }
  }

  /** PG `websearch_to_tsquery('english', text)` (reference
    * `src/backend/tsearch/wparser.c` / to_tsany.c websearch variant):
    * the web-search-box grammar — bare words AND together, `"quoted
    * text"` becomes a phrase (with stopword distance accounting), the
    * word `OR` disjoins, a leading `-` negates the next word or quoted
    * phrase. No parentheses; never raises on malformed input (unclosed
    * quotes run to end of text), matching PG's always-succeeds
    * contract. */
  def websearchToTsquery(text: String): String = {
    // split into: quoted segments, OR keyword, -prefixed atoms, words
    val toks = scala.collection.mutable.ListBuffer.empty[String]
    var or = false // pending OR between this atom and the previous
    val ops = scala.collection.mutable.ListBuffer.empty[Boolean] // per-join: true=OR
    var i = 0
    def pushAtom(atom: String, neg: Boolean): Unit = {
      val q = atom.trim
      if (q.isEmpty) or = false // atom was all stopwords: vanish (PG drops it)
      else {
        if (toks.nonEmpty) ops += or
        toks += (if (neg) s"!($q)" else q)
        or = false
      }
    }
    while (i < text.length) {
      val c = text.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '"' || (c == '-' && i + 1 < text.length &&
        text.charAt(i + 1) == '"')) {
        val neg = c == '-'
        val open = if (neg) i + 1 else i
        val close = text.indexOf('"', open + 1)
        val end = if (close < 0) text.length else close
        pushAtom(phrasetoTsquery(text.substring(open + 1, end)), neg)
        i = if (close < 0) text.length else close + 1
      } else {
        val start = i
        while (i < text.length && !text.charAt(i).isWhitespace &&
          text.charAt(i) != '"') i += 1
        val raw = text.substring(start, i)
        if (raw.equalsIgnoreCase("or") && toks.nonEmpty) or = true
        else if (raw.startsWith("-"))
          pushAtom(plaintoTsquery(raw.substring(1)), neg = true)
        else pushAtom(plaintoTsquery(raw), neg = false)
      }
    }
    if (toks.isEmpty) ""
    else toks.zip(false +: ops.toSeq).map { case (t, isOr) =>
      (if (isOr) " | " else " & ") + t
    }.mkString.stripPrefix(" & ")
  }
}
