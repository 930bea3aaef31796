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

  /** lowercase → drop stopwords → Porter-stem, one declarative pass
    * (ts_lexize through the english configuration). The stopword test
    * compiles to an InSet membership check and the stem is the codegen
    * [[PorterStem]] expression; the surrounding filter/transform are
    * Spark higher-order functions, which evaluate as expression islands
    * inside the stage (HOFs are CodegenFallback) — no UDF boundary, no
    * serialization, one pass. */
  def lexize(words: Column): Column =
    transform(
      filter(words, w => !lower(w).isInCollection(englishStopwords)),
      w => call_function("porter_stem", lower(w)))

  /** Stem query terms driver-side (to_tsquery applies the same
    * dictionary to the query it applies to documents). */
  def stemTerms(terms: Seq[String]): Seq[String] =
    terms.map(t => PorterStemmer.stem(t.toLowerCase))
      .filterNot(englishStopwords.contains)

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
