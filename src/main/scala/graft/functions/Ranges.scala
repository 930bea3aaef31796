package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Range-type surface (reference `src/backend/utils/adt/rangetypes.c`):
  * ranges as (lower, upper, bounds-inclusive) columns with the standard
  * operators — contains (`@>`), overlaps (`&&`), adjacency, intersection.
  * Half-open [lo, hi) semantics, matching PG's canonical discrete form.
  */
object Ranges {

  def rangeStruct(lo: Column, hi: Column): Column =
    struct(lo.as("lo"), hi.as("hi"))

  /** `range @> elem` */
  def containsElem(lo: Column, hi: Column, x: Column): Column =
    x >= lo && x < hi

  /** `r1 && r2` (overlap) */
  def overlaps(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    lo1 < hi2 && lo2 < hi1

  /** `r1 -|- r2` (adjacent) */
  def adjacent(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    hi1 === lo2 || hi2 === lo1

  /** `r1 * r2` (intersection; empty → null struct) */
  def intersect(lo1: Column, hi1: Column, lo2: Column, hi2: Column): Column =
    when(overlaps(lo1, hi1, lo2, hi2),
      struct(greatest(lo1, lo2).as("lo"), least(hi1, hi2).as("hi")))

  /** tsvector-style text search (reference `tsvector.c`/`tsrank.c`
    * capability, simplified): all query terms present; rank = total term
    * frequency / document token count. */
  def tsMatch(words: Column, terms: Seq[String]): Column =
    terms.map(t => array_contains(words, t)).reduce(_ && _)

  /** Full tsquery boolean grammar (reference `utils/adt/tsquery.c`):
    * `&` AND, `|` OR, `!` NOT, parentheses, and `term:*` prefix match,
    * with PG precedence (! binds tightest, then &, then |). The query is
    * parsed once driver-side and compiled to a plain boolean Column over
    * the word array, so matching stays declarative. */
  def tsMatchQuery(words: Column, query: String): Column =
    TsQuery.compile(words, query)

  def tsRank(words: Column, terms: Seq[String]): Column = {
    val hits = terms.map(t => size(filter(words, w => w === lit(t)))).reduce(_ + _)
    hits.cast("double") / size(words).cast("double")
  }
}

/** tsquery parser: recursive descent over `& | ! ( ) term[:*]` tokens. */
object TsQuery {

  sealed trait Node
  final case class Term(t: String, prefix: Boolean) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(c: Node) extends Node

  def parse(q: String): Node = {
    val p = new P(tokenize(q))
    val n = p.parseOr()
    require(p.peek.isEmpty, s"trailing tokens in tsquery: '$q'")
    n
  }

  def compile(words: Column, query: String): Column = comp(words, parse(query))

  private def comp(words: Column, n: Node): Column = n match {
    case Term(t, false) => array_contains(words, t)
    case Term(t, true) => exists(words, w => w.startsWith(t))
    case And(l, r) => comp(words, l) && comp(words, r)
    case Or(l, r) => comp(words, l) || comp(words, r)
    case Not(c) => !comp(words, c)
  }

  private def tokenize(q: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if ("&|!()".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else {
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace &&
          "&|()".indexOf(q.charAt(i)) < 0) i += 1
        out += q.substring(start, i)
      }
    }
    out.toList
  }

  private final class P(tokens: List[String]) {
    private var rest = tokens
    def peek: Option[String] = rest.headOption
    private def next(): String = {
      require(rest.nonEmpty, "unexpected end of tsquery")
      val h = rest.head; rest = rest.tail; h
    }
    def parseOr(): Node = {
      var l = parseAnd()
      while (peek.contains("|")) { next(); l = Or(l, parseAnd()) }
      l
    }
    private def parseAnd(): Node = {
      var l = parseUnary()
      while (peek.contains("&")) { next(); l = And(l, parseUnary()) }
      l
    }
    private def parseUnary(): Node = peek match {
      case Some("!") => next(); Not(parseUnary())
      case Some("(") =>
        next()
        val e = parseOr()
        require(next() == ")", "unbalanced parens in tsquery")
        e
      case Some(_) =>
        val t = next()
        if (t.endsWith(":*")) Term(t.dropRight(2), prefix = true)
        else Term(t, prefix = false)
      case None => throw new IllegalArgumentException("empty tsquery operand")
    }
  }
}
