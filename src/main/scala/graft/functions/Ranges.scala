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

  /** PG `ts_rewrite(query, target, substitute)` applied as a rule list
    * (reference `src/backend/utils/adt/tsquery_rewrite.c:1-461`
    * tsquery_rewrite / findsubquery): every occurrence of each rule's
    * target subtree in the parsed query — matched modulo AND/OR operand
    * order, as QTNode normalization does — is replaced by the rule's
    * substitute tree, then the rewritten query compiles exactly like
    * tsMatchQuery. The rewrite is a driver-side AST pass; the emitted
    * Column is the same codegen boolean the literal query would get. */
  def tsMatchRewritten(words: Column, query: String,
                       rules: Seq[(String, String)]): Column =
    TsQuery.compileNode(words, TsQuery.rewriteAll(query, rules))

  /** PG `ts_rank` (reference `utils/adt/tsrank.c:276-345` calc_rank_or):
    * for each distinct query term with occurrence count f, the term
    * contributes `resj = Σ_{j=1..f} w/j²` (positional decay over the
    * occurrence ordinal; unlabeled positions carry the default D-weight
    * w = 0.1), then `(wjm + resj - wjm/1)/1.64493406685` — with uniform
    * weights wjm is the first occurrence's 0.1, so the term term reduces
    * to `resj / (π²/6)` — and the total is divided by the number of
    * distinct query terms. `norm` implements the RANK_NORM_* bitmask of
    * `calc_rank`: 1 = /log2(len+1), 2 = /len, 32 = r/(r+1). */
  def tsRank(words: Column, terms: Seq[String], norm: Int = 0): Column = {
    val D = 0.1d
    val raw = terms.distinct.map { t =>
      val f = size(filter(words, w => w === lit(t)))
      // sequence(1, 0) descends in Spark — guard the f = 0 case
      when(f > 0,
        aggregate(sequence(lit(1), f), lit(0.0d),
          (acc, j) => acc + lit(D) / (j * j).cast("double")))
        .otherwise(lit(0.0d))
    }.reduce(_ + _) / lit(1.64493406685d) / lit(terms.distinct.size.toDouble)
    val len = size(words).cast("double")
    var r = raw
    if ((norm & 1) != 0) r = r / (log(len + 1.0d) / lit(math.log(2.0)))
    if ((norm & 2) != 0) r = when(len > 0, r / len).otherwise(r)
    if ((norm & 32) != 0) r = r / (r + 1.0d)
    r
  }

  /** 1-based positions of `t` in the word array (PG tsvector position
    * list for one lexeme). */
  def termPositions(words: Column, t: String): Column =
    filter(sequence(lit(1), size(words)), i => element_at(words, i) === lit(t))

  /** PG `ts_rank_cd` (cover density, reference `utils/adt/tsrank.c:
    * 525-798` Cover/calc_rank_cd) for the two-term AND query. The
    * Cover() scan over a 2-term document representation emits exactly
    * the ADJACENT unlike-term pairs of the merged position list (scan
    * up to the first position completing the query = q, back down to
    * the latest start = p, resume after p), and with uniform unlabeled
    * D-weights Cpos = w and nNoise = q - p - 1, so each cover adds
    * `w / (1 + nNoise) = 0.1 / (q - p)`. Declarative on purpose: the
    * same construction is spelled in the DuckDB oracle, and a
    * hand-computed fixture pins it against the C algorithm's walk. */
  /** Merged (pos, term) document representation for [[tsRankCdOf]].
    * Materialize this as its OWN column (`withColumn`) before ranking:
    * a Column referenced inside a lambda is re-evaluated per element,
    * turning the fold O(len²) per row if the merge is inlined. */
  def mergedPositions(words: Column, t1: String, t2: String): Column =
    sort_array(concat(
      transform(termPositions(words, t1), p => struct(p.as("pos"), lit(1).as("trm"))),
      transform(termPositions(words, t2), p => struct(p.as("pos"), lit(2).as("trm")))))

  /** Cover-density rank over an already-materialized merged list. */
  def tsRankCdOf(m: Column): Column = {
    val n = size(m)
    when(n >= 2,
      aggregate(sequence(lit(1), n - 1), lit(0.0d), (acc, i) => {
        val a = element_at(m, i)
        val b = element_at(m, i + 1)
        acc + when(a.getField("trm") =!= b.getField("trm"),
          lit(0.1d) / (b.getField("pos") - a.getField("pos")).cast("double"))
          .otherwise(lit(0.0d))
      })).otherwise(lit(0.0d))
  }

  def tsRankCd(words: Column, t1: String, t2: String): Column =
    tsRankCdOf(mergedPositions(words, t1, t2))

  // ------------------------------------------------------------------
  // Weighted tsvector (reference `utils/adt/tsvector_op.c:231`
  // tsvector_setweight; `tsrank.c:23` weights {0.1,0.2,0.4,1.0} indexed
  // D=0,C=1,B=2,A=3 via WEP_GETWEIGHT). A tsvector is modeled as
  // `array<struct<pos:int, word:string, weight:int>>`, position-sorted;
  // the weight nibble is the PG label index.
  // ------------------------------------------------------------------

  /** Default {D,C,B,A} weight vector (tsrank.c:23). */
  val defaultTsWeights: Seq[Double] = Seq(0.1, 0.2, 0.4, 1.0)

  private def labelNum(label: String): Int = label.toUpperCase match {
    case "A" => 3
    case "B" => 2
    case "C" => 1
    case "D" => 0
    case other => throw new IllegalArgumentException(
      s"unrecognized tsvector weight label: $other")
  }

  private val tsvType = "array<struct<pos:int,word:string,weight:int>>"

  /** Build a tsvector from a word array: positions 1..n, all entries
    * unlabeled (D). `sequence(1, 0)` descends in Spark, so the empty
    * array is guarded explicitly. */
  def toTsVector(words: Column): Column =
    when(size(words) > 0,
      transform(sequence(lit(1), size(words)), i =>
        struct(i.cast("int").as("pos"), element_at(words, i).as("word"),
          lit(0).as("weight"))))
      .otherwise(array().cast(tsvType))

  /** Build a tsvector with a per-position weight label computed from the
    * 1-based position (single pass — the construction PG users reach via
    * `setweight(tv1,'A') || setweight(tv2,'B') || tv3`, without the
    * per-element shift recompute a lambda-nested `array_max` would do). */
  def toTsVectorLabeled(words: Column, weightFor: Column => Column): Column =
    when(size(words) > 0,
      transform(sequence(lit(1), size(words)), i =>
        struct(i.cast("int").as("pos"), element_at(words, i).as("word"),
          weightFor(i).cast("int").as("weight"))))
      .otherwise(array().cast(tsvType))

  /** PG `strip(tsvector)` (tsvector_op.c tsvector_strip): drop
    * positions/weights — the sorted distinct lexeme set (also the
    * image `tsvector_to_array` returns). */
  def tsvStrip(tsv: Column): Column =
    array_sort(array_distinct(transform(tsv, e => e.getField("word"))))

  /** PG `length(tsvector)`: number of distinct lexemes. */
  def tsvLength(tsv: Column): Column = size(tsvStrip(tsv))

  /** PG `ts_delete(tsvector, lexeme)` (tsvector_op.c tsvector_delete_str):
    * remove every entry of one lexeme. */
  def tsDelete(tsv: Column, word: String): Column =
    filter(tsv, e => e.getField("word") =!= lit(word))

  /** PG `setweight(tsvector, 'A'|'B'|'C'|'D')` (tsvector_op.c:231):
    * relabel every position. */
  def setweight(tsv: Column, label: String): Column = {
    val w = labelNum(label)
    transform(tsv, e => struct(e.getField("pos").as("pos"),
      e.getField("word").as("word"), lit(w).as("weight")))
  }

  /** Largest position in a tsvector (0 when empty). */
  def tsvMaxPos(tsv: Column): Column =
    coalesce(array_max(transform(tsv, e => e.getField("pos"))), lit(0))

  /** PG `tsvector || tsvector` (tsvector_op.c tsvector_concat): right
    * side's positions are shifted past the left side's max position.
    * NOTE: the shift expression is re-evaluated per right-side element
    * (Spark lambdas don't CSE) — fine for small vectors; for long
    * documents build the combined vector in one pass with
    * [[toTsVectorLabeled]] instead. */
  def tsvConcat(a: Column, b: Column): Column = {
    val shift = tsvMaxPos(a)
    sort_array(concat(a, transform(b, e =>
      struct((e.getField("pos") + shift).cast("int").as("pos"),
        e.getField("word").as("word"), e.getField("weight").as("weight")))))
  }

  /** Map a weight-label column (0..3) to its weight value from a {D,C,B,A}
    * vector — a 4-branch CASE of literals, codegen-friendly. */
  def weightValue(w: Column, weights: Seq[Double] = defaultTsWeights): Column = {
    require(weights.length == 4, "weight vector must be {D,C,B,A} (4 floats)")
    when(w === 3, lit(weights(3))).when(w === 2, lit(weights(2)))
      .when(w === 1, lit(weights(1))).otherwise(lit(weights(0)))
  }

  /** Weight values (doubles) of `term`'s occurrences in position order —
    * the `wpos(post[j])` sequence of calc_rank_or. MATERIALIZE this with
    * `.withColumn` before passing to [[tsRankOrTermOf]]: a derived array
    * referenced inside a fold lambda is re-evaluated per element. */
  def termWeights(tsv: Column, term: String,
                  weights: Seq[Double] = defaultTsWeights): Column =
    transform(filter(tsv, e => e.getField("word") === lit(term)),
      e => weightValue(e.getField("weight"), weights))

  /** One term's unnormalized calc_rank_or contribution
    * (tsrank.c:316-332) over an already-materialized occurrence-weight
    * array: `resj = Σ_j w_j/j²` (j 1-based), `wjm` = FIRST maximum weight
    * (strict `>` keeps the earliest), contribution
    * `wjm + resj - wjm/jm²` — the caller divides by π²/6 and the
    * distinct-term count, mirroring the C loop's shape. */
  def tsRankOrTermOf(wArr: Column): Column = {
    val f = size(wArr)
    val resj = aggregate(sequence(lit(1), f), lit(0.0d),
      (acc, j) => acc + element_at(wArr, j) / (j * j).cast("double"))
    val m = array_max(wArr)
    val jm = array_position(wArr, m) // 1-based first max, long
    when(f > 0, m + resj - m / (jm * jm).cast("double")).otherwise(lit(0.0d))
  }

  /** RANK_NORM_* bitmask of calc_rank (tsrank.c:366-386) applied to a
    * computed rank: 1 /log2(len+1), 2 /len, 8 /uniq, 16 /log2(uniq+1),
    * 32 r/(r+1). `len` = total positions (cnt_length), `uniq` = distinct
    * lexemes (t->size). */
  def tsRankNorm(rank: Column, norm: Int, len: Column, uniq: Column): Column = {
    var r = rank
    if ((norm & 1) != 0)
      // calc_rank applies the log norm only when t->size > 0 — an empty
      // tsvector must not divide by log2(1) = 0
      r = when(len > 0,
        r / (log(len.cast("double") + 1.0d) / lit(math.log(2.0)))).otherwise(r)
    if ((norm & 2) != 0)
      r = when(len > 0, r / len.cast("double")).otherwise(r)
    if ((norm & 8) != 0)
      r = when(uniq > 0, r / uniq.cast("double")).otherwise(r)
    if ((norm & 16) != 0)
      r = when(uniq > 0,
        r / (log(uniq.cast("double") + 1.0d) / lit(math.log(2.0)))).otherwise(r)
    if ((norm & 32) != 0) r = r / (r + 1.0d)
    r
  }

  /** Weighted merged (pos, term, weight-value) list for the 2-term
    * cover-density walk — [[mergedPositions]] carrying `wpos`.
    * Materialize before ranking (same per-element re-eval rule). */
  def mergedPositionsW(tsv: Column, t1: String, t2: String,
                       weights: Seq[Double] = defaultTsWeights): Column =
    sort_array(concat(
      transform(filter(tsv, e => e.getField("word") === lit(t1)),
        e => struct(e.getField("pos").as("pos"), lit(1).as("trm"),
          weightValue(e.getField("weight"), weights).as("w"))),
      transform(filter(tsv, e => e.getField("word") === lit(t2)),
        e => struct(e.getField("pos").as("pos"), lit(2).as("trm"),
          weightValue(e.getField("weight"), weights).as("w")))))

  /** Weighted 2-term cover density (tsrank.c:726-790 calc_rank_cd):
    * each adjacent unlike-term pair in the merged list is one cover whose
    * two entries contribute `Cpos = 2/(1/w_begin + 1/w_end)` (harmonic
    * mean of the two position weights) scored over `1 + nNoise = q - p`.
    * With uniform D-weights this reduces to [[tsRankCdOf]]'s 0.1/(q-p). */
  def tsRankCdWOf(m: Column): Column = {
    val n = size(m)
    when(n >= 2,
      aggregate(sequence(lit(1), n - 1), lit(0.0d), (acc, i) => {
        val a = element_at(m, i)
        val b = element_at(m, i + 1)
        acc + when(a.getField("trm") =!= b.getField("trm"),
          (lit(2.0d) / (lit(1.0d) / a.getField("w") + lit(1.0d) / b.getField("w"))) /
            (b.getField("pos") - a.getField("pos")).cast("double"))
          .otherwise(lit(0.0d))
      })).otherwise(lit(0.0d))
  }

  /** Full n-term Cover() walk (tsrank.c:533-612), JVM-side: scan up from
    * the restart point until every query term is seen (cover end q),
    * scan back down until the set completes again (cover start p), score
    * `w / (1 + noiseWords)`, restart one past p. The 2-term declarative
    * path above is this walk's closed form (covered by tests); use this
    * for arbitrary AND queries via a typed map. */
  def coverRankCd(words: IndexedSeq[String], terms: Seq[String],
                  w: Double = 0.1): Double =
    coverRankCdW(words, terms, _ => w)

  /** Weighted n-term Cover walk (tsrank.c:726-790): each matched position
    * carries `wpos(1-based position)`; a cover [p, q] contributes
    * `Cpos / (1 + nNoise)` with `Cpos = nitems / Σ 1/w_i` — the harmonic
    * mean of the cover entries' weights times nitems/nitems (tsrank.c's
    * `(ext.end - ext.begin + 1) / invSum`). With constant w this is
    * exactly [[coverRankCd]]; the 2-term declarative [[tsRankCdWOf]] is
    * this walk's adjacent-pair closed form (pinned by fixture test). */
  def coverRankCdW(words: IndexedSeq[String], terms: Seq[String],
                   wpos: Int => Double): Double = {
    val termIdx = terms.distinct.zipWithIndex.toMap
    val nTerms = termIdx.size
    val doc = words.iterator.zipWithIndex.collect {
      case (word, i) if termIdx.contains(word) =>
        (i + 1, termIdx(word), wpos(i + 1))
    }.toArray
    var wdoc = 0.0
    var start = 0
    var exhausted = false
    while (!exhausted && start < doc.length) {
      val seen = new Array[Boolean](nTerms)
      var nSeen = 0
      var q = -1
      var i = start
      while (i < doc.length && q < 0) {
        if (!seen(doc(i)._2)) { seen(doc(i)._2) = true; nSeen += 1 }
        if (nSeen == nTerms) q = i
        i += 1
      }
      if (q < 0) exhausted = true
      else {
        java.util.Arrays.fill(seen, false); nSeen = 0
        var p = q
        var j = q
        var done = false
        while (j >= start && !done) {
          if (!seen(doc(j)._2)) { seen(doc(j)._2) = true; nSeen += 1 }
          if (nSeen == nTerms) { p = j; done = true }
          j -= 1
        }
        val span = doc(q)._1 - doc(p)._1
        var nNoise = span - (q - p)
        if (nNoise < 0) nNoise = (q - p) / 2
        var invSum = 0.0
        var k = p
        while (k <= q) { invSum += 1.0 / doc(k)._3; k += 1 }
        val cpos = (q - p + 1).toDouble / invSum
        wdoc += cpos / (1.0 + nNoise)
        start = p + 1
      }
    }
    wdoc
  }

  // ------------------------------------------------------------------
  // ts_headline (reference `src/backend/tsearch/wparser_def.c`
  // prsd_headline / mark_hl_words, single-fragment default mode;
  // pg_proc.h:4694-4698): choose the best cover of the query terms —
  // shortest span, earliest on ties, which is the cover the Cover walk
  // scores highest under uniform weights — open the headline window at
  // its start, extend to MaxWords, and wrap every query-term word
  // inside the window in StartSel/StopSel.
  // ------------------------------------------------------------------

  /** Best cover over a [[mergedPositions]] list: adjacent unlike-term
    * pairs are the 2-term covers (see [[tsRankCdOf]]); "best" = shortest
    * span, earliest start on ties — encoded as `span * 100000 +
    * startPos` so one bigint min carries both ordering keys (document
    * positions stay far below 100000). Null when no cover exists.
    * Materialize as its own column before use (lambda re-eval rule). */
  def bestCover(m: Column): Column =
    when(size(m) >= 2,
      aggregate(sequence(lit(1), size(m) - 1), lit(null).cast("bigint"),
        (acc, i) => {
          val a = element_at(m, i)
          val b = element_at(m, i + 1)
          // Spark least() skips nulls: the first candidate seeds acc
          least(acc, when(a.getField("trm") =!= b.getField("trm"),
            (b.getField("pos") - a.getField("pos")).cast("bigint") * 100000L
              + a.getField("pos")))
        }))

  /** Headline text from a precomputed [[bestCover]] score: the window is
    * [cover start, cover start + maxWords - 1] clamped to the document
    * (no cover → the document head, PG's trimmed-start fallback), and
    * every query-term word inside it is wrapped in startSel/stopSel. */
  def tsHeadlineOf(words: Column, best: Column, terms: Seq[String],
                   maxWords: Int = 35, startSel: String = "<b>",
                   stopSel: String = "</b>"): Column = {
    val hstart = coalesce((best % 100000L).cast("int"), lit(1))
    val winLen = least(size(words) - hstart + 1, lit(maxWords))
    val marked = transform(slice(words, hstart, winLen), w =>
      when(terms.map(t => w === lit(t)).reduce(_ || _),
        concat(lit(startSel), w, lit(stopSel))).otherwise(w))
    array_join(marked, " ")
  }

  /** [[tsHeadlineOf]] through a stemming dictionary (ts_headline over
    * the `english` configuration): the cover/window logic runs on the
    * STEMMED array while the emitted snippet shows the ORIGINAL
    * document words — a word is marked when its stem is a query stem,
    * so inflected forms highlight. `words` and `stems` must be
    * position-aligned, already-materialized columns. */
  def tsHeadlineStemmed(words: Column, stems: Column, best: Column,
                        terms: Seq[String], maxWords: Int = 35,
                        startSel: String = "<b>",
                        stopSel: String = "</b>"): Column = {
    val hstart = coalesce((best % 100000L).cast("int"), lit(1))
    val winLen = least(size(words) - hstart + 1, lit(maxWords))
    val marked = transform(sequence(hstart, hstart + winLen - 1), i =>
      when(terms.map(t => element_at(stems, i) === lit(t)).reduce(_ || _),
        concat(lit(startSel), element_at(words, i), lit(stopSel)))
        .otherwise(element_at(words, i)))
    array_join(marked, " ")
  }
}

/** tsquery parser: recursive descent over `& | ! <-> <N> ( ) term[:*]`
  * tokens, with PG precedence `!` > `<->` > `&` > `|` (tsquery.c
  * makepol; phrase operator `<N>` from tsquery_phrase_distance). Phrase
  * nodes compile POSITIONALLY: `a <N> b` matches where some occurrence
  * of b stands exactly N positions after an occurrence of a (`<->` is
  * `<1>`), composing left-nested (`a <-> b <-> c`) through end-position
  * sets. Phrase operands may be terms, prefixes, ORs of those, or
  * nested phrases — NOT/AND inside a phrase are rejected, as the
  * boolean compile has no position set to thread through. */
object TsQuery {

  sealed trait Node
  final case class Term(t: String, prefix: Boolean) extends Node
  final case class And(l: Node, r: Node) extends Node
  final case class Or(l: Node, r: Node) extends Node
  final case class Not(c: Node) extends Node
  final case class Phrase(l: Node, r: Node, dist: Int) extends Node

  def parse(q: String): Node = {
    val p = new P(tokenize(q))
    val n = p.parseOr()
    require(p.peek.isEmpty, s"trailing tokens in tsquery: '$q'")
    n
  }

  def compile(words: Column, query: String): Column = comp(words, parse(query))

  /** Compile an already-rewritten AST (see [[rewriteAll]]). */
  def compileNode(words: Column, n: Node): Column = comp(words, n)

  /** `ts_rewrite` substitution (tsquery_rewrite.c findsubquery): replace
    * every occurrence of `target` in `query` by `substitute`. Subtree
    * equality is structural modulo AND/OR operand order — the piece of
    * QTN normalization the two-operand grammar needs (PG sorts QTNode
    * children canonically before matching). Rules apply in order, each
    * over the previous rule's output, like PG's rewrite-by-SELECT form. */
  def rewriteAll(query: String, rules: Seq[(String, String)]): Node =
    rules.foldLeft(parse(query)) { case (n, (t, s)) =>
      rewriteNode(n, parse(t), parse(s))
    }

  private def rewriteNode(n: Node, target: Node, sub: Node): Node =
    if (sameTree(n, target)) sub
    else n match {
      case And(l, r) => And(rewriteNode(l, target, sub), rewriteNode(r, target, sub))
      case Or(l, r) => Or(rewriteNode(l, target, sub), rewriteNode(r, target, sub))
      case Not(c) => Not(rewriteNode(c, target, sub))
      case Phrase(l, r, d) =>
        Phrase(rewriteNode(l, target, sub), rewriteNode(r, target, sub), d)
      case t: Term => t
    }

  private def sameTree(a: Node, b: Node): Boolean = (a, b) match {
    case (Term(t1, p1), Term(t2, p2)) => t1 == t2 && p1 == p2
    case (And(l1, r1), And(l2, r2)) =>
      (sameTree(l1, l2) && sameTree(r1, r2)) ||
        (sameTree(l1, r2) && sameTree(r1, l2))
    case (Or(l1, r1), Or(l2, r2)) =>
      (sameTree(l1, l2) && sameTree(r1, r2)) ||
        (sameTree(l1, r2) && sameTree(r1, l2))
    case (Not(c1), Not(c2)) => sameTree(c1, c2)
    case (Phrase(l1, r1, d1), Phrase(l2, r2, d2)) =>
      d1 == d2 && sameTree(l1, l2) && sameTree(r1, r2)
    case _ => false
  }

  private def comp(words: Column, n: Node): Column = n match {
    case Term(t, false) => array_contains(words, t)
    case Term(t, true) => exists(words, w => w.startsWith(t))
    case And(l, r) => comp(words, l) && comp(words, r)
    case Or(l, r) => comp(words, l) || comp(words, r)
    case Not(c) => !comp(words, c)
    case p: Phrase => size(positions(words, p)) > 0
  }

  /** End-position set of a position-bearing node (1-based). NOTE the
    * lambda re-eval rule: the left side's position array is re-derived
    * per right-side candidate — fine for document-length arrays; for
    * hot paths materialize [[positions]] of subnodes as columns. */
  private def positions(words: Column, n: Node): Column = n match {
    case Term(t, false) =>
      filter(sequence(lit(1), size(words)), i => element_at(words, i) === lit(t))
    case Term(t, true) =>
      filter(sequence(lit(1), size(words)), i => element_at(words, i).startsWith(t))
    case Or(l, r) => array_union(positions(words, l), positions(words, r))
    case Phrase(l, r, d) =>
      val lp = positions(words, l)
      filter(positions(words, r), p => array_contains(lp, p - d))
    case other => throw new IllegalArgumentException(
      s"tsquery phrase operand must be positional (term/prefix/|/phrase): $other")
  }

  private val phraseRe = "<(\\d+)>|<->".r

  private def tokenize(q: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < q.length) {
      val c = q.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '<' &&
        phraseRe.findPrefixOf(q.substring(i)).isDefined) {
        val m = phraseRe.findPrefixOf(q.substring(i)).get
        out += m; i += m.length
      } else if ("&|!()".indexOf(c) >= 0) { out += c.toString; i += 1 }
      else {
        val start = i
        while (i < q.length && !q.charAt(i).isWhitespace &&
          "&|()<".indexOf(q.charAt(i)) < 0) i += 1
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
      var l = parsePhrase()
      while (peek.contains("&")) { next(); l = And(l, parsePhrase()) }
      l
    }
    private def parsePhrase(): Node = {
      var l = parseUnary()
      while (peek.exists(t => t == "<->" || phraseRe.matches(t))) {
        val op = next()
        val d = if (op == "<->") 1 else op.substring(1, op.length - 1).toInt
        l = Phrase(l, parseUnary(), d)
      }
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
