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

  def tsRank(words: Column, terms: Seq[String]): Column = {
    val hits = terms.map(t => size(filter(words, w => w === lit(t)))).reduce(_ + _)
    hits.cast("double") / size(words).cast("double")
  }
}
