package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** jsonb operator surface (reference `src/backend/utils/adt/jsonfuncs.c`
  * and jsonb_ops in `jsonb_op.c`): the PG operators a user's queries
  * spell as `? @> || -`, expressed over Spark map columns (the parsed
  * form of a flat jsonb object — one `from_json` per document, as in
  * q72/q109). All pure built-ins, fully codegen.
  */
object Jsonb {

  /** `obj ? key` — top-level key existence. */
  def hasKey(m: Column, key: String): Column =
    array_contains(map_keys(m), key)

  /** `obj ?& keys` — all keys present. */
  def hasAllKeys(m: Column, keys: Seq[String]): Column =
    keys.map(hasKey(m, _)).reduce(_ && _)

  /** `obj ?| keys` — any key present. */
  def hasAnyKey(m: Column, keys: Seq[String]): Column =
    keys.map(hasKey(m, _)).reduce(_ || _)

  /** `obj @> needle` — containment for a flat object of scalar values
    * (jsonb_ops containment: every needle pair present and equal). */
  def containsAll(m: Column, needle: Map[String, String]): Column =
    needle.map { case (k, v) => element_at(m, k) === lit(v) }
      .reduce(_ && _)

  /** `a || b` — concatenation, right side wins on key conflicts (PG
    * jsonb_concat). One `map_zip_with` pass — O(|a|+|b|) per row. (The
    * obvious `map_filter(a, k => !array_contains(map_keys(b), k))` is
    * O(|a|·|b|): a subexpression inside a HOF lambda is re-evaluated per
    * element, so `map_keys(b)` would be rebuilt for every key of `a`.)
    * `b`'s values are boxed in a struct so an explicit null value in `b`
    * still wins over `a`'s value, as PG's concat does. */
  def concat(a: Column, b: Column): Column = {
    val boxed = transform_values(b, (_, v) => struct(v.as("v")))
    map_zip_with(a, boxed,
      (_, va, wb) => when(wb.isNotNull, wb.getField("v")).otherwise(va))
  }

  /** `obj - key` — key deletion. */
  def removeKey(m: Column, key: String): Column =
    map_filter(m, (k, _) => k =!= lit(key))
}
