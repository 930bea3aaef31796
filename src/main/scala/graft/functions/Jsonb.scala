package graft.functions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

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
    * (jsonb_ops containment: every needle pair present and equal). For
    * nested documents use [[containsDeep]]. */
  def containsAll(m: Column, needle: Map[String, String]): Column =
    needle.map { case (k, v) => element_at(m, k) === lit(v) }
      .reduce(_ && _)

  /** `doc @> needle` — FULL recursive containment over JSON text
    * (reference `src/backend/utils/adt/jsonb_util.c:965`
    * JsonbDeepContains): nested objects recurse, arrays contain a
    * needle array when every needle element is contained in some target
    * element, a top-level array contains a primitive element, numbers
    * compare numerically. Runs as the codegen `jsonb_contains`
    * expression. */
  def containsDeep(doc: Column, needle: String): Column =
    call_function("jsonb_contains", doc, lit(needle))

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

/** `jsonb_contains(doc, needle)` — PG `@>` as a codegen expression over
  * two JSON strings (jsonb_util.c:965 JsonbDeepContains). A foldable
  * needle (the common `doc @> '<literal>'` shape) is parsed ONCE on the
  * driver and shipped as a codegen reference object, so per row only
  * the document is parsed — PG likewise detoasts the constant needle
  * once per scan, not per tuple. */
case class JsonbContains(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "jsonb_contains"

  @transient private lazy val parsedNeedle: JsonNode =
    if (right.foldable) {
      val v = right.eval()
      if (v == null) null else JsonbDeep.parse(v.toString)
    } else null

  override protected def nullSafeEval(d: Any, n: Any): Any =
    if (parsedNeedle != null) JsonbDeep.containsParsed(d.toString, parsedNeedle)
    else JsonbDeep.contains(d.toString, n.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (parsedNeedle != null) {
      val ref = ctx.addReferenceObj("jsonbNeedle", parsedNeedle,
        classOf[JsonNode].getName)
      defineCodeGen(ctx, ev, (a, _) =>
        s"graft.functions.JsonbDeep.containsParsed($a.toString(), $ref)")
    } else defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.JsonbDeep.contains($a.toString(), $b.toString())")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JsonbContains =
    copy(left = newLeft, right = newRight)
}

/** `jsonb_set(doc, '{a,1,b}', newval)` (reference `jsonfuncs.c:4161`
  * jsonb_set → setPath): walk the PG-style path — object keys and
  * array indices, negative indices counting from the end — and replace
  * or create (create_missing = true, the PG default) the target,
  * returning the updated document text. Jackson's object nodes keep
  * insertion order, so untouched structure round-trips byte-stable. */
case class JsonbSet(doc: Expression, path: Expression, value: Expression)
  extends TernaryExpression {

  override def first: Expression = doc
  override def second: Expression = path
  override def third: Expression = value
  override def dataType: DataType = StringType
  override def prettyName: String = "jsonb_set"

  override protected def nullSafeEval(d: Any, p: Any, v: Any): Any =
    JsonbDeep.setPath(d.toString, p.toString, v.toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (d, p, v) =>
      s"graft.functions.JsonbDeep.setPath($d.toString(), $p.toString(), $v.toString())")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): JsonbSet =
    copy(doc = newFirst, path = newSecond, value = newThird)
}

/** The JVM walk behind [[JsonbContains]], mirroring JsonbDeepContains'
  * recursion (jsonb_util.c:965): the needle drives the walk; a
  * contained array needs each of its elements contained in SOME target
  * element; the array-contains-primitive special case applies at top
  * level only, as in PG. */
object JsonbDeep {

  private[functions] val mapper = new ObjectMapper()

  def parse(s: String): JsonNode = mapper.readTree(s)

  /** PG jsonb_pretty layout: 4-space indent, `"key": value`, one
    * element per line, `[]`/`{}` for empties. */
  private[functions] def pretty(n: JsonNode, depth: Int,
                                sb: StringBuilder): Unit = {
    val pad = "    " * (depth + 1)
    val close = "    " * depth
    if (n.isObject) {
      if (!n.fields().hasNext) { sb ++= "{}"; return }
      sb ++= "{\n"
      val it = n.fields()
      var first = true
      while (it.hasNext) {
        val e = it.next()
        if (!first) sb ++= ",\n"
        first = false
        sb ++= pad ++= mapper.writeValueAsString(e.getKey) ++= ": "
        pretty(e.getValue, depth + 1, sb)
      }
      sb ++= "\n" ++= close ++= "}"
    } else if (n.isArray) {
      if (n.size == 0) { sb ++= "[]"; return }
      sb ++= "[\n"
      var i = 0
      while (i < n.size) {
        if (i > 0) sb ++= ",\n"
        sb ++= pad
        pretty(n.get(i), depth + 1, sb)
        i += 1
      }
      sb ++= "\n" ++= close ++= "]"
    } else sb ++= mapper.writeValueAsString(n)
  }

  /** Recursively drop null-valued OBJECT fields (array slots stay). */
  private[functions] def stripNulls(n: JsonNode): JsonNode = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    n match {
      case o: ObjectNode =>
        val out = mapper.createObjectNode()
        val it = o.fields()
        while (it.hasNext) {
          val e = it.next()
          if (!e.getValue.isNull) out.set[JsonNode](e.getKey, stripNulls(e.getValue))
        }
        out
      case a: ArrayNode =>
        val out = mapper.createArrayNode()
        var i = 0
        while (i < a.size) { out.add(stripNulls(a.get(i))); i += 1 }
        out
      case other => other
    }
  }

  def contains(doc: String, needle: String): Boolean =
    walk(mapper.readTree(doc), mapper.readTree(needle), top = true)

  /** [[contains]] with a pre-parsed needle (foldable-needle fast path). */
  def containsParsed(doc: String, needle: JsonNode): Boolean =
    walk(mapper.readTree(doc), needle, top = true)

  /** jsonb_set's setPath walk (jsonfuncs.c:4161): `path` is the PG
    * text-array form `{a,1,b}`; intermediate steps must exist (as in
    * PG), the FINAL step creates when missing (create_missing = true).
    * Negative array indices count from the end; an index one past
    * either end appends/prepends, as PG documents. */
  def setPath(doc: String, path: String, value: String): UTF8String = {
    val root = mapper.readTree(doc)
    applySet(root, path, mapper.readTree(value))
    UTF8String.fromString(mapper.writeValueAsString(root))
  }

  /** All of `jsonb_set(doc, paths(i), values(i))` with ONE parse of the
    * document (each application works on its own deep copy of the
    * tree, so the results are the independent single-set outputs). */
  def setPathMulti(doc: String, paths: Array[String],
                   values: Array[String]): Array[UTF8String] = {
    val root = mapper.readTree(doc)
    Array.tabulate(paths.length) { i =>
      val copy = root.deepCopy[JsonNode]()
      applySet(copy, paths(i), mapper.readTree(values(i)))
      UTF8String.fromString(mapper.writeValueAsString(copy))
    }
  }

  private def applySet(root: JsonNode, path: String, v: JsonNode): Unit = {
    import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
    val steps = path.trim.stripPrefix("{").stripSuffix("}").split(",")
      .map(_.trim).filter(_.nonEmpty)
    require(steps.nonEmpty, s"empty jsonb_set path: $path")
    var cur = root
    for (s <- steps.dropRight(1)) {
      cur = cur match {
        case o: ObjectNode =>
          val n = o.get(s)
          require(n != null, s"jsonb_set: path step '$s' does not exist")
          n
        case a: ArrayNode =>
          val i = s.toInt
          val k = if (i < 0) a.size + i else i
          require(k >= 0 && k < a.size, s"jsonb_set: index $i out of range")
          a.get(k)
        case other => throw new IllegalArgumentException(
          s"jsonb_set: cannot index ${other.getNodeType} with '$s'")
      }
    }
    cur match {
      case o: ObjectNode => o.set[JsonNode](steps.last, v)
      case a: ArrayNode =>
        val i = steps.last.toInt
        val k = if (i < 0) a.size + i else i
        if (k < 0) a.insert(0, v)
        else if (k >= a.size) a.add(v)
        else a.set(k, v)
      case other => throw new IllegalArgumentException(
        s"jsonb_set: cannot index ${other.getNodeType} with '${steps.last}'")
    }
  }

  private def walk(t: JsonNode, n: JsonNode, top: Boolean): Boolean = {
    import scala.jdk.CollectionConverters._
    if (n.isObject && t.isObject) {
      n.fields().asScala.forall { e =>
        val tv = t.get(e.getKey)
        tv != null && walk(tv, e.getValue, top = false)
      }
    } else if (n.isArray && t.isArray) {
      n.elements().asScala.forall(ne =>
        t.elements().asScala.exists(te => walk(te, ne, top = false)))
    } else if (top && t.isArray && n.isValueNode) {
      t.elements().asScala.exists(te => scalarEq(te, n))
    } else scalarEq(t, n)
  }

  private def scalarEq(a: JsonNode, b: JsonNode): Boolean =
    if (a.isNumber && b.isNumber)
      a.decimalValue().compareTo(b.decimalValue()) == 0
    else a.getNodeType == b.getNodeType && a == b
}

/** `jsonb_pretty(doc)` — PG's pretty form (jsonfuncs.c jsonb_pretty):
  * 4-space indent, `"key": value`, one element per line. */
case class JsonbPretty(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "jsonb_pretty"

  override def nullSafeEval(doc: Any): Any = {
    val sb = new StringBuilder
    JsonbDeep.pretty(JsonbDeep.mapper.readTree(doc.toString), 0, sb)
    UTF8String.fromString(sb.toString)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): JsonbPretty =
    copy(child = c)
}

/** `json_strip_nulls(doc)` (json.c json_strip_nulls): object fields
  * whose value is null disappear, recursively; array elements stay. */
case class JsonStripNulls(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = StringType
  override def prettyName: String = "json_strip_nulls"

  override def nullSafeEval(doc: Any): Any = UTF8String.fromString(
    JsonbDeep.mapper.writeValueAsString(
      JsonbDeep.stripNulls(JsonbDeep.mapper.readTree(doc.toString))))

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): JsonStripNulls =
    copy(child = c)
}

/** `json_array_elements(doc)` value array (jsonfuncs.c
  * elements_worker): each element re-serialized as its own JSON text —
  * explode it for the SRF form. */
case class JsonArrayElements(child: org.apache.spark.sql.catalyst.expressions.Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def prettyName: String = "json_array_elements"

  override def nullSafeEval(doc: Any): Any = {
    val n = JsonbDeep.mapper.readTree(doc.toString)
    require(n.isArray, s"json_array_elements: not a JSON array: $doc")
    val out = new Array[Any](n.size)
    var i = 0
    while (i < n.size) {
      out(i) = UTF8String.fromString(JsonbDeep.mapper.writeValueAsString(n.get(i)))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(
      c: org.apache.spark.sql.catalyst.expressions.Expression): JsonArrayElements =
    copy(child = c)
}

/** `jsonb_set_all(doc, path1, val1, path2, val2, ...)` — every
  * independent jsonb_set of one document with a SINGLE parse (the same
  * single-parse pattern as xpath_all for XML): returns the array of
  * updated documents in argument order. Jackson parse dominates
  * jsonb_set cost, so n sets amortize to ~1 parse + n copies. */
case class JsonbSetAll(children: Seq[org.apache.spark.sql.catalyst.expressions.Expression])
  extends org.apache.spark.sql.catalyst.expressions.Expression
  with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(children.length >= 3 && children.length % 2 == 1,
    "jsonb_set_all(doc, path1, val1[, path2, val2, ...])")

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = children.head.nullable
  override def prettyName: String = "jsonb_set_all"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val doc = children.head.eval(input)
    if (doc == null) return null
    val n = (children.length - 1) / 2
    val paths = new Array[String](n)
    val values = new Array[String](n)
    var i = 0
    while (i < n) {
      paths(i) = children(1 + 2 * i).eval(input).toString
      values(i) = children(2 + 2 * i).eval(input).toString
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      JsonbDeep.setPathMulti(doc.toString, paths, values)
        .asInstanceOf[Array[Any]])
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression]): JsonbSetAll =
    copy(children = newChildren)
}
