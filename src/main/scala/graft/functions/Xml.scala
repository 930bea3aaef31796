package graft.functions

import javax.xml.XMLConstants
import javax.xml.parsers.{DocumentBuilder, DocumentBuilderFactory}
import javax.xml.xpath.{XPathConstants, XPathExpression, XPathFactory}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-parse multi-XPath extraction (reference `src/backend/utils/adt/
  * xml.c:57-148` xpath; the PG idiom `SELECT xpath(a), xpath(b), ...`
  * re-parses the document per call — as do Spark's `xpath_*` builtins).
  * This expression DOM-parses the document ONCE per row and evaluates
  * every compiled XPath against the same tree, returning a struct of
  * node-text arrays (`c0..cN`). Callers project the typed views:
  * `element_at(f, 1)` for a scalar string, `.cast("long")` for numbers,
  * `size(f) > 0` for an existence predicate, `array_join` for node sets.
  *
  * Scale posture: per-row constant work, embarrassingly parallel, no
  * shuffle; the single parse replaces K parses for K extractions. The
  * XPaths are compiled once per task (transient lazy), and the parser
  * rejects DOCTYPE declarations (no XXE, no entity expansion bombs).
  */
case class XpathAll(xml: Expression, paths: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = xml
  override def prettyName: String = "xpath_all"

  override def dataType: DataType = StructType(paths.indices.map(i =>
    StructField(s"c$i", ArrayType(StringType, containsNull = false),
      nullable = false)))

  @transient private lazy val compiled: Array[XPathExpression] = {
    val xp = XPathFactory.newInstance().newXPath()
    paths.map(xp.compile).toArray
  }

  @transient private lazy val builder: DocumentBuilder = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_DTD, "")
    f.setAttribute(XMLConstants.ACCESS_EXTERNAL_SCHEMA, "")
    f.newDocumentBuilder()
  }

  override def nullSafeEval(input: Any): Any = {
    val doc = builder.parse(new org.xml.sax.InputSource(
      new java.io.StringReader(input.asInstanceOf[UTF8String].toString)))
    InternalRow.fromSeq(compiled.toSeq.map { e =>
      val nodes = e.evaluate(doc, XPathConstants.NODESET)
        .asInstanceOf[org.w3c.dom.NodeList]
      new GenericArrayData(Array.tabulate(nodes.getLength)(i =>
        UTF8String.fromString(nodes.item(i).getTextContent)))
    })
  }

  override protected def withNewChildInternal(newChild: Expression): XpathAll =
    copy(xml = newChild)
}
