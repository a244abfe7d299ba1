package org.apache.spark.sql.graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Tolerant streaming HTML tokenizer backing the scrape operators' DOM
  * walk (the reference's html_nodes("h3"/"h4"/"p") + per-paragraph
  * html_nodes("a") loops, hi-csa-db.Rmd:151-171, :198-203) — a REAL
  * single-pass parser, not a regex over the markup: it handles
  * attributes in any order/quoting (double, single, unquoted, `>`
  * inside quoted values), comments, doctypes/processing instructions,
  * self-closing tags, unknown/inline tags inside blocks, and unclosed
  * elements at EOF. No external parser library exists in the runtime
  * (jsoup is not among the provided jars), and a hand-rolled tokenizer
  * keeps the semantics small enough to twin exactly in the DuckDB
  * oracle on fixture HTML.
  *
  * Semantics (shared by both expressions):
  *  - text nodes are RAW — no entity decoding — so extracted text
  *    round-trips byte-identically with the markup between tags.
  *  - block elements are h1–h6 and p; blocks do not nest, so an opening
  *    block tag implicitly closes any open block (browser-style error
  *    recovery), and a closing block tag closes whatever block is open.
  *  - inline markup inside a block contributes its text content to the
  *    block's text (markup stripped).
  *  - anchors collect (text, href) per `<a href=...>`; anchors lacking
  *    an href are walked but not emitted; a new `<a>` implicitly closes
  *    an unclosed one.
  */
object HtmlParser {
  private val BlockTags = Set("h1", "h2", "h3", "h4", "h5", "h6", "p")

  /** One parse pass → (block elements as (tag, text), links as (text, href)). */
  def parse(html: String): (Seq[(String, String)], Seq[(String, String)]) = {
    val els = new ArrayBuffer[(String, String)]
    val lnks = new ArrayBuffer[(String, String)]
    val n = html.length
    var i = 0
    var blockTag: String = null
    val blockBuf = new java.lang.StringBuilder
    var inAnchor = false
    var aHref: String = null
    val aBuf = new java.lang.StringBuilder
    def flushBlock(): Unit = if (blockTag != null) {
      els += ((blockTag, blockBuf.toString)); blockTag = null; blockBuf.setLength(0)
    }
    def flushAnchor(): Unit = {
      if (inAnchor && aHref != null) lnks += ((aBuf.toString, aHref))
      inAnchor = false; aHref = null; aBuf.setLength(0)
    }
    while (i < n) {
      if (html.charAt(i) == '<') {
        if (html.startsWith("<!--", i)) {
          val e = html.indexOf("-->", i + 4); i = if (e < 0) n else e + 3
        } else if (i + 1 < n && (html.charAt(i + 1) == '!' || html.charAt(i + 1) == '?')) {
          val e = html.indexOf('>', i); i = if (e < 0) n else e + 1
        } else {
          val closing = i + 1 < n && html.charAt(i + 1) == '/'
          var j = i + (if (closing) 2 else 1)
          val nameStart = j
          while (j < n && Character.isLetterOrDigit(html.charAt(j))) j += 1
          val name = html.substring(nameStart, j).toLowerCase(java.util.Locale.ROOT)
          if (name.isEmpty) {
            // stray '<' — treat as literal text (tolerant recovery)
            if (blockTag != null) blockBuf.append('<')
            if (inAnchor) aBuf.append('<')
            i += 1
          } else {
            // attributes, up to the tag-closing '>' (quote-aware)
            var href: String = null
            while (j < n && html.charAt(j) != '>') {
              while (j < n && Character.isWhitespace(html.charAt(j))) j += 1
              if (j < n && html.charAt(j) == '/') j += 1
              else if (j < n && html.charAt(j) != '>') {
                val as = j
                while (j < n && html.charAt(j) != '=' && html.charAt(j) != '>'
                    && html.charAt(j) != '/' && !Character.isWhitespace(html.charAt(j))) j += 1
                val aname = html.substring(as, j).toLowerCase(java.util.Locale.ROOT)
                var avalue: String = null
                var k = j
                while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
                if (k < n && html.charAt(k) == '=') {
                  k += 1
                  while (k < n && Character.isWhitespace(html.charAt(k))) k += 1
                  if (k < n && (html.charAt(k) == '"' || html.charAt(k) == '\'')) {
                    val qc = html.charAt(k); k += 1
                    val vs = k
                    while (k < n && html.charAt(k) != qc) k += 1
                    avalue = html.substring(vs, k)
                    if (k < n) k += 1
                  } else {
                    val vs = k
                    while (k < n && !Character.isWhitespace(html.charAt(k)) && html.charAt(k) != '>') k += 1
                    avalue = html.substring(vs, k)
                  }
                  j = k
                }
                if (aname == "href" && avalue != null && href == null) href = avalue
              }
            }
            if (j < n) j += 1 // consume '>'
            i = j
            if (name == "a") {
              if (closing) flushAnchor()
              else { flushAnchor(); inAnchor = true; aHref = href }
            } else if (BlockTags(name)) {
              if (closing) flushBlock()
              else { flushBlock(); blockTag = name }
            } // other tags are inline/structural — text flows through
          }
        }
      } else {
        val lt = html.indexOf('<', i)
        val end = if (lt < 0) n else lt
        if (blockTag != null) blockBuf.append(html, i, end)
        if (inAnchor) aBuf.append(html, i, end)
        i = end
      }
    }
    flushAnchor(); flushBlock() // browser-style: unclosed elements end at EOF
    (els.toSeq, lnks.toSeq)
  }

  private def toArrayData(pairs: Seq[(String, String)]): ArrayData =
    new GenericArrayData(pairs.map { case (a, b) =>
      new GenericInternalRow(Array[Any](UTF8String.fromString(a), UTF8String.fromString(b)))
    }.toArray[Any])

  /** Static helper the generated code calls. */
  def elementsData(html: UTF8String): ArrayData = toArrayData(parse(html.toString)._1)
  def linksData(html: UTF8String): ArrayData = toArrayData(parse(html.toString)._2)
}

/** `graft_html_elements(html)` → `array<struct<tag:string,text:string>>`
  * of h1–h6/p block elements in document order, markup stripped from
  * the text. Codegen'd: one parser call per row inside the whole-stage
  * span. */
case class HtmlElements(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("tag", StringType, nullable = false),
    StructField("text", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_html_elements"

  protected override def nullSafeEval(input: Any): Any =
    HtmlParser.elementsData(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.HtmlParser.elementsData($c)")

  protected override def withNewChildInternal(newChild: Expression): HtmlElements =
    copy(child = newChild)
}

/** `graft_html_links(html)` → `array<struct<text:string,href:string>>`
  * of anchors carrying an href, in document order — the reference's
  * per-paragraph html_nodes("a") + html_attr("href") loop
  * (hi-csa-db.Rmd:198-203) as one expression. */
case class HtmlLinks(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("text", StringType, nullable = false),
    StructField("href", StringType, nullable = false))), containsNull = false)
  override def prettyName: String = "graft_html_links"

  protected override def nullSafeEval(input: Any): Any =
    HtmlParser.linksData(input.asInstanceOf[UTF8String])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"org.apache.spark.sql.graft.HtmlParser.linksData($c)")

  protected override def withNewChildInternal(newChild: Expression): HtmlLinks =
    copy(child = newChild)
}
