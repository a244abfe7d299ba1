package graft

import org.apache.spark.sql.graft.HtmlParser
import org.scalatest.funsuite.AnyFunSuite

/** Tokenizer-level tests for the real DOM walk behind S3/X1 — the
  * messy-markup cases a regex parse breaks on (r3 VERDICT "What's
  * missing" #2). */
class HtmlParseSpec extends AnyFunSuite {

  test("fixture-shaped html parses exactly like the regex twin") {
    val html = """<html><h3>doc 7</h3><p>alpha beta</p><p>gamma</p><a href="https://x.y/z">src</a></html>"""
    val (els, lnks) = HtmlParser.parse(html)
    assert(els == Seq("h3" -> "doc 7", "p" -> "alpha beta", "p" -> "gamma"))
    assert(lnks == Seq("src" -> "https://x.y/z"))
  }

  test("attribute order, quoting variants, and > inside quoted values") {
    val html = """<p id=x1 class="a>b">t1</p><a class='c' href=plain>l1</a><a href='s q'>l2</a>"""
    val (els, lnks) = HtmlParser.parse(html)
    assert(els == Seq("p" -> "t1"))
    assert(lnks == Seq("l1" -> "plain", "l2" -> "s q"))
  }

  test("comments, doctype, and unknown inline tags are transparent to block text") {
    val html = "<!DOCTYPE html><!-- <p>not real</p> --><p>a <b>bold</b> c</p>"
    val (els, _) = HtmlParser.parse(html)
    assert(els == Seq("p" -> "a bold c"))
  }

  test("browser-style recovery: implicit block close, unclosed elements at EOF, stray <") {
    val (els, lnks) = HtmlParser.parse("<h3>head<p>one<p>two < three")
    assert(els == Seq("h3" -> "head", "p" -> "one", "p" -> "two < three"))
    assert(lnks.isEmpty)
    // unclosed anchor still yields its link at EOF
    val (_, l2) = HtmlParser.parse("""<a href="u">dangling""")
    assert(l2 == Seq("dangling" -> "u"))
  }

  test("anchors without href are walked but not emitted; new <a> closes the previous") {
    val html = """<p><a>skip</a><a href="1">x</a><a href="2">y</a></p>"""
    val (els, lnks) = HtmlParser.parse(html)
    assert(lnks == Seq("x" -> "1", "y" -> "2"))
    assert(els == Seq("p" -> "skipxy"))
  }

  test("raw text: entities are NOT decoded (byte-identical round-trip with the markup)") {
    val (els, _) = HtmlParser.parse("<p>a &amp; b</p>")
    assert(els == Seq("p" -> "a &amp; b"))
  }
}
