package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.TextExtract._

/** Golden-pair fixtures from FIXTURES.md §3 (semantics from reference
  * cleaners.py:9-41, models.py:54-61, hparams.py:26). Pure — no Spark. */
class TextExtractSpec extends AnyFunSuite {

  test("entity decode") {
    assert(stripHtml("a &lt;b&gt; c") == "a <b> c")
    assert(cleanText(stripHtml("a &lt;b&gt; c")) == "a b c")
    assert(stripHtml("&amp;&quot;&apos;&#65;&#x42;&#x62;") == "&\"'ABb")
    // unknown / unterminated entities pass through
    assert(stripHtml("a &unknown; b") == "a &unknown; b")
    assert(stripHtml("fish & chips") == "fish & chips")
    assert(stripHtml("trailing &amp") == "trailing &amp")
  }

  test("tag strip with nesting") {
    assert(stripHtml("<p>x<b>y</b></p>") == "xy")
    assert(stripHtml("<div class=\"a>b\"><p>keep</p></div>") == "keep")
    assert(stripHtml("<!-- gone --><p>here</p><!-- unterminated") == "here")
    assert(stripHtml("<script>var x=1;</script>") == "var x=1;")
  }

  test("regex strip + lowercase (cleanString semantics)") {
    // "#" "&" "." "!" all removed; the two spaces around "&" remain
    assert(cleanText("C# & F.O.O!") == "c  foo")
    assert(tokenizeQuery("C# & F.O.O!").toSeq == Seq("c", "foo"))
    assert(cleanString("<p>C# &amp; F.O.O!</p>") == "c  foo")
    assert(cleanString(null) == null)
    assert(cleanString("") == "")
  }

  test("stopword filter") {
    assert(tokenizeQuery("what is the best way").toSeq == Seq("best", "way"))
  }

  test("doc cap asymmetry: 16-token doc cap, uncapped query") {
    val twenty = (1 to 20).map(i => s"tok$i").mkString(" ")
    assert(tokenizeDoc(twenty).length == 16)
    assert(tokenizeDoc(twenty).toSeq == (1 to 16).map(i => s"tok$i"))
    assert(tokenizeQuery(twenty).length == 20)
  }

  test("stopwords interleaved with cap: cap counts kept tokens") {
    val s = (1 to 20).map(i => s"the tok$i").mkString(" ")
    assert(tokenizeDoc(s).toSeq == (1 to 16).map(i => s"tok$i"))
  }

  test("empty doc → empty tokens") {
    assert(tokenizeDoc("").isEmpty)
    assert(tokenizeDoc("the a an of").isEmpty)
    assert(tokenizeQuery("   ").isEmpty)
  }
}
