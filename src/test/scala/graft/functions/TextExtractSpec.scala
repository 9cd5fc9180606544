package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

class TextExtractSpec extends AnyFunSuite {

  private def x(html: String): String =
    TextExtract.extract(html.getBytes(StandardCharsets.UTF_8))

  test("strips tags, scripts, styles, comments") {
    val html =
      """<html><head><title>Hello World</title>
        |<style>body{color:red}</style>
        |<script>var x = "<p>not text</p>";</script>
        |</head><body><h1>Hello  World</h1>
        |<!-- nav boilerplate -->
        |<p>First <b>bold</b> paragraph.</p><p>Second.</p>
        |</body></html>""".stripMargin
    assert(x(html) == "Hello World\nHello World\nFirst bold paragraph.\nSecond.")
  }

  test("entities decoded; numeric refs; broken entity left as-is") {
    assert(x("<p>a &amp; b &lt;c&gt; &quot;d&quot; &#65; &#x42; &nosuch; &</p>") ==
      "a & b <c> \"d\" A B &nosuch; &")
  }

  test("inline tags do not split words; block tags become newlines") {
    assert(x("ab<span>cd</span>ef<br>gh") == "abcdef\ngh")
  }

  test("whitespace collapse + nbsp") {
    assert(x("<p>a   b\t\tc</p><p>  </p><p>d</p>") == "a b c\nd")
  }

  test("truncated html does not throw") {
    assert(x("<p>ok<div attr=") == "ok")
    assert(x("<script>never closed") == "")
  }

  test("byte-identical determinism (north-rule invariant)") {
    val html = graft.ingest.CorpusGen.genHtml(42L, 123L, 100L)
    val b = html.getBytes(StandardCharsets.UTF_8)
    val t1 = TextExtract.extract(b)
    val t2 = TextExtract.extract(b)
    assert(t1 == t2)
    assert(t1.getBytes(StandardCharsets.UTF_8).sameElements(t2.getBytes(StandardCharsets.UTF_8)))
  }

  // Golden lock-down: freezes the extraction function (FIXTURES.md §5).
  test("golden extraction of a generated page") {
    val html = graft.ingest.CorpusGen.genHtml(42L, 0L, 10L)
    val text = TextExtract.extractString(html)
    // first line is the mention (title), then h1 repeats it
    val lines = text.split('\n')
    assert(lines.length >= 5)
    assert(lines(0) == lines(1), "title and h1 must carry the same mention")
    assert(lines(2).startsWith("Profile of "))
    assert(!text.contains("tracker"), "script content must not leak")
    assert(!text.contains("font:"), "style content must not leak")
  }
}
