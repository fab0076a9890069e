package graft.report

import graft.SparkSpec
import java.nio.charset.StandardCharsets
import java.time.Instant

/** S5 contract (reference modules/reporting.py:51-75): text-linearized
  * PDF of the HTML report — A4, 40 pt margins, 14 pt leading, 110-char
  * lines, page breaks. Prop-gated: structural PDF invariants + layout
  * constants rather than a byte oracle. */
class PdfSpec extends SparkSpec {
  import spark.implicits._

  private def ascii(b: Array[Byte]) = new String(b, StandardCharsets.ISO_8859_1)

  test("html text extraction strips tags, unescapes entities, drops blanks") {
    val text = Pdf.htmlToText(
      "<html><head><title>T&amp;1</title></head><body><h1>Head</h1>" +
        "<style>h1 {color: red}</style><p>a &lt;b&gt;</p><td></td></body></html>")
    assert(text == Seq("T&1", "Head", "a <b>"))
  }

  test("pdf bytes are structurally valid and deterministic") {
    val b1 = Pdf.renderLines(Seq("hello", "world (escaped) \\ yes"))
    val b2 = Pdf.renderLines(Seq("hello", "world (escaped) \\ yes"))
    assert(java.util.Arrays.equals(b1, b2))
    val s = ascii(b1)
    assert(s.startsWith("%PDF-1.4"))
    assert(s.contains("/BaseFont /Helvetica"))
    assert(s.contains("(hello) Tj"))
    assert(s.contains("(world \\(escaped\\) \\\\ yes) Tj"))
    assert(s.contains("/Count 1"))
    assert(s.endsWith("%%EOF\n"))
    // xref offsets must point at the object headers
    val xref = s.substring(s.indexOf("xref"))
    val offs = xref.linesIterator.drop(3).takeWhile(_.endsWith("n ")).map(_.take(10).toInt).toSeq
    offs.zipWithIndex.foreach { case (off, i) =>
      assert(s.startsWith(s"${i + 1} 0 obj", off), s"object ${i + 1} offset $off")
    }
  }

  test("55 lines per A4 page, reference truncation to 110 chars") {
    val many = (1 to 56).map(i => s"line$i")
    val s = ascii(Pdf.renderLines(many))
    assert(s.contains("/Count 2"), "56 lines must spill to a second page")
    assert(s.contains("(line55) Tj") && s.contains("(line56) Tj"))
    val long = "x" * 200
    val t = ascii(Pdf.renderLines(Seq(long)))
    assert(t.contains("(" + "x" * 110 + ") Tj") && !t.contains("x" * 111))
  }

  test("end to end: html report → pdf carries title, summary, and cells") {
    val df = Seq((1, "alpha"), (2, "beta")).toDF("id", "v")
    val clock = () => Instant.parse("2026-01-01T00:00:00Z")
    val html = Html.render("SafeData Run", Seq("summary" -> "{\"k\": 1}"), Seq("t" -> df), clock = clock)
    val s = ascii(Pdf.fromHtml(html))
    Seq("SafeData Run", "Generated: 2026-01-01 00:00:00", "{\"k\": 1}", "alpha", "beta")
      .foreach(x => assert(s.contains(s"(${x.replace("\"", "\"")}"), s"missing $x"))
  }
}
