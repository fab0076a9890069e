package graft.report

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

/** S5 PDF report sink (SURVEY.md §2.6 S5; reference
  * `modules/reporting.py:51-75` `try_make_pdf`): a best-effort TEXT
  * linearization of the S4 HTML report — strip tags, one drawn line per
  * text line — with the reference's exact layout constants: A4 pages,
  * 40 pt margins, 14 pt leading, lines truncated to 110 chars, page
  * break when the cursor passes the bottom margin.
  *
  * The reference silently returns None when reportlab is missing; this
  * implementation instead always succeeds by emitting the (tiny, stable)
  * subset of PDF 1.4 the layout needs — one Helvetica text object per
  * page — with no third-party dependency. Driver-side by design, like S4:
  * the input is the already-bounded HTML report string.
  */
object Pdf {

  // reportlab A4 in points (modules/reporting.py:66: `pagesize=A4`)
  private val PageW = 595.2755905511812
  private val PageH = 841.8897637795277
  private val Margin = 40.0
  private val Leading = 14.0
  private val MaxChars = 110

  /** BeautifulSoup `get_text('\n')` approximation: tags out, entities
    * unescaped, each inter-tag text chunk becomes one line. */
  private[report] def htmlToText(html: String): Seq[String] = {
    val noScript = html.replaceAll("(?is)<(script|style)[^>]*>.*?</\\1>", "")
    // &amp; must unescape LAST: Html.escape turns a literal "&lt;" into
    // "&amp;lt;", and unescaping &amp; first would double-unescape it to
    // "<" — corrupting round-tripped cell values.
    val chunks = noScript.split("<[^>]*>").toSeq
      .map(_.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", "\"").replace("&#39;", "'").replace("&nbsp;", " ")
        .replace("&amp;", "&"))
      .map(_.trim)
      .filter(_.nonEmpty)
    if (chunks.isEmpty) Seq("SafeData Report (text fallback).") else chunks
  }

  /** Escape a line for a PDF literal string; non-Latin-1 → '?'. */
  private def pdfEscape(s: String): String =
    s.take(MaxChars).map {
      case '\\' => "\\\\"
      case '(' => "\\("
      case ')' => "\\)"
      case c if c >= ' ' && c.toInt <= 255 => c.toString
      case _ => "?"
    }.mkString

  /** Locale-fixed formatting: PDF number syntax requires '.' decimals
    * and ASCII digits, but the f"" interpolator formats via the JVM
    * default locale — a comma-decimal default (de_DE, fr_FR) would emit
    * "40,0 801,890 Td" and produce an invalid file. */
  private def fr(pattern: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, pattern,
      args.map(_.asInstanceOf[AnyRef]): _*)

  /** Render `lines` to PDF bytes: one text object per page, Helvetica 12
    * (reportlab's canvas default font). */
  def renderLines(lines: Seq[String]): Array[Byte] = {
    val linesPerPage = math.max(1, ((PageH - 2 * Margin) / Leading).toInt + 1)
    val pages = if (lines.isEmpty) Seq(Seq.empty[String]) else lines.grouped(linesPerPage).toSeq

    // object ids: 1 Catalog, 2 Pages, 3 Font, then (Page, Contents) pairs
    val kids = pages.indices.map(i => s"${4 + i * 2} 0 R").mkString(" ")

    val objs = scala.collection.mutable.ArrayBuffer[String]()
    objs += "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
    objs += s"2 0 obj\n<< /Type /Pages /Kids [$kids] /Count ${pages.length} >>\nendobj\n"
    objs += "3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica /Encoding /WinAnsiEncoding >>\nendobj\n"
    pages.zipWithIndex.foreach { case (pageLines, i) =>
      val pageId = 4 + i * 2
      val contentId = pageId + 1
      val y0 = PageH - Margin
      val body = new StringBuilder
      body.append(fr("BT\n/F1 12 Tf\n%.1f TL\n%.1f %.3f Td\n", Leading, Margin, y0))
      pageLines.foreach { l => body.append(s"(${pdfEscape(l)}) Tj\nT*\n") }
      body.append("ET\n")
      val stream = body.toString
      objs += s"$pageId 0 obj\n<< /Type /Page /Parent 2 0 R " +
        fr("/MediaBox [0 0 %.3f %.3f] ", PageW, PageH) +
        s"/Resources << /Font << /F1 3 0 R >> >> /Contents $contentId 0 R >>\nendobj\n"
      objs += s"$contentId 0 obj\n<< /Length ${stream.getBytes(StandardCharsets.ISO_8859_1).length} >>\n" +
        s"stream\n$stream\nendstream\nendobj\n"
    }

    val out = new ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    val offsets = objs.map { o => val off = out.size(); w(o); off }
    val xrefOff = out.size()
    val n = objs.length + 1
    w(s"xref\n0 $n\n")
    w("0000000000 65535 f \n")
    offsets.foreach(off => w(fr("%010d 00000 n \n", off)))
    w(s"trailer\n<< /Size $n /Root 1 0 R >>\nstartxref\n$xrefOff\n%%EOF\n")
    out.toByteArray
  }

  /** The reference's contract: HTML report in, PDF file out. */
  def fromHtml(html: String): Array[Byte] = renderLines(htmlToText(html))

  def writeFromHtml(html: String, path: String): String = {
    java.nio.file.Files.write(java.nio.file.Paths.get(path), fromHtml(html))
    path
  }
}
