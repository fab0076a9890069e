package graft.report

import graft.SparkSpec
import java.time.Instant

class HtmlSpec extends SparkSpec {
  import spark.implicits._

  test("report is hash-stable under an injected clock") {
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val clock = () => Instant.parse("2026-01-01T00:00:00Z")
    val h1 = Html.render("Run", Seq("summary" -> "k=1"), Seq("t" -> df), clock = clock)
    val h2 = Html.render("Run", Seq("summary" -> "k=1"), Seq("t" -> df), clock = clock)
    assert(h1 == h2)
    assert(h1.contains("Generated: 2026-01-01 00:00:00"))
    assert(h1.contains("<td>1</td><td>a</td>"))
  }

  test("html escapes content and renders null") {
    val df = Seq((Some("<x>&"), 1), (None, 2)).toDF("s", "id")
    val html = Html.tableHtml(df)
    assert(html.contains("&lt;x&gt;&amp;"))
    assert(html.contains("<td>null</td>"))
  }

  test("table preview respects limit") {
    val df = (1 to 100).toDF("id")
    val html = Html.tableHtml(df, limit = 3)
    assert(html.split("<tr>").length == 5) // header + 3 rows
  }
}
