package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** The round-9 extractors factored into (DataFrame, Column) operators:
  * these tests drive them over CALLER-OWNED columns (hand-built frames
  * with extra passenger columns), proving a user can run them on their
  * corpus without copy-pasting query bodies — and that input columns
  * survive untouched. */
class Round10OperatorsSpec extends SparkSpec {

  test("htmlTables runs over a user column, keeps passenger columns") {
    import spark.implicits._
    val df = Seq(
      (1L, "keep-a", "<html><table><tr><td>x</td><td><i>y</i></td></tr>" +
        "<tr><th>h1</th><th>h2</th></tr></table></html>"),
      (2L, "keep-b", "no tables here at all"),
      (3L, "keep-c", "<table><tr><td>only</td></tr></table>" +
        "<p>between</p><table><tr><td>t2</td></tr></table>")
    ).toDF("id", "tag", "page")
    val got = TextAnalysis.htmlTables(df, col("page"))
      .select($"id", $"tag", $"table_idx", $"row_idx", $"n_cells", $"row_text")
      .as[(Long, String, Int, Int, Int, String)].collect().sortBy(r => (r._1, r._3, r._4))
    assert(got.toSeq == Seq(
      (1L, "keep-a", 0, 0, 2, "x|y"),
      (1L, "keep-a", 0, 1, 2, "h1|h2"),
      (3L, "keep-c", 0, 0, 1, "only"),
      (3L, "keep-c", 1, 0, 1, "t2")))
  }

  test("subtitleCues detects format from payload and parses both wire forms") {
    import spark.implicits._
    val srt = "1\n00:00:01,500 --> 00:00:03,000\nhello srt\n\n" +
      "2\n00:01:00,000 --> 00:01:02,250\nsecond cue"
    val vtt = "WEBVTT\n\n00:00:02.000 --> 00:00:04.100\n<i>styled vtt</i>"
    val df = Seq((10L, srt), (20L, vtt)).toDF("id", "payload")
    val got = TextAnalysis.subtitleCues(df, col("payload"))
      .select($"id", $"format", $"cue_idx", $"start_ms", $"end_ms", $"text")
      .as[(Long, String, Int, Long, Long, String)].collect().sortBy(r => (r._1, r._3))
    assert(got.toSeq == Seq(
      (10L, "srt", 0, 1500L, 3000L, "hello srt"),
      (10L, "srt", 1, 60000L, 62250L, "second cue"),
      (20L, "vtt", 0, 2000L, 4100L, "styled vtt")))
  }

  test("markdownCensus adds counts next to existing columns") {
    import spark.implicits._
    val md = "# Top\n## Sub\ntext with [a](http://x) and [b](http://y)\n" +
      "- one\n- two\n- three\n```\ncode\n```\n"
    val df = Seq((7L, md), (8L, "plain prose only")).toDF("id", "body")
    val got = TextAnalysis.markdownCensus(df, col("body"))
      .select($"id", $"n_headings", $"max_depth", $"n_links",
        $"n_code_blocks", $"n_list_items")
      .as[(Long, Int, Int, Int, Int, Int)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((7L, 2, 2, 2, 1, 3), (8L, 0, 0, 0, 0, 0)))
  }

  test("emlHeaders unfolds and extracts over a user column") {
    import spark.implicits._
    val eml = "From: Jane Doe <jane@ex.org>\r\nTo: bob@ex.org\r\n" +
      "Subject: folded\r\n subject line\r\n" +
      "Content-Type: text/plain\r\n\r\nbody text\r\n"
    val df = Seq((1L, eml)).toDF("id", "raw")
    val got = TextAnalysis.emlHeaders(df, col("raw"))
      .select($"id", $"sender_name", $"sender_addr", $"to_addr", $"subject",
        $"body_chars")
      .as[(Long, String, String, String, String, Int)].collect()
    assert(got.toSeq == Seq(
      (1L, "Jane Doe", "jane@ex.org", "bob@ex.org", "folded subject line", 11)))
  }
}
