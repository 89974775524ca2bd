package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.TextRender

/** Exact-string contracts for the display-only output formats
  * (reference Pretty/Markdown/Vertical/XML presentation family). */
class TextRenderSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private lazy val df = Seq(
    (1L, "x", Some(3.5)),
    (22L, "yy", None)).toDF("id", "name", "score")
    .coalesce(1) // deterministic row order for string comparison

  test("markdown: header, alignment markers, rows, NULL cell") {
    assert(TextRender.markdown(df) ==
      """|| id | name | score |
         ||-:|:-|-:|
         || 1 | x | 3.5 |
         || 22 | yy | ᴺᵁᴸᴸ |
         |""".stripMargin)
  }

  test("vertical: row headers, rule, name: value lines") {
    assert(TextRender.vertical(df) ==
      """|Row 1:
         |──────
         |id   : 1
         |name : x
         |score: 3.5
         |
         |Row 2:
         |──────
         |id   : 22
         |name : yy
         |score: ᴺᵁᴸᴸ
         |""".stripMargin)
  }

  test("pretty: box frame, number right / string left alignment") {
    assert(TextRender.pretty(df) ==
      """|┏━━━━┳━━━━━━┳━━━━━━━┓
         |┃ id ┃ name ┃ score ┃
         |┡━━━━╇━━━━━━╇━━━━━━━┩
         |│  1 │ x    │   3.5 │
         |├────┼──────┼───────┤
         |│ 22 │ yy   │  ᴺᵁᴸᴸ │
         |└────┴──────┴───────┘
         |""".stripMargin)
  }

  test("xml: meta columns, data rows, nil for NULL, escaping") {
    val out = TextRender.xml(Seq((1L, "a<b&c")).toDF("k", "v"))
    assert(out.contains("<name>k</name>"))
    assert(out.contains("<type>bigint</type>"))
    assert(out.contains("<v>a&lt;b&amp;c</v>"))
    assert(out.contains("<rows>1</rows>"))
    val nil = TextRender.xml(Seq((1L, None: Option[String])).toDF("k", "v"))
    assert(nil.contains("<v xsi:nil=\"true\" />"))
  }

  test("maxRows caps the rendered rows") {
    val big = spark.range(100).toDF("id")
    val md = TextRender.markdown(big, maxRows = 3)
    assert(md.linesIterator.size == 5) // header + alignment + 3 rows
  }
}
