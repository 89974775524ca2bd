package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TemplateIO

/** Template format: format-string parsing and write/read round-trips
  * through every per-column serialization, including the escaping
  * edges (quotes, backslashes, tabs, doubled dollars) that the clean
  * TPC-H gate data never exercises. */
class TemplateIOSpec extends AnyFunSuite {
  import TestSpark._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType)))

  private def df(rows: Seq[Row]) = spark.createDataFrame(
    spark.sparkContext.parallelize(rows, 2), schema)

  private def roundTrip(rows: Seq[Row], tpl: String): Set[Seq[Any]] = {
    val dir = java.nio.file.Files.createTempDirectory("tpl").toString + "/t"
    TemplateIO.write(df(rows), dir, tpl)
    TemplateIO.read(spark, dir, tpl, schema).collect().map(_.toSeq).toSet
  }

  test("format-string parsing: delimiters, serializations, $$ escape") {
    val t = TemplateIO.parse("a$$b ${x:CSV}-${y}|${z:Quoted}!")
    assert(t.delimiters == Seq("a$b ", "-", "|", "!"))
    assert(t.columns.map(_.name) == Seq("x", "y", "z"))
    assert(t.columns.map(_.fmt) == Seq(
      TemplateIO.CsvFmt, TemplateIO.RawFmt, TemplateIO.QuotedFmt))
    intercept[IllegalArgumentException](TemplateIO.parse("${x:Nope}"))
    intercept[IllegalArgumentException](TemplateIO.parse("${x"))
  }

  test("Quoted/CSV/JSON/Escaped round-trip hostile strings") {
    val hostile = Seq(
      Row(1L, "plain", 1.5),
      Row(2L, "it's got 'quotes'", -2.25),
      Row(3L, "back\\slash and \"double\"", 0.0),
      Row(4L, "tab\there", 1e10),
      // escape-pair adjacency: a literal backslash directly before a
      // char that is itself an escape target — decodes wrongly unless
      // unescaping is single-pass (`\t` on the wire is backslash+'t',
      // NOT a tab; `\\'` is backslash+quote)
      Row(5L, "\\t", -1.0),
      Row(6L, "\\n\\\\t", 2.0),
      Row(7L, "\\'", 3.0),
      Row(8L, "\\\"", 4.0))
    for (fmt <- Seq("Quoted", "CSV", "JSON", "Escaped")) {
      val tpl = s"row ${"${id:Raw}"}: ${"${name:" + fmt + "}"} = ${"${score:Raw}"}"
      val got = roundTrip(hostile, tpl)
      assert(got == hostile.map(_.toSeq).toSet, s"serialization $fmt mangled data")
    }
  }

  test("columns absent from the template read back as NULL") {
    val rows = Seq(Row(7L, "x", 3.5))
    val dir = java.nio.file.Files.createTempDirectory("tpl").toString + "/t"
    TemplateIO.write(df(rows), dir, "${id:Raw}/${score:Raw}")
    val got = TemplateIO.read(spark, dir, "${id:Raw}/${score:Raw}", schema)
      .collect().map(_.toSeq).toSet
    assert(got == Set(Seq(7L, null, 3.5)))
  }
}
