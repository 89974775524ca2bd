package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** Template row format — a format-string compiler over plain text files.
  *
  * The reference's Template format (daisy
  * `src/Formats/ParsedTemplateFormatString.h:29-31`,
  * `src/Processors/Formats/Impl/TemplateBlockOutputFormat.cpp` /
  * `TemplateRowInputFormat.cpp`) renders and parses rows through a
  * user-supplied format string
  * `Delim0 ${Col0:Fmt0} Delim1 ${Col1:Fmt1} Delim2`, where each
  * placeholder names a column and a per-column serialization
  * (None/Escaped/Quoted/CSV/JSON/Raw; `$$` escapes a literal dollar).
  *
  * The Spark-first compilation:
  *  - WRITE: the template compiles to ONE `concat(...)` projection —
  *    literal delimiters become `lit`s, placeholders become the typed
  *    column pushed through the serialization's escaping expression —
  *    then `write.text`. Everything stays inside WholeStageCodegen; no
  *    per-row interpretation (the template is compiled once at plan
  *    time, exactly like the reference's parsed format string).
  *  - READ: the template compiles to ONE anchored regex — delimiters
  *    are regex-quoted, each placeholder contributes a capture group
  *    shaped by its serialization — evaluated by the same
  *    `regexp_extract` machinery as the Regexp format, followed by the
  *    serialization's un-escaping and a cast to the target schema type.
  */
object TemplateIO {

  sealed trait ColFmt
  case object RawFmt extends ColFmt     // None/Raw: value as-is
  case object EscapedFmt extends ColFmt // TSV escaping: \t \n \\
  case object QuotedFmt extends ColFmt  // SQL 'quoted' with \' \\
  case object CsvFmt extends ColFmt     // "quoted", inner quotes doubled
  case object JsonFmt extends ColFmt    // JSON string literal

  final case class Placeholder(name: String, fmt: ColFmt)
  /** Alternating literal delimiters and placeholders, starting and
    * ending with a (possibly empty) delimiter. */
  final case class Template(delimiters: Seq[String], columns: Seq[Placeholder])

  private def fmtOf(s: String): ColFmt = s match {
    case "" | "None" | "Raw" => RawFmt
    case "Escaped" => EscapedFmt
    case "Quoted" => QuotedFmt
    case "CSV" => CsvFmt
    case "JSON" => JsonFmt
    case other => throw new IllegalArgumentException(
      s"Template: unknown column serialization '$other'")
  }

  /** Parse `Delim0 ${Col:Fmt} Delim1 ...` (reference
    * ParsedTemplateFormatString::parse). */
  def parse(format: String): Template = {
    val delims = Seq.newBuilder[String]
    val cols = Seq.newBuilder[Placeholder]
    val cur = new StringBuilder
    var i = 0
    while (i < format.length) {
      val c = format.charAt(i)
      if (c == '$' && i + 1 < format.length && format.charAt(i + 1) == '$') {
        cur.append('$'); i += 2
      } else if (c == '$' && i + 1 < format.length && format.charAt(i + 1) == '{') {
        val end = format.indexOf('}', i + 2)
        require(end >= 0, "Template: unbalanced ${")
        val body = format.substring(i + 2, end)
        val (name, fmt) = body.indexOf(':') match {
          case -1 => (body, RawFmt)
          case k => (body.substring(0, k), fmtOf(body.substring(k + 1)))
        }
        require(name.nonEmpty, "Template: empty column name")
        delims += cur.result(); cur.clear()
        cols += Placeholder(name, fmt)
        i = end + 1
      } else { cur.append(c); i += 1 }
    }
    delims += cur.result()
    Template(delims.result(), cols.result())
  }

  /** Serialization escaping as a Column expression (strings only —
    * non-string types render plain under every serialization, like the
    * reference's per-type text serializations). */
  private def serialize(c: Column, dt: DataType, fmt: ColFmt): Column =
    (dt, fmt) match {
      case (StringType, EscapedFmt) =>
        regexp_replace(regexp_replace(regexp_replace(
          c, "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n")
      case (StringType, QuotedFmt) =>
        concat(lit("'"), regexp_replace(regexp_replace(
          c, "\\\\", "\\\\\\\\"), "'", "\\\\'"), lit("'"))
      case (StringType, CsvFmt) =>
        concat(lit("\""), regexp_replace(c, "\"", "\"\""), lit("\""))
      case (StringType, JsonFmt) =>
        concat(lit("\""), regexp_replace(regexp_replace(
          c, "\\\\", "\\\\\\\\"), "\"", "\\\\\""), lit("\""))
      case _ => c.cast(StringType)
    }

  /** Render `df` through the template into text files: one
    * concat-projection, one text write. */
  def write(df: DataFrame, path: String, format: String): Unit = {
    val t = parse(format)
    val byName = df.schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val pieces = Seq.newBuilder[Column]
    t.delimiters.zipWithIndex.foreach { case (d, i) =>
      if (d.nonEmpty) pieces += lit(d)
      if (i < t.columns.length) {
        val p = t.columns(i)
        val f = byName.getOrElse(p.name.toLowerCase, throw
          new IllegalArgumentException(s"Template: no column ${p.name}"))
        pieces += serialize(col(f.name), f.dataType, p.fmt)
      }
    }
    df.select(concat(pieces.result(): _*).as("value"))
      .write.mode("overwrite").text(path)
  }

  private def groupPattern(dt: DataType, fmt: ColFmt): String =
    (dt, fmt) match {
      case (StringType, QuotedFmt) => "'((?:[^'\\\\]|\\\\.)*)'"
      case (StringType, CsvFmt) => "\"((?:[^\"]|\"\")*)\""
      case (StringType, JsonFmt) => "\"((?:[^\"\\\\]|\\\\.)*)\""
      case (StringType, _) => "(.*?)"
      case _ => "(-?[0-9][0-9.eE+-]*|true|false)" // plain typed rendering
    }

  /** Stand-in for a decoded backslash during unescaping. U+FFFF is a
    * Unicode noncharacter, so it cannot appear in interchange text. */
  private val BS = "￿"

  private def unescape(c: Column, dt: DataType, fmt: ColFmt): Column =
    (dt, fmt) match {
      // Escape pairs must decode left-to-right in ONE logical pass:
      // sequential replaces would mis-read the tail of one pair as the
      // head of the next (wire `\\t` — an escaped backslash then a
      // literal 't' — must NOT become a tab). Decoding `\\` to a
      // sentinel first removes every ambiguous backslash before the
      // single-char escapes run, then the sentinel restores it.
      case (StringType, EscapedFmt) =>
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          c, "\\\\\\\\", BS), "\\\\t", "\t"), "\\\\n", "\n"), BS, "\\\\")
      case (StringType, QuotedFmt) =>
        regexp_replace(regexp_replace(regexp_replace(
          c, "\\\\\\\\", BS), "\\\\'", "'"), BS, "\\\\")
      case (StringType, CsvFmt) => regexp_replace(c, "\"\"", "\"")
      case (StringType, JsonFmt) =>
        regexp_replace(regexp_replace(regexp_replace(
          c, "\\\\\\\\", BS), "\\\\\"", "\""), BS, "\\\\")
      case _ => c
    }

  /** Parse text files through the template into `schema`-typed columns.
    * Columns absent from the template read as NULL (the reference skips
    * unmapped columns). */
  def read(spark: SparkSession, path: String, format: String,
           schema: StructType): DataFrame = {
    val t = parse(format)
    val byName = schema.fields.map(f => f.name.toLowerCase -> f).toMap
    val placed = t.columns.map(p => byName.getOrElse(p.name.toLowerCase,
      throw new IllegalArgumentException(s"Template: no column ${p.name}")))
    val pattern = "^" + t.delimiters.zipWithIndex.map { case (d, i) =>
      java.util.regex.Pattern.quote(d) +
        (if (i < t.columns.length)
          groupPattern(placed(i).dataType, t.columns(i).fmt)
        else "")
    }.mkString + "$"
    val lines = spark.read.text(path)
    val extracted = schema.fields.map { f =>
      t.columns.indexWhere(_.name.equalsIgnoreCase(f.name)) match {
        case -1 => lit(null).cast(f.dataType).as(f.name)
        case i =>
          val g = regexp_extract(col("value"), pattern, i + 1)
          unescape(g, f.dataType, t.columns(i).fmt).cast(f.dataType).as(f.name)
      }
    }
    lines.select(extracted.toIndexedSeq: _*)
  }
}

/** Null output format (reference
  * `src/Processors/Formats/Impl/NullFormat.cpp` — `consume(Chunk) {}`):
  * rows are fully computed and then discarded. Spark's `noop` sink is
  * the exact equivalent: the plan executes distributed, nothing lands. */
object NullIO {
  def write(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()
}
