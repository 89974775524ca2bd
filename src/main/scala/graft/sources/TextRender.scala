package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Display-only output formats — the reference's presentation family
  * (`src/Processors/Formats/Impl/{Pretty,Vertical,Markdown,XML}
  * RowOutputFormat.cpp`). These are terminal/report sinks, not data
  * interchange: the render necessarily materializes the (row-capped)
  * result on the driver, exactly as the reference streams them to the
  * client terminal — the one place a collect is the correct pattern.
  *
  * Layout choices mirror the reference: Pretty uses its box-drawing
  * frame (┏━┳━┓ header, ├─┼─┤ row separators) with numbers
  * right-aligned, strings left-aligned and NULL shown as ᴺᵁᴸᴸ
  * (`PrettyBlockOutputFormat.cpp`; ANSI bold codes are omitted — the
  * reference drops them for non-TTY output too). Markdown emits
  * `|-:|`/`|:-|` alignment rows per column type
  * (`MarkdownRowOutputFormat.cpp:26-34`). Vertical prints `Row N:`,
  * a ─ rule, and `name: value` lines (`VerticalRowOutputFormat.cpp`).
  */
object TextRender {

  val MaxRows = 10000

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  private def cell(row: Row, i: Int): String =
    if (row.isNullAt(i)) "ᴺᵁᴸᴸ"            // ᴺᵁᴸᴸ
    else row.get(i).toString

  private def take(df: DataFrame, maxRows: Int): Array[Row] =
    df.limit(maxRows).collect()

  private def pad(s: String, w: Int, right: Boolean): String =
    if (right) " " * (w - s.length) + s else s + " " * (w - s.length)

  /** Pretty: full frame with per-row separators (reference `Pretty`). */
  def pretty(df: DataFrame, maxRows: Int = MaxRows): String = {
    val rows = take(df, maxRows)
    val fields = df.schema.fields
    val n = fields.length
    val widths = fields.indices.map { i =>
      (fields(i).name.length +: rows.map(r => cell(r, i).length).toSeq).max
    }
    def bar(l: String, m: String, r: String, f: String) =
      widths.map(w => f * (w + 2)).mkString(l, m, r)
    val sb = new StringBuilder
    sb.append(bar("┏", "┳", "┓", "━")).append('\n')
    sb.append(fields.indices.map(i =>
      " " + pad(fields(i).name, widths(i), right = false) + " ")
      .mkString("┃", "┃", "┃")).append('\n')
    sb.append(bar("┡", "╇", "┩", "━")).append('\n')
    rows.zipWithIndex.foreach { case (row, rn) =>
      if (rn > 0) sb.append(bar("├", "┼", "┤", "─")).append('\n')
      sb.append(fields.indices.map { i =>
        val right = isNumeric(fields(i).dataType) || row.isNullAt(i)
        " " + pad(cell(row, i), widths(i), right) + " "
      }.mkString("│", "│", "│")).append('\n')
    }
    sb.append(bar("└", "┴", "┘", "─")).append('\n')
    sb.toString
  }

  /** Markdown structural escaping: a literal '|' or newline inside a
    * cell would otherwise add/split columns (the reference's Markdown
    * output escapes through serializeTextEscaped the same way). */
  private def mdEsc(s: String): String =
    s.replace("\\", "\\\\").replace("|", "\\|")
      .replace("\n", "\\n").replace("\r", "\\r")

  /** Markdown table with per-type alignment markers. */
  def markdown(df: DataFrame, maxRows: Int = MaxRows): String = {
    val rows = take(df, maxRows)
    val fields = df.schema.fields
    val sb = new StringBuilder
    sb.append(fields.map(f => mdEsc(f.name)).mkString("| ", " | ", " |"))
      .append('\n')
    sb.append(fields.map(f =>
      if (isNumeric(f.dataType)) "-:" else ":-").mkString("|", "|", "|"))
      .append('\n')
    rows.foreach { r =>
      sb.append(fields.indices.map(i => mdEsc(cell(r, i)))
        .mkString("| ", " | ", " |")).append('\n')
    }
    sb.toString
  }

  /** Vertical: one `name: value` line per column per row. */
  def vertical(df: DataFrame, maxRows: Int = MaxRows): String = {
    val rows = take(df, maxRows)
    val fields = df.schema.fields
    val nameW = if (fields.isEmpty) 0 else fields.map(_.name.length).max
    val sb = new StringBuilder
    rows.zipWithIndex.foreach { case (r, i) =>
      if (i > 0) sb.append('\n')
      val title = s"Row ${i + 1}:"
      sb.append(title).append('\n').append("─" * title.length).append('\n')
      fields.indices.foreach { c =>
        sb.append(pad(fields(c).name, nameW, right = false))
          .append(": ").append(cell(r, c)).append('\n')
      }
    }
    sb.toString
  }

  /** XML result document (reference `XMLRowOutputFormat`): meta block
    * with column names/types, then one element per field per row. */
  def xml(df: DataFrame, maxRows: Int = MaxRows): String = {
    val rows = take(df, maxRows)
    val fields = df.schema.fields
    def esc(s: String): String = s
      .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    // computed columns like count(1) are not valid XML names — the
    // reference substitutes a generic <field> tag for those; the real
    // name stays (escaped) in the meta block.
    val tags = fields.map { f =>
      if (f.name.matches("[A-Za-z_][A-Za-z0-9_.-]*")) f.name else "field"
    }
    val sb = new StringBuilder
    sb.append("<?xml version='1.0' encoding='UTF-8' ?>\n")
    sb.append("<result xmlns:xsi=\"http://www.w3.org/2001/XMLSchema-instance\">\n")
    sb.append("\t<meta>\n\t\t<columns>\n")
    fields.foreach { f =>
      sb.append("\t\t\t<column>\n")
        .append(s"\t\t\t\t<name>${esc(f.name)}</name>\n")
        .append(s"\t\t\t\t<type>${esc(f.dataType.simpleString)}</type>\n")
        .append("\t\t\t</column>\n")
    }
    sb.append("\t\t</columns>\n\t</meta>\n\t<data>\n")
    rows.foreach { r =>
      sb.append("\t\t<row>\n")
      fields.indices.foreach { c =>
        val tag = tags(c)
        if (r.isNullAt(c)) sb.append(s"\t\t\t<$tag xsi:nil=\"true\" />\n")
        else sb.append(s"\t\t\t<$tag>${esc(r.get(c).toString)}</$tag>\n")
      }
      sb.append("\t\t</row>\n")
    }
    sb.append(s"\t</data>\n\t<rows>${rows.length}</rows>\n</result>\n")
    sb.toString
  }

  /** CSVWithNames (reference `CSVRowOutputFormat` rules: RFC-style
    * double-quote escaping, a field is quoted iff it contains a quote,
    * comma, CR or LF; NULL renders as \N like the reference's CSV). */
  def csv(df: DataFrame, maxRows: Int = MaxRows): String = {
    val rows = take(df, maxRows)
    val fields = df.schema.fields
    def f(s: String): String =
      if (s.exists(c => c == '"' || c == ',' || c == '\n' || c == '\r'))
        "\"" + s.replace("\"", "\"\"") + "\""
      else s
    val sb = new StringBuilder
    sb.append(fields.map(x => f(x.name)).mkString(",")).append('\n')
    rows.foreach { r =>
      sb.append(fields.indices.map(i =>
        if (r.isNullAt(i)) "\\N" else f(r.get(i).toString)).mkString(","))
        .append('\n')
    }
    sb.toString
  }

  /** TabSeparatedWithNames (reference `TabSeparatedRowOutputFormat`:
    * backslash-escaped \t, \n, \r, \\; NULL as \N). */
  def tsv(df: DataFrame, maxRows: Int = MaxRows): String = {
    val rows = take(df, maxRows)
    val fields = df.schema.fields
    def f(s: String): String = s.replace("\\", "\\\\")
      .replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")
    val sb = new StringBuilder
    sb.append(fields.map(x => f(x.name)).mkString("\t")).append('\n')
    rows.foreach { r =>
      sb.append(fields.indices.map(i =>
        if (r.isNullAt(i)) "\\N" else f(r.get(i).toString)).mkString("\t"))
        .append('\n')
    }
    sb.toString
  }
}
