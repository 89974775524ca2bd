package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** domain / domainWithoutWWW (reference `src/Functions/URL/domain.h`
  * `getURLHost` + `ExtractDomain<without_www>`): a single byte scan —
  * optional scheme skip (`[a-z0-9.+-]{,16}://` or leading `//`), then a
  * host walk tracking the last dot and the last `@`, terminated by
  * `:/?#`, rejecting the reference's restricted symbol set. Returns ''
  * (not NULL) when no host parses — the same grouping semantics the
  * reference exhibits in its web-analytics queries. The scan is a
  * static JVM call inside whole-stage codegen; java.util.regex never
  * runs (the reference's scanner is likewise regex-free — matching it
  * with regexp_extract costs ~2x on a hot column).
  */
object UrlFuncs {

  private def isAlphaNumeric(b: Int): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') || (b >= '0' && b <= '9')

  private def isRestricted(b: Int): Boolean = b.toChar match {
    case ' ' | '\t' | '<' | '>' | '%' | '{' | '}' | '|' | '\\' | '^' | '~' |
         '[' | ']' | ';' | '=' | '&' => true
    case _ => false
  }

  private val Empty = UTF8String.fromString("")

  /** Literal port of getURLHost + ExtractDomain over UTF-8 bytes. */
  def domain(u: UTF8String, withoutWWW: Boolean): UTF8String = {
    val b = u.getBytes
    val n = b.length
    if (n == 0) return Empty
    var pos = 0
    if (n >= 2 && b(0) == '/' && b(1) == '/') pos = 2
    else {
      // scheme: alnum/.-+ up to 16 bytes, then "://"
      val schemeEnd = math.min(n, 16)
      var p = 1
      var stop = false
      while (p < schemeEnd && !stop) {
        val c = b(p) & 0xff
        if (!isAlphaNumeric(c)) {
          if (c == '.' || c == '-' || c == '+') ()       // scheme chars
          else if (isRestricted(c)) return Empty
          else stop = true                               // exloop, p stays
        }
        if (!stop) p += 1
      }
      if (schemeEnd - p > 2 && b(p) == ':' && b(p + 1) == '/' && b(p + 2) == '/')
        pos = p + 3
      else pos = 0
    }
    var dotPos = -1
    var start = pos
    var p = pos
    var term = -1
    while (p < n && term < 0) {
      val c = b(p) & 0xff
      if (c == '.') { dotPos = p; p += 1 }
      else if (c == ':' || c == '/' || c == '?' || c == '#') term = p
      else if (c == '@') { start = p + 1; p += 1 }
      else if (isRestricted(c)) return Empty
      else p += 1
    }
    val end = if (term >= 0) term else n
    // checkAndReturnHost
    if (dotPos < 0 || start >= end || end - dotPos == 1) return Empty
    val afterDot = b(dotPos + 1) & 0xff
    if (afterDot == ':' || afterDot == '/' || afterDot == '?' || afterDot == '#')
      return Empty
    var s = start
    if (withoutWWW && end - s > 4 && b(s) == 'w' && b(s + 1) == 'w' &&
        b(s + 2) == 'w' && b(s + 3) == '.') s += 4
    UTF8String.fromBytes(b, s, end - s)
  }
}

/** domain(url) / domain_without_www(url) — codegen'd scanner. */
case class DomainExpr(child: Expression, withoutWWW: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis
      .TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure("domain requires a string argument")

  override protected def nullSafeEval(input: Any): Any =
    UrlFuncs.domain(input.asInstanceOf[UTF8String], withoutWWW)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.UrlFuncs.domain($c, $withoutWWW)")

  override protected def withNewChildInternal(newChild: Expression): DomainExpr =
    copy(child = newChild)
}
