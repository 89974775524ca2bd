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

  /** Materialize bytes [from, until) of `u` as a standalone string —
    * the only per-row allocation the scanners make (see domain's
    * scaladoc for why getBytes' whole-URL copy is avoided). */
  private def slice(u: UTF8String, from: Int, until: Int): UTF8String = {
    val out = new Array[Byte](until - from)
    var i = 0
    while (i < out.length) { out(i) = u.getByte(from + i); i += 1 }
    UTF8String.fromBytes(out)
  }

  /** Literal port of getURLHost + ExtractDomain over UTF-8 bytes.
    * Reads bytes in place via getByte — `getBytes` would copy the whole
    * URL per row (an UnsafeRow-backed string is never array-aligned),
    * which on a 100 M-row group-by column is the dominant allocation;
    * only the returned domain (typically 10-20 bytes) is materialized. */
  def domain(u: UTF8String, withoutWWW: Boolean): UTF8String = {
    val n = u.numBytes()
    if (n == 0) return Empty
    var pos = 0
    if (n >= 2 && u.getByte(0) == '/' && u.getByte(1) == '/') pos = 2
    else {
      // scheme: alnum/.-+ up to 16 bytes, then "://"
      val schemeEnd = math.min(n, 16)
      var p = 1
      var stop = false
      while (p < schemeEnd && !stop) {
        val c = u.getByte(p) & 0xff
        if (!isAlphaNumeric(c)) {
          if (c == '.' || c == '-' || c == '+') ()       // scheme chars
          else if (isRestricted(c)) return Empty
          else stop = true                               // exloop, p stays
        }
        if (!stop) p += 1
      }
      if (schemeEnd - p > 2 && u.getByte(p) == ':' && u.getByte(p + 1) == '/' &&
          u.getByte(p + 2) == '/')
        pos = p + 3
      else pos = 0
    }
    var dotPos = -1
    var start = pos
    var p = pos
    var term = -1
    while (p < n && term < 0) {
      val c = u.getByte(p) & 0xff
      if (c == '.') { dotPos = p; p += 1 }
      else if (c == ':' || c == '/' || c == '?' || c == '#') term = p
      else if (c == '@') { start = p + 1; p += 1 }
      else if (isRestricted(c)) return Empty
      else p += 1
    }
    val end = if (term >= 0) term else n
    // checkAndReturnHost
    if (dotPos < 0 || start >= end || end - dotPos == 1) return Empty
    val afterDot = u.getByte(dotPos + 1) & 0xff
    if (afterDot == ':' || afterDot == '/' || afterDot == '?' || afterDot == '#')
      return Empty
    var s = start
    if (withoutWWW && end - s > 4 && u.getByte(s) == 'w' && u.getByte(s + 1) == 'w' &&
        u.getByte(s + 2) == 'w' && u.getByte(s + 3) == '.') s += 4
    slice(u, s, end)
  }

  /** protocol (reference `src/Functions/URL/protocol.h` ExtractProtocol):
    * RFC-3986 scheme chars from an alpha start, requiring a ':' and at
    * least 4 bytes after the scheme. */
  def protocol(u: UTF8String): UTF8String = {
    val n = u.numBytes()
    if (n == 0) return Empty
    val c0 = u.getByte(0) & 0xff
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return Empty
    var p = 1
    while (p < n && {
      val c = u.getByte(p) & 0xff
      isAlphaNumeric(c) || c == '+' || c == '-' || c == '.'
    }) p += 1
    if (n - p < 4) return Empty
    if (u.getByte(p) == ':') slice(u, 0, p) else Empty
  }

  /** netloc (reference `src/Functions/URL/netloc.cpp`): scheme skip,
    * then user:pass@host:port up to the path/query/fragment — a literal
    * port including its slash/question-mark truncation bookkeeping. */
  def netloc(u: UTF8String): UTF8String = {
    val n = u.numBytes()
    if (n == 0) return Empty
    var pos = 0
    if (pos + 2 < n && u.getByte(0) == '/' && u.getByte(1) == '/') pos = 2
    else {
      val schemeEnd = math.min(n, 16)
      var p = 1
      var stop = false
      while (p < schemeEnd && !stop) {
        val c = u.getByte(p) & 0xff
        if (!isAlphaNumeric(c)) {
          if (c == '.' || c == '-' || c == '+') ()
          else if (isRestricted(c)) return Empty
          else stop = true
        }
        if (!stop) p += 1
      }
      if (p + 2 < schemeEnd && u.getByte(p) == ':' && u.getByte(p + 1) == '/' &&
          u.getByte(p + 2) == '/')
        pos = p + 3
      else pos = 0
    }
    var hasId = false
    var qmPos = n
    var slashPos = n
    val start = pos
    var p = pos
    while (p < n) {
      val c = u.getByte(p) & 0xff
      if (c == '/') {
        if (hasId) return slice(u, start, p)
        slashPos = p
      } else if (c == '?') {
        if (hasId) return slice(u, start, p)
        qmPos = p
      } else if (c == '#') {
        return slice(u, start, p)
      } else if (c == '@') {
        hasId = true
      } else if (isRestricted(c)) {
        return if (p > start)
          slice(u, start, math.min(math.min(p - 1, qmPos), slashPos))
        else Empty
      }
      p += 1
    }
    if (hasId) slice(u, start, p)
    else slice(u, start, math.min(math.min(p, qmPos), slashPos))
  }

  /** topLevelDomain (reference `src/Functions/URL/topLevelDomain.cpp`):
    * last dot-separated label of the host; empty for IPv4 (and, like
    * the reference's signed-char compare, for multibyte labels). */
  def topLevelDomain(u: UTF8String): UTF8String = {
    val hb = domain(u, withoutWWW = false).getBytes
    var hl = hb.length
    if (hl == 0) return Empty
    if (hb(hl - 1) == '.') hl -= 1
    var lastDot = -1
    var i = 0
    while (i < hl) { if (hb(i) == '.') lastDot = i; i += 1 }
    if (lastDot < 0) return Empty
    if (hb(lastDot + 1) <= '9'.toByte) return Empty // digits + signed multibyte
    UTF8String.fromBytes(hb, lastDot + 1, hl - lastDot - 1)
  }
}

object SubdomainFuncs {

  /** Compound second-level public-suffix zones (subset of the
    * publicsuffix.org list the reference generates its gperf table
    * from, `src/Functions/URL/tldLookup.gperf:13` — production would
    * load the full list; the subset keeps the lookup honest for the
    * common zones and the reference's own test vectors). */
  private val significantZones: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq(
      "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr",
      "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk", "ltd.uk", "plc.uk",
      "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp", "ad.jp",
      "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
      "com.br", "net.br", "org.br", "gov.br", "edu.br",
      "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
      "com.hk", "edu.hk", "gov.hk", "org.hk", "net.hk",
      "com.sg", "net.sg", "org.sg", "edu.sg", "gov.sg",
      "com.tw", "net.tw", "org.tw",
      "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
      "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
      "com.co", "net.co", "org.co", "edu.co", "gov.co",
      "co.in", "net.in", "org.in", "gen.in", "firm.in", "ind.in",
      "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
      "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz",
      "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr",
      "com.ua", "net.ua", "org.ua", "in.ua", "gov.ua", "edu.ua",
      "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl",
      "com.my", "net.my", "org.my", "edu.my", "gov.my",
      "com.ph", "net.ph", "org.ph",
      "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn",
      "com.eg", "com.sa", "com.ae", "co.ae", "com.qa",
      "co.il", "org.il", "net.il", "ac.il", "gov.il",
      "co.th", "or.th", "ac.th", "go.th", "in.th",
      "com.pk", "net.pk", "org.pk", "edu.pk", "gov.pk",
      "com.bd", "net.bd", "org.bd",
      "com.ng", "net.ng", "org.ng", "edu.ng", "gov.ng",
      "com.ke", "co.ke", "or.ke",
      "com.do", "com.ec", "com.uy", "com.py", "com.bo", "com.gt",
      "com.sv", "com.ni", "com.hn", "com.pa", "com.pr",
      "co.id", "or.id", "ac.id", "web.id", "net.id",
      "co.cr", "co.ve", "co.ao", "co.mz", "co.tz", "co.ug", "co.zw"
    ).foreach(z => s.add(z): Unit)
    s
  }

  /** firstSignificantSubdomain / cutToFirstSignificantSubdomain
    * (reference `src/Functions/URL/ExtractFirstSignificantSubdomain.h`):
    * take domainWithoutWWW, strip a trailing dot, find the last three
    * dots; no dot → whole domain; one dot → leading token; otherwise
    * look the tail after the second-to-last dot up in the public-suffix
    * zones and pick the token one dot further left when it matches.
    * `cut = true` returns from the token start to the domain end
    * (yandex.com.tr) instead of the token alone (yandex). */
  def firstSignificant(u: UTF8String, cut: Boolean): UTF8String = {
    val full = UrlFuncs.domain(u, withoutWWW = true)
    val b = full.getBytes
    var dl = b.length
    if (dl == 0) return UTF8String.fromString("")
    if (b(dl - 1) == '.') dl -= 1
    var p0 = -1; var p1 = -1; var p2 = -1
    var i = 0
    while (i < dl) {
      if (b(i) == '.') { p2 = p1; p1 = p0; p0 = i }
      i += 1
    }
    val (start, tokenEnd) =
      if (p0 < 0) (0, dl)                          // no dot: whole domain
      else if (p1 < 0) (0, p0)                     // one dot: leading token
      else {
        val zone = new String(b, p1 + 1, dl - p1 - 1,
          java.nio.charset.StandardCharsets.UTF_8)
        if (significantZones.contains(zone)) (p2 + 1, p1)
        else (p1 + 1, p0)
      }
    UTF8String.fromBytes(b, start, (if (cut) dl else tokenEnd) - start)
  }
}

/** protocol(url) / netloc(url) / top_level_domain(url) — codegen'd
  * scanners dispatching to the matching [[UrlFuncs]] kernel. */
case class UrlPartExpr(child: Expression, part: String)
    extends UnaryExpression {

  require(Set("protocol", "netloc", "topLevelDomain").contains(part))

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    part match {
      case "protocol" => UrlFuncs.protocol(u)
      case "netloc" => UrlFuncs.netloc(u)
      case "topLevelDomain" => UrlFuncs.topLevelDomain(u)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlFuncs.$part($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlPartExpr =
    copy(child = newChild)
}

/** first_significant_subdomain(url) / cut_to_first_significant_subdomain. */
case class FirstSignificantSubdomainExpr(child: Expression, cut: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override protected def nullSafeEval(input: Any): Any =
    SubdomainFuncs.firstSignificant(input.asInstanceOf[UTF8String], cut)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SubdomainFuncs.firstSignificant($c, $cut)")

  override protected def withNewChildInternal(
      newChild: Expression): FirstSignificantSubdomainExpr =
    copy(child = newChild)
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
