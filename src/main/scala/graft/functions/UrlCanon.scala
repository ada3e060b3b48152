package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `canonical_url(url)` — the full URL canonicalization contract of
  * [[graft.operators.UrlOps]] (scheme/host lowering, single-www
  * strip, scheme-default-port drop, fragment drop, tracking-param
  * removal, param sort, trailing-slash strip, NULL for anything
  * without a `scheme://host`) as ONE native single-pass parse.
  *
  * Why native: the Column formulation is ~10 independent
  * regexp_extract/regexp_replace passes plus a per-param rlike —
  * each one re-walks the string. The r12 settled bench read the
  * url family at ~0.9 s/row-set with the regex chain; one
  * character walk does the same work in a single traversal. The
  * SEMANTICS are pinned to the regex chain byte-for-byte:
  * UrlOpsSpec runs both implementations over the driver fixtures
  * plus an adversarial corpus and asserts equality, and the DuckDB
  * oracles keep replaying the documented regex contract — a
  * divergence fails both gates.
  *
  * Parsing rules (each mirrors one regex of the chain):
  *   - scheme: `^[A-Za-z][A-Za-z0-9+.-]*` immediately followed by
  *     `://`, lowercased; no match → NULL.
  *   - host[:port]: everything after `://` up to `/?#`, lowercased;
  *     a trailing `:<digits>` (the LAST colon, all-digit, non-empty
  *     tail — `:[0-9]+$`) splits off as the port STRING (kept
  *     verbatim, so `:0443` ≠ `:443`); then ONE leading `www.`
  *     strips. Empty host after the strip → NULL.
  *   - port survives unless (scheme, port) is (`https`, `443`) or
  *     (`http`, `80`).
  *   - path: from the end of host[:port] to the first `?` or `#`,
  *     original case, trailing `/` run stripped, empty → `/`.
  *   - query: present only when `?` precedes any `#`; split on `&`;
  *     empty params and tracking params (`^utm_[A-Za-z0-9_]*=`,
  *     `^gclid=`, `^fbclid=`, `^ref=` — case-sensitive, `=`
  *     required) drop; the rest sort in UTF8 BINARY order (matching
  *     Spark's array_sort and DuckDB's list_sort on VARCHAR) and
  *     rejoin with `&`; an emptied query loses its `?`.
  */
case class CanonicalUrl(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "canonical_url"

  override def nullSafeEval(input: Any): Any =
    UrlCanonData.canonicalUrl(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.UrlCanonData.canonicalUrl($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): CanonicalUrl =
    copy(child = newChild)
}

object UrlCanonData {

  private def isAlpha(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')
  private def isAlnum(c: Char): Boolean =
    isAlpha(c) || (c >= '0' && c <= '9')
  private def isSchemeChar(c: Char): Boolean =
    isAlnum(c) || c == '+' || c == '.' || c == '-'
  private def isDigit(c: Char): Boolean = c >= '0' && c <= '9'

  /** `^utm_[A-Za-z0-9_]*=` | `^gclid=` | `^fbclid=` | `^ref=` —
    * [[graft.operators.UrlOps.TrackingParamRe]] as a prefix test. */
  private def isTracking(p: String): Boolean = {
    if (p.startsWith("gclid=") || p.startsWith("fbclid=") ||
      p.startsWith("ref=")) return true
    if (!p.startsWith("utm_")) return false
    var i = 4
    val n = p.length
    while (i < n && (isAlnum(p.charAt(i)) || p.charAt(i) == '_')) i += 1
    i < n && p.charAt(i) == '='
  }

  /** One-pass canonicalization; null for anything without a parsable
    * `scheme://host`. See the class doc for the exact contract. */
  def canonicalUrl(raw: String): String = {
    if (raw == null) return null
    val n = raw.length
    // scheme
    if (n == 0 || !isAlpha(raw.charAt(0))) return null
    var i = 1
    while (i < n && isSchemeChar(raw.charAt(i))) i += 1
    if (i + 2 >= n || raw.charAt(i) != ':' || raw.charAt(i + 1) != '/' ||
      raw.charAt(i + 2) != '/') return null
    val scheme = raw.substring(0, i).toLowerCase(java.util.Locale.ROOT)
    // host[:port]
    val hostStart = i + 3
    var j = hostStart
    while (j < n && raw.charAt(j) != '/' && raw.charAt(j) != '?' &&
      raw.charAt(j) != '#') j += 1
    val hostPort = raw.substring(hostStart, j)
      .toLowerCase(java.util.Locale.ROOT)
    // port = trailing :<digits> (last colon, all-digit non-empty tail)
    var colon = hostPort.length - 1
    var allDigits = colon >= 0 && isDigit(hostPort.charAt(colon))
    while (colon >= 0 && hostPort.charAt(colon) != ':') {
      if (!isDigit(hostPort.charAt(colon))) allDigits = false
      colon -= 1
    }
    val hasPort = colon >= 0 && allDigits && colon < hostPort.length - 1
    val port = if (hasPort) hostPort.substring(colon + 1) else ""
    var host = if (hasPort) hostPort.substring(0, colon) else hostPort
    if (host.startsWith("www.")) host = host.substring(4)
    if (host.isEmpty) return null
    val defaultPort = (scheme == "https" && port == "443") ||
      (scheme == "http" && port == "80")
    // path: up to the first ? or #
    var k = j
    while (k < n && raw.charAt(k) != '?' && raw.charAt(k) != '#') k += 1
    var pathEnd = k
    while (pathEnd > j && raw.charAt(pathEnd - 1) == '/') pathEnd -= 1
    val path = if (pathEnd == j) "/" else raw.substring(j, pathEnd)
    // query: only when ? precedes any #
    var query = ""
    if (k < n && raw.charAt(k) == '?') {
      var qEnd = k + 1
      while (qEnd < n && raw.charAt(qEnd) != '#') qEnd += 1
      val rawQ = raw.substring(k + 1, qEnd)
      if (rawQ.nonEmpty) {
        val kept = new java.util.ArrayList[UTF8String]()
        var s = 0
        var e = 0
        val qn = rawQ.length
        while (s <= qn) {
          e = rawQ.indexOf('&', s)
          val end = if (e < 0) qn else e
          if (end > s) {
            val p = rawQ.substring(s, end)
            if (!isTracking(p)) kept.add(UTF8String.fromString(p))
          }
          s = end + 1
          if (e < 0) s = qn + 1
        }
        if (!kept.isEmpty) {
          // UTF8 binary order — what array_sort/list_sort use
          java.util.Collections.sort(kept)
          val sb = new java.lang.StringBuilder()
          var x = 0
          while (x < kept.size()) {
            if (x > 0) sb.append('&')
            sb.append(kept.get(x).toString)
            x += 1
          }
          query = sb.toString
        }
      }
    }
    val sb = new java.lang.StringBuilder(n + 2)
    sb.append(scheme).append("://").append(host)
    if (port.nonEmpty && !defaultPort) sb.append(':').append(port)
    sb.append(path)
    if (query.nonEmpty) sb.append('?').append(query)
    sb.toString
  }

  /** UTF8String adapter for codegen/eval (null in → null out). */
  def canonicalUrl(u: UTF8String): UTF8String = {
    if (u == null) return null
    val r = canonicalUrl(u.toString)
    if (r == null) null else UTF8String.fromString(r)
  }

  def canonical_url(u: Column): Column =
    ColumnBridge.column(CanonicalUrl(ColumnBridge.expression(u)))
}
