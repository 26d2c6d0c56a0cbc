package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization for dedup keys — the public tracking-param
  * normalization every web-crawl pipeline applies before grouping by
  * URL (the rules are the published ClearURLs/uBlock tracking-param
  * lists' common core plus RFC 3986 §6 normalization):
  *
  *   1. drop the fragment (`#...`);
  *   2. lowercase the scheme and host (ONLY those — path/query case is
  *      significant per RFC 3986);
  *   3. strip one leading `www.` from the host;
  *   4. drop the default port (`:443` for https, `:80` for http) and a
  *      bare trailing `:`;
  *   5. drop tracking query params by NAME: any `utm_*`, plus
  *      fbclid, gclid, dclid, gbraid, wbraid, msclkid, twclid, igshid,
  *      yclid, mc_cid, mc_eid, ref_src, _ga — UNAMBIGUOUS tracker names
  *      only. Bare `ref` and `spm` are deliberately KEPT (ADVICE r16):
  *      both are semantic on real sites (GitHub `?ref=branch`,
  *      referrer-as-content params), and a dedup key that strips them
  *      over-merges genuinely distinct resources;
  *   6. sort surviving `k=v` params bytewise and rejoin with `&`
  *      (param order is not semantic for dedup; empty query drops `?`);
  *   7. normalize the path: empty -> `/`, one trailing `/` stripped
  *      unless the path IS `/`.
  *
  * Userinfo (`user:pw@`) is preserved verbatim (credentials are not
  * case-insensitive hostname material) with the host parsed after the
  * LAST `@`; IPv6 literals (`[...]`) lowercase like any host (RFC 5952
  * prefers lowercase hex) and split their port at the colon AFTER the
  * closing bracket. Inputs without `://` are returned unchanged (opaque
  * identifiers stay stable keys). Bytewise param sort == java String order on ASCII;
  * non-ASCII params sort by UTF-16 code unit, which diverges from UTF-8
  * byte order only beyond the BMP — state this if the corpus has
  * non-ASCII query strings.
  */
case class UrlCanonicalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"url_canonicalize requires a string argument, got ${child.dataType.catalogString}")
    else TypeCheckResult.TypeCheckSuccess

  override def dataType: DataType = StringType
  override def prettyName: String = "url_canonicalize"

  override def nullSafeEval(input: Any): Any =
    UrlCanonicalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.UrlCanonicalize.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): UrlCanonicalize =
    copy(child = newChild)
}

object UrlCanonicalize {

  /** Registry builder with the arity check (ADVICE r16): extra
    * arguments must fail loudly, not be silently ignored.
    */
  def forArgs(exprs: Seq[Expression]): UrlCanonicalize = {
    if (exprs.size != 1)
      throw new IllegalArgumentException(
        s"url_canonicalize takes (url); got ${exprs.size} arguments")
    UrlCanonicalize(exprs.head)
  }

  /** Exact-name tracking params (utm_* is a prefix rule, handled apart).
    * Unambiguous tracker names only — see scaladoc rule 5 for why bare
    * `ref`/`spm` are NOT here.
    */
  private val TrackingNames: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    Seq("fbclid", "gclid", "dclid", "gbraid", "wbraid", "msclkid", "twclid",
      "igshid", "yclid", "mc_cid", "mc_eid", "ref_src", "_ga")
      .foreach(s.add)
    s
  }

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val name = if (eq >= 0) param.substring(0, eq) else param
    name.startsWith("utm_") || TrackingNames.contains(name)
  }

  /** Referenced from generated code — keep public and stable. */
  def compute(url: UTF8String): UTF8String = {
    val raw = url.toString
    val schemeEnd = raw.indexOf("://")
    if (schemeEnd < 0) return url
    val scheme = raw.substring(0, schemeEnd).toLowerCase(java.util.Locale.ROOT)
    var rest = raw.substring(schemeEnd + 3)
    val hash = rest.indexOf('#')
    if (hash >= 0) rest = rest.substring(0, hash)

    // Authority runs to the first '/' or '?', whichever comes first.
    val slash = rest.indexOf('/')
    val quest = rest.indexOf('?')
    val cut =
      if (slash >= 0 && (quest < 0 || slash < quest)) slash
      else if (quest >= 0) quest
      else rest.length
    val auth = rest.substring(0, cut)
    val pq = rest.substring(cut)

    // Authority = [userinfo@]host[:port]. Userinfo (split at the LAST
    // '@' — earlier ones belong to the userinfo) is kept verbatim: it is
    // credential material, not a case-insensitive hostname. An IPv6
    // literal's brackets contain ':', so its port colon is the one AFTER
    // the closing ']'; a bracketed literal never carries 'www.'.
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at + 1) else ""
    val hostport = auth.substring(at + 1)
    val colon =
      if (hostport.startsWith("[")) {
        val close = hostport.indexOf(']')
        if (close >= 0 && close + 1 < hostport.length &&
          hostport.charAt(close + 1) == ':') close + 1
        else -1
      } else hostport.indexOf(':')
    var host = (if (colon >= 0) hostport.substring(0, colon) else hostport)
      .toLowerCase(java.util.Locale.ROOT)
    if (host.startsWith("www.")) host = host.substring(4)
    val port = if (colon >= 0) hostport.substring(colon + 1) else ""
    val keepPort = port.nonEmpty &&
      !(scheme == "https" && port == "443") && !(scheme == "http" && port == "80")

    val q = pq.indexOf('?')
    var path = if (q >= 0) pq.substring(0, q) else pq
    val query = if (q >= 0) pq.substring(q + 1) else ""
    if (path.isEmpty) path = "/"
    else if (path.length > 1 && path.endsWith("/")) path = path.substring(0, path.length - 1)

    val kept = new java.util.ArrayList[String]()
    if (query.nonEmpty) {
      var i = 0
      while (i <= query.length) {
        val amp = query.indexOf('&', i)
        val end = if (amp < 0) query.length else amp
        if (end > i) {
          val p = query.substring(i, end)
          if (!isTracking(p)) kept.add(p)
        }
        i = end + 1
      }
      java.util.Collections.sort(kept)
    }
    val sb = new java.lang.StringBuilder(raw.length)
    sb.append(scheme).append("://").append(userinfo).append(host)
    if (keepPort) sb.append(':').append(port)
    sb.append(path)
    if (!kept.isEmpty) {
      sb.append('?')
      var j = 0
      while (j < kept.size()) {
        if (j > 0) sb.append('&')
        sb.append(kept.get(j))
        j += 1
      }
    }
    UTF8String.fromString(sb.toString)
  }
}
