package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * URL canonicalization — the normalization pass that runs BEFORE exact
 * URL dedup in a web-corpus pipeline: the same page arrives as
 * `HTTP://WWW.Site.com/a?utm_source=x&id=1#frag` and
 * `http://www.site.com/a?id=1`, and byte-level dedup treats them as
 * distinct documents unless the URL is normalized first (the same
 * role [[TextOps.cleanText]] plays for body text).
 *
 * Rules (the common subset of the crawl-dedup folklore, chosen to be
 * expressible as a pure codegen'd expression chain on BOTH engines —
 * no UDF, no java.net.URI):
 *  - scheme and host lowercase (they are case-insensitive per RFC 3986;
 *    the path is NOT touched — it is case-sensitive; neither is the
 *    userinfo before the last '@' in the authority — credentials are
 *    case-sensitive, and folding them would merge two URLs differing
 *    only in credential case into one dedup key AND corrupt the
 *    canonical string),
 *  - fragment stripped (never sent to the server),
 *  - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`),
 *  - remaining query parameters sorted by byte order (param order is
 *    almost always insignificant; sorting makes it canonical),
 *  - an emptied query loses its `?`.
 *
 * Scale: a pure projection — streams through the scan with no shuffle
 * and composes with the dedup families at zero extra passes. (The
 * param filter/sort lambdas are interpreted per row — over a handful
 * of array elements — so the Project sits just outside whole-stage
 * codegen; the regex/concat work is codegen'd. Pinned in PlanSpec.)
 */
object Urls {

  def canonicalizeUrl(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    // the authority may carry userinfo (user:pw@host:port); only the
    // part after the LAST '@' (host[:port]) is case-insensitive. The
    // greedy '^(.*@)' grabs through the final '@' (empty when absent),
    // '([^@]*)$' the remainder — so only host:port is folded.
    val authority = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    val host = concat(regexp_extract(authority, "^(.*@)", 1),
      lower(regexp_extract(authority, "([^@]*)$", 1)))
    val path = regexp_extract(url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // strip the fragment BEFORE looking for the query: a '?' inside a
    // fragment ('#!?page=2', fragment-router URLs) is client-side junk,
    // not a query string
    val noFrag = regexp_extract(url, "^([^#]*)", 1)
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = array_join(
      array_sort(filter(split(query, "&"), p =>
        length(p) > 0 && !p.startsWith("utm_") &&
          !p.startsWith("fbclid=") && !p.startsWith("gclid="))),
      "&")
    // a URL this parser can't decompose (no scheme://, relative,
    // mailto:) passes through UNCHANGED — canonicalizing it to the
    // degenerate '://…' would merge arbitrary unparseable URLs into one
    // dedup key, silently dropping distinct documents
    when(length(scheme) === 0, url).otherwise(
      concat(scheme, lit("://"), host, path,
        when(length(params) > 0, concat(lit("?"), params)).otherwise(lit(""))))
  }
}
