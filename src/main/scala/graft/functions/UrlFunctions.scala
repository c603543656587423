package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the web-corpus prep step BEFORE any URL-keyed
  * dedup or join: the same page arrives as `HTTP://Example.COM:80/a?b=1`,
  * `http://example.com/a?utm_source=x&b=1`, and `http://example.com/a?b=1#frag`,
  * and un-canonicalized keys make every downstream exact-dedup miss.
  *
  * Canonical form applied (the conservative, reversibility-preserving
  * subset of RFC 3986 normalization plus tracking-param stripping):
  *   - scheme and host lowercased (path/query case preserved)
  *   - userinfo (user:pass@) dropped — credentials are not part of the
  *     resource identity and don't belong in a corpus key
  *   - default ports stripped (:80 for http, :443 for https)
  *   - fragment dropped (including any '?' INSIDE the fragment — the
  *     query is extracted from the pre-fragment part only)
  *   - query parameters: tracking params removed (utm_*, fbclid,
  *     gclid), the rest SORTED for order-insensitive equality, empty
  *     query dropped
  *   - trailing slash on a non-root path dropped
  *
  * Everything is composed from Spark's codegen'd string/array
  * built-ins (regexp_extract, split, filter, array_sort, concat_ws) —
  * no UDF, stays in whole-stage codegen, and every step has an exact
  * DuckDB twin (string_split, list_filter, list_sort, list_aggregate)
  * so oracles verify the normalization bit-for-bit.
  */
object UrlFunctions {
  private val TrackingRe = "^(utm_[a-zA-Z0-9_]*|fbclid|gclid)="

  /** Canonicalize a URL column. Strings that do not look like
    * scheme://... pass through unchanged (conservative: never corrupt
    * a non-URL).
    */
  def canonicalizeUrl(u: Column): Column = {
    val scheme   = lower(regexp_extract(u, "^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    // userinfo ('user:pass@host') is DROPPED: credentials don't identify
    // the resource (and don't belong in a corpus key); stripping through
    // the last '@' also keeps the host/port split from landing on the
    // password's ':'
    val hostPort = regexp_extract(
      regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1), "([^@]*)$", 1)
    val host     = lower(regexp_extract(hostPort, "^([^:]*)", 1))
    val port     = regexp_extract(hostPort, ":([0-9]+)$", 1)
    val keepPort = port =!= "" &&
      !(scheme === "http" && port === "80") &&
      !(scheme === "https" && port === "443")
    val hostOut = concat(host, when(keepPort, concat(lit(":"), port)).otherwise(lit("")))
    val path = regexp_extract(u, "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    // non-root trailing slash dropped; empty path stays empty
    val pathOut = when(
      path =!= "/" && path.endsWith("/"),
      path.substr(lit(1), length(path) - 1)
    ).otherwise(path)
    // the query must come from the PRE-fragment part: a first-'?'
    // extraction over the whole URL would promote fragment content into
    // a query string ('http://h/p#sec?b=1' has NO query)
    val query = regexp_extract(regexp_extract(u, "^([^#]*)", 1), "\\?(.*)$", 1)
    val kept = array_sort(
      filter(split(query, "&"), p => !(p.rlike(TrackingRe) || p === ""))
    )
    val queryOut = when(size(kept) > 0, concat(lit("?"), concat_ws("&", kept)))
      .otherwise(lit(""))
    val rebuilt = concat(scheme, lit("://"), hostOut, pathOut, queryOut)
    when(u.rlike("^[a-zA-Z][a-zA-Z0-9+.-]*://"), rebuilt).otherwise(u)
  }
}
