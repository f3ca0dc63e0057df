package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the crawl-dedup primitive that pairs with
  * [[Html]]: a web corpus keyed by raw URL over-counts (case, default
  * ports, fragments, tracking params, param order all vary per fetch),
  * so exact dedup and the S2 hash cache both want one canonical form.
  *
  * The rule set is FIXED and documented (each is the standard
  * RFC 3986 §6 normalization or the universal crawler convention):
  *  1. scheme and host lowercase (path case is significant — kept);
  *  2. default ports strip (`:80` for http, `:443` for https);
  *  3. the fragment drops (never sent to the server);
  *  4. tracking params drop: names starting `utm_`, plus `fbclid` and
  *     `gclid`;
  *  5. remaining query params sort bytewise (param ORDER is
  *     server-insignificant in practice; sorting makes equal
  *     param-sets equal strings);
  *  6. a trailing slash strips from a non-root path;
  *  7. an emptied query drops its `?`.
  *
  * Scale shape: a per-row column expression — zero shuffle, no UDF.
  * The param filter/sort ride Spark's higher-order functions
  * (CodegenFallback, but over a handful of short tokens per row — not
  * a hot fold over document text; the SimHash/DSIR native-kernel rule
  * targets per-token corpus passes, not per-row metadata). */
object UrlOps {

  private val trackingRe = "^(utm_[^=]*|fbclid|gclid)(=.*)?$"

  def canonicalizeUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val scheme = lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val hostPort = lower(regexp_extract(noFrag, "^[^:/?#]+://([^/?#]+)", 1))
    val host = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rawPath = regexp_extract(noFrag, "^[^:/?#]+://[^/?#]+([^?#]*)", 1)
    val path = regexp_replace(rawPath, "(.)/$", "$1") // non-root trailing slash
    val query = regexp_extract(noFrag, "\\?([^#]*)", 1)
    val params = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(trackingRe))
    val sortedQ = array_join(array_sort(params), "&")
    // a URL without "://" is left untouched (not a canonicalizable
    // absolute URL — less cleaning, never a mangled key)
    when(scheme === "", url).otherwise(concat(
      scheme, lit("://"), host,
      when(path === "", lit("")).otherwise(path),
      when(sortedQ === "", lit("")).otherwise(concat(lit("?"), sortedQ))))
  }
}
