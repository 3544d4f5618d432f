package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus pipelines (the C4 / CCNet-style
  * pre-dedup step: two crawls of the same page under cosmetically
  * different URLs must collapse to one key before any exact or fuzzy
  * dedup runs).
  *
  * Canonical form, applied in order:
  *   - scheme and host lowercased; a leading `www.` label dropped
  *   - the scheme's default port stripped (`:80` http, `:443` https);
  *     any other explicit port kept
  *   - trailing slashes stripped from the path; an empty path becomes `/`
  *   - tracking parameters dropped (`utm_*`, `fbclid`, `gclid`, `ref`),
  *     the survivors sorted bytewise and re-joined — parameter order is
  *     serialization noise, not identity
  *   - the fragment dropped (never sent to the server)
  *
  * Everything is built from codegen'd native functions (regexp over the
  * RFC 3986 component grammar + higher-order array ops for the query
  * string) — no UDF, so the canonicalization inlines into the scan
  * projection and survives whole-stage codegen. Inputs that do not look
  * like `scheme://authority...` canonicalize to the degenerate
  * `://`-prefixed form rather than throwing; corpus pipelines filter
  * non-URLs upstream.
  */
object UrlFunctions {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val AuthRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val PathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  /** Tracking params dropped by canonicalization (public lists: Google
    * Analytics utm_*, Facebook fbclid, Google Ads gclid, bare ref). */
  private val TrackingRe = "^(utm_[^=]*|fbclid|gclid|ref)(=|$)"

  def urlScheme(url: Column): Column =
    lower(regexp_extract(url, SchemeRe, 1))

  /** Lowercased host with the leading `www.` label and any explicit
    * port removed. */
  def urlHost(url: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(url, AuthRe, 1)), ":[0-9]+$", ""),
      "^www\\.", "")

  /** Registered-domain approximation: the last two labels of the host
    * (`news3.example.com` -> `example.com`). A real pipeline consults the
    * public-suffix list for multi-label suffixes (`.co.uk`); two labels
    * is the standard approximation when the list is not shipped. */
  def urlDomain(url: Column): Column = {
    val labels = split(urlHost(url), "\\.")
    when(size(labels) >= 2,
      concat(element_at(labels, -2), lit("."), element_at(labels, -1)))
      .otherwise(urlHost(url))
  }

  /** Canonical query string: tracking params out, empty parts out,
    * survivors bytewise-sorted, `&`-joined (empty when nothing survives). */
  def canonicalQuery(url: Column): Column = {
    val q = regexp_extract(url, "\\?([^#]*)", 1)
    val kept = filter(split(q, "&"),
      p => p =!= "" && !p.rlike(TrackingRe))
    array_join(array_sort(kept), "&")
  }

  /** Full canonical URL (see object doc for the exact normal form). */
  def canonicalUrl(url: Column): Column = {
    val scheme = urlScheme(url)
    val auth = lower(regexp_extract(url, AuthRe, 1))
    val port = regexp_extract(auth, ":([0-9]+)$", 1)
    val host = urlHost(url)
    val defaultPort = (scheme === "http" && port === "80") ||
      (scheme === "https" && port === "443")
    val authority = concat(host,
      when(port =!= "" && !defaultPort, concat(lit(":"), port))
        .otherwise(lit("")))
    val rawPath = regexp_replace(
      regexp_extract(url, PathRe, 1), "/+$", "")
    val path = when(rawPath === "", lit("/")).otherwise(rawPath)
    val cq = canonicalQuery(url)
    concat(scheme, lit("://"), authority, path,
      when(cq === "", lit("")).otherwise(concat(lit("?"), cq)))
  }
}
