package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization — the first dedup key of every web-scale corpus
  * (crawl pipelines dedupe by canonical URL before any content hash,
  * since the same page is re-fetched under casing/port/tracking-param/
  * fragment variants). Built entirely from codegen'd native string
  * expressions (regexp_extract/replace, split/filter/array_sort) — one
  * scan-stage projection, no UDF, nothing shuffled.
  *
  * Canonical form (RFC 3986 normalizations plus the conventional
  * search-engine ones):
  *   - scheme and host lowercased; userinfo-free hosts assumed
  *   - leading `www.` stripped from the host
  *   - default port stripped (`:443` for https, `:80` for http)
  *   - fragment dropped
  *   - duplicate slashes in the path collapsed; trailing slash stripped
  *     (except the root path, which becomes `/` even when absent)
  *   - tracking query params dropped (`utm_*`, `fbclid`, `gclid`,
  *     `msclkid`, `ref`); surviving params sorted bytewise and rejoined
  *     (param order is transport noise, not identity)
  */
object UrlOps {

  /** Params dropped from the canonical query string. */
  val trackingParamRe = "^(utm_[^=]*|fbclid|gclid|msclkid|ref)="

  /** Canonicalize an absolute http(s) URL column (see object doc). */
  def canonicalizeUrl(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*$", "")
    val scheme =
      lower(regexp_extract(noFrag, "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    val auth =
      lower(regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    val bare = regexp_replace(auth, "^www\\.", "")
    val host = when(scheme === "https", regexp_replace(bare, ":443$", ""))
      .when(scheme === "http", regexp_replace(bare, ":80$", ""))
      .otherwise(bare)
    val rest =
      regexp_extract(noFrag, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)", 1)
    val rawPath = regexp_extract(rest, "^([^?]*)", 1)
    val dedupSlash = regexp_replace(rawPath, "/{2,}", "/")
    // "(.+)/$" never matches the bare root "/", which stays as-is
    val noTrail = regexp_replace(dedupSlash, "(.+)/$", "$1")
    val path = when(noTrail === "", lit("/")).otherwise(noTrail)
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = array_join(
      array_sort(filter(split(query, "&"),
        p => !p.rlike(trackingParamRe) && p =!= lit(""))), "&")
    concat(scheme, lit("://"), host, path,
      when(kept === "", lit("")).otherwise(concat(lit("?"), kept)))
  }
}
