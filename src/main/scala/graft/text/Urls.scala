package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL/domain curation primitives — the provenance axis of web-corpus
  * filtering (domain blocklists, per-domain caps, source attribution all
  * key on the registered domain). Every pattern is dialect-neutral
  * regex (char classes, optional groups, anchors only) so Java codegen
  * and an RE2-based oracle match byte-for-byte; every operator is a pure
  * per-row map — link extraction parallelizes embarrassingly and only
  * the per-domain rollup state reaches an exchange. */
object Urls {

  /** http(s) links only — ftp/mailto/bare hostnames are not training
    * provenance and must NOT match. Lowercase-normalized input expected
    * (apply to `lower(text)`); conservative path charset. */
  private val UrlRe = "https?://[a-z0-9.-]+(?:/[a-z0-9/?=._-]*)?"

  /** All http(s) URLs in `textCol` (lowercased first), document order. */
  def extractUrls(textCol: Column): Column =
    regexp_extract_all(lower(textCol), lit(UrlRe), lit(0))

  /** The host part of a URL ("" when the URL is malformed). */
  def host(urlCol: Column): Column =
    regexp_extract(urlCol, "https?://([a-z0-9.-]+)", 1)

  /** Last-two-label registered-domain heuristic ("cdn.assets-1.net" →
    * "assets-1.net"). A public-suffix list refines this in production;
    * the two-label rule is the engine-portable core. */
  def registeredDomain(hostCol: Column): Column =
    regexp_extract(hostCol, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)
}
