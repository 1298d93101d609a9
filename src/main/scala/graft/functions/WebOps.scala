package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus hygiene primitives (C4/CCNet-style): URL decomposition for
  * domain-level filtering, and PII detection/redaction for anonymization.
  *
  * Everything is pure Column algebra over regexes chosen to mean the same
  * thing in Java's engine (Spark) and RE2 (the DuckDB oracle): no
  * lookarounds, no backreferences, ASCII word boundaries only — so every
  * derived signal is hash-checkable end to end.
  */
object WebOps {

  /** Host of a URL: the authority between `scheme://` and the first
    * `/?#`, with any `user@` prefix and `:port` suffix stripped,
    * lowercased. Returns NULL for strings that don't parse as absolute
    * URLs (no scheme) — callers decide whether unparseable means drop.
    */
  def urlHost(url: Column): Column =
    lower(nullif(regexp_extract(
      url, "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^@/?#]*@)?([^:/?#]+)", 1), lit("")))

  /** Path component (leading slash included); empty path → "/". */
  def urlPath(url: Column): Column =
    when(urlHost(url).isNull, lit(null))
      .otherwise(coalesce(nullif(regexp_extract(
        url, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(/[^?#]*)", 1), lit("")), lit("/")))

  /** Registrable domain, approximated as the last two host labels
    * ("ads.tracker.example.com" → "example.com"). A faithful version
    * consults the public-suffix list (so "foo.co.uk" → "foo.co.uk", not
    * "co.uk"); the two-label rule is the standard lightweight stand-in
    * and is what the blocklist join keys on. Hosts with no dot (e.g.
    * "localhost") pass through unchanged.
    */
  def registrableDomain(host: Column): Column =
    coalesce(nullif(regexp_extract(host, "([^.]+\\.[^.]+)$", 1), lit("")), host)

  /** PII patterns — deliberately conservative (precision over recall):
    * the redaction pass must not mangle ordinary prose, and anything
    * higher-recall (names, addresses) needs a model, not a regex.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b"
  val Ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Count of matches of `re` in `text` (0 for no matches, NULL text →
    * NULL).
    */
  def matchCount(text: Column, re: String): Column =
    // group 0 explicitly: Spark's default group index is 1, which THROWS
    // on patterns with no capture group (DuckDB's default is already 0).
    // NULL guard: non-ANSI size(NULL) is the legacy -1, not NULL — the
    // oracle (and sanity) want NULL counts for NULL text.
    when(text.isNotNull,
      size(regexp_extract_all(text, lit(re), lit(0))).cast("long"))

  /** Redact emails → [EMAIL], then IPv4s → [IP], then phones → [PHONE].
    * Email first: its character class overlaps the numeric patterns, and
    * a fixed order keeps the result deterministic and oracle-matched.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "[EMAIL]"),
        Ipv4Re, "[IP]"),
      PhoneRe, "[PHONE]")
}
