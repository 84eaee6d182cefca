package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus curation — the blocking keys of
  * per-domain caps, URL-level dedup and source mixing (every large crawl
  * pipeline caps documents per registrable domain and dedups on a
  * canonical URL before content-level dedup ever runs).
  *
  * All pure codegen'd Column regex math (RE2-portable patterns, no
  * lookbehind/backrefs), so the DuckDB oracle replays every step and the
  * functions compose into scans without UDF boundaries. Non-URL input
  * (no `scheme://`) yields NULL rather than a half-parsed guess.
  *
  * The reference has no URL surface (its payloads are field-level Kafka
  * messages) — this is part of the declared training-data extension
  * inventory.
  */
object UrlOps {

  private val schemePrefix = "^[a-zA-Z][a-zA-Z0-9+.-]*://"

  /** Lowercased scheme, or NULL when the string has no `scheme://`. */
  def urlScheme(c: Column): Column = {
    val s = regexp_extract(c, s"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1)
    when(s === "", lit(null)).otherwise(lower(s))
  }

  /** Lowercased host: authority minus userinfo and port. NULL for non-URLs
    * and for bracketed IPv6 authorities (`http://[::1]:8080/x`) — the
    * colon-heavy bracket form would otherwise truncate to garbage (`[`);
    * IPv6 literals are not registrable-domain material, so the whole chain
    * (host → registrableDomain → normalize) treats them as unparseable.
    */
  def urlHost(c: Column): Column = {
    val h = regexp_extract(c, s"$schemePrefix(?:[^/?#]*@)?([^/:?#]+)", 1)
    when(h === "" || h.startsWith("["), lit(null)).otherwise(lower(h))
  }

  /** Two-level public suffixes this resolver recognizes — a pragmatic,
    * documented SUBSET of the Mozilla Public Suffix List (the full PSL is
    * a ~15k-entry data file; shipping and refreshing it is a deployment
    * concern, and these cover the overwhelming share of multi-level-suffix
    * hosts in web crawls). Hosts under an unlisted multi-level suffix
    * over-collapse to two labels — a conservative error for capping
    * (caps too aggressively, never too loosely).
    */
  val twoLevelSuffixes: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "org.nz", "net.nz",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "com.br", "org.br", "net.br", "gov.br",
    "com.cn", "org.cn", "net.cn", "gov.cn",
    "co.in", "org.in", "net.in", "gov.in",
    "com.mx", "org.mx", "com.tr", "org.tr", "com.sg", "com.hk",
    "co.za", "org.za", "co.kr", "or.kr")

  /** Registrable domain (site key for per-domain caps): the last two host
    * labels, or three when the last two are a recognized two-level public
    * suffix ([[twoLevelSuffixes]]). `sub.shop.co.uk` → `shop.co.uk`;
    * `cdn.example.com` → `example.com`; a bare suffix or single label
    * returns itself.
    */
  def registrableDomain(host: Column): Column = {
    val two = regexp_extract(host, "([^.]+\\.[^.]+)$", 1)
    val three = regexp_extract(host, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    when(host.isNull, lit(null))
      .when(two.isin(twoLevelSuffixes: _*) && three =!= "", three)
      .when(two =!= "", two)
      .otherwise(host)
  }

  /** Registrable-domain BLOCKLIST filter — the crawl-curation gatekeeper
    * (spam/adult/SEO-farm domain lists are the first filter every web
    * corpus applies): drop rows whose URL's registrable domain appears in
    * the list. The blocklist is config-sized (thousands to low millions of
    * domains), so it rides a BROADCAST anti-join — the corpus never
    * shuffles; matching is on [[registrableDomain]] so `a.spam.com` and
    * `b.spam.com` both fall to the `spam.com` entry.
    */
  def filterBlockedDomains(
      df: org.apache.spark.sql.DataFrame,
      urlCol: Column,
      blocklist: org.apache.spark.sql.DataFrame,
      domainCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions.broadcast
    val dom = registrableDomain(urlHost(urlCol))
    df.join(broadcast(blocklist.select(lower(col(domainCol)).as("_blocked"))),
        dom === col("_blocked"), "left_anti")
  }

  /** Canonical URL (crawl-canonicalizer semantics): lowercase scheme and
    * host, strip userinfo (crawl canonicalizers drop it — it is never a
    * content key), strip the default port (`:80` for http, `:443` for
    * https), strip the fragment, and give path-less URLs the `/` path.
    * Query strings are KEPT (they select content); NULL for non-URLs.
    */
  def urlNormalize(c: Column): Column = {
    val scheme = urlScheme(c)
    val hostPort = lower(regexp_extract(c, s"$schemePrefix(?:[^/?#]*@)?([^/?#]*)", 1))
    val noDefault = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .when(scheme === "https", regexp_replace(hostPort, ":443$", ""))
      .otherwise(hostPort)
    val rest = regexp_replace(regexp_replace(c, s"$schemePrefix[^/?#]*", ""), "#.*$", "")
    // Path-less means no '/' BEFORE the query too: `http://h?q=1` and
    // `http://h/?q=1` are the same resource and must canonicalize alike.
    val path = when(rest === "", lit("/"))
      .when(rest.startsWith("?"), concat(lit("/"), rest))
      .otherwise(rest)
    // Bracketed IPv6 authorities are unparseable across the whole chain
    // (see urlHost) — NULL here too, not a half-normalized form.
    when(scheme.isNull || hostPort.startsWith("["), lit(null))
      .otherwise(concat(scheme, lit("://"), noDefault, path))
  }

  /** All `href="…"` targets of an HTML document, in document order — the
    * link-extraction half of a web-graph pipeline (outlinks → registrable
    * domains → [[graft.operators.Graph]] analytics). One RE2-portable
    * `regexp_extract_all` (group 1), codegen'd, shuffle-free; unquoted or
    * single-quoted hrefs are out of contract (the crawl-normalization
    * layer quotes attributes before this point).
    */
  def extractHrefs(html: Column): Column =
    regexp_extract_all(html, lit("href=\"([^\"]*)\""), lit(1))
}
