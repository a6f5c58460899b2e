package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * URL canonicalization and domain extraction for web-scale corpus curation:
 * URL-keyed dedup, per-domain capping/mixing, and domain-level quality
 * policies all need one canonical form per page first (the same page is
 * crawled as `HTTP://WWW.Site.com/a/`, `http://site.com:80/a?utm_source=x`,
 * `http://site.com/a#frag`, …).
 *
 * Everything here is a pure Column expression chain (regexp extract/replace,
 * split/filter/array_join) — whole-stage codegen, zero shuffle, scales
 * linearly like the rest of [[TextAnalysis]]. Composition points:
 * [[Dedup.exact]] on `url_norm` for URL-level dedup, [[Sampling.capPerGroup]]
 * on `url_domain` for per-domain caps.
 *
 * Normalization contract (absolute http(s)-style URLs):
 *  - fragment dropped; scheme and host lowercased; path/query case KEPT
 *    (paths are case-sensitive by RFC 3986);
 *  - leading `www.` prefixes and default ports (`:80` http, `:443` https)
 *    dropped, non-default ports kept;
 *  - `utm_*` tracking parameters dropped, other parameters kept in order;
 *  - trailing `/`s dropped from the path (`/a/` ≡ `/a`, `/` ≡ ``);
 *  - inputs with no `scheme://` pass through trimmed but otherwise
 *    untouched (opaque ids, relative links) — deterministic, never null.
 *
 * [[normalize]] is IDEMPOTENT (property-tested): canonical forms are
 * fixpoints, so re-normalizing an already-clean corpus is a no-op.
 */
object Urls {

  private val SchemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"

  /** Lowercased scheme, or empty string when the value has no `scheme://`. */
  def scheme(url: Column): Column =
    lower(regexp_extract(trim(url), SchemeRe, 1))

  /** Lowercased `host[:port]` authority (ports intact, `www.` intact). */
  def hostPort(url: Column): Column =
    lower(regexp_extract(trim(url), SchemeRe + "([^/?#]*)", 2))

  /** Lowercased host: authority minus any `:port` and leading `www.`
   *  prefixes (repeated — `www.www.x.com` canonicalizes like `x.com`, and
   *  normalization stays idempotent). */
  def host(url: Column): Column =
    regexp_replace(regexp_replace(hostPort(url), ":[0-9]+$", ""), "^(www\\.)+", "")

  /** Multi-label public-suffix rules, loaded once at class-load from the
   *  bundled resource `graft/public_suffixes.txt` — a curated snapshot of
   *  the public suffix list's dominant registry rules (~1000 entries: the
   *  full second-level registries of .uk/.il/.pl/.jp/.br/.cn/… including
   *  prefecture/province/state suffixes, plus a small private-hosting
   *  section where a subdomain is an independent publisher, e.g.
   *  `github.io`). The rules compile into the same static `isin`
   *  expression as before (Catalyst folds a large `isin` to a hash-set
   *  `InSet`, still whole-stage codegen, zero runtime lookups). Wildcard
   *  (`*.x`) and exception (`!y.x`) rules of a handful of small
   *  registries are not represented; extending coverage is one line in
   *  the resource file. */
  val PublicSuffixes: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffixes.txt")
    require(in != null, "graft/public_suffixes.txt missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    finally in.close()
  }
  private val twoLabelSuffixes = PublicSuffixes.filter(_.count(_ == '.') == 1)
  private val threeLabelSuffixes = PublicSuffixes.filter(_.count(_ == '.') == 2)

  /**
   * Registrable domain: the longest matching public suffix
   * ([[PublicSuffixes]]) plus one more label — `a.b.site.com` →
   * `site.com`, `shop.example.co.uk` → `example.co.uk`,
   * `cdn.assets.s3.amazonaws.com` → `assets.s3.amazonaws.com`.
   * Single-label hosts (e.g. `localhost`) and bare suffixes pass through.
   */
  def domain(url: Column): Column = {
    val h = host(url)
    val lastTwo = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val lastThree = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val lastFour = regexp_extract(h, "([^.]+(\\.[^.]+){3})$", 1)
    when(lastTwo === "", h)
      .when(lastThree.isin(threeLabelSuffixes: _*) && lastFour =!= "", lastFour)
      .when(lastThree.isin(threeLabelSuffixes: _*), h)
      .when(lastTwo.isin(twoLabelSuffixes: _*) && lastThree =!= "", lastThree)
      .otherwise(lastTwo)
  }

  /** Canonical URL per the contract above. */
  def normalize(url: Column): Column = {
    val u = trim(url)
    val noFrag = regexp_replace(u, "#.*", "")
    val sch = lower(regexp_extract(noFrag, SchemeRe, 1))
    val hp = lower(regexp_extract(noFrag, SchemeRe + "([^/?#]*)", 2))
    val hpNoDefault = when(sch === "http", regexp_replace(hp, ":80$", ""))
      .when(sch === "https", regexp_replace(hp, ":443$", ""))
      .otherwise(hp)
    val authority = regexp_replace(hpNoDefault, "^(www\\.)+", "")
    val rest = regexp_extract(noFrag, SchemeRe + "[^/?#]*([/?][^#]*)?", 2)
    val path = regexp_replace(regexp_extract(rest, "^([^?]*)", 1), "/+$", "")
    val query = regexp_extract(rest, "\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => !(p.startsWith("utm_") || p === ""))
    val queryNorm = array_join(kept, "&")
    val rebuilt = concat(sch, lit("://"), authority, path,
      when(queryNorm === "", lit("")).otherwise(concat(lit("?"), queryNorm)))
    when(sch === "", u).otherwise(rebuilt)
  }

  /**
   * Domain blocklist filtering — the UT1/URL-category-list pass of a web
   * curation pipeline: drop every page whose HOST or REGISTRABLE DOMAIN
   * (after the [[host]]/[[domain]] canonicalization: lowercased, port and
   * `www.` stripped) appears in the blocklist. Listing a registrable
   * domain blocks the whole site including subdomains-by-way-of-domain;
   * listing a full host (e.g. `bad.example.com`) blocks only that host.
   *
   * 100 TB shape: real category lists run to millions of entries, far past
   * what an `isin` literal plan can carry — the list becomes a broadcast
   * table (ONE copy per executor) and membership is two broadcast
   * anti-joins (host key, then domain key). The corpus never shuffles and
   * text never moves; entries are lowercased/deduped once on the tiny side.
   */
  def dropBlockedDomains(df: DataFrame, urlCol: String, blocked: DataFrame,
      entryCol: String): DataFrame = {
    val b = broadcast(
      blocked.select(lower(trim(col(entryCol))).as("__graft_blocked")).distinct())
    df.withColumn("__graft_bl_host", host(col(urlCol)))
      .withColumn("__graft_bl_dom", domain(col(urlCol)))
      .join(b, col("__graft_bl_host") === col("__graft_blocked"), "left_anti")
      .join(b, col("__graft_bl_dom") === col("__graft_blocked"), "left_anti")
      .drop("__graft_bl_host", "__graft_bl_dom")
  }

  /** [[dropBlockedDomains]] for an in-memory list (tests, small policies). */
  def dropBlockedDomains(df: DataFrame, urlCol: String,
      blocked: Seq[String]): DataFrame = {
    if (blocked.isEmpty) df
    else {
      val spark = df.sparkSession
      import spark.implicits._
      dropBlockedDomains(df, urlCol, blocked.toDF("entry"), "entry")
    }
  }

  /** Adds `url_norm`, `url_host`, `url_domain`, `url_scheme` next to
   *  `urlCol` — the columns downstream dedup/capping/mixing key on. */
  def withUrlParts(df: DataFrame, urlCol: String): DataFrame = {
    val u = col(urlCol)
    df.withColumn("url_norm", normalize(u))
      .withColumn("url_host", host(u))
      .withColumn("url_domain", domain(u))
      .withColumn("url_scheme", scheme(u))
  }
}
