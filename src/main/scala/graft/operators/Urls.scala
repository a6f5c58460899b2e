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

  /** Leading-`www.` strip pattern: drops repeated `www.` prefixes
   *  (`www.www.x.com` canonicalizes like `x.com`) but only while at least
   *  two labels remain — `www.ck` (a PSL-exception registrable domain:
   *  the Cook Islands' main site) must NOT collapse to the bare TLD `ck`.
   *  The lookahead keeps the replace idempotent. */
  private val WwwStrip = "^(www\\.)+(?=[^.]+\\.)"

  /** Lowercased host: authority minus any `:port` and leading `www.`
   *  prefixes (see [[WwwStrip]]). */
  def host(url: Column): Column =
    regexp_replace(regexp_replace(hostPort(url), ":[0-9]+$", ""), WwwStrip, "")

  /** Multi-label public-suffix rules, loaded once at class-load from the
   *  bundled resource `graft/public_suffixes.txt` — a curated snapshot of
   *  the public suffix list's dominant registry rules (~1100 entries: the
   *  full second-level registries of .uk/.il/.pl/.jp/.br/.cn/… including
   *  prefecture/province/state suffixes, plus a small private-hosting
   *  section where a subdomain is an independent publisher, e.g.
   *  `github.io`), in the list's own syntax: literal rules, wildcard
   *  rules (`*.x` — every single label directly under `x` is a public
   *  suffix), and exception rules (`!y.x` — `y.x` is NOT a suffix despite
   *  a covering wildcard; it is itself a registrable domain). The rules
   *  compile into one static `when`/`isin` chain (Catalyst folds a large
   *  `isin` to a hash-set `InSet`, still whole-stage codegen, zero
   *  runtime lookups); extending coverage is one line in the resource
   *  file. */
  val PublicSuffixes: Seq[String] = {
    val in = getClass.getResourceAsStream("/graft/public_suffixes.txt")
    require(in != null, "graft/public_suffixes.txt missing from classpath")
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .map(_.trim).filter(l => l.nonEmpty && !l.startsWith("#")).toVector
    finally in.close()
  }
  private def labels(s: String): Int = s.count(_ == '.') + 1
  private val literalRules = PublicSuffixes.filter(r => !r.startsWith("*.") && !r.startsWith("!"))
  private val twoLabelSuffixes = literalRules.filter(labels(_) == 2)
  private val threeLabelSuffixes = literalRules.filter(labels(_) == 3)
  // wildcard BASES by label count: `*.ck` → base "ck" (suffix = 2 labels),
  // `*.kobe.jp` → base "kobe.jp" (suffix = 3), `*.compute.amazonaws.com`
  // → base (suffix = 4)
  private val wildcardBases = PublicSuffixes.filter(_.startsWith("*.")).map(_.drop(2))
  private val wild1 = wildcardBases.filter(labels(_) == 1)
  private val wild2 = wildcardBases.filter(labels(_) == 2)
  private val wild3 = wildcardBases.filter(labels(_) == 3)
  // exception NAMES: the name is itself a registrable domain
  private val exceptionNames = PublicSuffixes.filter(_.startsWith("!")).map(_.drop(1))
  private val exc2 = exceptionNames.filter(labels(_) == 2)
  private val exc3 = exceptionNames.filter(labels(_) == 3)

  /** `c ∈ set`, folding the empty set to false (isin of nothing). */
  private def inSet(c: Column, set: Seq[String]): Column =
    if (set.isEmpty) lit(false) else c.isin(set: _*)

  /**
   * Registrable domain per the public suffix list algorithm: the longest
   * matching rule wins, exception rules beat wildcards — `a.b.site.com` →
   * `site.com`, `shop.example.co.uk` → `example.co.uk`, `a.b.ck` →
   * `a.b.ck` (wildcard `*.ck`), `sub.city.kobe.jp` → `city.kobe.jp`
   * (exception `!city.kobe.jp` under `*.kobe.jp`). Single-label hosts
   * (e.g. `localhost`) and bare suffixes pass through.
   */
  def domain(url: Column): Column = {
    val h = host(url)
    val tld = regexp_extract(h, "([^.]+)$", 1)
    val lastTwo = regexp_extract(h, "([^.]+\\.[^.]+)$", 1)
    val lastThree = regexp_extract(h, "([^.]+\\.[^.]+\\.[^.]+)$", 1)
    val lastFour = regexp_extract(h, "([^.]+(\\.[^.]+){3})$", 1)
    val lastFive = regexp_extract(h, "([^.]+(\\.[^.]+){4})$", 1)
    when(lastTwo === "", h)
      // exceptions first (they defeat any covering wildcard): the name
      // itself is the registrable domain of every host at or under it
      .when(inSet(lastTwo, exc2), lastTwo)
      .when(inSet(lastThree, exc3), lastThree)
      // wildcard 3-label base → 4-label suffix → 5-label registrable
      .when(inSet(lastThree, wild3) && lastFive =!= "", lastFive)
      .when(inSet(lastThree, wild3) && lastFour =!= "", h) // bare wildcard suffix
      // wildcard 2-label base → 3-label suffix → 4-label registrable
      .when(inSet(lastTwo, wild2) && lastFour =!= "", lastFour)
      .when(inSet(lastTwo, wild2) && lastThree =!= "", h)
      // literal 3-label suffixes
      .when(lastThree.isin(threeLabelSuffixes: _*) && lastFour =!= "", lastFour)
      .when(lastThree.isin(threeLabelSuffixes: _*), h)
      // wildcard 1-label base → 2-label suffix → 3-label registrable
      .when(inSet(tld, wild1) && lastThree =!= "", lastThree)
      .when(inSet(tld, wild1), h) // ≥2 labels here, so `x.ck` is a bare suffix
      // literal 2-label suffixes
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
    val authority = regexp_replace(hpNoDefault, WwwStrip, "")
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

  /** Canonical-URL dedup — the first dedup pass of every crawl pipeline:
   *  documents whose URLs [[normalize]] to the same canonical form are one
   *  page fetched many ways (scheme/host case, `www.`, default ports,
   *  tracking params, fragments, trailing slash), and only one survives.
   *  Survivor = lowest `keepBy` (default: the id — "first crawled wins"
   *  under monotonic ids); `url_norm` rides along on the output. One hash
   *  exchange on the canonical URL; the normalization itself is the pure
   *  codegen chain of [[normalize]], so the corpus moves exactly once. */
  def dropDuplicateUrls(
      df: DataFrame,
      idCol: String,
      urlCol: String,
      keepBy: Seq[Column] = Nil): DataFrame = {
    val order = if (keepBy.nonEmpty) keepBy :+ col(idCol).asc else Seq(col(idCol).asc)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("url_norm")).orderBy(order: _*)
    df.withColumn("url_norm", normalize(col(urlCol)))
      .withColumn("__url_rn", row_number().over(w))
      .filter(col("__url_rn") === 1)
      .drop("__url_rn")
  }
}
