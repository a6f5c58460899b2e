package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * robots.txt (RFC 9309) parsing and URL admission — the crawl-politeness
 * gate every web-corpus pipeline needs before fetching or before keeping
 * a crawled page whose origin disallowed it.
 *
 * [[parseRules]] turns (host, robots-body) rows into a flat RULES table —
 * line classification, group assembly (consecutive `User-agent` lines
 * head a group; rules bind to the nearest group above), comment/unknown-
 * directive skipping, and the pattern→regex compilation (`*` → any run,
 * trailing `$` → end anchor, everything else literal) all happen here as
 * pure column expressions over one per-host line window.
 *
 * [[evaluate]] admits URLs under the RFC match rules: the group set is
 * the product-token exact match for the caller's agent when one exists,
 * else the `*` groups; among matching rules the LONGEST pattern wins and
 * `Allow` beats `Disallow` on equal length; no matching rule (or no
 * rules at all for the host) ⇒ allowed. Empty `Disallow:` matches
 * nothing (the classic "allow everything" idiom).
 *
 * Scale shape: robots bodies are small and per-host; parsing windows on
 * host (ONE narrow exchange of lines), and evaluation joins URLs to
 * their host's rules — a rules table is tiny relative to a URL corpus,
 * so Spark broadcasts it and the URL side never shuffles (spec-gated).
 * Everything is codegen'd builtins; no UDFs.
 */
object Robots {

  /** (host, group_id, agent, allow, pattern, pattern_len, regex) — one row
   *  per (group agent × rule). */
  def parseRules(df: DataFrame, hostCol: String, bodyCol: String): DataFrame = {
    val lines = df
      .select(col(hostCol).as("host"),
        posexplode(split(col(bodyCol), "\n")).as(Seq("line_no", "raw")))
      // strip comments and trailing CR, trim
      .withColumn("line", trim(regexp_replace(col("raw"), "#.*$", "")))
      .withColumn("directive", lower(trim(regexp_extract(col("line"), "^([^:]+):", 1))))
      .withColumn("value", trim(regexp_extract(col("line"), "^[^:]+:(.*)$", 1)))
      .filter(col("directive").isin("user-agent", "allow", "disallow"))
    val w = Window.partitionBy(col("host")).orderBy(col("line_no"))
    // a UA line STARTS a group iff the previous kept line is not a UA line
    val grouped = lines
      .withColumn("is_ua", col("directive") === "user-agent")
      .withColumn("prev_ua", lag(col("is_ua"), 1, false).over(w))
      .withColumn("starts", col("is_ua") && !col("prev_ua"))
      .withColumn("group_id", sum(when(col("starts"), 1).otherwise(0)).over(w))
      .filter(col("group_id") > 0) // rules before any User-agent line bind nowhere
    val agents = grouped.filter(col("is_ua"))
      .select(col("host"), col("group_id"), lower(col("value")).as("agent"))
    val rules = grouped.filter(!col("is_ua"))
      .select(col("host"), col("group_id"),
        (col("directive") === "allow").as("allow"), col("value").as("pattern"))
      .withColumn("pattern_len", length(col("pattern")))
      .withColumn("regex", patternRegex(col("pattern")))
    // LEFT join: a group whose agent line is followed by no rules still
    // exists per RFC 9309 §2.2.1 ("matched empty group" = allow all) — it
    // survives as one marker row with null rule fields so [[evaluate]]'s
    // exact-group detection sees it and suppresses the `*` fallback
    agents.join(rules, Seq("host", "group_id"), "left")
      .select(col("host"), col("group_id"), col("agent"),
        col("allow"), col("pattern"), col("pattern_len"), col("regex"))
  }

  /** RFC 9309 path-pattern → Java/RE2 regex: escape regex metacharacters,
   *  `*` → `.*`, a TRAILING `$` → end anchor; anchored at the start. An
   *  empty pattern compiles to a never-matching regex (empty Disallow =
   *  allow all). */
  private def patternRegex(pattern: Column): Column = {
    val endAnchored = pattern.endsWith("$")
    val body = when(endAnchored, pattern.substr(lit(1), length(pattern) - lit(1)))
      .otherwise(pattern)
    val escaped = regexp_replace(body, "([.^+?(){}\\[\\]|\\\\$])", "\\\\$1")
    val wild = regexp_replace(escaped, "\\*", ".*")
    when(length(pattern) === 0, lit("(?!)")) // never matches a path
      .otherwise(concat(lit("^"), wild, when(endAnchored, lit("$")).otherwise(lit(""))))
  }

  /**
   * Admission verdict per URL for `userAgent`: adds `allowed` plus the
   * winning `matched_pattern` (null = default allow). URLs are matched on
   * [[Urls.host]] and the PATH part (query string included per RFC;
   * scheme/host stripped; missing path ⇒ "/").
   */
  def evaluate(
      urls: DataFrame,
      urlCol: String,
      rules: DataFrame,
      userAgent: String): DataFrame = {
    val ua = userAgent.toLowerCase
    // does the host have an exact product-token group for this agent?
    // ([[parseRules]] keeps rule-less groups as marker rows, so an empty
    // exact group correctly suppresses the * fallback)
    val hostHasExact = rules.groupBy(col("host"))
      .agg(max(when(col("agent") === lit(ua), true).otherwise(false)).as("has_exact"))
    // __robots_-prefix every rule column BEFORE joining into the caller's
    // URL frame — a corpus that already carries host/allow/pattern/regex
    // columns must not hit an ambiguous-reference failure
    val applicable = rules.join(hostHasExact, "host")
      .filter(col("agent") === lit(ua) ||
        (col("agent") === "*" && !col("has_exact")))
      .select(col("host").as("__robots_host"), col("allow").as("__robots_allow"),
        col("pattern").as("__robots_pattern"),
        col("pattern_len").as("__robots_len"), col("regex").as("__robots_regex"))
    val withParts = urls
      .withColumn("__host", Urls.host(col(urlCol)))
      .withColumn("__path",
        coalesce(
          when(length(regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)$", 1)) > 0,
            regexp_extract(col(urlCol), "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]+(/.*)$", 1)),
          lit("/")))
    val matched = withParts
      .withColumn("__uid", monotonically_increasing_id()) // duplicate-URL safe
      .join(broadcast(applicable), col("__host") === col("__robots_host"), "left")
      .withColumn("__hit",
        col("__robots_regex").isNotNull &&
          regexp_like(col("__path"), col("__robots_regex")))
    // longest pattern wins; Allow beats Disallow at equal length; no hit ⇒ allow
    val w = Window.partitionBy(col("__uid"))
      .orderBy(col("__hit").desc, col("__robots_len").desc, col("__robots_allow").desc)
    matched
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .withColumn("allowed",
        when(col("__hit"), col("__robots_allow")).otherwise(lit(true)))
      .withColumn("matched_pattern", when(col("__hit"), col("__robots_pattern")))
      .drop("__robots_host", "__robots_allow", "__robots_pattern",
        "__robots_len", "__robots_regex", "__host", "__path", "__hit", "__rn", "__uid")
  }
}
