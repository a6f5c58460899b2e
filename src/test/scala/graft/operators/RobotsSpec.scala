package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RobotsSpec extends SparkSpec {
  import spark.implicits._

  private val body =
    """# graft crawler policy
      |User-agent: graftbot
      |User-Agent: extrabot
      |Disallow: /private
      |Allow: /private/pub
      |
      |User-agent: *
      |Disallow: /*.json$
      |Disallow: /tmp
      |Allow:
      |Sitemap: https://a.example/sitemap.xml
      |""".stripMargin

  private def rules = Robots.parseRules(
    Seq(("a.example", body)).toDF("host", "body"), "host", "body")

  test("parsing: groups, shared UA lines, comments and unknown directives skipped") {
    val r = rules.collect()
    // group 1 has two agents x two rules; group 2 one agent x three rules
    assert(r.count(x => x.getString(2) == "graftbot") == 2)
    assert(r.count(x => x.getString(2) == "extrabot") == 2)
    assert(r.count(x => x.getString(2) == "*") == 3)
    assert(!r.exists(_.getString(4).contains("sitemap")), "sitemap is not a rule")
  }

  test("named group: longest match wins, Allow beats Disallow on prefix") {
    val urls = Seq(
      "https://a.example/private/secret", // Disallow /private
      "https://a.example/private/pub/x", // Allow /private/pub (longer)
      "https://a.example/data.json", // graftbot group has no json rule
      "https://a.example/") // nothing matches
      .toDF("url")
    val got = Robots.evaluate(urls, "url", rules, "GraftBot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!got("https://a.example/private/secret"))
    assert(got("https://a.example/private/pub/x"))
    assert(got("https://a.example/data.json"))
    assert(got("https://a.example/"))
  }

  test("star group applies only without an exact agent; $ and * patterns work") {
    val urls = Seq(
      "https://a.example/data.json", // /*.json$ hits
      "https://a.example/data.json?x=1", // $ anchor: query breaks the match
      "https://a.example/tmp/scratch", // /tmp prefix
      "https://a.example/private/secret") // star group has no /private rule
      .toDF("url")
    val got = Robots.evaluate(urls, "url", rules, "otherbot")
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(!got("https://a.example/data.json"))
    assert(got("https://a.example/data.json?x=1"))
    assert(!got("https://a.example/tmp/scratch"))
    assert(got("https://a.example/private/secret"))
  }

  test("empty Disallow matches nothing; unknown host and bare host default-allow") {
    val urls = Seq(
      "https://a.example/anything/else",
      "https://unknown.example/whatever",
      "https://a.example").toDF("url") // no path at all ⇒ "/"
    val got = Robots.evaluate(urls, "url", rules, "anybot")
      .collect().map(r => (r.getString(0), r.getBoolean(1), r.get(2))).toList
    assert(got.forall(_._2), s"all should be allowed: $got")
    assert(got.forall(_._3 == null), "default allows carry no matched pattern")
  }

  test("RFC 9309 matched empty group: an exact UA group with zero rules allows " +
      "everything and suppresses the * fallback") {
    // the trailing UA line heads a group that ends at EOF with zero rules
    // (consecutive UA lines merge per RFC 9309, so the empty group must
    // come after a rule-bearing one)
    val b = "User-agent: *\nDisallow: /\n\nUser-agent: graftbot\n"
    val r = Robots.parseRules(Seq(("e.example", b)).toDF("host", "body"), "host", "body")
    val urls = Seq("https://e.example/anything").toDF("url")
    // graftbot's group EXISTS but is empty ⇒ allow-all, NOT the * Disallow:/
    val named = Robots.evaluate(urls, "url", r, "graftbot")
      .collect().map(x => x.getString(0) -> x.getBoolean(1)).toMap
    assert(named("https://e.example/anything"),
      "the matched empty group must allow, not fall through to *")
    // an agent with no group still gets the * group
    val star = Robots.evaluate(urls, "url", r, "otherbot")
      .collect().map(x => x.getString(0) -> x.getBoolean(1)).toMap
    assert(!star("https://e.example/anything"))
  }

  test("URL frames that already carry rule-table column names evaluate cleanly") {
    val urls = Seq(("https://a.example/tmp/x", "mine.example", "keep", 7))
      .toDF("url", "host", "pattern", "pattern_len") // collide on purpose
    val got = Robots.evaluate(urls, "url", rules, "anybot").collect()
    assert(got.length == 1 && !got.head.getAs[Boolean]("allowed"))
    // the caller's columns survive untouched
    assert(got.head.getAs[String]("host") == "mine.example")
    assert(got.head.getAs[Int]("pattern_len") == 7)
  }

  test("duplicate URLs each keep a verdict; plan broadcasts the rules side") {
    val urls = Seq.fill(3)("https://a.example/tmp/x").toDF("url")
    val out = Robots.evaluate(urls, "url", rules, "anybot")
    assert(out.count() == 3)
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"rules side must broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"URL corpus must not shuffle:\n$plan")
  }
}
