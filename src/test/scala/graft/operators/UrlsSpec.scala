package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlsSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("url").select(Urls.normalize(col("url"))).as[String].head()

  private def dom(u: String): String =
    Seq(u).toDF("url").select(Urls.domain(col("url"))).as[String].head()

  test("normalize lowercases scheme+host, keeps path case") {
    assert(norm("HTTPS://Example.COM/Path/To/X") === "https://example.com/Path/To/X")
  }

  test("normalize strips fragment, www, default ports; keeps others") {
    assert(norm("http://www.site.com:80/a#frag") === "http://site.com/a")
    assert(norm("https://site.com:443/a") === "https://site.com/a")
    assert(norm("https://site.com:8443/a") === "https://site.com:8443/a")
    // :80 is only default for http, :443 only for https
    assert(norm("http://site.com:443/a") === "http://site.com:443/a")
  }

  test("normalize drops utm_* params, keeps others in order") {
    assert(norm("https://s.com/a?utm_source=x&id=7&utm_id=9&b=2")
      === "https://s.com/a?id=7&b=2")
    // all params tracking -> query gone entirely
    assert(norm("https://s.com/a?utm_source=x") === "https://s.com/a")
  }

  test("normalize strips trailing slashes; bare / collapses to empty") {
    assert(norm("https://s.com/a/") === "https://s.com/a")
    assert(norm("https://s.com/a//") === "https://s.com/a")
    assert(norm("https://s.com/") === "https://s.com")
    assert(norm("https://s.com") === "https://s.com")
    assert(norm("http://www.www.site.com/x") === "http://site.com/x")
  }

  test("null urls propagate as null through every extractor") {
    val row = Seq((1L, null: String)).toDF("id", "url")
      .select(Urls.normalize(col("url")), Urls.host(col("url")),
        Urls.domain(col("url")), Urls.scheme(col("url")))
      .collect()(0)
    assert((0 to 3).forall(row.isNullAt))
  }

  test("normalize is idempotent on arbitrary inputs (fuzz)") {
    val inputs =
      // structured: every combination of the rule-triggering pieces
      (for {
        scheme <- Seq("http://", "HTTPS://", "ftp://", "")
        host <- Seq("WWW.Site.com", "www.www.x.COM", "a.b.c", "s.com:443", "x.com:8443", "")
        path <- Seq("", "/", "/A/b", "/a//", "/a/?", "/%20x")
        q <- Seq("", "?utm_a=1", "?id=2&utm_b=3&x=4", "?&&", "?url=https://y.com/")
        f <- Seq("", "#Frag", "#a#b")
      } yield s"$scheme$host$path$q$f") ++
        // junk
        Seq("", "   ", "not a url", "https//missing.colon", "a://b", "://x",
          "https://", "http://x.com?", "relative/p?x=1#f", "\thttp://T.com/A\n")
    val df = inputs.toDF("url")
    val bad = df
      .select(col("url"), Urls.normalize(col("url")).as("n1"))
      .select(col("url"), col("n1"), Urls.normalize(col("n1")).as("n2"))
      .filter(col("n1") =!= col("n2"))
    assert(bad.count() === 0,
      bad.collect().take(5).mkString("non-idempotent: ", "; ", ""))
  }

  test("schemeless input passes through trimmed, never null") {
    assert(norm("  not a url  ") === "not a url")
    assert(norm("relative/path?x=1") === "relative/path?x=1")
  }

  test("host and domain extraction") {
    val row = Seq("HTTPS://WWW.A.B.Site.COM:8443/x?q=1#f").toDF("url")
      .select(Urls.host(col("url")), Urls.domain(col("url")), Urls.scheme(col("url")))
      .as[(String, String, String)].head()
    assert(row === (("a.b.site.com", "site.com", "https")))
    assert(dom("http://localhost:9000/x") === "localhost")
    assert(dom("http://www.site.com/x") === "site.com")
  }

  test("domain respects multi-part public suffixes") {
    assert(dom("https://shop.example.co.uk/x") === "example.co.uk")
    assert(dom("https://WWW.Example.CO.UK/x") === "example.co.uk")
    assert(dom("https://a.b.site.com.au") === "site.com.au")
    // a bare multi-part suffix has no registrable label above it
    assert(dom("https://co.uk/") === "co.uk")
    // plain TLDs keep the two-label rule
    assert(dom("https://deep.sub.site.org/x") === "site.org")
  }

  test("domain covers the bundled public-suffix snapshot beyond the old literal set") {
    // registries the round-7 40-entry literal set missed
    assert(dom("https://example.com.pl/x") === "example.com.pl")
    assert(dom("https://www.example.co.il/x") === "example.co.il")
    assert(dom("https://shop.example.waw.pl") === "example.waw.pl")
    assert(dom("https://x.example.tokyo.jp") === "example.tokyo.jp")
    assert(dom("https://a.example.ca.us") === "example.ca.us")
    assert(dom("https://sub.example.gob.mx") === "example.gob.mx")
    // private hosting section: each subdomain is its own publisher
    assert(dom("https://alice.github.io/repo") === "alice.github.io")
    assert(dom("https://a.b.blogspot.com") === "b.blogspot.com")
    // three-label suffix: registrable is suffix + one label
    assert(dom("https://cdn.assets.s3.amazonaws.com/k") === "assets.s3.amazonaws.com")
    assert(dom("https://s3.amazonaws.com/bucket") === "s3.amazonaws.com")
    // sanity on the loaded rules: non-empty, lowercase, PSL-syntax only
    assert(Urls.PublicSuffixes.size > 500)
    assert(Urls.PublicSuffixes.forall(s =>
      s == s.toLowerCase && s.contains(".") &&
        (!s.contains("*") || s.startsWith("*.")) &&
        (!s.contains("!") || s.startsWith("!"))))
  }

  test("domain applies PSL wildcard and exception rules") {
    // `*.ck`: every label under ck is a public suffix → registrable is
    // suffix + one label
    assert(dom("https://www.a.b.ck/x") === "a.b.ck")
    assert(dom("https://deep.sub.a.b.ck/x") === "a.b.ck")
    // a bare wildcard suffix has no registrable label above it
    assert(dom("https://b.ck/") === "b.ck")
    // `!www.ck` defeats `*.ck`: www.ck is itself registrable
    assert(dom("https://www.ck/") === "www.ck")
    assert(dom("https://sub.www.ck/") === "www.ck")
    // jp designated cities: `*.kobe.jp` with `!city.kobe.jp`
    assert(dom("https://x.ward.kobe.jp/") === "x.ward.kobe.jp")
    assert(dom("https://a.x.ward.kobe.jp/") === "x.ward.kobe.jp")
    assert(dom("https://city.kobe.jp/") === "city.kobe.jp")
    assert(dom("https://www.city.kobe.jp/") === "city.kobe.jp")
    // other wholly-wildcard registries
    assert(dom("https://example.com.bd/") === "example.com.bd")
    assert(dom("https://www.example.gov.mm/") === "example.gov.mm")
    // private-section wildcard: each compute zone is its own publisher
    assert(dom("https://vm.us-east-1.compute.amazonaws.com/") ===
      "vm.us-east-1.compute.amazonaws.com")
    // literal rules unaffected by wildcard machinery
    assert(dom("https://shop.example.co.uk/x") === "example.co.uk")
  }

  test("dropBlockedDomains: domain entries block the site, host entries one host") {
    val pages = Seq(
      (1L, "https://bad.com/a"),                 // blocked by domain
      (2L, "https://www.BAD.com:443/b"),         // same after canonicalization
      (3L, "https://cdn.bad.com/c"),             // subdomain of a blocked domain
      (4L, "https://evil.example.com/d"),        // blocked by full host
      (5L, "https://example.com/e"),             // bare site of that host survives
      (6L, "https://other.example.com/f"),       // sibling host survives
      (7L, "https://good.com/g"),                // unrelated survives
      (8L, "not-a-url"))                         // no scheme: host "" never matches
      .toDF("doc_id", "url")
    val kept = Urls.dropBlockedDomains(pages, "url",
        Seq("BAD.com", "evil.example.com"))
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(5L, 6L, 7L, 8L))
  }

  test("dropBlockedDomains: empty list is a no-op, DataFrame list form agrees") {
    val pages = Seq((1L, "https://x.com/a"), (2L, "https://y.com/b"))
      .toDF("doc_id", "url")
    assert(Urls.dropBlockedDomains(pages, "url", Seq.empty[String])
      .count() === 2L)
    val listDf = Seq("y.com").toDF("entry")
    val kept = Urls.dropBlockedDomains(pages, "url", listDf, "entry")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L))
  }

  test("dropDuplicateUrls: noise collapses, min id survives, keepBy overrides") {
    val pages = Seq(
      (1L, "https://a.com/p", 5L),
      (2L, "HTTPS://WWW.A.com:443/p?utm_source=z#x", 9L), // same canonical
      (3L, "https://a.com/p/", 1L), // trailing slash: same canonical
      (4L, "https://b.com/q", 2L)).toDF("doc_id", "url", "quality")
    val kept = Urls.dropDuplicateUrls(pages, "doc_id", "url")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 4L), s"min id per canonical, got $kept")
    // quality-aware survivor selection
    val best = Urls.dropDuplicateUrls(pages, "doc_id", "url",
        keepBy = Seq(col("quality").desc))
      .select("doc_id").as[Long].collect().toSet
    assert(best === Set(2L, 4L), s"highest quality per canonical, got $best")
    // plan: exactly one exchange — the canonical-url window
    val plan = Urls.dropDuplicateUrls(pages, "doc_id", "url")
      .queryExecution.executedPlan.toString
    assert(plan.linesIterator.count(_.trim.startsWith("Exchange")) <= 1,
      s"url dedup must shuffle the corpus at most once:\n$plan")
  }

  test("withUrlParts + capPerGroup composition caps per canonical domain") {
    val docs = (1L to 40L).map { i =>
      (i, s"HTTP://WWW.D${i % 4}.com/page/$i?utm_source=x")
    }.toDF("doc_id", "url")
    val parts = Urls.withUrlParts(docs, "url")
    assert(parts.select("url_norm").as[String].head().startsWith("http://d"))
    val capped = Sampling.capPerGroup(parts, Seq("url_domain"), Seq("doc_id"), 3)
    val byDom = capped.groupBy("url_domain").count().as[(String, Long)].collect().toMap
    assert(byDom.values.forall(_ === 3L) && byDom.size === 4)
  }
}
