package graft

import org.apache.spark.sql.functions._

import graft.operators.UrlOps

/** Edge-totality for the URL canonicalization contract — each case
  * here pins one rule of [[UrlOps]]' documented contract on a
  * hand-computed expectation (the driver-data oracle exercises the
  * rules in bulk; this spec is where a rule change fails by NAME). */
class UrlOpsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(urls: String*): Seq[(String, String)] =
    urls.toDF("url")
      .select(UrlOps.canonicalUrl(col("url")).as("c"),
        UrlOps.registeredDomain(col("url")).as("d"))
      .as[(String, String)].collect().toSeq

  test("case, www, default port, tracking, param order, fragment — all at once") {
    assert(canon("HTTPS://WWW.Example.COM:443/a/b/?utm_source=x&b=2&a=1#frag") ===
      Seq(("https://example.com/a/b?a=1&b=2", "example.com")))
  }

  test("default port drops only for the matching scheme") {
    assert(canon(
      "https://example.com:443/p",
      "http://example.com:80/p",
      "http://example.com:443/p",   // 443 is NOT http's default — kept
      "https://example.com:80/p",   // 80 is NOT https' default — kept
      "https://example.com:8080/p") ===
      Seq(("https://example.com/p", "example.com"),
        ("http://example.com/p", "example.com"),
        ("http://example.com:443/p", "example.com"),
        ("https://example.com:80/p", "example.com"),
        ("https://example.com:8080/p", "example.com")))
  }

  test("empty path and bare slash both canonicalize to /") {
    assert(canon("https://example.com", "https://example.com/",
        "https://example.com?a=1") ===
      Seq(("https://example.com/", "example.com"),
        ("https://example.com/", "example.com"),
        ("https://example.com/?a=1", "example.com")))
  }

  test("tracking-only query loses its ?; ref and *clid are tracking") {
    assert(canon(
      "https://example.com/p?utm_campaign=only",
      "https://example.com/p?gclid=1&fbclid=2&ref=home",
      "https://example.com/p?ref=abc&z=1") ===
      Seq(("https://example.com/p", "example.com"),
        ("https://example.com/p", "example.com"),
        ("https://example.com/p?z=1", "example.com")))
  }

  test("only a single leading www. strips; other subdomains are kept") {
    assert(canon(
      "https://www.blog.example.com/p",
      "https://blog.example.com/p",
      "https://news.example.org/p") ===
      Seq(("https://blog.example.com/p", "example.com"),
        ("https://blog.example.com/p", "example.com"),
        ("https://news.example.org/p", "example.org")))
  }

  test("registered domain: multi-part public suffixes take three labels") {
    assert(canon(
      "https://blog.shop.co.uk/p",
      "https://a.b.shop.com.au/p",
      "https://shop.co.jp/p",
      "https://deep.sub.shop.com/p") ===
      Seq(("https://blog.shop.co.uk/p", "shop.co.uk"),
        ("https://a.b.shop.com.au/p", "shop.com.au"),
        ("https://shop.co.jp/p", "shop.co.jp"),
        ("https://deep.sub.shop.com/p", "shop.com")))
  }

  test("dotless host canonicalizes but has no registered domain (PSL)") {
    assert(canon("http://localhost:9999/p") ===
      Seq(("http://localhost:9999/p", null)))
  }

  test("malformed / scheme-less URLs null out instead of degenerating") {
    assert(canon(
      "not a url at all",
      "/relative/path?a=1",
      "example.com/no-scheme",
      "http://") ===
      Seq((null, null), (null, null), (null, null), (null, null)))
  }

  test("PSL published vectors: wildcard and exception rules") {
    // drawn from publicsuffix.org's test_psl vectors for *.ck/!www.ck
    // and *.kobe.jp/!city.kobe.jp — exercised through the URL path
    // (PublicSuffixSpec drives the host-level function directly)
    assert(canon(
      "https://b.test.ck/p",
      "https://a.b.test.ck/p",
      "https://www.ck/p",
      "https://test.ck/p",          // test.ck IS a public suffix → null
      "https://b.c.kobe.jp/p",
      "https://city.kobe.jp/p",
      "https://www.city.kobe.jp/p") ===
      Seq(("https://b.test.ck/p", "b.test.ck"),
        ("https://a.b.test.ck/p", "b.test.ck"),
        // canonical host strips the single leading www.; the PSL walk
        // runs on the UNstripped host, so www.ck still registers
        ("https://ck/p", "www.ck"),
        ("https://test.ck/p", null),
        ("https://b.c.kobe.jp/p", "b.c.kobe.jp"),
        ("https://city.kobe.jp/p", "city.kobe.jp"),
        // canonical strips the single leading www.; registered domain
        // (PSL on the unstripped host) is unaffected
        ("https://city.kobe.jp/p", "city.kobe.jp")))
  }

  test("PSL vectors: us k12 matrix and private-registry suffixes") {
    assert(canon(
      "https://test.ak.us/p",
      "https://www.test.k12.ak.us/p",
      "https://example.uk.com/p",
      "https://uk.com/p",            // suffix-only host → null
      "https://myapp.github.io/p") ===
      Seq(("https://test.ak.us/p", "test.ak.us"),
        ("https://test.k12.ak.us/p", "test.k12.ak.us"),
        ("https://example.uk.com/p", "example.uk.com"),
        ("https://uk.com/p", null),
        ("https://myapp.github.io/p", "myapp.github.io")))
  }

  test("trailing slash runs collapse; root path survives") {
    assert(canon(
      "https://example.com/a//",
      "https://example.com///") ===
      Seq(("https://example.com/a", "example.com"),
        ("https://example.com/", "example.com")))
  }

  test("dedupByUrl collapses canonical variants and keeps the lowest id") {
    val docs = Seq(
      (1L, "https://www.example.com:443/p?b=2&a=1#x"),
      (2L, "HTTPS://example.com/p?a=1&utm_source=s&b=2"),
      (3L, "https://example.com/p/?b=2&a=1"),
      (4L, "https://example.com/q")).toDF("doc_id", "url")
    val got = UrlOps.dedupByUrl(docs).orderBy(col("canonical_url"))
      .as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("https://example.com/p?a=1&b=2", 1L, 3L),
      ("https://example.com/q", 4L, 1L)))
  }

  test("blocklistFilter drops by registered domain, not by host") {
    val docs = Seq(
      (1L, "https://blog.bad.co.uk/p"),
      (2L, "https://www.bad.co.uk/p"),
      (3L, "https://good.com/p")).toDF("doc_id", "url")
    val blocked = Seq("bad.co.uk").toDF("domain")
    val kept = UrlOps.blocklistFilter(docs, blocked)
      .select(col("doc_id")).as[Long].collect().toSeq
    assert(kept === Seq(3L))
  }
}
