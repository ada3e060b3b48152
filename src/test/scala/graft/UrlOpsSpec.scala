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

  test("native single-pass walk ≡ the regex-chain contract, adversarially") {
    // the r12 native CanonicalUrl expression replaced the ~10-pass
    // regex chain on the hot path; the chain stays as the executable
    // SPEC (the DuckDB oracle mirrors its patterns) and this
    // differential corpus is the gate: every rule boundary, plus the
    // shapes of the driver fixtures, plus deliberate garbage
    val urls = Seq(
      // fixture shapes
      "HTTPS://WWW.Site3.co.uk:443/path/3?utm_source=x&b=2&a=1#frag",
      "http://blog.site7.com:8080/a/b/", "https://site1.org",
      "http://news.site11.net:443/x?id=9&utm_campaign=y",
      // scheme/host edges
      "ftp+ssh://Host.Example:21/f", "a://b://c", "x://", "://host/p",
      "http:/one-slash.com", "no-scheme.com/path", "", "h",
      "http://:8080/p", "http://www./p", "http://WWW.WWW.com/p",
      // port edges
      "http://h:80/p", "https://h:443/p", "http://h:443/p",
      "https://h:80/p", "http://h:0443/p", "http://h:/p",
      "http://h:8x0/p", "http://a:1:2/p", "http://[::1]:80/p",
      // path edges
      "http://h", "http://h/", "http://h///", "http://h/a//b///",
      "http://h/p#frag/with/slashes", "http://h#?query-after-frag=1",
      // query edges
      "http://h/p?", "http://h/p?&", "http://h/p?a=1&&b=2&",
      "http://h/p?utm_source=1", "http://h/p?utm_=1&z=2",
      "http://h/p?utm_x-y=1", "http://h/p?UTM_SOURCE=1",
      "http://h/p?ref=abc&refx=1&gclid=2&fbclid=3&real=4",
      "http://h/p?b=2&a=1&b=1", "http://h/p?a", "http://h/p?=v",
      "http://h/p?x=%20&y=+", "http://h/p?a=1#f?notquery=2"
    ) ++ (0L until 400L).map(i =>
      s"${if (i % 3 == 0) "HTTP" else "https"}://${if (i % 2 == 0) "www." else ""}site${i % 23}.com" +
        s"${if (i % 4 == 0) s":${8000 + i % 3}" else ""}/p$i${"/" * (i % 3).toInt}" +
        s"${if (i % 5 == 0) s"?utm_source=$i&z=$i&a=${i % 7}" else ""}" +
        s"${if (i % 7 == 0) "#frag" else ""}")
    val both = urls.toDF("url")
      .select(col("url"),
        UrlOps.canonicalUrl(col("url")).as("native"),
        UrlOps.canonicalUrlRegex(col("url")).as("regex"))
      .collect()
    both.foreach { r =>
      assert(r.get(1) == r.get(2),
        s"native='${r.get(1)}' regex='${r.get(2)}' for url='${r.get(0)}'")
    }
  }

  test("native walk ≡ regex chain on 2000 seeded-random URL-ish strings") {
    // fuzz beyond the hand-picked corpus: random compositions of the
    // grammar's pieces INCLUDING invalid fragments placed anywhere —
    // fixed seed, so a divergence is a reproducible counterexample
    val rnd = new scala.util.Random(0xC0FFEE)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.length))
    val schemes = Seq("http", "HTTPS", "ftp+x", "9bad", "", "h")
    val seps = Seq("://", ":/", "//", ":", "")
    val hosts = Seq("www.Ex.com", "EX.COM", "a.b.c", "www.", "", "h:x",
      "[::1]", "host", "SITE.co.uk")
    val ports = Seq("", ":80", ":443", ":8080", ":0443", ":", ":8x", ":1:2")
    val paths = Seq("", "/", "//", "/a/b", "/a//", "/a/b///", "/%20x")
    val queries = Seq("", "?", "?a=1", "?b=2&a=1", "?utm_source=x&k=v",
      "?ref=1&real=2", "?&&", "?a", "?utm_=1", "?UTM_S=1", "?z=9&z=1")
    val frags = Seq("", "#", "#f", "#f?x=1", "#a/b")
    val urls = (0 until 2000).map { _ =>
      pick(schemes) + pick(seps) + pick(hosts) + pick(ports) +
        pick(paths) + pick(queries) + pick(frags)
    }
    val bad = urls.toDF("url")
      .select(col("url"),
        UrlOps.canonicalUrl(col("url")).as("native"),
        UrlOps.canonicalUrlRegex(col("url")).as("regex"))
      .collect()
      .filter(r => r.get(1) != r.get(2))
    assert(bad.isEmpty, bad.take(5).map(r =>
      s"url='${r.get(0)}' native='${r.get(1)}' regex='${r.get(2)}'")
      .mkString("; "))
  }

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
