package graft

import graft.functions.PublicSuffixData

/** [[PublicSuffixData.registeredDomain]] against the Public Suffix
  * List's published test vectors (publicsuffix.org test_psl.txt —
  * checkPublicSuffix(host, expected-registrable-domain)), restricted
  * to rules present in the embedded curated table. Pure driver-side
  * unit tests — the Spark expression wraps this exact function, and
  * UrlOpsSpec drives it through the URL column path.
  */
class PublicSuffixSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def check(host: String, expected: String): Unit =
    assert(PublicSuffixData.registeredDomain(host) === expected,
      s"registeredDomain($host)")

  test("null / invalid input") {
    check(null, null)
    check("", null)
    check(".com", null)
    check(".example.com", null)
    check("example.com.", null)
    check("a..com", null)
  }

  test("mixed case lowers") {
    check("COM", null)
    check("example.COM", "example.com")
    check("WwW.example.COM", "example.com")
  }

  test("unlisted TLD: * default rule") {
    check("example", null)
    check("example.example", "example.example")
    check("b.example.example", "example.example")
    check("a.b.example.example", "example.example")
  }

  test("TLD with only one (implicit single-label) rule") {
    check("biz", null)
    check("domain.biz", "domain.biz")
    check("b.domain.biz", "domain.biz")
    check("a.b.domain.biz", "domain.biz")
  }

  test("com and 2-level private registry rules") {
    check("com", null)
    check("example.com", "example.com")
    check("b.example.com", "example.com")
    check("a.b.example.com", "example.com")
    check("uk.com", null)
    check("example.uk.com", "example.uk.com")
    check("b.example.uk.com", "example.uk.com")
    check("test.ac", "test.ac")
  }

  test("jp: category, geo, wildcard-with-exception") {
    check("jp", null)
    check("test.jp", "test.jp")
    check("www.test.jp", "test.jp")
    check("ac.jp", null)
    check("test.ac.jp", "test.ac.jp")
    check("www.test.ac.jp", "test.ac.jp")
    check("kyoto.jp", null)
    check("test.kyoto.jp", "test.kyoto.jp")
    check("ide.kyoto.jp", null)
    check("b.ide.kyoto.jp", "b.ide.kyoto.jp")
    check("a.b.ide.kyoto.jp", "b.ide.kyoto.jp")
    check("c.kobe.jp", null)
    check("b.c.kobe.jp", "b.c.kobe.jp")
    check("a.b.c.kobe.jp", "b.c.kobe.jp")
    check("city.kobe.jp", "city.kobe.jp")
    check("www.city.kobe.jp", "city.kobe.jp")
  }

  test("ck: pure wildcard TLD with exception") {
    check("ck", null)
    check("test.ck", null)
    check("b.test.ck", "b.test.ck")
    check("a.b.test.ck", "b.test.ck")
    check("www.ck", "www.ck")
    check("www.www.ck", "www.ck")
  }

  test("us: state and k12 matrix") {
    check("us", null)
    check("test.us", "test.us")
    check("www.test.us", "test.us")
    check("ak.us", null)
    check("test.ak.us", "test.ak.us")
    check("www.test.ak.us", "test.ak.us")
    check("k12.ak.us", null)
    check("test.k12.ak.us", "test.k12.ak.us")
    check("www.test.k12.ak.us", "test.k12.ak.us")
  }

  test("uk multi-part registries") {
    check("co.uk", null)
    check("example.co.uk", "example.co.uk")
    check("b.example.co.uk", "example.co.uk")
    check("a.b.example.co.uk", "example.co.uk")
  }

  test("platform private suffixes register one label below") {
    check("github.io", null)
    check("myapp.github.io", "myapp.github.io")
    check("www.myapp.github.io", "myapp.github.io")
    check("blogspot.com", null)
    check("someone.blogspot.com", "someone.blogspot.com")
  }

  test("parsePsl: the published .dat wire format classifies correctly") {
    val dat =
      """// This Source Code Form is subject to the terms of the Mozilla
        |// ===BEGIN ICANN DOMAINS===
        |
        |// ac : https://en.wikipedia.org/wiki/.ac
        |com
        |co.uk
        |  org.uk
        |ac.jp
        |// ck : https://en.wikipedia.org/wiki/.ck
        |*.ck
        |!www.ck
        |*.kobe.jp
        |!city.kobe.jp
        |// ===END ICANN DOMAINS===
        |// ===BEGIN PRIVATE DOMAINS===
        |GitHub.io trailing-comment-text ignored
        |// ===END PRIVATE DOMAINS===
        |""".stripMargin
    val (normal, wild, exc) = PublicSuffixData.parsePsl(dat.linesIterator)
    // single-label normal rules (`com`) drop — they decide like the
    // implicit * default; everything else survives, lowercased, with
    // prefixes stripped and rule text cut at the first whitespace
    assert(normal === Seq("co.uk", "org.uk", "ac.jp", "github.io"))
    assert(wild === Seq("ck", "kobe.jp"))
    assert(exc === Seq("www.ck", "city.kobe.jp"))
  }

  test("a .dat-loaded rule table decides the full vector set like the curated one") {
    // serialize the curated table back to PSL wire format (plus
    // single-label rules the parser must drop), parse it, and replay
    // EVERY host exercised above through the same walk — the loader
    // path is behavior-identical, so a production GRAFT_PSL_FILE
    // swap-in changes data, never semantics
    val dat = (Seq("// round-trip of the curated subset", "com", "net", "org") ++
      PublicSuffixData.NormalSuffixes ++
      PublicSuffixData.WildcardSuffixes.map("*." + _) ++
      PublicSuffixData.ExceptionSuffixes.map("!" + _)).mkString("\n")
    val (n, w, e) = PublicSuffixData.parsePsl(dat.linesIterator)
    val table = PublicSuffixData.buildRules(n, w, e)
    val hosts = Seq(
      null, "", ".com", "example.com.", "a..com", "COM", "example.COM",
      "WwW.example.COM", "example", "example.example", "b.example.example",
      "biz", "domain.biz", "a.b.domain.biz", "com", "example.com",
      "a.b.example.com", "uk.com", "example.uk.com", "b.example.uk.com",
      "test.ac", "jp", "test.jp", "www.test.jp", "ac.jp", "test.ac.jp",
      "kyoto.jp", "test.kyoto.jp", "ide.kyoto.jp", "b.ide.kyoto.jp",
      "a.b.ide.kyoto.jp", "c.kobe.jp", "b.c.kobe.jp", "a.b.c.kobe.jp",
      "city.kobe.jp", "www.city.kobe.jp", "ck", "test.ck", "b.test.ck",
      "a.b.test.ck", "www.ck", "www.www.ck", "us", "test.us", "ak.us",
      "test.ak.us", "k12.ak.us", "test.k12.ak.us", "www.test.k12.ak.us",
      "co.uk", "example.co.uk", "a.b.example.co.uk", "github.io",
      "myapp.github.io", "www.myapp.github.io", "someone.blogspot.com")
    hosts.foreach { h =>
      assert(PublicSuffixData.registeredDomainIn(table, h) ===
        PublicSuffixData.registeredDomain(h), s"loaded-vs-curated on $h")
    }
  }
}
