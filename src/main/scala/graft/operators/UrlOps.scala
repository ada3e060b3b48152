package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization and domain-level corpus operations — the
  * front door of every web-crawl training-data pipeline: before any
  * dedup/quality op runs, raw crawl URLs are canonicalized (so the
  * same page fetched via tracking-decorated / fragment-bearing /
  * case-varying URLs collapses to one key), rolled up to their
  * registered domain for per-site quality decisions, and filtered
  * against domain blocklists.
  *
  * Reference scope note: the reference pipeline stores per-activity
  * `map_polyline` URLs-as-strings but performs no URL analytics; this
  * family is part of the engine's training-data-pipeline extension
  * surface (like [[TextAnalysis.htmlExtract]] / [[Dedup]]).
  *
  * Everything here is a row-local codegen'd projection built from
  * `regexp_extract`/`regexp_replace`/array HOFs — no UDFs, no
  * shuffles beyond the (skinny, domain-keyed) rollup aggregates. The
  * regex dialect is the Java∩RE2 common subset (no lookarounds, no
  * backrefs) so the DuckDB oracle replays the exact same patterns.
  *
  * Canonicalization contract (documented so the oracle and any
  * downstream join key agree byte-for-byte):
  *   1. scheme lowercased; host lowercased and a single leading
  *      `www.` stripped (other subdomains are real and kept);
  *   2. fragment dropped;
  *   3. port dropped only when it is the scheme default
  *      (`https:443`, `http:80`) — any other scheme/port combination
  *      (including `http:443`) is meaningful and kept;
  *   4. query params split on `&`, tracking params dropped
  *      (`utm_*`, `gclid`, `fbclid`, `ref`), the remainder sorted
  *      lexicographically (param order never distinguishes pages)
  *      and rejoined; an emptied query loses its `?`;
  *   5. path: trailing slash runs stripped, empty path → `/`.
  *
  * At 100 TB scale: canonicalize/registeredDomain are pure maps that
  * ride the scan; [[domainRollup]] shuffles only (domain, partial-agg)
  * rows — the domain key space is millions, not the corpus;
  * [[blocklistFilter]] broadcasts the blocklist (policy lists are
  * thousands of rows) into a hash anti-join, so the corpus is scanned
  * once and never shuffled.
  */
object UrlOps {

  /** Tracking-param keys dropped during canonicalization, as one
    * `key=` anchored regex alternation. */
  val TrackingParamRe = "^(utm_[A-Za-z0-9_]*|gclid|fbclid|ref)="

  private val schemeRe = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  private val hostPortRe = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
  private val pathRe = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
  private val queryRe = "^[^?#]*\\?([^#]*)"

  /** Lowercased scheme of `u` ("" when `u` has no `scheme://`). */
  def scheme(u: Column): Column = lower(regexp_extract(u, schemeRe, 1))

  /** Lowercased host of `u`, port stripped, single leading `www.`
    * stripped. */
  def host(u: Column): Column =
    regexp_replace(
      regexp_replace(lower(regexp_extract(u, hostPortRe, 1)), ":[0-9]+$", ""),
      "^www\\.", "")

  /** Explicit port of `u` as a string ("" when absent). */
  def port(u: Column): Column =
    regexp_extract(regexp_extract(u, hostPortRe, 1), ":([0-9]+)$", 1)

  /** Canonical path: trailing slash runs stripped, empty → "/". */
  def canonicalPath(u: Column): Column = {
    val stripped = regexp_replace(regexp_extract(u, pathRe, 1), "/+$", "")
    when(stripped === "", lit("/")).otherwise(stripped)
  }

  /** Canonical query string: tracking params out, the rest sorted and
    * rejoined with `&` ("" when nothing survives). */
  def canonicalQuery(u: Column): Column = {
    val raw = regexp_extract(u, queryRe, 1)
    val kept = filter(split(raw, "&"),
      p => p =!= "" && !p.rlike(TrackingParamRe))
    array_join(array_sort(kept), "&")
  }

  /** The full canonical URL per the contract above; NULL when `u` has
    * no recognizable `scheme://host` (relative references, garbage) —
    * a degenerate `"://…"` canonical would otherwise become a dedup/
    * rollup KEY that collides every malformed URL into one page.
    *
    * Implementation: ONE native single-pass parse
    * ([[graft.functions.CanonicalUrl]], r12) — the regex-chain
    * formulation below walks the string ~10 times per row and read
    * ~0.9 s on the settled url rows; UrlOpsSpec pins the native walk
    * ≡ the regex chain over the fixtures plus an adversarial corpus,
    * and the DuckDB oracle keeps replaying the regex contract. */
  def canonicalUrl(u: Column): Column =
    graft.functions.UrlCanonData.canonical_url(u)

  /** The original regex-chain formulation — the executable SPEC of
    * the contract (the DuckDB oracle mirrors these exact patterns).
    * Kept as the equivalence baseline for the native walk; not on
    * the hot path. */
  private[graft] def canonicalUrlRegex(u: Column): Column = {
    val s = scheme(u)
    val h = host(u)
    val p = port(u)
    val defaultPort = (s === "https" && p === "443") ||
      (s === "http" && p === "80")
    val portPart =
      when(p =!= "" && !defaultPort, concat(lit(":"), p)).otherwise(lit(""))
    val q = canonicalQuery(u)
    val queryPart = when(q =!= "", concat(lit("?"), q)).otherwise(lit(""))
    when(s === "" || h === "", lit(null).cast("string"))
      .otherwise(concat(s, lit("://"), h, portPart, canonicalPath(u), queryPart))
  }

  /** Registered (pay-level) domain of `u` under the Public Suffix
    * List algorithm ([[graft.functions.PslRegisteredDomain]]): public
    * suffix plus one label, with wildcard (`*.ck`) and exception
    * (`!www.ck`) rules honored — `blog.site.co.uk` → `site.co.uk`,
    * `a.b.site.com` → `site.com`. NULL when `u` has no parsable host,
    * when the host IS a public suffix (`co.uk`), or when it has no
    * dot (`localhost`) — PSL semantics, a change from the pre-r11
    * regex subset which returned such hosts unchanged.
    *
    * The PSL lookup runs on the lowercased, port-stripped host
    * WITHOUT www-stripping (`www.` is just a label to the PSL; the
    * exception rule `!www.ck` makes `www.ck` itself registrable) —
    * still a pure row-local projection, no join.
    */
  def registeredDomain(u: Column): Column = {
    val hostWithWww =
      regexp_replace(lower(regexp_extract(u, hostPortRe, 1)), ":[0-9]+$", "")
    when(hostWithWww === "", lit(null).cast("string"))
      .otherwise(graft.functions.PublicSuffixData
        .psl_registered_domain(hostWithWww))
  }

  /** Adds `canonical_url` and `registered_domain` to `docs` — the
    * canonical first pass; both are pure projections on the scan. */
  def canonicalize(docs: DataFrame, urlCol: String = "url"): DataFrame =
    docs
      .withColumn("canonical_url", canonicalUrl(col(urlCol)))
      .withColumn("registered_domain", registeredDomain(col(urlCol)))

  /** URL-level exact dedup: group by canonical URL, keep the lowest
    * `idCol` as the canonical fetch, count the collapsed variants.
    * One skinny groupBy on the canonical string — the pre-shuffle
    * projection already dropped every other column. Malformed URLs
    * (NULL canonical) are excluded: a URL that cannot be canonicalized
    * asserts no equality with anything, and a NULL group would collapse
    * every malformed fetch into one bogus "page". */
  def dedupByUrl(docs: DataFrame, urlCol: String = "url",
                 idCol: String = "doc_id"): DataFrame =
    docs
      .select(canonicalUrl(col(urlCol)).as("canonical_url"), col(idCol))
      .filter(col("canonical_url").isNotNull)
      .groupBy(col("canonical_url"))
      .agg(min(col(idCol)).as("keeper_" + idCol),
        count(lit(1)).as("n_urls"))

  /** Per-registered-domain rollup (doc count + any numeric sums the
    * caller selects beforehand must be exact-integer columns).
    * Malformed / suffix-only hosts roll into a NULL-domain row — the
    * observable "unattributable volume" bucket, not silently merged
    * into a real site. */
  def domainRollup(docs: DataFrame, urlCol: String = "url",
                   sumCol: String = "n_chars"): DataFrame =
    docs
      .select(registeredDomain(col(urlCol)).as("registered_domain"),
        col(sumCol))
      .groupBy(col("registered_domain"))
      .agg(count(lit(1)).as("n_docs"), sum(col(sumCol)).as("sum_" + sumCol))

  /** Drop every doc whose registered domain appears in `blocked`
    * (one `domain` column). The blocklist broadcasts into a hash
    * anti-join keyed on the derived domain — corpus scanned once,
    * never shuffled. Docs with no registered domain (malformed URL,
    * suffix-only host) are KEPT: a NULL key matches nothing in an
    * anti-join, and "unattributable" must not read as "blocked". */
  def blocklistFilter(docs: DataFrame, blocked: DataFrame,
                      urlCol: String = "url"): DataFrame =
    docs
      .withColumn("registered_domain", registeredDomain(col(urlCol)))
      .join(broadcast(blocked.select(col("domain").as("registered_domain"))),
        Seq("registered_domain"), "left_anti")
}
