package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SQL surface for the engine's native expressions: registered, every
  * graft kernel is callable from `spark.sql` / `expr(...)` exactly
  * like a built-in — `SELECT word_ngrams(text, 2) FROM docs`.
  *
  * Two entry points, one registration list:
  *  - deployment: `--conf spark.sql.extensions=graft.GraftExtensions`
  *    (the [[SparkSessionExtensions]] injection path — functions exist
  *    before any query is parsed);
  *  - live session / tests: [[GraftExtensions.register]] on an
  *    existing session's function registry.
  *
  * Scalar literal arguments (gram width, plane counts, seeds) are
  * extracted from foldable expressions at resolution time — the same
  * contract built-ins like `approx_count_distinct(col, rsd)` use.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.registrations.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, name: String): Int = {
    require(e.foldable, s"$name must be a literal")
    e.eval().asInstanceOf[Number].intValue()
  }

  private def longArg(e: Expression, name: String): Long = {
    require(e.foldable, s"$name must be a literal")
    e.eval().asInstanceOf[Number].longValue()
  }

  private def entry(name: String, usage: String)(builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder) =
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions", name, usage),
      builder)

  /** All native functions: (identifier, info, builder). */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo, FunctionRegistry.FunctionBuilder)] = Seq(
    entry("cosine_similarity",
      "cosine_similarity(a, b) - cosine of two float vectors") {
      args => CosineSimilarity(args(0), args(1))
    },
    entry("word_ngrams",
      "word_ngrams(text, n) - consecutive word n-grams with multiplicity") {
      args => WordNgrams(args(0), intArg(args(1), "n"))
    },
    entry("word_shingle_hashes",
      "word_shingle_hashes(text, k) - sorted distinct 64-bit k-shingle hashes") {
      args => WordShingleHashes(args(0), intArg(args(1), "k"))
    },
    entry("minhash_band_keys",
      "minhash_band_keys(hashes, bands, rowsPerBand) - LSH band keys") {
      args => MinHashBandKeys(args(0), intArg(args(1), "bands"), intArg(args(2), "rowsPerBand"))
    },
    entry("sorted_intersect_count",
      "sorted_intersect_count(a, b) - |A∩B| of two sorted long arrays") {
      args => SortedIntersectCount(args(0), args(1))
    },
    entry("rolling_hash",
      "rolling_hash(text, window) - min Karp-Rabin window hash") {
      args => RollingHash(args(0), intArg(args(1), "window"))
    },
    entry("srp_buckets",
      "srp_buckets(emb, planes, tables, dim, seed) - SRP LSH bucket ids") {
      args => SrpBuckets(args(0), intArg(args(1), "planes"), intArg(args(2), "tables"),
        intArg(args(3), "dim"), longArg(args(4), "seed"))
    },
    entry("simhash64",
      "simhash64(hashes) - 64-bit SimHash over feature hashes") {
      args => SimHash64(args(0))
    },
    entry("nearest_centroid",
      "nearest_centroid(emb, cents) - centroid_id of max-cosine centroid") {
      args => NearestCentroid(args(0), args(1))
    },
    entry("repetition_stats",
      "repetition_stats(text) - line-dup counts + top word-bigram struct") {
      args => RepetitionStats(args(0))
    },
    entry("nfc_normalize",
      "nfc_normalize(text) - Unicode NFC normalization") {
      args => NfcNormalize(args(0))
    },
    entry("polyline_decode",
      "polyline_decode(s) - Google encoded polyline to array<struct<lat,lng>>") {
      args => PolylineDecode(args(0))
    },
    entry("polyline_encode",
      "polyline_encode(points) - array<struct<lat,lng>> to encoded polyline") {
      args => PolylineEncode(args(0))
    },
    entry("bloom_agg",
      "bloom_agg(key, items, bits) - mergeable Bloom filter over xxhash64(key)") {
      args => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(
          new org.apache.spark.sql.catalyst.expressions.XxHash64(Seq(args(0))),
          org.apache.spark.sql.catalyst.expressions.Literal(longArg(args(1), "items")),
          org.apache.spark.sql.catalyst.expressions.Literal(longArg(args(2), "bits")))
    },
    entry("bloom_might_contain",
      "bloom_might_contain(bloom, key) - membership probe; false = definitely absent") {
      args => {
        // a foldable (literal) key must not reach might_contain's
        // codegen as an inlined long literal — see CodegenMaterialized
        val h = new org.apache.spark.sql.catalyst.expressions.XxHash64(
          Seq(args(1)))
        org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
          args(0),
          if (h.foldable) functions.CodegenMaterialized(h) else h)
      }
    },
    entry("canonical_url",
      "canonical_url(url) - canonical crawl URL (case/www/default-port/" +
        "tracking/fragment normalization); NULL without scheme://host") {
      args => CanonicalUrl(args(0))
    },
    entry("psl_registered_domain",
      "psl_registered_domain(host) - registered (pay-level) domain under " +
        "the Public Suffix List rules; NULL for invalid or suffix-only hosts") {
      args => PslRegisteredDomain(args(0))
    },
    entry("deflate_size",
      "deflate_size(text) - raw-DEFLATE byte count of the UTF-8 bytes " +
        "(level 6, nowrap); deflate_size(t)/octet_length(t) is the " +
        "compression-ratio quality signal") {
      args => graft.functions.DeflateSize(args(0))
    })
    // (BigramProfileScores stays engine-internal: it is parameterized
    // by the language-profile table langId owns, not a standalone
    // SQL-shaped kernel.)

  /** Register every native function on a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    registrations.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
}
