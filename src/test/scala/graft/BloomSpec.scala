package graft

import org.apache.spark.sql.functions._

import graft.functions.BloomFunctions._
import graft.operators.TextAnalysis

class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def keys(n: Int, prefix: String) =
    (0 until n).map(i => s"$prefix$i").toDF("k")

  test("zero false negatives: every inserted key probes true") {
    val members = keys(500, "member-")
    val bloom = members.agg(bloom_agg($"k", 1000L, 1L << 16).as("bf"))
    val missed = members.filter(!bloom_probe(bloom, $"k")).count()
    assert(missed === 0L, "a Bloom filter can never miss an inserted key")
  }

  test("false-positive rate is sane at the configured sizing") {
    val members = keys(500, "member-")
    val bloom = members.agg(bloom_agg($"k", 1000L, 1L << 16).as("bf"))
    // 2^16 bits for 500 items ≈ 131 bits/item — FP rate should be
    // tiny; 1% of 2000 non-members is two orders above expectation.
    val fp = keys(2000, "absent-").filter(bloom_probe(bloom, $"k")).count()
    assert(fp <= 20L, s"false-positive rate implausibly high: $fp/2000")
  }

  test("merge is partitioning-invariant: same bytes from any layout") {
    val members = keys(500, "member-")
    def bytesOf(parts: Int): Seq[Byte] =
      members.repartition(parts)
        .agg(bloom_agg($"k", 1000L, 1L << 16).as("bf"))
        .collect()(0).getAs[Array[Byte]](0).toSeq
    assert(bytesOf(1) === bytesOf(7),
      "partial-filter OR-merge must not depend on partitioning")
  }

  test("bloomContaminatedDocs equals the exact contaminated set") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta", "en", "s0", 40L),
      (1L, "alpha beta gamma delta epsilon nothing shared here", "en", "s1", 40L),
      (2L, "totally different words with no overlap at all", "en", "s2", 40L),
      (3L, "more unrelated text goes in this document row", "en", "s3", 40L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val bench = docs.filter($"doc_id" === 0L)
    val got = TextAnalysis.bloomContaminatedDocs(docs, bench, k = 5)
      .as[Long].collect().toSet
    // docs 0 (itself) and 1 (shares the 5-gram "alpha beta gamma
    // delta epsilon") are contaminated; 2 and 3 are clean.
    assert(got === Set(0L, 1L))
  }

  test("exactIncrementalBloom equals the join-everything answer") {
    val corpus = Seq(
      (0L, "seen before exactly this text"),
      (1L, "another standing corpus document")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      (10L, "seen before exactly this text"),   // dup of corpus 0
      (11L, "genuinely new fresh document"),
      (12L, "genuinely new fresh document"),    // in-batch dup of 11
      (13L, "also new and unique text here")
    ).toDF("doc_id", "text")
    val got = graft.operators.Dedup.exactIncrementalBloom(corpus, fresh)
      .select($"doc_id").as[Long].collect().toSet
    assert(got === Set(11L, 13L),
      "corpus dup and in-batch second occurrence must both drop")
  }

  test("bloom functions are callable from SQL, subquery form included") {
    GraftExtensions.register(spark)
    keys(100, "m-").createOrReplaceTempView("bloom_members")
    val hit = spark.sql(
      """SELECT bloom_might_contain(
           (SELECT bloom_agg(k, 1000, 65536) FROM bloom_members), 'm-7')""")
      .collect()(0).getBoolean(0)
    val miss = spark.sql(
      """SELECT bloom_might_contain(
           (SELECT bloom_agg(k, 1000, 65536) FROM bloom_members), 'absent')""")
      .collect()(0).getBoolean(0)
    assert(hit, "inserted key must probe true through the SQL surface")
    assert(!miss, "at 65 bits/item a single absent key colliding is ~impossible")
  }

  test("literal-key codegen: upstream (Long)-literal mis-parse reproduced; the guard compiles") {
    // Upstream Spark emits `bf.mightContainLong((Long)<value>)`; when
    // the probe key constant-folds to a NEGATIVE long literal, janino
    // parses `(Long)-N` as `java.lang.Long − N` and codegen falls back
    // to the interpreter. Pin the trigger with fallback DISABLED
    // (GenerateUnsafeProjection propagates the CompileException), and
    // pin that CodegenMaterialized — what BloomFunctions wraps every
    // foldable probe hash in — makes the same tree compile. If a
    // future Spark release fixes the cast emission, the intercept
    // below fails: that is the signal to drop the guard.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.codegen.GenerateUnsafeProjection
    val bytes = keys(100, "m-")
      .agg(bloom_agg(col("k"), 1000L, 65536L))
      .head.getAs[Array[Byte]](0)
    val negHash = Literal(-863305594884437625L) // any negative long
    intercept[Exception] {
      GenerateUnsafeProjection.generate(
        Seq(BloomFilterMightContain(Literal(bytes), negHash)))
    }
    val proj = GenerateUnsafeProjection.generate(Seq(BloomFilterMightContain(
      Literal(bytes), graft.functions.CodegenMaterialized(negHash))))
    proj(InternalRow.empty).getBoolean(0): Unit // compiled, evaluates
  }
}
