package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.9f, 0.1f, 0.0f, 0.0f), 0),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f, 0.0f), 1),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f, 0.0f), 2),  // opposite of 0
    (4L, Array(0.7f, 0.7f, 0.0f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("cosine: known geometry") {
    val c = vecs.filter($"vec_id" === 0L)
      .crossJoin(vecs.filter($"vec_id" === 3L).select($"embedding".as("other")))
      .select(Similarity.cosine($"embedding", $"other").as("c"))
      .as[Double].head()
    assert(math.abs(c - (-1.0)) < 1e-6)
  }

  test("ivf: null embeddings in the corpus never crash or win (sampled or scored)") {
    // Null-heavy corpus with nlist > non-null count: without the
    // isNotNull sampling filter a null vector lands in the centroid
    // set and NearestCentroid dereferences it (latent NPE — the
    // corpus side handles nulls, so the op's own contract admits them).
    val withNulls = vecs.unionByName(Seq(
      (10L, null.asInstanceOf[Array[Float]], 9),
      (11L, null.asInstanceOf[Array[Float]], 9),
      (12L, null.asInstanceOf[Array[Float]], 9)
    ).toDF("vec_id", "embedding", "label"))
    val q = vecs.filter($"vec_id" === 0L)
    val out = Similarity.ivfTopK(withNulls, q, 3, nlist = 8, nprobe = 8)
      .select("vec_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 4L, 2L)) // same as brute force; null rows invisible
    // And the kernel itself tolerates a null centroid vector in the array.
    val k = spark.range(1).select(
      graft.functions.NearestCentroid.nearest_centroid(
        array(lit(1.0f), lit(0.0f)),
        array(
          struct(lit(7L).as("centroid_id"),
            lit(null).cast("array<float>").as("centroid")),
          struct(lit(9L).as("centroid_id"),
            array(lit(1.0f), lit(0.0f)).as("centroid")))).as("c"))
      .as[Long].head()
    assert(k === 9L)
  }

  test("brute-force top-k ranks by cosine, excludes self") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0L), 3)
      .select("vec_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 4L, 2L)) // 0.994, 0.707, 0.0 (vec 3 = -1 excluded by k)
  }

  test("lsh: identical vectors share a bucket; top-k recall on real data") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val approx = Similarity.lshTopK(emb, q, 5, planes = 4)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // 4 planes → 16 buckets over 500 vecs: recall needn't be 1 but the
    // probe must return results and they must be a subset ranked by
    // true cosine (each approx hit is a real vector, self excluded).
    assert(approx.nonEmpty)
    assert(approx.forall { case (qid, vid) => qid != vid })
    // at least some overlap with the exact top-5
    assert((approx intersect exact).nonEmpty)
  }

  test("multi-probe lsh strictly widens the candidate set") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 5)
    val single = Similarity.lshTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val multi = Similarity.lshTopK(emb, q, 10, probeHamming = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    // 9 probed buckets produce more results and at least as much
    // true recall as a single bucket
    assert(multi.size > single.size)
    assert((multi intersect exact).size >= (single intersect exact).size)
  }

  test("ivf: identical results across runs (deterministic centroids)") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    def run() = Similarity.ivfTopK(emb, q, 5, nlist = 8, nprobe = 2)
      .select("query_id", "vec_id", "cosine")
      .as[(Long, Long, Double)].collect().toSeq
    assert(run() === run())
  }

  test("ivf with full probe reproduces the exact brute-force baseline") {
    // nprobe = nlist scores the whole corpus: any dropped or duplicated
    // vector in the assignment/probe machinery would break equality.
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 5)
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    val full = Similarity.ivfTopK(emb, q, 10, nlist = 16, nprobe = 16)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(full === exact)
  }

  test("k-means refinement: deterministic, and full probe still exact") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    def run() = Similarity.ivfTopK(emb, q, 5, nlist = 8, nprobe = 2, refine = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(run() === run())
    // refined cells still partition the corpus: probing all of them
    // reproduces the brute-force baseline exactly
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    val full = Similarity.ivfTopK(emb, q, 5, nlist = 8, nprobe = 8, refine = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
    assert(full === exact)
  }

  test("int8 quantization: codes in range, zero vectors safe, reconstruction tight") {
    val withZero = vecs.unionByName(
      Seq((99L, Array(0.0f, 0.0f, 0.0f, 0.0f), 5)).toDF("vec_id", "embedding", "label"))
    val q = Similarity.quantizeInt8(withZero)
    val rows = q.select($"vec_id", $"q_scale", $"q_emb").collect()
    rows.foreach { r =>
      val codes = r.getSeq[Byte](2)
      assert(codes.forall(c => c >= -127 && c <= 127))
      if (r.getLong(0) == 99L) {
        assert(r.getFloat(1) === 0.0f)
        assert(codes.forall(_ === 0.toByte))
      }
    }
    // dequantized cosine stays ~1 on non-zero vectors
    val deq = q.filter($"vec_id" =!= 99L)
      .select(Similarity.cosine($"embedding",
        Similarity.dequantizeInt8(q)).as("c")).as[Double].collect()
    assert(deq.forall(_ >= 0.999))
  }

  test("incremental embedding dedup ≡ full-union brute restricted to fresh") {
    val emb = tables.Tables.embeddings(spark, sf)
    val corpus = emb.filter($"vec_id" < 250)
    val fresh = emb.filter($"vec_id" >= 250)
    val inc = Similarity.cosineIncremental(corpus, fresh, 0.45)
      .select("vec_id").as[Long].collect().toSet
    val victims = Similarity.cosinePairsBrute(emb, 0.45)
      .select("vec_id_b").as[Long].collect().toSet
    val expected = fresh.select("vec_id").as[Long].collect().toSet -- victims
    assert(inc === expected)
  }

  test("embedding near-dup: lsh candidates are a subset of brute pairs") {
    val emb = tables.Tables.embeddings(spark, sf)
    val brute = Similarity.cosinePairsBrute(emb, 0.45)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect().toSet
    val lsh = Similarity.cosinePairsLsh(emb, 0.45)
      .select("vec_id_a", "vec_id_b").as[(Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    // exact verify stage ⇒ no false positives, ever
    assert(lsh.subsetOf(brute))
    assert(lsh.nonEmpty)
  }

  test("persisted IVF index: partitioned cells; reload+probe ≡ in-flight") {
    import graft.tables.VectorIndex
    val emb = tables.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("vindex_test").toString
    try {
      VectorIndex.write(emb, dir, nlist = 8)
      // cells land partitioned by centroid_id — the layout probe
      // pruning depends on
      val parts = new java.io.File(s"$dir/cells").list()
      assert(parts.exists(_.startsWith("centroid_id=")), parts.mkString(","))
      val q = emb.filter($"vec_id" < 3)
      val persisted = VectorIndex.topK(spark, dir, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      val inflight = graft.operators.Similarity
        .ivfTopK(emb, q, 5, nlist = 8, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      assert(persisted === inflight)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("index append: no rebuild, standing cells untouched, full probe ≡ brute") {
    import graft.tables.VectorIndex
    val emb = tables.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("vindex_app_test").toString
    try {
      VectorIndex.write(emb.filter($"vec_id" >= 50), dir, nlist = 8)
      val before = new java.io.File(s"$dir/cells").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
      VectorIndex.append(emb.filter($"vec_id" < 50), dir)
      // append only ADDS files — every pre-existing cell file survives
      val after = new java.io.File(s"$dir/cells").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
      before.foreach { case (p, m) =>
        assert(after.get(p).contains(m), s"standing cell file rewritten: $p")
      }
      assert(after.size > before.size, "append added no cell files")
      // full probe over the appended index loses nothing vs brute force
      val q = emb.filter($"vec_id" < 3)
      val appended = VectorIndex.topK(spark, dir, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      val brute = Similarity.bruteForceTopK(emb, q, 5)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      assert(appended === brute)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("index compaction: batch roots fold into one cells tree, probe unmoved, source untouched") {
    import graft.tables.VectorIndex
    val emb = tables.Tables.embeddings(spark, sf)
    val src = java.nio.file.Files.createTempDirectory("vindex_cmp_src").toString
    val dstBase = java.nio.file.Files.createTempDirectory("vindex_cmp_dst").toString
    val dst = s"$dstBase/idx"
    try {
      VectorIndex.write(emb.filter($"vec_id" >= 50), src, nlist = 8)
      VectorIndex.append(emb.filter($"vec_id" < 50), src,
        batch = Some("0")) // a batch root, so compaction has one to fold
      val q = emb.filter($"vec_id" < 3)
      def top(d: String) = VectorIndex.topK(spark, d, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      val before = top(src)
      val srcFiles = java.nio.file.Files.walk(java.nio.file.Paths.get(src))
        .iterator()
      val srcState = {
        import scala.jdk.CollectionConverters._
        srcFiles.asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => p.toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      }
      VectorIndex.compactTo(spark, src, dst)
      // one generation at the target, nothing batch-rooted
      assert(Option(new java.io.File(dst).listFiles()).toSeq.flatten
        .forall(f => !f.getName.startsWith("cells_batch_")))
      assert(top(dst) === before, "compaction moved a probe result")
      val srcAfter = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(java.nio.file.Paths.get(src)).iterator()
          .asScala.filter(java.nio.file.Files.isRegularFile(_))
          .map(p => p.toString ->
            java.nio.file.Files.getLastModifiedTime(p).toMillis).toMap
      }
      assert(srcAfter === srcState, "write-new compaction touched the source")
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(src)); rm(new java.io.File(dstBase))
    }
  }

  test("index tombstones: O(|ids|) delete, immediate on float AND pq paths, compaction folds") {
    import graft.tables.VectorIndex
    val emb = tables.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("vindex_del_test").toString
    val cmpBase = java.nio.file.Files.createTempDirectory("vindex_del_cmp").toString
    val cmp = s"$cmpBase/idx"
    try {
      VectorIndex.write(emb, dir, nlist = 8)
      VectorIndex.writePq(emb, dir, nlist = 8, m = 8, ksub = 16)
      def cellFileState() = new java.io.File(s"$dir/cells").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
      val cellFiles = cellFileState()
      val dead = emb.filter($"vec_id" % 7 === 3).select($"vec_id")
      VectorIndex.delete(dead, dir, batch = Some("1"))
      VectorIndex.delete(dead, dir, batch = Some("1")) // redelivery no-op
      // no cell partition was rewritten by the delete
      assert(cellFileState() === cellFiles)
      val q = emb.filter($"vec_id" < 3)
      // float path: full probe ≡ brute force over the LIVE corpus
      val live = emb.filter($"vec_id" % 7 =!= 3)
      assert(VectorIndex.topK(spark, dir, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq ===
        Similarity.bruteForceTopK(live, q, 5)
          .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq)
      // compressed path filters too: no tombstoned id in any ADC top-k
      VectorIndex.pqTopK(spark, dir, q, 5, nprobe = 8).collect()
        .foreach(r => assert(r.getAs[Long]("vec_id") % 7 != 3))
      // compaction folds the tombstones: the new generation carries no
      // delete sets and probes identically
      VectorIndex.compactTo(spark, dir, cmp)
      assert(Option(new java.io.File(cmp).listFiles()).toSeq.flatten
        .forall(f => !f.getName.startsWith("deletes_batch_")))
      assert(VectorIndex.topK(spark, cmp, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq ===
        VectorIndex.topK(spark, dir, q, 5, nprobe = 8)
          .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq)
      // the COMPRESSED side traveled with the compaction: ADC works
      // off the new root with no tombstoned id and matches the source
      assert(VectorIndex.pqTopK(spark, cmp, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq ===
        VectorIndex.pqTopK(spark, dir, q, 5, nprobe = 8)
          .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq)
      VectorIndex.pqTopK(spark, cmp, q, 5, nprobe = 8).collect()
        .foreach(r => assert(r.getAs[Long]("vec_id") % 7 != 3))
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir)); rm(new java.io.File(cmpBase))
    }
  }

  test("pq index append: standing codes untouched, append ≡ one-shot encode, probe ≡ in-flight") {
    import graft.tables.VectorIndex
    val emb = tables.Tables.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("vindex_pq_test").toString
    try {
      VectorIndex.writePq(emb.filter($"vec_id" >= 50), dir, nlist = 8,
        m = 8, ksub = 16)
      val before = new java.io.File(s"$dir/codes").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
      VectorIndex.appendPq(emb.filter($"vec_id" < 50), dir)
      // append only ADDS code files — standing codes survive untouched
      val after = new java.io.File(s"$dir/codes").listFiles()
        .filter(_.getName.startsWith("centroid_id="))
        .flatMap(_.listFiles()).map(f => f.getPath -> f.lastModified()).toMap
      before.foreach { case (p, t) =>
        assert(after.get(p).contains(t), s"standing code file rewritten: $p")
      }
      assert(after.size > before.size, "append added no code files")
      // append path == one-shot encode of the union against the SAME
      // persisted artifacts (assignment + residual + encode are
      // deterministic given fixed centroids/codebooks)
      val centroids = spark.read.parquet(s"$dir/centroids")
      val codebooks = spark.read.parquet(s"$dir/codebooks")
      val oneshot = Similarity.pqEncode(
          Similarity.ivfpqResiduals(emb, centroids), codebooks,
          m = 8, dim = 64, carry = Seq("centroid_id"))
        .select($"vec_id", $"centroid_id", $"codes")
        .as[(Long, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      val appended = VectorIndex.pqCodes(spark, dir)
        .select($"vec_id", $"centroid_id", $"codes")
        .as[(Long, Long, Seq[Long])].collect().map(r => r._1 -> ((r._2, r._3)))
        .toMap
      assert(appended === oneshot)
      // persisted ADC probe == in-flight ivfpqProbe over the same relations
      val q = emb.filter($"vec_id" < 3)
      val persisted = VectorIndex.pqTopK(spark, dir, q, 5, nprobe = 8)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      val inflight = Similarity.ivfpqProbe(centroids, codebooks,
          VectorIndex.pqCodes(spark, dir), q, 5, nprobe = 8, m = 8, dim = 64)
        .select("query_id", "vec_id").as[(Long, Long)].collect().toSeq
      assert(persisted === inflight && persisted.nonEmpty)
    } finally {
      def rm(p: java.io.File): Unit = {
        Option(p.listFiles).foreach(_.foreach(rm)); p.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("ivf: probes return valid ranked neighbours with decent recall") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, q, 5)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(emb, q, 5, nlist = 8, nprobe = 3)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert(ivf.nonEmpty)
    assert(ivf.forall { case (qid, vid) => qid != vid })
    assert((ivf intersect exact).nonEmpty)
  }

  test("pq encode: m codes per vector, all in range, partitioning-independent") {
    val emb = tables.Tables.embeddings(spark, sf)
    val (m, ksub) = (16, 64)
    val cb = Similarity.pqCodebooks(emb, m, ksub)
    // every subspace has a full, dense codebook
    val bySub = cb.groupBy($"sub_idx").count().as[(Int, Long)].collect().toMap
    assert(bySub.keySet === (0 until m).toSet)
    assert(bySub.values.forall(_ == ksub.toLong))
    val enc = Similarity.pqEncode(emb, cb, m)
      .select($"vec_id", $"codes").as[(Long, Seq[Long])].collect().toMap
    assert(enc.values.forall(c => c.length == m && c.forall(x => x >= 0 && x < ksub)))
    val enc2 = Similarity.pqEncode(emb.repartition(13), cb, m)
      .select($"vec_id", $"codes").as[(Long, Seq[Long])].collect().toMap
    assert(enc2 === enc)
  }

  test("pq adc score equals cosine against the codebook reconstruction") {
    val emb = tables.Tables.embeddings(spark, sf)
    val (m, ksub, dim) = (16, 64, 64)
    val sd = dim / m
    val cb = Similarity.pqCodebooks(emb, m, ksub)
      .as[(Int, Long, Seq[Float])].collect()
      .map { case (s, c, v) => (s, c) -> v }.toMap
    val codes = Similarity.pqEncode(emb, Similarity.pqCodebooks(emb, m, ksub), m)
      .select($"vec_id", $"codes").as[(Long, Seq[Long])].collect().toMap
    val byId = emb.select($"vec_id", $"embedding")
      .as[(Long, Seq[Float])].collect().toMap
    val got = Similarity.pqTopK(emb, emb.filter($"vec_id" < 2), 5, m, ksub)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (qid, vid, _, adc) =>
      val recon = codes(vid).zipWithIndex.flatMap { case (c, s) => cb((s, c)) }
      val q = byId(qid)
      val dot = recon.zip(q).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val expected = dot / (math.sqrt(recon.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(q.map(x => x.toDouble * x.toDouble).sum))
      assert(math.abs(adc - expected) < 1e-9,
        s"adc=$adc expected=$expected for ($qid,$vid)")
    }
  }

  test("pq rerank: exact cosines for survivors, recall ≥ pure adc") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.pqTopKReranked(emb, q, 10, candidates = 100)
      .as[(Long, Long, Int, Double)].collect()
    assert(rr.forall { case (qid, vid, _, _) => qid != vid })
    // survivors carry their TRUE cosine (the float tier re-scored them)
    val byId = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    rr.take(10).foreach { case (qid, vid, _, c) =>
      val (a, b) = (byId(qid), byId(vid))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val expected = dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
      assert(math.abs(c - expected) < 1e-6)
    }
    val rrSet = rr.map { case (qid, vid, _, _) => (qid, vid) }.toSet
    val adcSet = Similarity.pqTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    assert((rrSet intersect exact).size >= (adcSet intersect exact).size)
  }

  test("knn graph: dense ranks per cellmate count, repartition-stable, true cosines") {
    val emb = tables.Tables.embeddings(spark, sf)
    val g = Similarity.knnGraphIvf(emb, k = 5, nlist = 8)
      .select($"vec_id", $"centroid_id", $"nb_id", $"cosine", $"rank")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(g.nonEmpty)
    assert(g.forall { case (v, _, nb, _, _) => v != nb })
    // ranks are dense 1..min(k, cellmates) per vector
    val cellOf = g.map(r => r._1 -> r._2).toMap
    val cellSize = g.map(r => r._2).distinct.map { c =>
      c -> g.filter(_._2 == c).map(_._1).distinct.length
    }.toMap
    g.groupBy(_._1).foreach { case (v, rows) =>
      val expected = math.min(5, cellSize(cellOf(v)) - 1)
      assert(rows.map(_._5).sorted.toSeq === (1L to expected.toLong),
        s"vector $v ranks not dense")
    }
    // neighbours carry their true cosine and rank by it
    val byId = emb.filter($"embedding".isNotNull)
      .select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    g.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._5)
      assert(sorted.map(_._4).zip(sorted.tail.map(_._4)).forall { case (a, b) => a >= b })
    }
    g.take(20).foreach { case (v, _, nb, c, _) =>
      val (a, b) = (byId(v), byId(nb))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val expect = dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
      assert(math.abs(c - math.max(-1.0, math.min(1.0, expect))) < 1e-12)
    }
    val g2 = Similarity.knnGraphIvf(emb.repartition(11), k = 5, nlist = 8)
      .select($"vec_id", $"nb_id", $"rank").as[(Long, Long, Long)].collect().toSet
    assert(g2 === g.map(r => (r._1, r._3, r._5)).toSet)
  }

  test("knn pagerank: integer-exact update verified against the graph, repartition-stable") {
    val emb = tables.Tables.embeddings(spark, sf)
    val Scale = 1000000000000L
    val pr = Similarity.knnPageRank(emb, iters = 2, k = 5, nlist = 8)
      .as[(Long, Long)].collect()
    val live = emb.filter($"embedding".isNotNull).count()
    assert(pr.length.toLong === live)
    // replay the two integer rounds from the graph edges in scala
    val g = Similarity.knnGraphIvf(emb, k = 5, nlist = 8)
      .select($"vec_id", $"nb_id").as[(Long, Long)].collect()
    val deg = g.groupBy(_._1).map { case (s, e) => s -> e.length.toLong }
    val nodes = pr.map(_._1)
    var ranks = nodes.map(_ -> Scale).toMap
    for (_ <- 1 to 2) {
      val in = g.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map(e => ranks(e._1) / deg(e._1)).sum
      }
      ranks = nodes.map(v =>
        v -> (Scale / 100L * 15L + 85L * in.getOrElse(v, 0L) / 100L)).toMap
    }
    pr.foreach { case (v, rq) => assert(rq === ranks(v), s"node $v") }
    // a node nobody links to sits at exactly the damped base
    val inDeg = g.map(_._2).toSet
    nodes.filterNot(inDeg).foreach(v => assert(ranks(v) === 150000000000L))
    val pr2 = Similarity.knnPageRank(emb.repartition(9), iters = 2, k = 5, nlist = 8)
      .as[(Long, Long)].collect().toMap
    assert(pr2 === pr.toMap)
  }

  test("label propagation: seeds keep labels, majority + tie rule verified vs graph") {
    val emb = tables.Tables.embeddings(spark, sf)
    val out = Similarity.labelPropagate(emb, k = 5, nlist = 8)
      .as[(Long, Boolean, Option[Int], Long)].collect()
    assert(out.length.toLong === emb.filter($"embedding".isNotNull).count())
    val labels = emb.filter($"embedding".isNotNull)
      .select($"vec_id", $"label").as[(Long, Int)].collect().toMap
    // independently recompute from the graph the op is defined over
    val g = Similarity.knnGraphIvf(emb, k = 5, nlist = 8)
      .select($"vec_id", $"nb_id").as[(Long, Long)].collect()
    val seedVotes = g.filter(_._2 % 10 == 0)
      .groupBy(_._1).map { case (v, rows) =>
        val counts = rows.map(r => labels(r._2)).groupBy(identity)
          .map { case (l, o) => (l, o.length) }
        v -> counts.toSeq.sortBy { case (l, n) => (-n, l) }.head
      }
    out.foreach { case (v, isSeed, pred, votes) =>
      assert(isSeed === (v % 10 == 0))
      if (isSeed) assert(pred === Some(labels(v)))
      else seedVotes.get(v) match {
        case Some((l, n)) => assert(pred === Some(l) && votes === n.toLong)
        case None => assert(pred.isEmpty && votes === 0L)
      }
    }
    // the fixture must exercise both propagation and the no-seed case
    assert(out.exists { case (_, s, p, _) => !s && p.nonEmpty })
  }

  test("ivfpq: exact ranking when the codebook covers every residual") {
    // ksub = corpus size → every residual IS a codebook entry, the ADC
    // reconstruction is exact, and full-probe IVF-PQ must reproduce the
    // brute-force ranking (ulp-level LUT-algebra differences can't
    // reorder the fixture's well-separated cosines).
    val out = Similarity.ivfpqTopK(vecs, vecs.filter($"vec_id" === 0L), 3,
        nlist = 2, nprobe = 2, m = 2, ksub = 5, dim = 4)
      .select("vec_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 4L, 2L))
  }

  test("ivfpq: residuals reconstruct, nulls stay invisible, encode deterministic") {
    val withNulls = vecs.unionByName(Seq(
      (10L, null.asInstanceOf[Array[Float]], 9)
    ).toDF("vec_id", "embedding", "label"))
    val cents = Similarity.ivfCentroids(withNulls, nlist = 2)
      .as[(Long, Seq[Float])].collect().toMap
    val resid = Similarity.ivfpqResiduals(withNulls, Similarity.ivfCentroids(withNulls, 2))
      .select($"vec_id", $"centroid_id", $"embedding")
      .as[(Long, Long, Option[Seq[Float]])].collect()
    val byId = vecs.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    resid.foreach {
      case (10L, cell, r) => assert(cell === -1L && r.isEmpty)
      case (vid, cell, Some(r)) =>
        val rebuilt = r.zip(cents(cell)).map { case (x, c) => x + c }
        rebuilt.zip(byId(vid)).foreach { case (a, b) => assert(math.abs(a - b) < 1e-6f) }
      case other => fail(s"unexpected residual row $other")
    }
    // encode with the centroid_id carry is partitioning-independent
    val centroids = Similarity.ivfCentroids(withNulls, 2)
    val res = Similarity.ivfpqResiduals(withNulls, centroids)
    val cb = Similarity.pqCodebooks(res, m = 2, ksub = 4, dim = 4)
    val e1 = Similarity.pqEncode(res, cb, m = 2, dim = 4, carry = Seq("centroid_id"))
      .select($"vec_id", $"centroid_id", $"codes")
      .as[(Long, Long, Seq[Long])].collect().toSet
    val e2 = Similarity.pqEncode(res.repartition(7), cb, m = 2, dim = 4,
        carry = Seq("centroid_id"))
      .select($"vec_id", $"centroid_id", $"codes")
      .as[(Long, Long, Seq[Long])].collect().toSet
    assert(e1 === e2)
    assert(e1.collect { case (10L, _, codes) => codes }.head === Seq(-1L, -1L))
  }

  test("ivfpq rerank on real data: true cosines, recall vs exact baseline") {
    val emb = tables.Tables.embeddings(spark, sf)
    val q = emb.filter($"vec_id" < 3)
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val rr = Similarity.ivfpqTopKReranked(emb, q, 10, candidates = 100)
      .as[(Long, Long, Int, Double)].collect()
    assert(rr.forall { case (qid, vid, _, _) => qid != vid })
    val byId = emb.select($"vec_id", $"embedding").as[(Long, Seq[Float])].collect().toMap
    rr.take(10).foreach { case (qid, vid, _, c) =>
      val (a, b) = (byId(qid), byId(vid))
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      val expected = dot / (math.sqrt(a.map(x => x.toDouble * x.toDouble).sum) *
        math.sqrt(b.map(x => x.toDouble * x.toDouble).sum))
      assert(math.abs(c - expected) < 1e-6)
    }
    // full probe: only PQ quantization can cost recall; the reranked
    // top-10 must recover at least half the exact set per query
    val rrByQ = rr.groupBy(_._1).map { case (qid, rows) =>
      qid -> rows.map(_._2).toSet }
    exact.groupBy(_._1).foreach { case (qid, pairs) =>
      val hits = (pairs.map(_._2) intersect rrByQ.getOrElse(qid, Set())).size
      assert(hits >= pairs.size / 2, s"query $qid recall $hits/${pairs.size}")
    }
  }

  test("exact k-means: partitioning-independent centroids and assignment") {
    val emb = tables.Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val a = Similarity.kmeansAssign(emb.repartition(3),
        Similarity.kmeansCentroids(emb.repartition(3), 8, 2))
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    val b = Similarity.kmeansAssign(emb.repartition(17),
        Similarity.kmeansCentroids(emb.repartition(17), 8, 2))
      .select("vec_id", "centroid_id").as[(Long, Long)].collect().toMap
    assert(a === b)
    assert(a.keySet.size.toLong === emb.count()) // every live vector assigned
    assert(a.values.toSet.subsetOf(
      Similarity.kmeansSeeds(emb, 8).select("centroid_id")
        .as[Long].collect().toSet)) // ids come from the seed set
  }

  test("jl projection: shape, determinism, JL distance concentration") {
    val emb = tables.Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val p = Similarity.jlProject(emb)
      .select("vec_id", "proj").as[(Long, Seq[Float])].collect()
    assert(p.length.toLong === emb.count())
    assert(p.forall(_._2.length === 16))
    val p2 = Similarity.jlProject(emb.repartition(7))
      .select("vec_id", "proj").as[(Long, Seq[Float])].collect().toMap
    assert(p.toMap === p2) // partitioning-independent, bit-identical
    // the JL guarantee actually holds on this data: the bulk of pair
    // distances land within ±50% (E[ratio]=1, sd≈sqrt(2/16)≈0.35)
    val d = Similarity.jlDistortion(emb, 5)
      .as[(Long, Long, Double, Double)].head()
    assert(d._1 > 0)
    assert(d._2.toDouble / d._1 > 0.70, s"within-half frac ${d._2}/${d._1}")
    assert(d._3 > 0.0 && d._4 < 10.0)
  }

  test("jl rerank: true cosines, no self, recall vs brute is real") {
    val emb = tables.Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val q = emb.filter($"vec_id" < 5)
    val got = Similarity.jlTopKReranked(emb, q, 10, 100)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.forall { case (qid, vid, _, _) => qid != vid })
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id").as[(Long, Long)].collect().toSet
    val gotSet = got.map { case (qid, vid, _, _) => (qid, vid) }.toSet
    val recall = (gotSet intersect exact).size.toDouble / exact.size
    assert(recall >= 0.5, s"jl rerank recall $recall")
  }

  test("matryoshka rerank: full-candidate pass ≡ brute; narrow pass has real recall") {
    val emb = tables.Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val q = emb.filter($"vec_id" < 5)
    val n = emb.count().toInt
    // candidates = whole corpus → the prefix tier cannot lose anyone:
    // output must equal brute-force exactly (ids AND cosines)
    val full = Similarity.matryoshkaTopKReranked(emb, q, 10, n)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)]
      .collect().toSet
    val exact = Similarity.bruteForceTopK(emb, q, 10)
      .select("query_id", "vec_id", "cosine").as[(Long, Long, Double)]
      .collect().toSet
    assert(full === exact)
    // production operating point: top-100 prefix candidates
    val got = Similarity.matryoshkaTopKReranked(emb, q, 10, 100)
      .as[(Long, Long, Int, Double)].collect()
    assert(got.forall { case (qid, vid, _, _) => qid != vid })
    val gotSet = got.map { case (qid, vid, _, _) => (qid, vid) }.toSet
    val exactIds = exact.map { case (qid, vid, _) => (qid, vid) }
    val recall = (gotSet intersect exactIds).size.toDouble / exactIds.size
    assert(recall >= 0.5, s"matryoshka rerank recall $recall")
  }

  test("semantic dedup: victims ⊆ brute victims; survivors + victims partition") {
    val emb = tables.Tables.embeddings(spark, sf).filter($"embedding".isNotNull)
    val survivors = Similarity.semanticDedup(emb, 16, 0.45)
      .select("vec_id").as[Long].collect().toSet
    val all = emb.select("vec_id").as[Long].collect().toSet
    val victims = all diff survivors
    // precision: every semantic victim is a true ≥-threshold near-dup
    // victim under the GLOBAL brute pair set (within-cluster pairs are
    // a subset of all pairs, so this must hold exactly)
    val bruteVictims = Similarity.cosinePairsBrute(emb, 0.45)
      .select("vec_id_b").as[Long].collect().toSet
    assert(victims.subsetOf(bruteVictims),
      s"false positives: ${victims diff bruteVictims}")
    assert(survivors.union(victims) === all)
  }

  test("prototypicality prune: proportional quotas, hard/easy asymmetry") {
    // 20 vectors around two orthogonal prototypes with per-vector
    // noise so cosines are distinct within each cluster.
    val pts = (0 until 20).map { i =>
      val base = if (i < 12) Array(1.0f, 0.0f, 0.0f, 0.0f)
                 else Array(0.0f, 1.0f, 0.0f, 0.0f)
      val v = base.clone()
      v(2) = 0.02f * (i % 7)     // varying off-axis noise
      v(3) = 0.01f * (i % 5)
      (i.toLong, v, i / 12)
    }.toDF("vec_id", "embedding", "label")
    val hard = Similarity.prototypicalityPrune(pts, k = 2, sweeps = 1,
      keepFrac = 0.5, keepHard = true)
    val easy = Similarity.prototypicalityPrune(pts, k = 2, sweeps = 1,
      keepFrac = 0.5, keepHard = false)
    val assigned = Similarity.kmeansAssign(pts,
      Similarity.kmeansCentroids(pts, 2, 1))
      .select($"vec_id", $"centroid_id", $"cos")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byCell = assigned.groupBy(_._2)
    // Per-cluster quota: ceil(0.5·n_c) rows from each cell, both modes.
    for (m <- Seq(hard, easy)) {
      val kept = m.select($"vec_id", $"centroid_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      kept.groupBy(_._2).foreach { case (cell, rows) =>
        assert(rows.length == math.ceil(byCell(cell).length * 0.5).toLong,
          s"cell $cell quota")
      }
    }
    // Asymmetry: every kept-hard cosine ≤ every dropped one per cell
    // (and the reverse for keep-easy).
    val hardIds = hard.select($"vec_id").as[Long].collect().toSet
    byCell.foreach { case (_, rows) =>
      val (kept, dropped) = rows.partition(r => hardIds(r._1))
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).max <= dropped.map(_._3).min + 1e-12)
    }
    val easyIds = easy.select($"vec_id").as[Long].collect().toSet
    byCell.foreach { case (_, rows) =>
      val (kept, dropped) = rows.partition(r => easyIds(r._1))
      if (kept.nonEmpty && dropped.nonEmpty)
        assert(kept.map(_._3).min >= dropped.map(_._3).max - 1e-12)
    }
  }
}
