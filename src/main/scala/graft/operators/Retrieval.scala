package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions._

/** Lexical retrieval over the corpus: an inverted posting relation,
  * BM25 ranked search, boolean-AND search, exact phrase filter, and
  * reciprocal-rank-fusion of lexical + vector candidates (hybrid
  * search — the retrieval shape RAG-style training-data tooling runs
  * over a pretraining corpus).
  *
  * 100 TB shape: [[postingsStaged]] is THE stored artifact — an
  * inverted index keyed by term, hash-bucketed on term so a query
  * touches only its own terms' buckets, rolled forward batch over
  * batch exactly like the MinHash pair sets and LM counts. Per-query
  * work is then postings-of-query-terms sized, never corpus sized;
  * the query relation and per-term stats are broadcast (bounded by
  * vocabulary, not data); the final fusion joins are over
  * queries×k rows. Nothing in the query path scans the corpus.
  *
  * Exactness discipline (the DuckDB oracle hash-matches): BM25's only
  * transcendental is the idf. Lucene's variant
  * `ln(1 + (N - df + 0.5)/(df + 0.5))` is identically
  * `ln(N + 1) - ln(df + 0.5)` — BOTH ln arguments are exactly
  * representable doubles (an integer and an integer plus one half),
  * so the established quantized-ln rule applies: `round(ln(x)*1e12)`
  * as a long, integer subtraction, and every remaining factor is a
  * correctly-rounded IEEE chain mirrored operation-for-operation in
  * the oracle SQL.
  */
object Retrieval {

  /** Inverted posting relation: one row per (term, doc) with the term
    * frequency and the document length — dl rides on the posting row
    * so scoring never re-joins a doc-stats relation. Blank/null-text
    * docs contribute no postings (they can never match a term query).
    */
  def postingsStaged(docs: DataFrame): DataFrame =
    Stage.relation("retrieval.postings", Seq(docs)) {
      Par.widen(docs, col("doc_id"))
        .select(col("doc_id"), tokens(col("text")).as("__toks"))
        .filter(size(col("__toks")) > 0)
        .select(col("doc_id"), size(col("__toks")).cast("long").as("dl"),
          explode(col("__toks")).as("term"))
        .groupBy(col("term"), col("doc_id"), col("dl"))
        .agg(count(lit(1)).as("tf"))
    }

  /** [[postingsStaged]] with FACET columns riding each posting row
    * (the dl discipline applied to metadata): a filtered query then
    * prunes postings by a pushed predicate on its own scan instead of
    * joining a corpus-sized doc-metadata relation — the only filter
    * shape that survives 100 TB when the predicate is unselective.
    */
  def postingsStagedWith(docs: DataFrame, carry: Seq[String]): DataFrame =
    Stage.relation(s"retrieval.postings.${carry.mkString("+")}",
      Seq(docs)) {
      Par.widen(docs, col("doc_id"))
        .select(col("doc_id") +: carry.map(col) :+
          tokens(col("text")).as("__toks"): _*)
        .filter(size(col("__toks")) > 0)
        .select(col("doc_id") +: carry.map(col) :+
          size(col("__toks")).cast("long").as("dl") :+
          explode(col("__toks")).as("term"): _*)
        .groupBy((Seq("term", "doc_id", "dl") ++ carry).map(col): _*)
        .agg(count(lit(1)).as("tf"))
    }

  /** FILTERED (faceted) search — Elasticsearch's filter-context
    * semantics: `filter` restricts which documents may rank, while
    * df and corpus statistics stay CORPUS-WIDE (a filter narrows the
    * candidate set, it does not re-weigh term rarity — scores of
    * surviving docs are bit-identical to their unfiltered scores).
    * The facet columns named in `carry` ride the posting rows, so the
    * predicate prunes the postings scan directly; nothing joins the
    * corpus. Fully exact — the oracle spells the same semantics with
    * a membership subquery.
    */
  def bm25TopKFiltered(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                       carry: Seq[String],
                       filter: org.apache.spark.sql.Column,
                       k: Int = 10, k1: Double = 1.2,
                       b: Double = 0.75): DataFrame = {
    val p = postingsStagedWith(docs, carry).filter(filter)
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    scoreBm25(p, termStatsStaged(docs), corpusStatsStaged(docs),
      queries, k, k1, b)
  }

  /** Per-term document frequency — vocabulary-sized by construction
    * (one row per distinct term), hence always broadcast at the join.
    */
  def termStatsStaged(docs: DataFrame): DataFrame =
    Stage.relation("retrieval.termstats", Seq(docs)) {
      postingsStaged(docs).groupBy(col("term")).agg(count(lit(1)).as("df"))
    }

  /** Corpus-level constants (one row): document count and total token
    * count over ALL docs (null text counts 0 tokens, matching the
    * oracle's coalesce convention). avgdl is derived at use sites as
    * `sum_dl / n_docs` so Spark and DuckDB share the division tree.
    */
  def corpusStatsStaged(docs: DataFrame): DataFrame =
    Stage.relation("retrieval.corpusstats", Seq(docs)) {
      // r18: sum_dl derives from the postings artifact — Σ tf over
      // posting rows ≡ Σ size(tokens) over docs (null/blank text
      // emits no postings ≡ the 0-coalesce; the guard keeps an
      // all-blank corpus at 0, not null). n_docs is a text-free row
      // count. Was a second full tokenize pass of the corpus.
      docs.agg(count(lit(1)).as("n_docs"))
        .crossJoin(postingsStaged(docs)
          .agg(coalesce(sum(col("tf")), lit(0L)).as("sum_dl")))
    }

  private def queryRelation(docs: DataFrame,
                            queries: Seq[(Long, Seq[String])]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    queries.flatMap { case (qid, ts) => ts.map(t => (qid, t)) }
      .toDF("query_id", "term")
  }

  /** BM25 top-k: ranked documents per term query.
    *
    * Plan: postings ⋈ broadcast(query terms) prunes to query-term
    * postings, ⋈ broadcast(term df), × broadcast(1-row corpus stats);
    * per-(query, doc) contributions sum as exact longs; a per-query
    * window takes the top k on (score desc, doc_id). The quantized
    * idf makes the score an integer — ties and ordering are exact.
    */
  def bm25TopK(docs: DataFrame, queries: Seq[(Long, Seq[String])],
               k: Int = 10, k1: Double = 1.2, b: Double = 0.75): DataFrame =
    scoreBm25(postingsStaged(docs), termStatsStaged(docs),
      corpusStatsStaged(docs), queries, k, k1, b)

  private[graft] def scoreBm25(p: DataFrame, termStats: DataFrame,
                        corpusStats: DataFrame,
                        queries: Seq[(Long, Seq[String])],
                        k: Int, k1: Double, b: Double): DataFrame =
    rankTopK(scoreBm25Unranked(p, termStats, corpusStats, queries,
      k1, b), k)

  /** The per-(query, doc) exact-long BM25 sums WITHOUT the rank
    * window — the hook the filter-clause composition restricts before
    * ranking (ranks must be assigned within the eligible set). */
  private[graft] def scoreBm25Unranked(p: DataFrame, termStats: DataFrame,
                                       corpusStats: DataFrame,
                                       queries: Seq[(Long, Seq[String])],
                                       k1: Double, b: Double): DataFrame = {
    val q = queryRelation(p, queries)
    val idfQ =
      (round(log(col("n_docs").cast("double") + 1.0d) * 1e12d) -
        round(log(col("df").cast("double") + 0.5d) * 1e12d)).cast("long")
    val avgdl = col("sum_dl").cast("double") / col("n_docs").cast("double")
    val tfD = col("tf").cast("double")
    val tfNorm = (tfD * (k1 + 1.0d)) /
      (tfD + lit(k1) * (lit(1.0d - b) + lit(b) *
        (col("dl").cast("double") / avgdl)))
    p.join(broadcast(q), Seq("term"))
      .join(broadcast(termStats), Seq("term"))
      .crossJoin(broadcast(corpusStats))
      .select(col("query_id"), col("doc_id"),
        round(idfQ.cast("double") * tfNorm).cast("long").as("contrib_q"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib_q")).as("score_q"))
  }

  /** The per-query top-k window over (query_id, doc_id, score_q). */
  private[graft] def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score_q").desc, col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .withColumn("score", col("score_q").cast("double") / 1e12d)
      .orderBy(col("query_id"), col("rank"))
  }

  /** BM25 over a ROLLED-FORWARD index: the corpus arrives as batches
    * with disjoint doc sets, and every index artifact is additive —
    * postings union (disjoint docs never collide on (term, doc)),
    * per-term df sums, and the 1-row corpus stats sum component-wise.
    * Scoring then runs the exact [[bm25TopK]] plan over the merged
    * artifacts, so incremental ≡ full-rebuild bit-for-bit (the driver
    * gate pins it against the SAME oracle as bm25_topk).
    *
    * This is the 100 TB maintenance path: a day's ingest appends its
    * posting increment and bumps term/corpus stats; the corpus is
    * never rescanned. (In-process the increments stage per batch via
    * [[Stage.relation]]; a deployment persists them — same contract
    * as the IVF-PQ append and the Bloom-gated exact dedup.)
    */
  def bm25TopKIncremental(batches: Seq[DataFrame],
                          queries: Seq[(Long, Seq[String])],
                          k: Int = 10, k1: Double = 1.2,
                          b: Double = 0.75): DataFrame = {
    require(batches.nonEmpty, "need at least one corpus batch")
    val p = batches.map(postingsStaged).reduce(_.unionByName(_))
    val df = batches.map(termStatsStaged).reduce(_.unionByName(_))
      .groupBy(col("term")).agg(sum(col("df")).as("df"))
    val corpus = batches.map(corpusStatsStaged).reduce(_.unionByName(_))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("sum_dl")).as("sum_dl"))
    scoreBm25(p, df, corpus, queries, k, k1, b)
  }

  /** Boolean-AND search: documents containing EVERY query term, via
    * posting intersection (group count over the pruned postings —
    * postings hold one row per (term, doc), so `count == n_terms` is
    * the intersection test). Returns (query_id, doc_id, dl).
    */
  def booleanAnd(docs: DataFrame,
                 queries: Seq[(Long, Seq[String])]): DataFrame =
    booleanAndFrom(postingsStaged(docs), queries)
      .orderBy(col("query_id"), col("doc_id"))

  /** Boolean-OR search: documents containing ANY query term — posting
    * UNION with distinct membership (group count ≥ 1 over the pruned
    * postings). Same 100 TB shape as AND: only the query terms'
    * posting buckets are read, never the corpus. */
  def booleanOr(docs: DataFrame,
                queries: Seq[(Long, Seq[String])]): DataFrame =
    booleanOrFrom(postingsStaged(docs), queries)
      .orderBy(col("query_id"), col("doc_id"))

  /** Boolean AND-NOT search: documents containing EVERY include term
    * and NONE of the exclude terms. The exclusion is a
    * candidates-sized LEFT ANTI join of the AND-intersection against
    * the EXCLUDED terms' postings — the complement of an exclude term
    * is never materialized (the only NOT shape that survives 100 TB:
    * the anti-join's build side is the exclude terms' posting
    * buckets, its probe side the already-intersected candidates). */
  def booleanNot(docs: DataFrame,
                 queries: Seq[(Long, Seq[String], Seq[String])]): DataFrame =
    booleanNotFrom(postingsStaged(docs), queries)
      .orderBy(col("query_id"), col("doc_id"))

  /** Nested boolean query AST — Lucene's BooleanQuery shape: leaves
    * are terms, AND/OR nest arbitrarily, and NOT exists ONLY as the
    * binary difference `Diff(pos, neg)` (docs of `pos` minus docs of
    * `neg`) — a complement node is unrepresentable by construction,
    * so every evaluation stays bounded by the mentioned terms'
    * postings at any nesting depth. */
  sealed trait BoolExpr
  object BoolExpr {
    final case class Term(t: String) extends BoolExpr
    final case class And(es: Seq[BoolExpr]) extends BoolExpr {
      require(es.nonEmpty, "empty AND")
    }
    final case class Or(es: Seq[BoolExpr]) extends BoolExpr {
      require(es.nonEmpty, "empty OR")
    }
    final case class Diff(pos: BoolExpr, neg: BoolExpr) extends BoolExpr

    /** Every term the tree mentions — what the persisted path prunes
      * its bucket reads to. */
    def termsOf(e: BoolExpr): Seq[String] = e match {
      case Term(t) => Seq(t)
      case And(es) => es.flatMap(termsOf)
      case Or(es) => es.flatMap(termsOf)
      case Diff(a, b) => termsOf(a) ++ termsOf(b)
    }
  }

  /** Evaluate nested boolean queries over the corpus: each query's
    * tree compiles to set algebra over the pruned posting relation —
    * Term = that term's doc set, And = equi-join intersection, Or =
    * distinct union, Diff = LEFT ANTI difference. Returns
    * (query_id, doc_id, dl). 100 TB shape: every LEAF reads only its
    * term's posting bucket; And/Diff joins are bounded by their
    * smaller side's postings; nothing ever touches the corpus or a
    * complement. */
  def booleanTree(docs: DataFrame,
                  queries: Seq[(Long, BoolExpr)]): DataFrame =
    booleanTreeFrom(postingsStaged(docs), queries)
      .orderBy(col("query_id"), col("doc_id"))

  /** The tree evaluator over ANY (term, doc_id, dl) posting relation
    * — shared by the scan-staged path and the persisted index
    * ([[graft.tables.InvertedIndex.booleanTree]], where the relation
    * arrives bucket-pruned and tombstone-filtered). */
  private[graft] def booleanTreeFrom(p: DataFrame,
                                     queries: Seq[(Long, BoolExpr)]): DataFrame = {
    import BoolExpr._
    val pd = p.select(col("term"), col("doc_id"), col("dl"))
    def eval(e: BoolExpr): DataFrame = e match {
      case Term(t) =>
        pd.filter(col("term") === t).select(col("doc_id")).distinct()
      case And(es) =>
        es.map(eval).reduce((a, b) => a.join(b, Seq("doc_id")))
      case Or(es) =>
        es.map(eval).reduce(_.unionByName(_)).distinct()
      case Diff(pos, neg) =>
        eval(pos).join(eval(neg), Seq("doc_id"), "left_anti")
    }
    val dls = pd.select(col("doc_id"), col("dl")).distinct()
    queries.map { case (qid, e) =>
      eval(e).select(lit(qid).as("query_id"), col("doc_id"))
    }.reduce(_.unionByName(_))
      .join(dls, Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("dl"))
  }

  /** RANKED query with a BOOLEAN FILTER clause — Lucene's
    * must/filter composition: BM25 scores the query terms exactly as
    * [[bm25TopK]] (df/corpus stats corpus-wide — filter-context
    * semantics, a filter narrows membership, never re-weighs), but
    * only documents satisfying the filter TREE may rank. The filter
    * set evaluates by posting set algebra ([[booleanTree]]'s
    * evaluator — bounded by ITS terms' buckets), and the restriction
    * is a semi-join of the scoring rows against it: query cost is
    * (query-term buckets) + (filter-term buckets), corpus untouched.
    */
  def bm25TopKBooleanFiltered(docs: DataFrame,
                              queries: Seq[(Long, Seq[String], BoolExpr)],
                              k: Int = 10, k1: Double = 1.2,
                              b: Double = 0.75): DataFrame = {
    val p = postingsStaged(docs)
    val eligible = booleanTreeFrom(p,
      queries.map { case (qid, _, f) => (qid, f) })
      .select(col("query_id"), col("doc_id"))
    val scored = scoreBm25Unranked(p, termStatsStaged(docs),
      corpusStatsStaged(docs),
      queries.map { case (qid, ts, _) => (qid, ts) }, k1, b)
    rankTopK(scored.join(eligible, Seq("query_id", "doc_id")), k)
  }

  /** The AND core over ANY (term, doc_id, dl) posting relation —
    * shared by the scan-staged path and the persisted index
    * ([[graft.tables.InvertedIndex.booleanQuery]], where the relation
    * arrives term-bucket-pruned and tombstone-filtered). */
  private[graft] def booleanAndFrom(p: DataFrame,
                                    queries: Seq[(Long, Seq[String])]): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val sizes = queries.map { case (qid, ts) => (qid, ts.distinct.length.toLong) }
      .toDF("query_id", "n_terms")
    val q = queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    p.join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"), col("dl"))
      .agg(count(lit(1)).as("n_hit"))
      .join(broadcast(sizes), Seq("query_id"))
      .filter(col("n_hit") === col("n_terms"))
      .select(col("query_id"), col("doc_id"), col("dl"))
  }

  /** The OR core: distinct (query, doc) membership over the pruned
    * postings — a doc matching several of the query's terms (or one
    * term several times) appears once. */
  private[graft] def booleanOrFrom(p: DataFrame,
                                   queries: Seq[(Long, Seq[String])]): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    val q = queries.flatMap { case (qid, ts) => ts.distinct.map(t => (qid, t)) }
      .toDF("query_id", "term")
    p.join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("dl"))
      .distinct()
  }

  /** The AND-NOT core: intersect the includes, anti-join the
    * excludes. A query with NO include terms is refused rather than
    * silently complemented — `NOT x` alone would require enumerating
    * every document NOT containing x, the one posting shape with no
    * sub-corpus plan. */
  private[graft] def booleanNotFrom(p: DataFrame,
                                    queries: Seq[(Long, Seq[String], Seq[String])]): DataFrame = {
    val spark = p.sparkSession
    import spark.implicits._
    require(queries.forall(_._2.nonEmpty),
      "boolean NOT needs at least one include term per query " +
        "(a bare NOT materializes the corpus complement)")
    val candidates =
      booleanAndFrom(p, queries.map { case (qid, inc, _) => (qid, inc) })
    val exq = queries
      .flatMap { case (qid, _, ex) => ex.distinct.map(t => (qid, t)) }
    if (exq.isEmpty) return candidates
    val excluded = p
      .join(broadcast(exq.toDF("query_id", "term")), Seq("term"))
      .select(col("query_id"), col("doc_id"))
      .distinct()
    candidates.join(excluded, Seq("query_id", "doc_id"), "left_anti")
  }

  /** Exact phrase filter: documents whose text contains the words of
    * `phrase` adjacent and in order (single-space padded containment —
    * the corpus tokenizer's whitespace-run convention means adjacency
    * in token space is single-space adjacency after squeezing runs).
    * Pure string predicate, pushed to the scan; no postings needed.
    */
  def phraseSearch(docs: DataFrame, phrase: String): DataFrame =
    docs
      .filter(col("text").isNotNull &&
        concat(lit(" "),
          regexp_replace(col("text"), "\\s+", " "), lit(" "))
          .contains(s" $phrase "))
      .select(col("doc_id"), col("n_chars"))
      .orderBy(col("doc_id"))

  /** Positional postings: one row per token OCCURRENCE (doc, position,
    * term) — the classic positional inverted index. Staged like
    * [[postingsStaged]]; term-bucketed in production so a phrase query
    * reads only its own terms' buckets.
    */
  def positionalPostingsStaged(docs: DataFrame): DataFrame =
    Stage.relation("retrieval.pospostings", Seq(docs)) {
      Par.widen(docs, col("doc_id"))
        .select(col("doc_id"), posexplode(tokens(col("text"))))
        .toDF("doc_id", "pos", "term")
    }

  /** Ordered-window proximity — the `#N(w1…wk)` operator of the
    * sequential-dependence model (Metzler & Croft 2005, "A Markov
    * Random Field Model for Term Dependencies"; INQUERY's ordered
    * window): a doc matches iff the terms occur IN ORDER with the
    * whole chain spanning ≤ `window` token positions. Emits the match
    * count (distinct chain anchors) and the MINIMAL span — the
    * proximity evidence an SDM-style ranker feeds on, strictly
    * between exact-phrase (window = k−1) and bag-of-words AND
    * (window = ∞).
    *
    * Scale shape: each term contributes only ITS positional posting
    * rows (term-bucket pruned on the persisted tree); the chain is
    * k−1 doc_id-keyed equi-joins over skinny (doc_id, pos) relations
    * with the window bound pushed into EVERY hop (a partial chain
    * already wider than the window can never complete — pruned before
    * it multiplies), and the roll-up is one doc-keyed aggregation.
    */
  private[graft] def orderedWindowFrom(p: DataFrame, terms: Seq[String],
                                       window: Int): DataFrame = {
    require(terms.size >= 2, "ordered window needs at least two terms")
    require(window >= terms.size - 1, "window cannot fit the terms")
    val parts = terms.zipWithIndex.map { case (t, i) =>
      p.filter(col("term") === t)
        .select(col("doc_id"), col("pos").cast("long").as(s"p$i"))
    }
    val last = terms.size - 1
    val chained = (1 to last).foldLeft(parts.head) { (acc, i) =>
      acc.join(parts(i), Seq("doc_id"))
        .filter(col(s"p$i") > col(s"p${i - 1}") &&
          col(s"p$i") - col("p0") <= window)
    }
    chained.groupBy(col("doc_id"))
      .agg(count_distinct(col("p0")).as("n_anchors"),
        min(col(s"p$last") - col("p0")).as("min_span"))
  }

  /** [[orderedWindowFrom]] over the staged positional postings, with
    * doc metadata attached. */
  def orderedWindow(docs: DataFrame, terms: Seq[String],
                    window: Int): DataFrame =
    orderedWindowFrom(positionalPostingsStaged(docs), terms, window)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))

  /** UNORDERED window — SDM's `#uwN(w1…wk)`: all terms occur (any
    * order) within a span of ≤ `window` positions. Terms must be
    * distinct (distinct terms can never share a position, so the
    * tuple positions are distinct for free). Same per-hop pruning
    * discipline as the ordered variant: the running (min, max) span
    * rides through the chain and a too-wide partial prunes before it
    * multiplies. Emits tuple count and minimal span.
    */
  private[graft] def unorderedWindowFrom(p: DataFrame, terms: Seq[String],
                                         window: Int): DataFrame = {
    require(terms.size >= 2 && terms.distinct.size == terms.size,
      "unordered window needs >= 2 DISTINCT terms")
    require(window >= terms.size - 1, "window cannot fit the terms")
    val parts = terms.zipWithIndex.map { case (t, i) =>
      p.filter(col("term") === t)
        .select(col("doc_id"), col("pos").cast("long").as(s"p$i"))
    }
    val seed = parts.head
      .select(col("doc_id"), col("p0").as("gmin"), col("p0").as("gmax"))
    val chained = (1 until terms.size).foldLeft(seed) { (acc, i) =>
      acc.join(parts(i), Seq("doc_id"))
        .filter(greatest(col("gmax"), col(s"p$i")) -
          least(col("gmin"), col(s"p$i")) <= window)
        .select(col("doc_id"),
          least(col("gmin"), col(s"p$i")).as("gmin"),
          greatest(col("gmax"), col(s"p$i")).as("gmax"))
    }
    chained.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tuples"),
        min(col("gmax") - col("gmin")).as("min_span"))
  }

  /** [[unorderedWindowFrom]] over the staged postings + doc metadata. */
  def unorderedWindow(docs: DataFrame, terms: Seq[String],
                      window: Int): DataFrame =
    unorderedWindowFrom(positionalPostingsStaged(docs), terms, window)
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))

  /** SDM-lite ranked retrieval (Metzler & Croft 2005's
    * sequential-dependence mixture, with the feature transforms kept
    * EXACT instead of log-smoothed): per (query, doc),
    *
    *   sdm_q = bm25_q + wO·#8(adjacent term pairs, ordered)
    *               + wU·#8(term pairs, unordered)
    *
    * all in the quantized-long score domain (wO = 0.10·10¹²,
    * wU = 0.05·10¹² per match tuple — the canonical 0.85/0.10/0.05
    * mixture re-based on the unit BM25 weight), ranked per query with
    * the deterministic (score desc, doc_id) tie-break. Pair features
    * follow the SDM definition: every ADJACENT pair of the query's
    * terms contributes its windowed counts.
    *
    * Scale shape: BM25 reads the term-bucket postings; each pair
    * feature reads its two terms' positional buckets with the span
    * bound pushed into the join; features outer-join the BM25 side as
    * query-sized skinny relations — a doc matching no window just
    * scores its BM25.
    */
  def sdmTopK(docs: DataFrame, queries: Seq[(Long, Seq[String])],
              window: Int = 8, k: Int = 10): DataFrame = {
    val p = positionalPostingsStaged(docs)
    // r18: the ENTIRE SDM input set derives from the ONE staged
    // positional index plus a tokenize-free doc count — the old shape
    // staged postings + termstats + corpusstats SEPARATELY, i.e.
    // three full tokenize passes per invocation. Equivalences (all
    // bit-exact, oracle hash re-proved):
    //   tf  per (term, doc) = count of position rows   ≡ explode+count
    //   dl  per doc         = count of position rows   ≡ size(tokens)
    //   df  per term        = count of (term, doc) tf rows
    //   sum_dl              = count of ALL position rows (null/empty
    //                         text emits no positions ≡ the 0-coalesce)
    //   n_docs              = count(*) over docs — no text read
    // Only query-term postings are aggregated for tf/df (BM25 joins
    // the broadcast query relation first anyway); dl/sum_dl aggregate
    // the full index, which is the one unavoidable corpus-sized pass.
    val qTerms = queries.flatMap(_._2).distinct
    val tf = p.filter(col("term").isin(qTerms: _*))
      .groupBy(col("term"), col("doc_id")).agg(count(lit(1)).as("tf"))
    val dl = p.groupBy(col("doc_id")).agg(count(lit(1)).as("dl"))
    val postings = dl.join(broadcast(tf), Seq("doc_id"))
      .select(col("term"), col("doc_id"), col("dl"), col("tf"))
    val termStats = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val corpusStats = docs.agg(count(lit(1)).as("n_docs"))
      .crossJoin(p.agg(count(lit(1)).as("sum_dl")))
    val bm = scoreBm25Unranked(postings, termStats, corpusStats,
      queries, 1.2, 0.75)
    // r18: ONE (query_id, term_a, term_b)-driven join over the staged
    // positional postings replaces the per-(query, pair) fan-out. The
    // old shape instantiated orderedWindowFrom + unorderedWindowFrom
    // once per adjacent pair per query — 2·Q·P chained joins, each
    // re-filtering the postings relation twice — and unioned the lot.
    // Both window features are functions of the SAME (p_a, p_b)
    // position-pair relation, so the collapse broadcasts the tiny
    // pair table, joins the (pruned) postings twice TOTAL, and
    // derives both counts per (query, pair, doc) in one aggregation:
    //   ordered anchors  = distinct p_a with p_a < p_b ≤ p_a + window
    //                      (orderedWindowFrom's 2-term chain verbatim)
    //   unordered tuples = all |p_b − p_a| ≤ window
    //                      (unorderedWindowFrom's 2-term span rule;
    //                      SDM pair features are always 2-term)
    // then sums over pairs per (query, doc) exactly as the union +
    // groupBy did. A (pair, doc) whose rows all fail the ordered
    // bound contributes 0 where the old plan contributed no row —
    // identical after the left-join coalesce. Oracle hash re-proved.
    val pairRows = queries.flatMap { case (qid, terms) =>
      terms.sliding(2).filter(_.size == 2).map(_.toSeq).toSeq.distinct
        .map { case Seq(a, b) => (qid, a, b) }
    }
    val sparkSess = docs.sparkSession
    import sparkSess.implicits._
    val pairs = pairRows.toDF("query_id", "ta", "tb")
    val touched = pairRows.flatMap { case (_, a, b) => Seq(a, b) }.distinct
    val occ = p.filter(col("term").isin(touched: _*))
    val occA = occ.select(col("term").as("ta"), col("doc_id"),
      col("pos").cast("long").as("p0"))
    val occB = occ.select(col("term").as("tb"), col("doc_id"),
      col("pos").cast("long").as("p1"))
    val feats = occA.join(broadcast(pairs), Seq("ta"))
      .join(occB, Seq("doc_id", "tb"))
      .filter(abs(col("p1") - col("p0")) <= window)
      .groupBy(col("query_id"), col("ta"), col("tb"), col("doc_id"))
      .agg(
        count_distinct(when(col("p1") > col("p0") &&
          col("p1") - col("p0") <= window, col("p0"))).as("no"),
        count(lit(1)).as("nu"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("no")).as("__no"), sum(col("nu")).as("__nu"))
    val sdm = bm
      .join(feats, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("doc_id"),
        (col("score_q") + coalesce(col("__no"), lit(0L)) * 100000000000L +
          coalesce(col("__nu"), lit(0L)) * 50000000000L).as("score_q"))
    rankTopK(sdm, k)
  }

  /** Index-backed exact phrase search: adjacency via position
    * arithmetic over [[positionalPostingsStaged]] — the i-th phrase
    * word must sit at `anchor_pos + i`. Semantically ≡ [[phraseSearch]]
    * (tokens are whitespace-delimited, so padded containment IS token
    * adjacency — the driver gate pins both against the same oracle),
    * but this variant never scans document text: at 100 TB the joins
    * touch only the phrase's terms' posting buckets, each join keyed
    * skinny on (doc_id, pos). Repeated words self-join the same
    * posting bucket at shifted offsets — correct by the same
    * arithmetic.
    */
  def phraseSearchIndexed(docs: DataFrame, phrase: String): DataFrame =
    phraseAnchors(docs, phrase)
      .select(col("doc_id")).distinct()
      .join(docs.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .orderBy(col("doc_id"))

  /** Anchor positions (0-based token index of each phrase START) —
    * the shared relation behind indexed phrase search and occurrence
    * reporting. */
  private def phraseAnchors(docs: DataFrame, phrase: String): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    phraseAnchorsFrom(positionalPostingsStaged(docs), words)
  }

  /** The anchor fold over ANY positional-posting relation
    * (term, doc_id, pos) — shared by the staged path and the
    * persisted positions tree ([[graft.tables.InvertedIndex]]). */
  private[graft] def phraseAnchorsFrom(p: DataFrame,
                                       words: Seq[String]): DataFrame = {
    require(words.nonEmpty && words.head.nonEmpty, "empty phrase")
    val anchor = p.filter(col("term") === words.head)
      .select(col("doc_id"), col("pos"))
    words.zipWithIndex.drop(1).foldLeft(anchor) {
      case (acc, (w, i)) =>
        acc.join(
          p.filter(col("term") === w)
            .select(col("doc_id"), (col("pos") - i).as("pos")),
          Seq("doc_id", "pos"))
    }
  }

  /** Phrase occurrence report per matching doc: 1-based token
    * position of the FIRST match and the total match count — the
    * relation a highlighter/snippet generator consumes. Same pruned
    * positional-postings path as [[phraseSearchIndexed]]; match
    * arithmetic only, text never re-scanned.
    */
  def phraseOccurrences(docs: DataFrame, phrase: String): DataFrame =
    phraseAnchors(docs, phrase)
      .groupBy(col("doc_id"))
      .agg((min(col("pos")) + 1L).cast("long").as("first_pos"),
        count(lit(1)).as("n_matches"))
      .orderBy(col("doc_id"))

  /** Snippet/highlight generation — the consumer of
    * [[phraseOccurrences]]: each matching doc re-materializes a token
    * window of `window` tokens either side of its FIRST match
    * (clamped to the document), joined back to text form with single
    * spaces (the tokenizer's whitespace-run convention makes that
    * lossless in token space — the chunk_documents list-slicing
    * discipline, so the DuckDB oracle replays it exactly).
    *
    * 100 TB shape: occurrence discovery is the pruned positional-
    * postings path (phrase-term buckets only); ONLY matching docs
    * fetch their text, by id — a candidates-sized join against the
    * store, never a corpus scan — and the window slice is row-local.
    */
  def snippets(docs: DataFrame, phrase: String, window: Int = 3): DataFrame = {
    val words = phrase.trim.split("\\s+").toSeq
    val start = greatest(lit(1L), col("first_pos") - window)
    val end = least(size(col("__toks")).cast("long"),
      col("first_pos") + lit((words.length - 1 + window).toLong))
    phraseOccurrences(docs, phrase)
      .join(docs.select(col("doc_id"), col("text")), Seq("doc_id"))
      .select(col("doc_id"), col("first_pos"), col("n_matches"),
        tokens(col("text")).as("__toks"))
      .select(col("doc_id"), col("first_pos"), col("n_matches"),
        start.as("snip_start"), end.as("snip_end"),
        array_join(slice(col("__toks"), start.cast("int"),
          (end - start + 1L).cast("int")), " ").as("snippet"))
      .orderBy(col("doc_id"))
  }

  /** Snippets for RANKED (multi-term BM25) queries — the serving
    * consumer for non-phrase searches: each of a query's top-k docs
    * re-materializes the `window`-token span holding the DENSEST
    * cluster of that query's term occurrences. Deterministic rule,
    * spelled for the oracle: candidate windows start at each query-
    * term occurrence p and cover [p, p+window−1] in token space;
    * density = occurrences of ANY query term inside; the winner is
    * (max density, then earliest p); win_start/win_end are 1-based
    * inclusive, clamped to the doc.
    *
    * 100 TB shape: occurrence discovery reads the query terms'
    * positional-posting buckets RESTRICTED to the top-k candidate
    * docs (queries×k join — candidates-at-a-time, like [[snippets]]);
    * the density self-join is per-(query, doc) occurrence-bounded;
    * only the k winners fetch text by id for the row-local slice.
    */
  def snippetsBm25(docs: DataFrame, queries: Seq[(Long, Seq[String])],
                   k: Int = 10, window: Int = 7): DataFrame =
    snippetsFromRun(
      bm25TopK(docs, queries, k)
        .select(col("query_id"), col("doc_id"), col("rank")),
      positionalPostingsStaged(docs), docs, queries, window)

  /** [[snippetsBm25]] SERVED OFF THE CATALOG — the highlight stage of
    * the production loop: candidates come from the catalog-resolved
    * persisted index (registered batches only), occurrences from the
    * SAME index's live positional postings (term-bucket-pruned,
    * tombstone-filtered), and only the k winners fetch text by id.
    * No stage scans the corpus; the snippet consumer is pinned
    * end-to-end against the scan path's oracle. */
  def snippetsBm25Catalog(spark: org.apache.spark.sql.SparkSession,
                          catalogRoot: String, docs: DataFrame,
                          queries: Seq[(Long, Seq[String])],
                          k: Int = 10, window: Int = 7): DataFrame = {
    val st = graft.tables.IndexCatalog.current(catalogRoot)
    val only = Some(st.batches.toSet)
    snippetsFromRun(
      graft.tables.InvertedIndex.bm25TopK(spark, st.generation, queries,
          k, only = only)
        .select(col("query_id"), col("doc_id"), col("rank")),
      graft.tables.InvertedIndex.livePositionsFor(spark, st.generation,
        queries.flatMap(_._2).distinct, only),
      docs, queries, window)
  }

  /** The densest-window selection + slice shared by the scan-staged
    * and catalog-served snippet paths: `occAll` is ANY positional
    * relation (term, doc_id, pos). */
  private def snippetsFromRun(run: DataFrame, occAll: DataFrame,
                              docs: DataFrame,
                              queries: Seq[(Long, Seq[String])],
                              window: Int): DataFrame = {
    val q = queryRelation(docs, queries).distinct()
    val occ = occAll
      .join(broadcast(q), Seq("term"))
      .join(broadcast(run.select(col("query_id"), col("doc_id"))),
        Seq("query_id", "doc_id"))
      .select(col("query_id"), col("doc_id"), col("pos"))
    val dens = occ.as("a")
      .join(occ.as("b"),
        col("a.query_id") === col("b.query_id") &&
          col("a.doc_id") === col("b.doc_id") &&
          col("b.pos") >= col("a.pos") &&
          col("b.pos") <= col("a.pos") + (window - 1))
      .groupBy(col("a.query_id").as("query_id"),
        col("a.doc_id").as("doc_id"), col("a.pos").as("pos"))
      .agg(count(lit(1)).as("n_in_window"))
    val wPick = Window.partitionBy(col("query_id"), col("doc_id"))
      .orderBy(col("n_in_window").desc, col("pos"))
    val winStart = (col("pos") + 1L).cast("long")
    val winEnd = least(size(col("__toks")).cast("long"),
      col("pos") + lit(window.toLong))
    dens.withColumn("__rn", row_number().over(wPick))
      .filter(col("__rn") === 1).drop("__rn")
      .join(run, Seq("query_id", "doc_id"))
      .join(docs.select(col("doc_id"), tokens(col("text")).as("__toks")),
        Seq("doc_id"))
      .select(col("query_id"), col("doc_id"), col("rank"),
        winStart.as("win_start"), winEnd.as("win_end"),
        col("n_in_window"),
        array_join(slice(col("__toks"), winStart.cast("int"),
          (winEnd - winStart + 1L).cast("int")), " ").as("snippet"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** FILTERED hybrid search — filter-context semantics on BOTH arms:
    * the lexical arm is [[bm25TopKFiltered]] (facets ride the posting
    * rows; df/corpus stats stay corpus-wide), the dense arm is the
    * persisted IVF index's faceted probe
    * ([[graft.tables.VectorIndex.topKFiltered]] — facets ride the
    * cell rows via the index's `carry`); surviving candidates keep
    * their unfiltered scores bit-exactly on both sides, so only
    * MEMBERSHIP changes, never weights — and the fusion is the plain
    * [[rrfFuse]] over the two filtered rank lists. With full probe
    * the dense arm is exactly brute force over the filtered corpus,
    * which is what makes the row hash-checkable; production drops
    * nprobe and the query cost is (query-term buckets) +
    * (nprobe/nlist of cells), facet-pruned in-scan on both.
    */
  def hybridRrfFiltered(spark: org.apache.spark.sql.SparkSession,
                        vecIndexDir: String, docs: DataFrame,
                        emb: DataFrame, queries: Seq[(Long, Seq[String])],
                        carry: Seq[String],
                        lexFilter: org.apache.spark.sql.Column,
                        denseFilter: org.apache.spark.sql.Column,
                        kLex: Int = 20, kAnn: Int = 20, kRrf: Int = 60,
                        k: Int = 10, nprobe: Int = 16): DataFrame = {
    val qIds = queries.map(_._1)
    rrfFuse(
      bm25TopKFiltered(docs, queries, carry, lexFilter, kLex),
      graft.tables.VectorIndex.topKFiltered(spark, vecIndexDir,
        emb.filter(col("vec_id").isin(qIds: _*)), kAnn, nprobe,
        denseFilter),
      kRrf, k)
  }

  /** CATALOG-SERVED filtered hybrid — the full production serving
    * loop's query stage: BOTH arms resolve their committed
    * [[graft.tables.IndexCatalog]] head (one tiny JSON read each) and
    * query the served generation restricted to REGISTERED batches, so
    * a CDC-maintained index (appends registered through the catalog)
    * serves exactly its committed state. The facet filters are
    * filter-context (membership only): the lexical filter evaluates
    * on the posting rows of the pruned term buckets, the dense filter
    * on the cell rows of the probed partitions — neither arm ever
    * joins or scans the corpus. Query vectors come from `emb`
    * (callers' rows, not index rows).
    */
  def hybridRrfCatalog(spark: org.apache.spark.sql.SparkSession,
                       invCatalogRoot: String, vecCatalogRoot: String,
                       emb: DataFrame, queries: Seq[(Long, Seq[String])],
                       lexFilter: Option[org.apache.spark.sql.Column] = None,
                       denseFilter: Option[org.apache.spark.sql.Column] = None,
                       kLex: Int = 20, kAnn: Int = 20, kRrf: Int = 60,
                       k: Int = 10, nprobe: Int = 16): DataFrame = {
    val inv = graft.tables.IndexCatalog.current(invCatalogRoot)
    val vec = graft.tables.IndexCatalog.current(vecCatalogRoot)
    val qIds = queries.map(_._1)
    val qVecs = emb.filter(col("vec_id").isin(qIds: _*))
    val lexArm = graft.tables.InvertedIndex.bm25TopK(spark,
      inv.generation, queries, kLex, only = Some(inv.batches.toSet),
      filter = lexFilter)
    val annArm = denseFilter match {
      case Some(f) => graft.tables.VectorIndex.topKFiltered(spark,
        vec.generation, qVecs, kAnn, nprobe, f,
        only = Some(vec.batches.toSet))
      case None => graft.tables.VectorIndex.topK(spark, vec.generation,
        qVecs, kAnn, nprobe, only = Some(vec.batches.toSet))
    }
    rrfFuse(lexArm, annArm, kRrf, k)
  }

  /** Graded relevance judgments DERIVED from the corpus: rel(q, d) =
    * how many of q's distinct terms appear in d (1..n; docs matching
    * no term are absent — standard sparse qrels). Self-contained
    * ground truth both engines can replay, which is what makes the
    * evaluation row hash-checkable.
    */
  def relevanceFromTerms(docs: DataFrame,
                         queries: Seq[(Long, Seq[String])]): DataFrame = {
    val q = queryRelation(docs, queries).distinct()
    postingsStaged(docs)
      .join(broadcast(q), Seq("term"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("rel"))
  }

  /** [[relevanceFromTerms]] over the POSITIONAL index: a posting row
    * ≡ a distinct (term, doc) group of the position rows, so `rel`
    * (matched query terms per doc) is identical — lets the SDM eval
    * derive run AND qrels from the one staged positional artifact
    * instead of staging the term-frequency postings a second time
    * (r18; one tokenize pass per invocation, not two).
    */
  def relevanceFromPositions(p: DataFrame,
                             queries: Seq[(Long, Seq[String])]): DataFrame = {
    val q = queryRelation(p, queries).distinct()
    p.join(broadcast(q), Seq("term"))
      .select(col("query_id"), col("doc_id"), col("term")).distinct()
      .groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("rel"))
  }

  /** Ranked-retrieval evaluation: nDCG@k, MRR and recall@k per query.
    *
    * Exactness discipline: the only transcendental is the log2 rank
    * discount — quantized ONCE per position as
    * `disc_q = round(1e12 / (ln(rank+1)/ln(2)))` (ln over exact
    * integer args, mirrored operation-for-operation in the oracle);
    * gains `2^rel − 1` are exact integers, so DCG/IDCG are exact
    * integer sums and `ndcg = dcg_q / idcg_q` is one deterministic
    * double division. Both inputs are rank-bounded relations
    * (queries×k and queries×|rel docs|) — evaluation costs nothing at
    * any corpus scale once the run and qrels exist.
    */
  def evalMetrics(run: DataFrame, qrels0: DataFrame, k: Int): DataFrame = {
    // localCheckpoint (r17): qrels feeds three subtrees (judgment
    // join, ideal ranking, per-query totals) and is usually derived
    // from a corpus text scan — unpinned, that derivation re-ran per
    // reference. Rank-bounded rows, tiny at any scale.
    val qrels = qrels0.localCheckpoint()
    def discQ(rank: org.apache.spark.sql.Column) =
      round(lit(1e12d) /
        (log(rank.cast("double") + 1.0d) / log(lit(2.0d)))).cast("long")
    val gain = (expr("shiftleft(1, CAST(rel AS INT))") - 1).cast("long")
    val topk = run.filter(col("rank") <= k)
    val judged = topk.join(qrels, Seq("query_id", "doc_id"), "left")
      .select(col("query_id"), col("rank"),
        coalesce(col("rel"), lit(0L)).as("rel"))
    val perQ = judged.groupBy(col("query_id")).agg(
      sum(gain * discQ(col("rank"))).as("dcg_q"),
      min(when(col("rel") > 0, col("rank"))).as("__fr"),
      sum(when(col("rel") > 0, 1L).otherwise(0L)).as("n_hit_topk"))
    val wIdeal = Window.partitionBy(col("query_id"))
      .orderBy(col("rel").desc, col("doc_id"))
    val ideal = qrels
      .withColumn("__rn", row_number().over(wIdeal).cast("long"))
      .filter(col("__rn") <= k)
      .groupBy(col("query_id"))
      .agg(sum(gain * discQ(col("__rn"))).as("idcg_q"))
    val nRel = qrels.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    perQ
      .join(ideal, Seq("query_id"), "left")
      .join(nRel, Seq("query_id"), "left")
      .select(col("query_id"),
        coalesce(col("n_rel"), lit(0L)).as("n_rel"),
        col("n_hit_topk"),
        coalesce(col("__fr"), lit(0L)).as("first_rel_rank"),
        when(coalesce(col("__fr"), lit(0L)) > 0,
          lit(1.0d) / col("__fr").cast("double")).otherwise(lit(0.0d))
          .as("rr"),
        when(coalesce(col("n_rel"), lit(0L)) > 0,
          col("n_hit_topk").cast("double") / col("n_rel").cast("double"))
          .otherwise(lit(0.0d)).as("recall_at_k"),
        col("dcg_q"),
        coalesce(col("idcg_q"), lit(0L)).as("idcg_q"),
        when(coalesce(col("idcg_q"), lit(0L)) > 0,
          col("dcg_q").cast("double") / col("idcg_q").cast("double"))
          .otherwise(lit(0.0d)).as("ndcg"))
      .orderBy(col("query_id"))
  }

  /** Maximal Marginal Relevance: greedily re-rank each query's
    * candidate list for diversity —
    * `score(d) = λ·rel(d) − (1−λ)·max_{s∈S} cos(d, s)` with the max
    * taken as 0.0 while S is empty, ties on (score, doc_id asc).
    *
    * Candidates are the brute-cosine top-`kCand` per query (rel =
    * cosine to the query vector). The greedy selection is inherently
    * sequential PER QUERY, so it runs in `flatMapGroups` over the
    * candidate-bounded group (kCand rows × 64 floats — never corpus
    * data; the justified tier-(d) fallback, like the binary codecs).
    * Every float op mirrors the engine's cosine kernel
    * ([[graft.functions.CosineSimilarity]]'s clamp + double
    * accumulation), so the k-step-unrolled DuckDB oracle reproduces
    * scores bit-for-bit.
    */
  def mmrRerank(emb: DataFrame, queryIds: Seq[Long], kCand: Int = 12,
                k: Int = 6, lambda: Double = 0.5): DataFrame =
    mmrFromCandidates(emb,
      Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id").isin(queryIds: _*)), kCand),
      k, lambda)

  /** MMR over candidates drawn from the PERSISTED IVF index
    * ([[graft.tables.VectorIndex]]) instead of a corpus scan — the
    * serving-path composition: the index probe nominates `kCand` rows
    * per query reading only probed cell partitions, then the same
    * greedy kernel as [[mmrRerank]] diversifies them. With
    * `nprobe == nlist` the candidate set is EXACTLY brute force's
    * (probing every cell reads every vector), so this pins against
    * mmr_rerank's oracle bit-for-bit; production drops nprobe and the
    * plan cost becomes nprobe/nlist of the store, never the corpus.
    */
  def mmrRerankIndexed(spark: org.apache.spark.sql.SparkSession,
                       indexDir: String, emb: DataFrame,
                       queryIds: Seq[Long], kCand: Int = 12, k: Int = 6,
                       lambda: Double = 0.5, nprobe: Int = 16): DataFrame =
    mmrFromCandidates(emb,
      graft.tables.VectorIndex.topK(spark, indexDir,
        emb.filter(col("vec_id").isin(queryIds: _*)), kCand, nprobe),
      k, lambda)

  /** The greedy MMR kernel over an already-nominated candidate list
    * (query_id, vec_id, cosine) — shared by the brute-force and
    * index-probed front ends. Candidates fetch their float vectors
    * from `emb` by id (candidates-at-a-time, never a corpus scan);
    * the in-memory sort on (−rel, doc_id) makes the result
    * independent of candidate row order, so ANY generator producing
    * the same candidate SET produces the same rerank.
    */
  private[graft] def mmrFromCandidates(emb: DataFrame, candidates: DataFrame,
                                       k: Int, lambda: Double): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val cands = candidates
      .join(emb.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .select(col("query_id"), col("vec_id").as("doc_id"),
        col("cosine").as("rel"), col("embedding"))
      .as[(Long, Long, Double, Seq[Float])]
    cands.groupByKey(_._1)
      .flatMapGroups { (qid, it) =>
        val cs = it.toArray.sortBy(c => (-c._3, c._2))
        val embs = cs.map(_._4.toArray)
        val nSel = math.min(k, cs.length)
        val selected = new Array[Boolean](cs.length)
        // true running max of cos(d, s) over selected s — may be
        // NEGATIVE (embeddings anticorrelate); 0.0 only while S empty
        val maxSim = Array.fill(cs.length)(Double.NegativeInfinity)
        val out = new Array[(Long, Long, Long, Double)](nSel)
        var step = 0
        while (step < nSel) {
          var best = -1
          var bestScore = 0.0
          var i = 0
          while (i < cs.length) {
            if (!selected(i)) {
              val ms = if (step == 0) 0.0 else maxSim(i)
              val score = lambda * cs(i)._3 - (1.0 - lambda) * ms
              if (best < 0 || score > bestScore ||
                (score == bestScore && cs(i)._2 < cs(best)._2)) {
                best = i; bestScore = score
              }
            }
            i += 1
          }
          selected(best) = true
          out(step) = (qid, cs(best)._2, step + 1L, bestScore)
          i = 0
          while (i < cs.length) {
            if (!selected(i)) {
              val s = Retrieval.cosineF(embs(i), embs(best))
              if (s > maxSim(i)) maxSim(i) = s
            }
            i += 1
          }
          step += 1
        }
        out.iterator
      }
      .toDF("query_id", "doc_id", "mmr_rank", "score")
      .orderBy(col("query_id"), col("mmr_rank"))
  }

  /** Float-array cosine mirroring
    * [[graft.functions.CosineSimilarity.cosine]] exactly (double
    * accumulation over float inputs, clamped to [−1, 1]). */
  private[operators] def cosineF(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble
      val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    math.max(-1.0, math.min(1.0, dot / (math.sqrt(na) * math.sqrt(nb))))
  }

  /** Reciprocal-rank fusion of a lexical (BM25) candidate list and a
    * vector (cosine top-k) candidate list: each query's fused score is
    * Σ 1/(kRrf + rank) over the sources that surfaced the doc. Rank
    * arithmetic only — no score calibration across modalities, which
    * is exactly why RRF is the standard fusion baseline.
    *
    * `queries` pairs each term query with the embedding vec_id that
    * plays its dense counterpart; candidates are doc_ids (the corpus
    * embedding table indexes documents by the same id domain). The
    * fusion join is over queries×k rows — driver-trivial at any
    * corpus size; all the heavy lifting happened inside the two
    * candidate generators, each with its own 100 TB path (term-pruned
    * postings; IVF cells).
    */
  def hybridRrf(docs: DataFrame, emb: DataFrame,
                queries: Seq[(Long, Seq[String])],
                kLex: Int = 20, kAnn: Int = 20, kRrf: Int = 60,
                k: Int = 10): DataFrame = {
    val qIds = queries.map(_._1)
    rrfFuse(
      bm25TopK(docs, queries, kLex),
      Similarity.bruteForceTopK(
        emb, emb.filter(col("vec_id").isin(qIds: _*)), kAnn),
      kRrf, k)
  }

  /** RRF hybrid search over the PERSISTED artifacts — both arms read
    * their stored index, never the corpus: lexical candidates from the
    * term-bucketed inverted index ([[graft.tables.InvertedIndex]],
    * only the query terms' posting buckets open) and dense candidates
    * from the IVF cell tree ([[graft.tables.VectorIndex]], only probed
    * cell partitions read). With `nprobe == nlist` the dense candidate
    * list is EXACTLY the brute-force one, so this pins against
    * hybrid_rrf_topk's oracle bit-for-bit; at 100 TB nprobe drops and
    * the query cost is (query-term buckets) + (nprobe/nlist of cells).
    */
  def hybridRrfIndexed(spark: org.apache.spark.sql.SparkSession,
                       invIndexRoot: String, vecIndexDir: String,
                       emb: DataFrame, queries: Seq[(Long, Seq[String])],
                       kLex: Int = 20, kAnn: Int = 20, kRrf: Int = 60,
                       k: Int = 10, nprobe: Int = 16): DataFrame = {
    val qIds = queries.map(_._1)
    rrfFuse(
      graft.tables.InvertedIndex.bm25TopK(spark, invIndexRoot, queries, kLex),
      graft.tables.VectorIndex.topK(spark, vecIndexDir,
        emb.filter(col("vec_id").isin(qIds: _*)), kAnn, nprobe),
      kRrf, k)
  }

  /** Fusion core shared by the scan-backed and index-backed hybrid
    * paths: rank the dense arm (cosine desc, vec_id — the generators'
    * own ordering, so rank assignment is generator-independent for
    * equal candidate sets), full-outer join the two rank lists, and
    * sum reciprocal ranks. Every input is queries×k-sized.
    */
  private[graft] def rrfFuse(lexTopK: DataFrame, annRaw: DataFrame,
                             kRrf: Int, k: Int): DataFrame = {
    val lex = lexTopK
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val wAnn = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val ann = annRaw
      .withColumn("ann_rank", row_number().over(wAnn).cast("long"))
      .select(col("query_id"), col("vec_id").as("doc_id"), col("ann_rank"))
    val fused = lex.join(ann, Seq("query_id", "doc_id"), "full_outer")
      .select(col("query_id"), col("doc_id"), col("lex_rank"), col("ann_rank"),
        (coalesce(lit(1.0d) / (lit(kRrf).cast("double") + col("lex_rank").cast("double")), lit(0.0d)) +
          coalesce(lit(1.0d) / (lit(kRrf).cast("double") + col("ann_rank").cast("double")), lit(0.0d)))
          .as("rrf"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }
}
