package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  * Everything here is composed from codegen'd built-in expressions —
  * no UDFs — so whole-stage codegen spans the full pipeline and the
  * ops scale linearly with bytes scanned.
  */
object TextFunctions {

  /** Whitespace tokenization: `split` on a run of whitespace, empty
    * strings filtered. The filter (not a trim) is load-bearing:
    * Spark's `trim` strips SPACES only, so tab/newline-led text kept a
    * leading "" token under the old trim-then-split formulation —
    * empty/blank input of ANY whitespace now yields an empty array,
    * the same convention the DuckDB oracles use (`list_filter(...,
    * x <> '')`).
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** Distinct k-word shingles over a *materialized* token array:
    * ["a b c", "b c d", …]. Word shingles (not char shingles) because
    * near-dup detection cares about local ordering; `array_distinct`
    * makes it a set for Jaccard. Documents shorter than k words yield
    * a single whole-doc shingle.
    *
    * IMPORTANT evaluation contract: `toks` must be a projected column
    * (attribute), not an inline [[tokens]] expression — the transform
    * lambda body references it per element, and an inlined expression
    * would re-run the regex split once per shingle (and once per seed
    * under [[minhashSignature]]), turning O(n) shingling into O(n²)
    * or worse. Referencing `toks` twice here (size + slice) also stops
    * CollapseProject from inlining a non-cheap producer projection.
    */
  def wordShingles(toks: Column, k: Int): Column = {
    val nShingles = size(toks) - (k - 1)
    val idx = sequence(lit(1), greatest(nShingles, lit(1)))
    array_distinct(transform(idx, i => concat_ws(" ", slice(toks, i, lit(k)))))
  }

  /** Base (unseeded) 64-bit hashes of a shingle array — compute ONCE
    * per row and materialize (e.g. behind a repartition) before
    * feeding [[minhashSignature]]: if the shingle expression itself is
    * inlined under the per-seed lambda, Catalyst re-evaluates the
    * whole shingling `numHashes` times per row.
    */
  def shingleHashes(shingles: Column): Column =
    transform(shingles, s => xxhash64(s))

  /** MinHash signature over pre-hashed shingles: for each of
    * `numHashes` seeds, the min of `xxhash64(seed, h)` over the base
    * hashes. Seeded rehash of longs only — O(seeds·|shingles|) cheap
    * integer ops per row, no string work, zero shuffles/explodes.
    */
  def minhashSignature(baseHashes: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      seed => array_min(transform(baseHashes, h => xxhash64(seed, h))))

  /** LSH band keys computed directly from the base hashes: band b's
    * key is `xxhash64` of its `rowsPerBand` minhash components (seeds
    * b·r … b·r+r-1). Two docs sharing any band key are near-dup
    * candidates.
    *
    * Deliberately NOT `hash(slice(signature))`: a separately-built
    * signature column gets re-inlined under the band lambda by
    * CollapseProject (single syntactic reference), re-evaluating the
    * full 64-seed signature once per band. Expanding the r seed-mins
    * inside the band lambda keeps total work at bands·r·|hashes|
    * integer hashes per row, over a materialized attribute.
    */
  def minhashBandKeys(baseHashes: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => xxhash64((0 until rowsPerBand).map(j =>
        array_min(transform(baseHashes, h => xxhash64(b * rowsPerBand + j, h)))): _*))

  /** Exact Jaccard similarity of two pre-distinct arrays, as double. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")
}
