package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hash/sketch column functions: shingling, MinHash signatures, SimHash,
  * rolling-hash document fingerprints. Pure `functions._` higher-order
  * expressions — distributed, codegen-friendly, no driver-side state.
  */
object HashFunctions {

  /** Word n-gram shingles (distinct), e.g. n=3 ⇒ "a b c" trigram strings. */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val count = size(toks) - (n - 1)
    when(count <= 0, array(concat_ws(" ", toks)).cast("array<string>")).otherwise(
      array_distinct(transform(sequence(lit(0), count - 1),
        i => concat_ws(" ", slice(toks, i + 1, lit(n))))))
  }

  /** Distinct word-n-gram hashes — the native stand-in for the distinct
    * shingle STRING set (see [[graft.plans.ShingleHashesExpr]]): tokens are
    * whitespace-free so join-with-space is injective, making chained token
    * hashes bijective with shingle strings. One tight loop per row, no
    * shingle strings materialized. */
  def shingleHashes(text: Column, n: Int): Column =
    graft.plans.SketchExpressions.shingleHashes(TextFunctions.tokens(lower(text)), n)

  /** Duplicate word-n-gram fraction, the standard corpus-quality repetition
    * filter (boilerplate/spam detector in C4/Gopher-style pipelines):
    * `1 - distinct/total` over word n-grams; 0 for docs shorter than n
    * tokens (they count as one whole-doc shingle, mirroring
    * [[wordShingles]]). The total is pure arithmetic on the token count;
    * the distinct count is the native hash-set size — no per-element
    * lambdas, scan speed at 100 TB. */
  def repetitionRatio(text: Column, n: Int): Column = {
    val toks = TextFunctions.tokens(lower(text))
    val total = greatest(size(toks) - (n - 1), lit(1)).cast("double")
    lit(1.0) -
      size(graft.plans.SketchExpressions.shingleHashes(toks, n)) / total
  }

  /** Character n-gram shingles (distinct). */
  def charShingles(text: Column, n: Int): Column = {
    val t = lower(text)
    val count = length(t) - (n - 1)
    when(count <= 0, array(t)).otherwise(
      array_distinct(transform(sequence(lit(0), count - 1), i => t.substr(lit(1) + i, lit(n)))))
  }

  /** MinHash signature: k permutations via one xxhash64 per shingle + k
    * hashLong re-mixes. `sig[i] = min over shingles of mix_i(h(shingle))` —
    * the probability two docs agree at position i equals their Jaccard
    * similarity (Broder '97). Backed by a native Catalyst expression
    * ([[graft.plans.MinHashSignatureExpr]]) — the HOF formulation is ~1000×
    * slower (interpreted per-element lambdas). */
  def minHashSignature(shingles: Column, k: Int): Column =
    graft.plans.SketchExpressions.minHashSignature(shingles, k)

  /** LSH band keys: split the signature into `bands` bands of `rowsPerBand`
    * rows each and hash each band. Docs sharing any band key are candidate
    * pairs — the classic banding amplification. Returns
    * `array<struct<band:int, key:bigint>>` ready to `explode` + shuffle-join
    * on (band, key); at scale this is a hash-partitioned equi-join on a
    * 12-byte key instead of an O(n²) cross join. `rowsPerBand` is a literal
    * so Catalyst folds the slice bounds. */
  def lshBandKeys(signature: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(
        b.cast("int").as("band"),
        xxhash64(concat_ws(",", transform(
          slice(signature, b * rowsPerBand + 1, lit(rowsPerBand)),
          v => v.cast("string"))), b).as("key")))

  /** Estimated Jaccard similarity from two equal-length MinHash signatures. */
  def minHashJaccard(sigA: Column, sigB: Column): Column =
    size(filter(zip_with(sigA, sigB, (a, b) => a === b), x => x)).cast("double") /
      size(sigA).cast("double")

  /** Exact Jaccard similarity of two shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val uni = size(array_union(a, b)).cast("double")
    when(uni === 0, lit(0.0)).otherwise(inter / uni)
  }

  /** Broder containment |A∩B| / |A| — the ASYMMETRIC near-dup signal:
    * a short document wholly quoted inside a long one scores ~1 from the
    * short side while symmetric Jaccard stays small (|A∩B|/|A∪B| is
    * diluted by the long side). The signal behind boilerplate/quotation
    * dedup. Arrays are assumed distinct (shingle sets are). */
  def containment(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val da = size(a).cast("double")
    when(da === 0, lit(0.0)).otherwise(inter / da)
  }

  /** 64-bit SimHash over tokens (Charikar '02): for each bit b, sum +1/-1
    * across token hashes, emit bit b if the sum is positive. Near-duplicate
    * docs land within small Hamming distance. Backed by a native Catalyst
    * expression ([[graft.plans.SimHash64Expr]]). */
  def simHash64(text: Column): Column =
    graft.plans.SketchExpressions.simHash64(TextFunctions.tokens(lower(text)))

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** 2-D Z-order (Morton) key: interleave the low `bits` bits of two
    * non-negative integer columns — x on even positions, y on odd. Rows
    * sorted by this key cluster in BOTH dimensions at once, so a
    * `repartitionByRange(zkey) + sort + write` layout lets parquet footer
    * min/max statistics skip row groups for selective filters on EITHER
    * column (StorageLayoutSpec pins the skipping; single-column sort only
    * helps its lead column). Pure bit arithmetic — codegen'd, and exactly
    * reproducible in any engine (the q49 oracle spells out the same 32-term
    * expression in SQL). */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** Rolling-hash document fingerprint: chained hash over the token stream,
    * order-sensitive — two docs get equal fingerprints iff their token
    * sequences match (mod collisions). Implemented as an xxhash64 chain
    * (`acc' = xxhash64(acc, token)`) — overflow-free under ANSI mode and
    * equally collision-resistant. */
  def docFingerprint(text: Column): Column =
    aggregate(TextFunctions.tokens(lower(text)), lit(0L),
      (acc, t) => xxhash64(acc, t))
}
