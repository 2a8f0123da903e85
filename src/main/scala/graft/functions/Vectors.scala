package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float|double>` columns, written as
  * higher-order-function Column expressions (codegen'd, no UDF, no
  * serialization) — the building blocks for similarity search and
  * embedding-based dedup at 100 TB.
  */
object Vectors {

  /** Cast every element to double BEFORE arithmetic: float*float stays
    * float in Spark SQL, which would diverge from double-precision engines
    * in the last bits. */
  private def dbl(a: Column): Column = transform(a, _.cast("double"))

  /** Dot product of two array columns (element-wise and accumulated in
    * double, sequential fold — deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(dbl(a), dbl(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def norm2Sq(a: Column): Column =
    aggregate(dbl(a), lit(0.0), (acc, x) => acc + x * x)

  def l2Norm(a: Column): Column = sqrt(norm2Sq(a))

  /** Cosine similarity (null if either norm is 0). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** MinHash signature of a string-array column (shingle set): k seeded
    * 64-bit hashes, each the min over the set — `array<bigint>` of length k.
    * xxhash64(elem, seed) is the seeded hash family; everything stays inside
    * whole-stage codegen. */
  def minhashSignature(shingles: Column, k: Int): Column =
    transform(sequence(lit(1), lit(k)),
      seed => array_min(transform(shingles, s => xxhash64(s, seed))))

  /** LSH band keys from a minhash signature: `bands` hashes, each over a
    * contiguous slice of the signature (banding technique from Broder /
    * Leskovec-Rajaraman-Ullman "Mining of Massive Datasets" ch.3). Two docs
    * share a band key iff their signature slices agree exactly. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)),
      b => struct(b.as("band"),
        xxhash64(concat_ws(",", transform(
          slice(sig, b * rowsPerBand + 1, lit(rowsPerBand)), _.cast("string")))).as("sig")))

  /** SimHash (Charikar 2002): 64-bit fingerprint where bit j is the sign of
    * the sum over tokens of ±1 according to bit j of the token's hash.
    * Near-duplicate docs differ in few bits (small Hamming distance). */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    // counts[j] = sum over tokens of (bit j set ? +1 : -1)
    val counts = aggregate(
      hashes,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc, sequence(lit(0), lit(63)),
        (a, j) => a + when(call_function("getbit", h, j) === 1, 1).otherwise(-1)))
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)), (c, j) => struct(c.as("c"), j.as("j"))),
      lit(0L),
      (acc, cj) => acc + when(cj("c") > 0, call_function("shiftleft", lit(1L), cj("j"))).otherwise(0L))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}
