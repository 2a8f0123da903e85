package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Bloom-filter SEMI-JOIN PRUNING — the runtime-filter shape a
  * 100 TB join wants: before shuffling the fact side, drop the rows whose
  * join key cannot possibly match the (already filtered) dimension side.
  * Spark's own runtime row-level filtering does this opportunistically;
  * this module makes it an explicit, verifiable operator.
  *
  * Everything is built from codegen'd `functions._` — no driver-side
  * BloomFilter object, no UDF:
  *
  *  - BUILD: each dim key sets `k` bit positions `xxhash64(key, i)
  *    mod m`; positions aggregate map-side into a ≤ m/64-row
  *    (word, bits) table via `bit_or` — the bitmap STAYS a table, never
  *    a per-row array (a 1-row array column would be copied into every
  *    probe row by the cross join — 128 KiB × |fact| of pure memcpy).
  *  - PROBE: k BROADCAST HASH JOINS on the word index (the bitmap table
  *    broadcasts once; each join attaches one long), then one codegen'd
  *    conjunction of bit tests. A missing word (no build key hashed into
  *    it) joins null → the row prunes.
  *  - The prune is CONSERVATIVE by construction (false positives pass and
  *    are removed by the real join that follows; false negatives are
  *    impossible), so the final join result is byte-identical with and
  *    without the filter — which is exactly what the oracle checks.
  *
  * Sizing: m defaults to 1<<20 bits (a ≤16 Ki-row word table ≈ 128 KiB
  * broadcast — sized by the DIM cardinality, independent of fact size);
  * with k=4 that holds ~3 % false positives at ~100k build keys. At larger
  * dim cardinalities pass a bigger `mBits`; past ~10 M keys prefer a plain
  * shuffle join — the bloom pays off only while the word table broadcasts
  * cheaply.
  */
object Bloom {

  /** The k probed bit positions of `key`: xxhash64 re-seeded by mixing in
    * the probe index as an extra hashed column. */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(mBits.toLong)))

  private def checkArgs(mBits: Int, k: Int): Unit = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, s"mBits $mBits must be a power of 2")
    require(k >= 1 && k <= 8, s"k $k out of range 1..8")
  }

  /** Bitmap of the values of `key` in `build` as a (word index, 64-bit
    * word) table `(__bw, __bits)` with ≤ m/64 rows. `mBits` must be a
    * power of two. Duplicate build keys need not be pre-deduped — bit_or
    * absorbs them map-side, so the shuffle carries at most m/64 word rows
    * regardless of build-side row count. */
  def buildWordTable(build: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    checkArgs(mBits, k)
    build.select(explode(array(positions(key, mBits, k): _*)).as("__p"))
      .groupBy(expr("int(__p div 64)").as("__bw"))
      .agg(expr("bit_or(shiftleft(1L, int(__p % 64)))").as("__bits"))
  }

  /** Rows of `probe` whose `key` passes the bloom membership test — a
    * superset of the true semi-join (false positives only). k broadcast
    * equi-joins on the word index + one codegen'd conjunction. */
  def prune(probe: DataFrame, key: Column, words: DataFrame,
      mBits: Int, k: Int): DataFrame = {
    checkArgs(mBits, k)
    val withPos = probe.withColumns(
      (0 until k).map(i => s"__bp$i").zip(positions(key, mBits, k)).toMap)
    val joined = (0 until k).foldLeft(withPos) { (d, i) =>
      d.join(
        broadcast(words.select(col("__bw").as(s"__bw$i"), col("__bits").as(s"__bits$i"))),
        expr(s"int(__bp$i div 64)") === col(s"__bw$i"), "left_outer")
    }
    val pass = (0 until k).map { i =>
      expr(s"(coalesce(__bits$i, 0L) & shiftleft(1L, int(__bp$i % 64))) != 0L")
    }.reduce(_ && _)
    joined.where(pass)
      .drop((0 until k).flatMap(i => Seq(s"__bp$i", s"__bw$i", s"__bits$i")): _*)
  }

  /** The full verified pattern: bloom-prune `probe` on `probeKey` against
    * the keys of `build`, then run the EXACT inner equi-join. The result
    * is identical to the plain join (the prune is transparent); the
    * bloom's value is that at scale the probe-side shuffle ships only
    * ~|matching| + fp rows instead of the whole fact table. */
  def prunedJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val words = buildWordTable(build, col(buildKey), mBits, k)
    prune(probe, col(probeKey), words, mBits, k)
      .join(build, col(probeKey) === build(buildKey))
  }
}
