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
  *    mod m`; positions aggregate map-side into ≤ m/64 (word, bits) rows
  *    via `bit_or`, then ONE model-sized row holds the dense bitmap array
  *    (map lookup + sequence fill — absent words are 0).
  *  - PROBE: the bitmap row cross-broadcasts to the fact side (a scalar
  *    array, BroadcastNestedLoopJoin on a 1-row side); a fact row survives
  *    only if ALL k probed bits are set (`element_at` + bitwise AND in one
  *    codegen'd conjunction).
  *  - The prune is CONSERVATIVE by construction (false positives pass and
  *    are removed by the real join that follows; false negatives are
  *    impossible), so the final join result is byte-identical with and
  *    without the filter — which is exactly what the oracle checks.
  *
  * Sizing: m defaults to 1<<20 bits (16 Ki longs ≈ 128 KiB broadcast —
  * sized by the DIM cardinality, independent of fact size); with k=4 that
  * holds ~3 % false positives at ~100k build keys. At larger dim
  * cardinalities pass a bigger `mBits`; past ~10 M keys prefer a plain
  * shuffle join — the bloom pays off only while the bitmap broadcasts
  * cheaply.
  */
object Bloom {

  /** The k probed bit positions of `key`: xxhash64 re-seeded by mixing in
    * the probe index as an extra hashed column. */
  private def positions(key: Column, mBits: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(key, lit(i)), lit(mBits.toLong)))

  /** Bitmap of the values of `key` in `build` as ONE row holding an
    * `m/64`-long array column `__bloom`. `mBits` must be a power of two. */
  def buildBitmap(build: DataFrame, key: Column, mBits: Int, k: Int): DataFrame = {
    require(mBits > 0 && (mBits & (mBits - 1)) == 0, s"mBits $mBits must be a power of 2")
    require(k >= 1 && k <= 8, s"k $k out of range 1..8")
    val words = mBits / 64
    // one row per (key, probe): duplicates need not be pre-deduped —
    // bit_or absorbs them map-side, so the shuffle carries at most m/64
    // word rows regardless of build-side row count
    val bits = build.select(explode(array(positions(key, mBits, k): _*)).as("__p"))
      .groupBy(expr("int(__p div 64)").as("__w"))
      .agg(expr("bit_or(shiftleft(1L, int(__p % 64)))").as("__bits"))
    // dense array: sequence over all word indexes, 0-filled where no row
    bits.agg(map_from_entries(collect_list(struct(col("__w"), col("__bits"))))
        .as("__m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        w => coalesce(element_at(col("__m"), w), lit(0L))).as("__bloom"))
  }

  /** Rows of `probe` whose `key` passes the bloom membership test — a
    * superset of the true semi-join (false positives only). The bitmap
    * row broadcasts; the k bit tests are one codegen'd conjunction over
    * pre-projected position columns. */
  def prune(probe: DataFrame, key: Column, bitmap: DataFrame,
      mBits: Int, k: Int): DataFrame = {
    val withPos = probe.crossJoin(broadcast(bitmap))
      .withColumns((0 until k).map(i => s"__bp$i").zip(positions(key, mBits, k)).toMap)
    val pass = (0 until k).map { i =>
      expr(s"(element_at(__bloom, int(__bp$i div 64) + 1) & " +
        s"shiftleft(1L, int(__bp$i % 64))) != 0L")
    }.reduce(_ && _)
    withPos.where(pass).drop("__bloom" +: (0 until k).map(i => s"__bp$i"): _*)
  }

  /** The full verified pattern: bloom-prune `probe` on `probeKey` against
    * the keys of `build`, then run the EXACT inner equi-join. The result
    * is identical to the plain join (the prune is transparent); the
    * bloom's value is that at scale the probe-side shuffle ships only
    * ~|matching| + fp rows instead of the whole fact table. */
  def prunedJoin(probe: DataFrame, probeKey: String,
      build: DataFrame, buildKey: String,
      mBits: Int = 1 << 20, k: Int = 4): DataFrame = {
    val bitmap = buildBitmap(build, col(buildKey), mBits, k)
    prune(probe, col(probeKey), bitmap, mBits, k)
      .join(build, col(probeKey) === build(buildKey))
  }
}
