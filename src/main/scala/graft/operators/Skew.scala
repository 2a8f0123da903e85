package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins: salting. A hot join key (one user with
  * 10⁹ events, one null-ish default id) collapses a shuffle join into one
  * straggler task; salting splits each hot key into `salts` sub-keys.
  *
  * `left` (the big/skewed side) gets a deterministic salt derived from its
  * other columns; `right` (the dimension side) is replicated once per salt.
  * Join on (key, salt) ≡ join on key, but the hot key's rows spread over
  * `salts` tasks. Cost: right side × salts — use for genuinely skewed keys,
  * ideally only for the hot-key subset (AQE's skew-join handles moderate
  * skew automatically; explicit salting is the big-hammer for extreme keys).
  */
object Skew {

  /** Equi-join `left ⋈ right` on `key`, salted `salts` ways.
    * Result is identical to `left.join(right, Seq(key), joinType)` for
    * inner/left joins. */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    // deterministic salt: hash of the left row's non-key columns — uniform,
    // reproducible (no rand(), which would break retries/resume)
    val saltSrc: Seq[Column] = left.columns.filterNot(_ == key).map(col).toSeq
    val l = left.withColumn("__salt",
      if (saltSrc.isEmpty) lit(0) else pmod(hash(saltSrc: _*), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
