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

  /** Two-phase SALTED AGGREGATION for skewed group keys: phase 1 aggregates
    * per (key, salt) — the hot key's rows spread over `salts` reduce tasks —
    * phase 2 merges the `salts` partials per key (a #keys×salts-row shuffle,
    * trivial). Output equals `df.groupBy(key).agg(...)`: count/min/max and
    * integral sums exactly; float sums up to re-association (neither form
    * has a canonical order — parity tests round, per the oracle
    * conventions).
    *
    * When it matters at 100 TB: Spark's hash aggregate already does map-side
    * partials for these built-ins, so a plain groupBy rarely skews — the
    * salted form is for aggregations WITHOUT partial merge (typed
    * Aggregators over huge per-key state, collect_list-shaped ops, exact
    * per-key sketch builds), where one hot key otherwise serializes into a
    * single reduce task. This operator demonstrates the shape on algebraic
    * ops so the output stays oracle-verifiable.
    *
    * `aggs` maps output column name → (op, valueCol), op ∈ sum|count|min|max
    * (count ignores its valueCol). Salt derives from a hash of the non-key
    * columns (deterministic, like [[saltedJoin]]); any salt assignment gives
    * the same merged result. */
  def saltedAgg(
      df: DataFrame,
      key: String,
      aggs: Seq[(String, (String, String))],
      salts: Int): DataFrame = {
    require(salts > 0, s"salts $salts must be positive")
    val ops = aggs.map(_._2._1).toSet
    require(ops.subsetOf(Set("sum", "count", "min", "max")),
      s"unsupported ops: ${ops.diff(Set("sum", "count", "min", "max"))}")
    val saltSrc: Seq[Column] = df.columns.filterNot(_ == key).map(col).toSeq
    val salted = df.withColumn("__salt",
      if (saltSrc.isEmpty) lit(0) else pmod(hash(saltSrc: _*), lit(salts)))
    val phase1 = salted.groupBy(col(key), col("__salt")).agg(
      aggs.head._2 match { case (op, c) => partial(op, c, aggs.head._1) },
      aggs.tail.map { case (out, (op, c)) => partial(op, c, out) }: _*)
    phase1.groupBy(col(key)).agg(
      aggs.head match { case (out, (op, _)) => merge(op, out) },
      aggs.tail.map { case (out, (op, _)) => merge(op, out) }: _*)
  }

  private def partial(op: String, c: String, out: String): Column = (op match {
    case "sum" => sum(col(c))
    case "count" => count(lit(1))
    case "min" => min(col(c))
    case "max" => max(col(c))
  }).as(out)

  private def merge(op: String, out: String): Column = (op match {
    case "sum" | "count" => sum(col(out))
    case "min" => min(col(out))
    case "max" => max(col(out))
  }).as(out)
}
