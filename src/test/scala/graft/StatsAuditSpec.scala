package graft

import org.apache.spark.sql.functions._
import graft.operators.{Dedup, Similarity, Stats}

/** Hand-computed checks for the audit/eval pack: chi-square independence,
  * Mann-Whitney AUC, Spearman rank correlation, reciprocal-rank fusion,
  * boilerplate line removal, and the k-anonymity census. The sf0.01
  * oracle queries (q214-q219) are the cross-engine gate; these specs pin
  * the arithmetic to values computed by hand.
  */
class StatsAuditSpec extends SparkSpecBase {
  import spark.implicits._

  // ---- chiSquareIndependence -------------------------------------------

  test("chiSquare: perfect 2x2 association gives chi2 = N, V = 1") {
    // A only ever X, B only ever Y: every cell term is
    // (O*N - R*C)^2 * 1e6 / (N*R*C) = (100 or -100)^2 * 1e6 / 2000 = 5e6
    val df = (Seq.fill(10)(("A", "X")) ++ Seq.fill(10)(("B", "Y")))
      .toDF("r", "c")
    val out = Stats.chiSquareIndependence(df, col("r"), col("c")).collect().head
    assert(out.getLong(out.fieldIndex("n")) === 20L)
    assert(out.getLong(out.fieldIndex("dof")) === 1L)
    assert(out.getLong(out.fieldIndex("chi2_ppm")) === 20000000L)
    assert(out.getDouble(out.fieldIndex("cramers_v")) === 1.0)
  }

  test("chiSquare: exact independence gives chi2 = 0") {
    // uniform 2x2: O = R*C/N exactly in every cell
    val df = Seq(("A", "X"), ("A", "Y"), ("B", "X"), ("B", "Y")).toDF("r", "c")
    val out = Stats.chiSquareIndependence(df, col("r"), col("c")).collect().head
    assert(out.getLong(out.fieldIndex("chi2_ppm")) === 0L)
    assert(out.getDouble(out.fieldIndex("cramers_v")) === 0.0)
  }

  // ---- aucMannWhitney --------------------------------------------------

  test("auc: perfect separation is 1e6 ppm, reversed is 0") {
    val df = Seq((3L, true), (4L, true), (1L, false), (2L, false))
      .toDF("s", "p")
    val out = Stats.aucMannWhitney(df, col("s"), col("p")).collect().head
    assert(out.getLong(out.fieldIndex("u2")) === 8L) // 2U = 2 * n+ * n-
    assert(out.getLong(out.fieldIndex("auc_ppm")) === 1000000L)
    val rev = Stats.aucMannWhitney(df, -col("s"), col("p")).collect().head
    assert(rev.getLong(rev.fieldIndex("auc_ppm")) === 0L)
  }

  test("auc: midrank ties match the hand-computed pair count") {
    // pos {2,3}, neg {2,1}: wins 3, tie 0.5 -> U = 3.5, AUC = 0.875
    val df = Seq((2L, true), (3L, true), (2L, false), (1L, false))
      .toDF("s", "p")
    val out = Stats.aucMannWhitney(df, col("s"), col("p")).collect().head
    assert(out.getLong(out.fieldIndex("u2")) === 7L)
    assert(out.getLong(out.fieldIndex("auc_ppm")) === 875000L)
  }

  test("auc: all-tied scores give exactly 1/2; single class gives NULL") {
    val tied = Seq((5L, true), (5L, true), (5L, false), (5L, false))
      .toDF("s", "p")
    val t = Stats.aucMannWhitney(tied, col("s"), col("p")).collect().head
    assert(t.getLong(t.fieldIndex("auc_ppm")) === 500000L)
    val one = Seq((1L, true), (2L, true)).toDF("s", "p")
    val o = Stats.aucMannWhitney(one, col("s"), col("p")).collect().head
    assert(o.isNullAt(o.fieldIndex("auc_ppm")))
  }

  // ---- spearmanCorr ----------------------------------------------------

  test("spearman: monotone nonlinear is +1, reversed is -1") {
    val df = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 64L), (5L, 125L))
      .toDF("x", "y")
    val up = Stats.spearmanCorr(df, col("x"), col("y")).collect().head
    assert(up.getDouble(up.fieldIndex("rho")) === 1.0)
    val dn = Stats.spearmanCorr(df, col("x"), -col("y")).collect().head
    assert(dn.getDouble(dn.fieldIndex("rho")) === -1.0)
  }

  test("spearman: identical tie structure keeps rho = 1; constant is NULL") {
    val df = Seq((1L, 10L), (2L, 50L), (2L, 50L), (3L, 90L)).toDF("x", "y")
    val r = Stats.spearmanCorr(df, col("x"), col("y")).collect().head
    assert(r.getDouble(r.fieldIndex("rho")) === 1.0)
    val flat = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("x", "y")
    val f = Stats.spearmanCorr(flat, col("x"), col("y")).collect().head
    assert(f.isNullAt(f.fieldIndex("rho")))
  }

  // ---- rrfFuse ---------------------------------------------------------

  test("rrf: contributions are integer 1e6 DIV (k+r), ties break by id") {
    // k=0 for round numbers: a=1e6/1+1e6/3, b=1e6/2+1e6/2, c=1e6/3+1e6/1
    val ra = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("id", "rank")
    val rb = Seq(("c", 1L), ("b", 2L), ("a", 3L)).toDF("id", "rank")
    val out = Similarity.rrfFuse(ra, rb, "id", "rank", k = 0, topN = 3)
      .collect().map(r => (r.getString(0), r.getLong(3)))
    assert(out.toSeq === Seq(("a", 1333333L), ("c", 1333333L), ("b", 1000000L)))
  }

  test("rrf: id missing from one list contributes nothing from it") {
    val ra = Seq(("a", 1L), ("b", 2L)).toDF("id", "rank")
    val rb = Seq(("b", 1L)).toDF("id", "rank")
    val out = Similarity.rrfFuse(ra, rb, "id", "rank", k = 0, topN = 3)
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1L else r.getLong(2), r.getLong(3))).toSeq
    // b: 1e6/2 + 1e6/1 = 1.5e6; a: 1e6/1 only
    assert(out === Seq(("b", 2L, 1L, 1500000L), ("a", 1L, -1L, 1000000L)))
  }

  // ---- boilerplateLines ------------------------------------------------

  test("boilerplate: lines above maxDf drop from EVERY doc, order kept") {
    val docs = Seq(
      (1L, Seq("chrome", "alpha")),
      (2L, Seq("beta", "chrome")),
      (3L, Seq("chrome")))
      .toDF("id", "lines")
    val out = Dedup.boilerplateLines(docs, "id", col("lines"), maxDf = 2L)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) === (("alpha", 2L, 1L)))
    assert(out(2L) === (("beta", 2L, 1L)))
    assert(out(3L) === (("", 1L, 0L))) // fully-boilerplate doc survives empty
  }

  test("boilerplate: df counts DISTINCT docs, not occurrences") {
    // "x" twice in one doc -> df = 1 <= maxDf=1 -> kept both times
    val docs = Seq((1L, Seq("x", "y", "x"))).toDF("id", "lines")
    val out = Dedup.boilerplateLines(docs, "id", col("lines"), maxDf = 1L)
      .collect().head
    assert(out.getString(1) === "x y x")
    assert(out.getLong(3) === 3L)
  }

  // ---- kAnonymity ------------------------------------------------------

  test("kAnonymity: census of groups below k") {
    val df = Seq(
      ("a", 1L), // group size 1
      ("b", 1L), ("b", 1L), // size 2
      ("c", 1L), ("c", 1L), ("c", 1L)) // size 3
      .toDF("qi1", "qi2")
    val out = Stats.kAnonymity(df, Seq(col("qi1"), col("qi2")), k = 3L)
      .collect().head
    assert(out.getLong(out.fieldIndex("n_rows")) === 6L)
    assert(out.getLong(out.fieldIndex("n_groups")) === 3L)
    assert(out.getLong(out.fieldIndex("k_min")) === 1L)
    assert(out.getLong(out.fieldIndex("groups_below_k")) === 2L)
    assert(out.getLong(out.fieldIndex("rows_below_k")) === 3L)
  }
}
