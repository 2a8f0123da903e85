package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [[graft.plans.BucketSearch]] — the binary-search range-bucket id that
  * replaced OrderedScan's O(buckets) when-chain (r15). The contract is
  * exact equivalence with the chain's semantics: bucket = index of the
  * first cut ≥ v, cuts.length when v exceeds every cut, NaN in the last
  * bucket. Proven here by direct comparison against the chain over
  * randomized cut arrays and values (boundary hits, midpoints, outside
  * both ends, NaN, ±Infinity), through the real codegen path (a DataFrame
  * projection) AND the interpreted path (expression eval). */
class BucketSearchSpec extends SparkSpecBase {

  private def searchCol(c: Column, cuts: Array[Double]): Column =
    org.apache.spark.sql.GraftShim.column(
      graft.plans.BucketSearch(org.apache.spark.sql.GraftShim.expression(c), cuts))

  private def chainCol(c: Column, cuts: Array[Double]): Column =
    cuts.zipWithIndex.foldRight(lit(cuts.length): Column) {
      case ((cut, i), elseExpr) => when(c <= cut, i).otherwise(elseExpr)
    }

  test("binary search == when-chain on randomized cuts and adversarial values (codegen path)") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 8) {
      val nCuts = Seq(0, 1, 2, 7, 63, 255)(trial % 6)
      val cuts = Array.fill(nCuts)(rnd.nextDouble() * 2000 - 1000).distinct.sorted
      // adversarial values: every cut exactly (boundary hit), midpoints
      // between cuts, far outside both ends, NaN, infinities, random
      val vals = (cuts ++
        cuts.sliding(2).collect { case Array(a, b) => (a + b) / 2 }.toArray ++
        Array(-1e18, 1e18, Double.NaN, Double.NegativeInfinity,
          Double.PositiveInfinity) ++
        Array.fill(200)(rnd.nextDouble() * 2400 - 1200)).toSeq
      val df = vals.toDF("v")
      val out = df.select(
        searchCol(col("v"), cuts).as("bs"),
        chainCol(col("v"), cuts).as("chain")).collect()
      out.zip(vals).foreach { case (r, v) =>
        assert(r.getInt(0) === r.getInt(1),
          s"trial $trial: value $v → search ${r.getInt(0)} != chain ${r.getInt(1)} " +
            s"(cuts ${cuts.take(5).mkString(",")}...)")
      }
    }
  }

  test("interpreted eval matches codegen semantics and nulls pass through") {
    val cuts = Array(-3.0, 0.0, 4.5)
    val e = graft.plans.BucketSearch(
      org.apache.spark.sql.catalyst.expressions.Literal(null,
        org.apache.spark.sql.types.DoubleType), cuts)
    assert(e.eval(null) === null, "null input must stay null (UnaryExpression contract)")
    def at(v: Double): Any = graft.plans.BucketSearch(
      org.apache.spark.sql.catalyst.expressions.Literal(v), cuts).eval(null)
    assert(at(-5.0) === 0)   // below every cut
    assert(at(-3.0) === 0)   // exact hit on first cut (v <= cut0)
    assert(at(-1.0) === 1)
    assert(at(0.0) === 1)    // exact hit on middle cut
    assert(at(2.0) === 2)
    assert(at(4.5) === 2)    // exact hit on last cut
    assert(at(9.0) === 3)    // above every cut → cuts.length
    assert(at(Double.NaN) === 3, "NaN lands in the last bucket, like the chain")
  }
}
