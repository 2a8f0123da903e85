package graft

import graft.core.{JoinKind, KSeries, UnionBehavior}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** COMPOSITION fuzz: the per-operator oracle suite (260 DuckDB-checked
  * queries) saturates single operators; residual semantic drift would hide
  * in COMPOSITIONS (a fill after a union after a zip...). This spec runs
  * 100 seeded random chains of 3–5 KSeries ops against an INDEPENDENT
  * naive reference engine (a sorted `Vector[(Long, Option[Double])]`
  * mirroring the reference library's array semantics: missing = None,
  * aggregare-skip, positional shift, value-coalescing union) and requires
  * exact equality — values bitwise, since both engines apply the identical
  * IEEE op sequence to identical operands.
  *
  * Op pool: mapValues(+c / *c), filter(v>c), dropMissing, between,
  * fillForward/fillBackward/fillWith, shift(±2), diff(1..2),
  * union(PreferLeft/PreferRight), zipWith(Outer/Inner/Left/Right)(+/min),
  * append(disjoint). Order-destroying ops re-sort (both engines), so
  * ordered-only ops stay legal anywhere in the chain. Inputs avoid NaN
  * sources (finite small values, no division) because the engines'
  * NaN-canonicalization points differ by design from plain doubles.
  */
class CompositionFuzzSpec extends SparkSpecBase {

  type Model = Vector[(Long, Option[Double])] // sorted by key, unique keys

  private def toDf(m: Model): DataFrame = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("k", LongType, nullable = false),
      StructField("v", DoubleType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(m.map { case (k, v) =>
        org.apache.spark.sql.Row(k, v.map(Double.box).orNull)
      }: _*), schema).repartition(3) // exercise the distributed paths
  }

  private def collectModel(ks: KSeries): Model =
    ks.df.collect().toVector
      .map(r => (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .sortBy(_._1)

  // ---- the naive reference engine ----

  private def mShift(m: Model, o: Int): Model = {
    val vs = m.map(_._2)
    m.indices.toVector.map { i =>
      val j = i - o
      (m(i)._1, if (j >= 0 && j < vs.size) vs(j) else None)
    }
  }
  private def mDiff(m: Model, o: Int): Model =
    m.indices.toVector.map { i =>
      val j = i - o
      val d = for {
        a <- m(i)._2
        b <- if (j >= 0) m(j)._2 else None
      } yield a - b
      (m(i)._1, d)
    }
  private def mFillF(m: Model): Model = {
    var last: Option[Double] = None
    m.map { case (k, v) => last = v.orElse(last); (k, last) }
  }
  private def mFillB(m: Model): Model = mFillF(m.reverse).reverse
  private def mUnion(a: Model, b: Model, preferLeft: Boolean): Model = {
    val am = a.toMap; val bm = b.toMap
    (am.keySet ++ bm.keySet).toVector.sorted.map { k =>
      val l = am.getOrElse(k, None); val r = bm.getOrElse(k, None)
      (k, if (preferLeft) l.orElse(r) else r.orElse(l))
    }
  }
  private def mZip(a: Model, b: Model, kind: JoinKind,
      op: (Double, Double) => Double): Model = {
    val am = a.toMap; val bm = b.toMap
    val keys = kind match {
      case JoinKind.Outer => am.keySet ++ bm.keySet
      case JoinKind.Inner => am.keySet & bm.keySet
      case JoinKind.Left  => am.keySet
      case JoinKind.Right => bm.keySet
    }
    keys.toVector.sorted.map { k =>
      val r = for {
        x <- am.get(k).flatten
        y <- bm.get(k).flatten
      } yield op(x, y)
      (k, r)
    }
  }

  // ---- generators (seeded, reproducible) ----

  private def genModel(rnd: scala.util.Random, keyBase: Long): Model = {
    val n = 3 + rnd.nextInt(18)
    rnd.shuffle((0L until 40L).toList).take(n).toVector.sorted.map { i =>
      val v = if (rnd.nextInt(5) == 0) None
              else Some((rnd.nextInt(2001) - 1000) / 10.0)
      (keyBase + i, v)
    }
  }

  test("100 random 3-5 op chains match the naive reference engine exactly") {
    for (seed <- 1 to 100) {
      val rnd = new scala.util.Random(seed)
      var model = genModel(rnd, 0L)
      var ks = KSeries(toDf(model), ordered = true)
      val nOps = 3 + rnd.nextInt(3)
      val trace = new StringBuilder
      for (_ <- 1 to nOps) {
        rnd.nextInt(12) match {
          case 0 =>
            val c = (rnd.nextInt(41) - 20) / 2.0
            trace ++= s"mapValues(+$c); "
            ks = ks.mapValues(_ + lit(c)); model = model.map { case (k, v) => (k, v.map(_ + c)) }
          case 1 =>
            val c = (rnd.nextInt(9) - 4) / 2.0
            trace ++= s"mapValues(*$c); "
            ks = ks.mapValues(_ * lit(c)); model = model.map { case (k, v) => (k, v.map(_ * c)) }
          case 2 =>
            val c = (rnd.nextInt(1001) - 500) / 10.0
            trace ++= s"filter(v>$c); "
            ks = ks.filter((_, v) => v > lit(c)); model = model.filter(_._2.exists(_ > c))
          case 3 =>
            trace ++= "dropMissing; "
            ks = ks.dropMissing; model = model.filter(_._2.nonEmpty)
          case 4 =>
            val lo = rnd.nextInt(30).toLong; val hi = lo + rnd.nextInt(20)
            trace ++= s"between($lo,$hi); "
            ks = ks.between(lit(lo), lit(hi)); model = model.filter(p => p._1 >= lo && p._1 <= hi)
          case 5 =>
            val o = rnd.nextInt(5) - 2
            trace ++= s"shift($o); "
            ks = ks.shift(o); model = mShift(model, o)
          case 6 =>
            val o = 1 + rnd.nextInt(2)
            trace ++= s"diff($o); "
            ks = ks.diff(o); model = mDiff(model, o)
          case 7 =>
            trace ++= "fillForward; "
            ks = ks.fillForward(); model = mFillF(model)
          case 8 =>
            trace ++= "fillBackward; "
            ks = ks.fillBackward(); model = mFillB(model)
          case 9 =>
            val c = (rnd.nextInt(201) - 100) / 10.0
            trace ++= s"fillWith($c); "
            ks = ks.fillWith(c); model = model.map { case (k, v) => (k, v.orElse(Some(c))) }
          case 10 =>
            val other = genModel(rnd, rnd.nextInt(20).toLong)
            val pl = rnd.nextBoolean()
            trace ++= s"union(preferLeft=$pl); "
            ks = ks.union(KSeries(toDf(other), ordered = true),
              if (pl) UnionBehavior.PreferLeft else UnionBehavior.PreferRight)
              .copy(ordered = true) // keys unique; ordered ops sort internally
            model = mUnion(model, other, pl)
          case 11 =>
            val other = genModel(rnd, rnd.nextInt(20).toLong)
            val kind = Seq(JoinKind.Outer, JoinKind.Inner, JoinKind.Left,
              JoinKind.Right)(rnd.nextInt(4))
            val useMin = rnd.nextBoolean()
            trace ++= s"zipWith($kind,${if (useMin) "min" else "+"}); "
            ks = ks.zipWith(KSeries(toDf(other), ordered = true), kind)(
              if (useMin) (a, b) => least(a, b) else (a, b) => a + b)
              .copy(ordered = true)
            model = mZip(model, other, kind, if (useMin) math.min else _ + _)
        }
      }
      assert(collectModel(ks) === model, s"seed=$seed chain: $trace")
    }
  }

  test("append with disjoint keys matches concatenation") {
    for (seed <- 1 to 10) {
      val rnd = new scala.util.Random(1000 + seed)
      val a = genModel(rnd, 0L)
      val b = genModel(rnd, 1000L)
      val got = collectModel(
        KSeries(toDf(a), ordered = true)
          .append(KSeries(toDf(b), ordered = true), checkDuplicates = true))
      assert(got === (a ++ b), s"seed=$seed")
    }
  }
}
