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
  * zipAlign(Left/Right × NearestSmaller/NearestGreater)(+/min) — the as-of
  * alignment matrix with missing values on both sides (trap §7.4.1),
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
  // fill-then-as-of lookup (the reference's fill-before-reindex,
  // src/JoinHelpers.fs:49-53): last non-missing value among data keys <= k
  // (NearestSmaller) / first non-missing among keys >= k (NearestGreater)
  private def mAsOfLookup(data: Model, k: Long, smaller: Boolean): Option[Double] =
    if (smaller) data.filter(_._1 <= k).flatMap(_._2).lastOption
    else data.filter(_._1 >= k).flatMap(_._2).headOption

  private def mZipAlign(a: Model, b: Model, kind: JoinKind, smaller: Boolean,
      op: (Double, Double) => Double): Model = kind match {
    case JoinKind.Left =>
      a.map { case (k, av) =>
        (k, for { x <- av; y <- mAsOfLookup(b, k, smaller) } yield op(x, y)) }
    case JoinKind.Right =>
      b.map { case (k, bv) =>
        (k, for { y <- bv; x <- mAsOfLookup(a, k, smaller) } yield op(x, y)) }
    case other => throw new IllegalArgumentException(s"zipAlign model: $other")
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
        rnd.nextInt(13) match {
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
          case 12 =>
            // the reference's hardest semantics (§7.4.1): as-of zipAlign —
            // every kind×lookup direction, with missing values in BOTH
            // series so fill-then-as-of is continuously exercised
            val other = genModel(rnd, rnd.nextInt(20).toLong)
            val kind = if (rnd.nextBoolean()) JoinKind.Left else JoinKind.Right
            val smaller = rnd.nextBoolean()
            val useMin = rnd.nextBoolean()
            trace ++= s"zipAlign($kind,${if (smaller) "NearestSmaller" else "NearestGreater"},${if (useMin) "min" else "+"}); "
            ks = ks.zipAlign(KSeries(toDf(other), ordered = true), kind,
              if (smaller) graft.core.Lookup.NearestSmaller
              else graft.core.Lookup.NearestGreater)(
              if (useMin) (a, b) => least(a, b) else (a, b) => a + b)
              .copy(ordered = true)
            model = mZipAlign(model, other, kind, smaller,
              if (useMin) math.min else _ + _)
        }
      }
      assert(collectModel(ks) === model, s"seed=$seed chain: $trace")
    }
  }

  // ---- KFrame composition: same discipline over the frame surface ----

  // rows sorted by key; each row maps column name -> Option[value]
  private type FModel = (Vector[String], Vector[(Long, Map[String, Option[Double]])])

  private def toFrameDf(m: FModel): DataFrame = {
    import org.apache.spark.sql.types._
    val (cols, rows) = m
    val schema = StructType(StructField("k", LongType, nullable = false) +:
      cols.map(c => StructField(c, DoubleType, nullable = true)))
    spark.createDataFrame(
      java.util.Arrays.asList(rows.map { case (k, vs) =>
        org.apache.spark.sql.Row.fromSeq(k +: cols.map(c => vs(c).map(Double.box).orNull))
      }: _*), schema).repartition(3)
  }

  private def collectFrame(kf: graft.core.KFrame): FModel = {
    val cols = kf.dataCols.toVector
    val rows = kf.df.select((col("k") +: cols.map(col)).toIndexedSeq: _*)
      .collect().toVector
      .map { r =>
        (r.getLong(0), cols.zipWithIndex.map { case (c, i) =>
          c -> (if (r.isNullAt(i + 1)) None else Some(r.getDouble(i + 1)))
        }.toMap)
      }.sortBy(_._1)
    (cols.sorted, rows.map { case (k, vs) => (k, vs) })
  }

  private def sortedModel(m: FModel): FModel = (m._1.sorted, m._2.sortBy(_._1))

  private def genFrame(rnd: scala.util.Random, cols: Vector[String]): FModel = {
    val n = 3 + rnd.nextInt(15)
    val rows = rnd.shuffle((0L until 30L).toList).take(n).toVector.sorted.map { k =>
      (k, cols.map(c => c -> (if (rnd.nextInt(5) == 0) None
                              else Some((rnd.nextInt(2001) - 1000) / 10.0))).toMap)
    }
    (cols, rows)
  }

  test("60 random 3-4 op KFrame chains match the naive reference engine exactly") {
    for (seed <- 1 to 60) {
      val rnd = new scala.util.Random(10000 + seed)
      var nextId = 0
      def freshCol(): String = { nextId += 1; s"c$nextId" }
      var model: FModel = genFrame(rnd, Vector(freshCol(), freshCol()))
      var kf = graft.core.KFrame(toFrameDf(model), Seq("k"), ordered = true)
      val nOps = 3 + rnd.nextInt(2)
      val trace = new StringBuilder
      for (_ <- 1 to nOps) {
        val (cols, rows) = model
        rnd.nextInt(7) match {
          case 0 =>
            val c = (rnd.nextInt(9) - 4) / 2.0
            trace ++= s"mapNumeric(*$c); "
            kf = kf.mapNumeric(_ * lit(c))
            model = (cols, rows.map { case (k, vs) =>
              (k, vs.map { case (n, v) => n -> v.map(_ * c) }) })
          case 1 if cols.nonEmpty =>
            val target = cols(rnd.nextInt(cols.size))
            val x = (rnd.nextInt(1001) - 500) / 10.0
            trace ++= s"filterRows($target>$x); "
            kf = kf.filterRows(col(target) > lit(x))
            model = (cols, rows.filter(_._2(target).exists(_ > x)))
          case 2 =>
            trace ++= "rowsDense; "
            kf = kf.rowsDense
            model = (cols, rows.filter(_._2.values.forall(_.nonEmpty)))
          case 3 if cols.nonEmpty =>
            val src = cols(rnd.nextInt(cols.size))
            val c = (rnd.nextInt(41) - 20) / 2.0
            val name = freshCol()
            trace ++= s"addColumn($name=$src+$c); "
            kf = kf.addColumn(name, col(src) + lit(c))
            model = (cols :+ name, rows.map { case (k, vs) =>
              (k, vs + (name -> vs(src).map(_ + c))) })
          case 4 if cols.size > 1 =>
            val victim = cols(rnd.nextInt(cols.size))
            trace ++= s"dropSeries($victim); "
            kf = kf.dropSeries(victim)
            model = (cols.filterNot(_ == victim), rows.map { case (k, vs) =>
              (k, vs - victim) })
          case 5 =>
            val other = genFrame(rnd, Vector(freshCol()))
            val kind = Seq(graft.core.JoinKind.Outer, graft.core.JoinKind.Inner,
              graft.core.JoinKind.Left, graft.core.JoinKind.Right)(rnd.nextInt(4))
            trace ++= s"join($kind); "
            kf = kf.join(graft.core.KFrame(toFrameDf(other), Seq("k"), ordered = true), kind)
              .copy(ordered = true) // keys stay unique; ordered ops sort internally
            val lm = rows.toMap; val rm = other._2.toMap
            val keys = (kind match {
              case graft.core.JoinKind.Outer => lm.keySet ++ rm.keySet
              case graft.core.JoinKind.Inner => lm.keySet & rm.keySet
              case graft.core.JoinKind.Left  => lm.keySet
              case graft.core.JoinKind.Right => rm.keySet
            }).toVector.sorted
            val allCols = cols ++ other._1
            model = (allCols, keys.map { k =>
              val l = lm.getOrElse(k, cols.map(_ -> (None: Option[Double])).toMap)
              val r = rm.getOrElse(k, other._1.map(_ -> (None: Option[Double])).toMap)
              (k, l ++ r)
            })
          case _ =>
            val o = rnd.nextInt(3) - 1
            trace ++= s"shift($o); "
            kf = kf.shift(o)
            val shifted = rows.indices.toVector.map { i =>
              val j = i - o
              (rows(i)._1,
                if (j >= 0 && j < rows.size) rows(j)._2
                else cols.map(_ -> (None: Option[Double])).toMap)
            }
            model = (cols, shifted)
        }
      }
      assert(collectFrame(kf) === sortedModel(model), s"seed=${10000 + seed} chain: $trace")
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

  test("vocabFingerprint law: fp equality iff equal distinct-token sets (seeded random docs)") {
    import spark.implicits._
    import graft.functions.Text
    val rnd = new scala.util.Random(1106)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "fff", "g", "hh")
    // random docs over a tiny vocabulary force plenty of set collisions
    val docs = (0L until 200L).map { i =>
      val n = 1 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
    }
    val df = docs.toList.toDF("id", "text")
    val got = df.select(col("id"), Text.vocabFingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = docs.map { case (i, s) => i -> s.split(" ").toSet }.toMap
    var collisions = 0
    for (i <- 0L until 200L; j <- (i + 1) until 200L) {
      val same = model(i) == model(j)
      if (same) collisions += 1
      assert((got(i) == got(j)) === same,
        s"docs $i/$j: sets ${model(i)} vs ${model(j)}")
    }
    assert(collisions > 100) // the generator must actually exercise equality
  }
}
