package graft

import org.apache.spark.sql.functions._

import graft.core.KSeries
import graft.operators.{Boundary, ChunkWhile, Windowing}

/** Window/chunk boundary semantics (reference src/Common/Common.fs:511-654,
  * tests tests/FSharp.DataFrame.Tests/Common.fs:108-191). */
class WindowingSpec extends SparkSpecBase {

  private def s(rows: (Long, java.lang.Double)*): KSeries =
    KSeries(seriesDf(rows: _*), ordered = true)

  private val in = s((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0))

  test("windowInto Skip drops incomplete leading windows; key = last key") {
    val r = Windowing.windowInto(in, 3, Boundary.Skip)(sum)
    assert(collectKV(r) === Seq((3L, Some(6.0)), (4L, Some(9.0)), (5L, Some(12.0))))
  }

  test("windowInto AtBeginning keeps growing prefixes") {
    val r = Windowing.windowInto(in, 3, Boundary.AtBeginning)(sum)
    assert(collectKV(r) === Seq(
      (1L, Some(1.0)), (2L, Some(3.0)), (3L, Some(6.0)), (4L, Some(9.0)), (5L, Some(12.0))))
  }

  test("windowIntoForward AtEnding: key = first key, trailing windows shrink") {
    val r = Windowing.windowIntoForward(in, 3, Boundary.AtEnding)(sum)
    assert(collectKV(r) === Seq(
      (1L, Some(6.0)), (2L, Some(9.0)), (3L, Some(12.0)), (4L, Some(9.0)), (5L, Some(5.0))))
  }

  test("chunkInto Skip drops trailing partial chunk; key = first key") {
    val r = Windowing.chunkInto(in, 2, Boundary.Skip)((sum(_), "v"))
    assert(collectKV(r) === Seq((1L, Some(3.0)), (3L, Some(7.0))))
  }

  test("chunkInto AtEnding keeps trailing partial chunk") {
    val r = Windowing.chunkInto(in, 2, Boundary.AtEnding)((sum(_), "v"))
    assert(collectKV(r) === Seq((1L, Some(3.0)), (3L, Some(7.0)), (5L, Some(5.0))))
  }

  test("chunkInto AtBeginning aligns chunks to the end (partial chunk first)") {
    val r = Windowing.chunkInto(in, 2, Boundary.AtBeginning)((sum(_), "v"))
    // 5 rows, n=2 → partial chunk {1}, then {2,3}, {4,5}
    assert(collectKV(r) === Seq((1L, Some(1.0)), (2L, Some(5.0)), (4L, Some(9.0))))
  }

  test("windowDistInto: range frame (lastKey - firstKey < d)") {
    val sp = s((1L, 1.0), (2L, 2.0), (5L, 5.0), (6L, 6.0))
    val r = Windowing.windowDistInto(sp, 2)(sum)
    // window at k: keys in (k-2, k] → 1:{1}=1, 2:{1,2}=3, 5:{5}=5, 6:{5,6}=11
    assert(collectKV(r) === Seq(
      (1L, Some(1.0)), (2L, Some(3.0)), (5L, Some(5.0)), (6L, Some(11.0))))
  }

  test("chunkWhile splits when pred(first, cur) fails (reference Common.fs:511-547)") {
    val df = seriesDf((1L, 1.0), (2L, 2.0), (3L, 3.0), (10L, 10.0), (11L, 11.0))
    val r = ChunkWhile.assign(df, "k", (first, cur) => cur - first < 3)
    val chunks = r.select("k", "chunk_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(chunks === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("chunkWhile with partitions restarts per group") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("a", 2L), ("b", 1L), ("b", 5L)).toDF("g", "k")
    val r = ChunkWhile.assign(df, "k", (f, c) => c - f < 3, partitionBy = Seq("g"))
    val got = r.collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2))).toSet
    assert(got === Set(("a", 1L, 1L), ("a", 2L, 1L), ("b", 1L, 1L), ("b", 5L, 5L)))
  }

  test("windows lose no values (FsCheck law, reference Common.fs:108-191)") {
    // every input row appears in exactly min(n, position-dependent) windows;
    // here: sum over all Skip windows of size n == sum of each sliding span
    val n = 3
    val all = Windowing.windowInto(in, n, Boundary.AtBeginning)(count)
    // AtBeginning covers every key exactly once as a window key
    assert(all.count() === in.df.count())
  }
}
