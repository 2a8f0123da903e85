package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver keeps only the LAST 2000 chars of bench stdout; the metric
  * line must stay under budget at ANY query count, self-describing how
  * many cheap-tail entries were omitted. */
class BenchTailSpec extends AnyFunSuite {

  private def fakeResults(n: Int): Seq[(String, Double)] =
    (1 to n).map(i => (f"q$i%02d_synthetic_query_name", (i % 97) * 0.033 + 0.01))

  test("tail line stays under the byte budget at any query count") {
    val load = "\"load\":[0.123,0.456]"
    for (n <- Seq(1, 50, 294, 500, 1000, 4000)) {
      val line = Bench.tailLine(fakeResults(n), qerr = 0, load, total = n * 0.5)
      assert(line.length <= 1900, s"line ${line.length} bytes at $n queries")
      // well-formed JSON with the wrapper fields intact
      assert(line.startsWith("{\"metric\":\"total\""))
      assert(line.contains("\"qomit\":"))
      // percentile stamp characterizes the omitted cheap mass
      assert("\"p\":\\[\\d+,\\d+,\\d+\\]".r.findFirstIn(line).isDefined)
      assert(line.endsWith("}}"))
      val qomit = "\"qomit\":(\\d+)".r.findFirstMatchIn(line).get.group(1).toInt
      val kept = "\"\\d+\":-?\\d+".r.findAllIn(
        line.drop(line.indexOf("\"queries\""))).size
      assert(kept + qomit === n, s"kept=$kept qomit=$qomit n=$n")
    }
  }

  test("tail line keeps the SLOWEST queries and omits only the cheap tail") {
    val rs = (1 to 600).map(i => (f"q$i%03d_x", i * 0.01))
    val line = Bench.tailLine(rs, qerr = 0, "\"load\":[0.1,0.1]", total = 1.0)
    // the slowest query (q600 at 6.0s) must be present; the cheapest must not
    assert(line.contains("\"600\":6000"))
    assert(!line.contains("\"1\":10,"))
    // error sentinels survive as -1, never a plausible timing
    val line2 = Bench.tailLine(Seq(("q01_a", -1.0), ("q02_b", 0.5)), 1,
      "\"load\":[0.1,0.1]", 0.5)
    assert(line2.contains("\"1\":-1") && line2.contains("\"2\":500"))
  }
}
