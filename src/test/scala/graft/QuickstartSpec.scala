package graft

import org.apache.spark.sql.functions._

/** Docs-as-test, the reference's strategy ported (reference
  * tests/Documentation.Tests.fs:44-73 compiles every .fsx literate
  * script under samples/ as a test): the README quick-start block is asserted
  * BYTE-IDENTICAL to the snippet below and then executed verbatim against
  * the bundled sf0.001 testdata, so the documented public surface cannot
  * rot — an API change that breaks the README breaks this spec, and a
  * README edit that drifts from the tested code fails the equality
  * assertion. */
class QuickstartSpec extends SparkSpecBase {

  /** EXACT copy of README.md's quick-start ```scala block. Update BOTH
    * together — the first test enforces it. */
  private val snippet: String =
    """import graft.core._
      |import graft.operators._
      |import org.apache.spark.sql.SparkSession
      |import org.apache.spark.sql.functions._
      |
      |val spark = SparkSession.builder()
      |  .config("spark.sql.extensions", "graft.plans.GraftExtensions") // required
      |  .getOrCreate()
      |import spark.implicits._
      |
      |// keyed series (the reference's Series<K,V>) over any DataFrame
      |val daily = KSeries(
      |  orders.groupBy(to_date($"o_orderdate").as("k"))
      |        .agg(sum($"o_totalprice").as("v")),
      |  ordered = true)
      |
      |val trend = daily
      |  .between(lit("1995-01-01"), lit("1995-12-31"))  // slicing → scan pruning
      |  .fillForward()                                  // auto-routes at scale
      |  .diff(1)                                        // ordered analytics
      |  .ewma(alpha = 0.1)                              // distributed recurrence
      |
      |// frames (the reference's Frame<R,C>) are DataFrames + row-key metadata
      |val kf = KFrame(df, Seq("yr", "mo", "status"))    // 3-level row key
      |  .lookupLevels(None, Some(6), None)              // SimpleLookup slice
      |// as-of joins need ordered frames on both sides:
      |val asof = KFrame(quotes, Seq("day"), ordered = true)
      |  .joinAsOf(KFrame(trades, Seq("day"), ordered = true), Lookup.NearestSmaller)
      |""".stripMargin

  test("README quick-start block matches the tested snippet byte-for-byte") {
    val readme = Seq("README.md", "/root/repo/README.md")
      .map(java.nio.file.Paths.get(_)).find(java.nio.file.Files.exists(_))
      .getOrElse(fail("README.md not found"))
    val text = new String(java.nio.file.Files.readAllBytes(readme), "UTF-8")
    assert(text.contains("```scala\n" + snippet + "```"),
      "README.md's quick-start ```scala block differs from QuickstartSpec.snippet — " +
        "update both together")
  }

  test("the quick-start snippet runs verbatim against the bundled testdata") {
    val dir = "/root/testdata/sf0.001"
    // fixture bindings — the only lines NOT in the README (the README
    // says "given your DataFrames orders/df/quotes/trades")
    val orders = Tables(spark, dir, "orders")
    val df = orders.select(
      year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"),
      col("o_orderstatus").as("status"), col("o_totalprice"))
    val quotes = orders.groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(avg(col("o_totalprice")).as("px"))
    val trades = orders.where(col("o_orderkey") % 7 === 0)
      .select(to_date(col("o_orderdate")).as("day"), col("o_totalprice").as("qty"))

    // ---- BEGIN verbatim snippet (mirrors `snippet` above, line for line,
    // modulo the outer val bindings already in scope) ----
    locally {
      import graft.core._
      import graft.operators._
      import org.apache.spark.sql.SparkSession
      import org.apache.spark.sql.functions._

      val spark = SparkSession.builder()
        .config("spark.sql.extensions", "graft.plans.GraftExtensions") // required
        .getOrCreate()
      import spark.implicits._

      // keyed series (the reference's Series<K,V>) over any DataFrame
      val daily = KSeries(
        orders.groupBy(to_date($"o_orderdate").as("k"))
              .agg(sum($"o_totalprice").as("v")),
        ordered = true)

      val trend = daily
        .between(lit("1995-01-01"), lit("1995-12-31"))  // slicing → scan pruning
        .fillForward()                                  // auto-routes at scale
        .diff(1)                                        // ordered analytics
        .ewma(alpha = 0.1)                              // distributed recurrence

      // frames (the reference's Frame<R,C>) are DataFrames + row-key metadata
      val kf = KFrame(df, Seq("yr", "mo", "status"))    // 3-level row key
        .lookupLevels(None, Some(6), None)              // SimpleLookup slice
      // as-of joins need ordered frames on both sides:
      val asof = KFrame(quotes, Seq("day"), ordered = true)
        .joinAsOf(KFrame(trades, Seq("day"), ordered = true), Lookup.NearestSmaller)
      // ---- END verbatim snippet ----

      // the documented chains actually compute something on the testdata
      assert(trend.df.count() > 0, "trend series is empty")
      val kfRows = kf.df.collect()
      assert(kfRows.nonEmpty && kfRows.forall(_.getAs[Int]("mo") == 6),
        "lookupLevels(None, Some(6), None) must slice month 6")
      assert(asof.df.count() > 0, "as-of join produced no rows")
    }
  }

  test("the pipeline surface routes through the KFrame wrapper (sugar, same plans)") {
    // r13 verdict #8: the unified-API story covers the LLM-pipeline ops
    // too — kf.dedupExact/nearDup/tokenCounts are thin forwarders, so each
    // must be row-identical to the operator it forwards to
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val kf = graft.core.KFrame(docs, Seq("doc_id"))
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().map(_.toSeq).toSet
    assert(rows(kf.dedupExact("text")) ===
      rows(graft.operators.Dedup.exact(docs, "doc_id", "text")))
    assert(rows(kf.nearDup("text")) ===
      rows(graft.operators.Dedup.minhashLshPortable(docs, "doc_id", "text")))
    val toks = kf.tokenCounts("text")
    assert(toks.columns.toSeq === Seq("doc_id", "n_tok") && toks.count() === docs.count())
  }
}
