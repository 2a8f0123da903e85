package graft

import org.apache.spark.sql.types._

import graft.sources.Csv

/** Culture-aware CSV parity with the reference's round-trip test
  * (reference tests/FSharp.DataFrame.Tests/Frame.fs:32-49: custom separator
  * AND culture). */
class CsvSpec extends SparkSpecBase {

  private def writeRaw(lines: Seq[String]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_csv").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "part.csv"),
      lines.mkString("\n").getBytes("UTF-8"))
    dir
  }

  private val deSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("x", DoubleType)))

  test("de-DE culture: comma decimals and '.' grouping parse into doubles") {
    val dir = writeRaw(Seq("name;x", "a;1.234,56", "b;-0,5", "c;7"))
    val df = Csv.read(spark, dir, separator = ";", schema = Some(deSchema), culture = "de-DE")
    val got = df.collect().map(r => r.getString(0) ->
      (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(got === Map("a" -> Some(1234.56), "b" -> Some(-0.5), "c" -> Some(7.0)))
  }

  test("ALL reference missing tokens (NaN, NA, #N/A, :) parse as null in numeric AND string columns") {
    val dir = writeRaw(Seq("name;x",
      "a;NA", "b;2,5", "c;#N/A", "d;:", "e;NaN",
      "NA;1,0", "#N/A;1,0", ":;1,0"))
    val df = Csv.read(spark, dir, separator = ";", schema = Some(deSchema), culture = "de-DE")
    val rows = df.collect()
    val byName = rows.filterNot(_.isNullAt(0))
      .map(r => r.getString(0) -> r.isNullAt(1)).toMap
    assert(byName === Map("a" -> true, "b" -> false, "c" -> true, "d" -> true, "e" -> true))
    // token-valued STRING cells are missing too (FrameExtensions.fs:49)
    assert(rows.count(_.isNullAt(0)) === 3)
  }

  test("write+read round-trip under de-DE preserves values exactly (2-dp money)") {
    import spark.implicits._
    val src = Seq(("x", 1234.56), ("y", -0.5), ("z", 100.0)).toDF("name", "x")
    val dir = java.nio.file.Files.createTempDirectory("graft_csv_rt").toString + "/out"
    Csv.write(src, dir, separator = ";", culture = "de-DE", decimals = 2)
    // the files on disk really are culture-formatted
    val raw = spark.read.text(dir).collect().map(_.getString(0)).toSet
    assert(raw.exists(_.contains("1234,56")), s"expected comma decimal in $raw")
    val back = Csv.read(spark, dir, separator = ";", schema = Some(deSchema), culture = "de-DE")
    val got = back.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got === Map("x" -> 1234.56, "y" -> -0.5, "z" -> 100.0))
  }

  test("inference with samplingRatio (the inferRows cost cap) still types numerics") {
    val dir = writeRaw(Seq("name,x") ++ (1 to 500).map(i => s"r$i,$i.5"))
    val df = Csv.read(spark, dir, samplingRatio = 0.1)
    assert(df.schema("x").dataType === DoubleType)
    assert(df.count() === 500)
  }

  test("XML round-trip preserves hostile text exactly (escaping, whitespace, unicode)") {
    import spark.implicits._
    val hostile = Seq(
      (1L, "a & b < c > d"),            // entity escaping
      (2L, "\"quoted\" & 'apos'"),      // quote flavors
      (3L, "  leading and trailing  "), // surrounding whitespace
      (4L, "emoji 😀 and café"), // supplementary plane + accents
      (5L, "<doc>nested tags</doc>"),   // text that LOOKS like markup
      (6L, "]]> cdata terminator"))
      .toDF("id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_xml_rt").toString + "/out"
    hostile.write.mode("overwrite")
      .option("rootTag", "docs").option("rowTag", "doc").format("xml").save(dir)
    val back = spark.read.schema(hostile.schema)
      .option("rowTag", "doc").option("ignoreSurroundingSpaces", "false")
      .format("xml").load(dir)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = hostile.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(back === want)
  }
}
