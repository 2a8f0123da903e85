package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `Frame.ReadCsv` / `SaveCsv` (reference src/FrameExtensions.fs:45-78,
  * 240-270, 320-356) on Spark's distributed CSV source.
  *
  * Option mapping (reference → Spark):
  *  - `separators`        → `sep`
  *  - missing tokens `"NaN,NA,#N/A,:"` → `nullValue`/`nanValue`
  *  - `culture`           → `locale` + decimal-comma routing (below)
  *  - `inferRows` cap     → `samplingRatio` (Spark samples a fraction of
  *    rows for schema inference rather than a prefix — same cost cap,
  *    sounder statistically at 100 TB where a prefix is one file)
  *  - `schema`            → explicit `StructType` (skips inference)
  *
  * Culture handling: Spark parses `double` CSV fields with Java's
  * period-only `Double.parseDouble`, but honors `locale` for `DecimalType`
  * — so for comma-decimal cultures (de-DE, fr-FR, ...) double columns are
  * read as `decimal(38,18)` under the culture's `DecimalFormat` and cast
  * back to double. Everything stays a distributed scan; no driver parsing.
  */
object Csv {

  /** The reference's missing-value tokens (FrameExtensions.fs:49). Typed
    * columns get them via parse-failure→null (permissive mode) plus the
    * NaN→missing canonicalization below; string columns are scrubbed
    * explicitly in [[read]] — Spark's single `nullValue` option alone can
    * only carry one of them. */
  val MissingTokens: Seq[String] = Seq("NaN", "NA", "#N/A", ":")

  private def applyMissingTokens(df: DataFrame): DataFrame =
    df.select(df.schema.map { f =>
      f.dataType match {
        case StringType =>
          when(col(f.name).isin(MissingTokens: _*), lit(null))
            .otherwise(col(f.name)).as(f.name)
        case DoubleType | FloatType =>
          // the reference reads "NaN" as MISSING, not as a NaN value
          when(isnan(col(f.name)), lit(null)).otherwise(col(f.name)).as(f.name)
        case _ => col(f.name)
      }
    }: _*)

  private def commaDecimal(culture: String): Boolean = {
    val sym = java.text.DecimalFormatSymbols.getInstance(
      java.util.Locale.forLanguageTag(culture))
    sym.getDecimalSeparator == ','
  }

  /** Frame.ReadCsv. `schema=None, inferTypes=true` infers column types
    * (over `samplingRatio` of rows); `inferTypes=false` reads all-string
    * like the reference's skipTypeInference. */
  def read(
      spark: SparkSession,
      path: String,
      separator: String = ",",
      inferTypes: Boolean = true,
      samplingRatio: Double = 1.0,
      schema: Option[StructType] = None,
      culture: String = "en-US",
      dateFormat: Option[String] = None,
      header: Boolean = true): DataFrame = {
    var r = spark.read
      .option("header", header.toString)
      .option("sep", separator)
      .option("nullValue", "NA")
      .option("nanValue", "NaN")
      .option("locale", culture)
    dateFormat.foreach(f => r = r.option("dateFormat", f))
    val parsed = schema match {
      case Some(sc) if commaDecimal(culture) =>
        val swapped = StructType(sc.map {
          case f if f.dataType == DoubleType || f.dataType == FloatType =>
            f.copy(dataType = DecimalType(38, 18))
          case f => f
        })
        r.schema(swapped).csv(path).select(sc.map { f =>
          f.dataType match {
            case DoubleType => col(f.name).cast("double").as(f.name)
            case FloatType  => col(f.name).cast("float").as(f.name)
            case _          => col(f.name)
          }
        }: _*)
      case Some(sc) => r.schema(sc).csv(path)
      case None if inferTypes =>
        r.option("inferSchema", "true")
          .option("samplingRatio", samplingRatio.toString).csv(path)
      case None => r.csv(path)
    }
    applyMissingTokens(parsed)
  }

  /** Frame.SaveCsv (reference FrameExtensions.fs:320-356). For
    * comma-decimal cultures, fractional columns are rendered through
    * `decimal` and the separator swapped — a distributed projection, so the
    * sink scales like any `df.write`. `decimals` bounds the rendered scale
    * (CSV is a text format; pick the precision the data carries). */
  def write(
      df: DataFrame,
      path: String,
      separator: String = ",",
      culture: String = "en-US",
      decimals: Int = 6,
      header: Boolean = true): Unit = {
    val out =
      if (!commaDecimal(culture)) df
      else df.select(df.schema.map { f =>
        f.dataType match {
          case DoubleType | FloatType =>
            translate(col(f.name).cast(DecimalType(38, decimals)).cast("string"),
              ".", ",").as(f.name)
          case _ => col(f.name)
        }
      }: _*)
    out.write.mode("overwrite")
      .option("header", header.toString).option("sep", separator).csv(path)
  }
}
