package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Custom aggregates for the reference's arbitrary-reducer surface
  * (`Series.stat` / `Series.reduce` take any Seq[float] => float,
  * reference src/SeriesModule.fs:46-65; SURVEY §2.10): a typed
  * `Aggregator[IN, BUF, OUT]` is the Spark-native equivalent — distributed
  * partial aggregation (map-side combine) instead of the reference's
  * single-thread fold.
  */
object CustomAggs {

  /** Weighted mean: sum(x*w)/sum(w), null-skipping on either side. */
  private object WeightedMeanAgg
      extends Aggregator[(java.lang.Double, java.lang.Double), (Double, Double), java.lang.Double] {
    def zero: (Double, Double) = (0.0, 0.0)
    def reduce(b: (Double, Double), in: (java.lang.Double, java.lang.Double)): (Double, Double) =
      if (in._1 == null || in._2 == null) b
      else (b._1 + in._1 * in._2, b._2 + in._2)
    def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Double)): java.lang.Double =
      if (r._2 == 0.0) null else r._1 / r._2
    def bufferEncoder: Encoder[(Double, Double)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaDouble)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  /** `weightedMean(x, w)` as a Column aggregate. */
  def weightedMean(x: Column, w: Column): Column =
    udaf(WeightedMeanAgg).apply(x.cast("double"), w.cast("double"))

  /** Geometric mean via a log-sum Aggregator (positive inputs; nulls and
    * non-positives skipped — missing-skipping like every reference stat). */
  private object GeoMeanAgg
      extends Aggregator[java.lang.Double, (Double, Long), java.lang.Double] {
    def zero: (Double, Long) = (0.0, 0L)
    def reduce(b: (Double, Long), in: java.lang.Double): (Double, Long) =
      if (in == null || in <= 0.0) b else (b._1 + math.log(in), b._2 + 1)
    def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
      (a._1 + b._1, a._2 + b._2)
    def finish(r: (Double, Long)): java.lang.Double =
      if (r._2 == 0L) null else math.exp(r._1 / r._2)
    def bufferEncoder: Encoder[(Double, Long)] = Encoders.tuple(
      Encoders.scalaDouble, Encoders.scalaLong)
    def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
  }

  def geoMean(x: Column): Column = udaf(GeoMeanAgg).apply(x.cast("double"))
}
