package graft

import org.apache.spark.sql.functions._

import graft.functions.{Vectors => V}

/** Native codegen expressions must agree bit-for-bit with the HOF and UDF
  * forms (identical accumulation order in double). */
class VectorExprSpec extends SparkSpecBase {

  import spark.implicits._

  private val vecs = Seq(
    (1L, Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f)),
    (2L, Seq(0.1f, -0.2f, 0.3f), Seq(-0.4f, 0.5f, -0.6f)),
    (3L, Seq.empty[Float], Seq.empty[Float])).toDF("id", "a", "b")

  test("dot_f32 / norm2_f32 agree with the HOF forms exactly") {
    val r = vecs.select(
      call_function("dot_f32", col("a"), col("b")).as("d1"),
      V.dot(col("a"), col("b")).as("d2"),
      call_function("norm2_f32", col("a")).as("n1"),
      V.norm2Sq(col("a")).as("n2")).collect()
    r.foreach { row =>
      assert(row.getDouble(0) === row.getDouble(1))
      assert(row.getDouble(2) === row.getDouble(3))
    }
  }

  test("non-float array arguments fail analysis instead of reading garbage") {
    val dbl = Seq((1L, Seq(1.0, 2.0))).toDF("id", "a")
    val ex = intercept[Exception](
      dbl.select(call_function("dot_f32", col("a"), col("a"))).collect())
    assert(ex.getMessage.contains("dot_f32"))
    val ex2 = intercept[Exception](
      dbl.select(call_function("norm2_f32", col("a"))).collect())
    assert(ex2.getMessage.contains("norm2_f32"))
  }

  test("null ELEMENTS are read as 0.0, not NPE") {
    val withNullElem = Seq((1L, Seq(Some(3.0f), None, Some(4.0f))))
      .toDF("id", "a")
    val r = withNullElem.select(
      call_function("norm2_f32", col("a")).as("n"),
      call_function("dot_f32", col("a"), col("a")).as("d")).head
    assert(r.getDouble(0) === 25.0)
    assert(r.getDouble(1) === 25.0)
  }

  test("null inputs yield null") {
    val withNull = Seq((1L, Option.empty[Seq[Float]])).toDF("id", "a")
    val r = withNull.select(call_function("norm2_f32", col("a"))).head
    assert(r.isNullAt(0))
  }

  test("expression participates in whole-stage codegen") {
    // a local relation would be constant-folded — go through parquet
    val dir = java.nio.file.Files.createTempDirectory("graft_vexpr").toString
    vecs.write.mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir)
      .select(call_function("dot_f32", col("a"), col("b")).as("d"))
    // "*(n)" prefixes mark operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project [dot_f32"), s"plan:\n$plan")
    assert(df.count() === 3)
    // and is usable from SQL
    vecs.createOrReplaceTempView("vexpr_t")
    val viaSql = spark.sql("SELECT dot_f32(a, b) FROM vexpr_t WHERE id = 1").head.getDouble(0)
    assert(viaSql === 32.0)
  }
}
