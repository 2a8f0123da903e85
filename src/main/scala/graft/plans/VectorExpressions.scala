package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expressions for dense-vector math over `array<float>`:
  * the top of the extension preference ladder (native `Expression` with
  * `doGenCode` > Scala UDF > interpreted HOF). Unlike the UDF kernels in
  * graft.functions.Vectors these read `ArrayData` in place — no
  * Seq[Float] materialization per call — and emit Java into whole-stage
  * codegen, so a 100 TB similarity scan stays in one generated loop.
  * Registered as SQL functions `dot_f32` / `norm2_f32` by
  * [[GraftExtensions]].
  */
case class DotF32(left: Expression, right: Expression)
    extends BinaryExpression {

  // Strictly array<float> (either nullability): these are session-wide SQL
  // functions, and accepting any ArrayType would silently read mis-sized
  // element slots (array<double>/array<bigint>) as garbage floats instead of
  // failing analysis. Null ELEMENTS are read as 0.0 (documented; parquet
  // array columns are containsNull=true by default, so rejecting them would
  // reject every scanned embedding column).
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_f32 expects two array<float> arguments, got ${left.dataType} and ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_f32"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product over `array<bigint>` — the fixed-point sibling of
  * [[DotF32]] for quantized vectors (SemDeDup pair scans, portable-ANN
  * kernels): exact, order-free, and fused into whole-stage codegen. Long
  * multiply-add wraps on overflow like any Java long — callers own the
  * scale headroom (floor(x·2^k) elements at dims ≤ 4096 stay far below
  * 2^63 for k ≤ 20). Null elements read as 0. Squared norm = dot_i64(v,v).
  * Registered as SQL function `dot_i64` by [[GraftExtensions]]. */
case class DotI64(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      }))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"dot_i64 expects two array<bigint> arguments, got ${left.dataType} and ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_i64"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && !$b.isNullAt($i)) {
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm of an `array<float>` — companion to [[DotF32]]. */
case class Norm2F32(child: Expression)
    extends UnaryExpression {

  // See DotF32: strictly array<float>, null elements read as 0.0.
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"norm2_f32 expects an array<float> argument, got $other")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "norm2_f32"

  override protected def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    var acc = 0.0
    var i = 0
    val n = x.numElements()
    while (i < n) {
      if (!x.isNullAt(i)) { val v = x.getFloat(i).toDouble; acc += v * v }
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    double $v = (double) $a.getFloat($i);
         |    $acc += $v * $v;
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
