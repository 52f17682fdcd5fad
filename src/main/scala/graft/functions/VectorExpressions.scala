package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for cosine similarity between two
  * `array<float>` columns, with whole-stage codegen.
  *
  * Why a custom Expression (SURVEY.md §4.3 preference (b)): the
  * `zip_with + aggregate` higher-order form allocates an intermediate
  * array and interprets two lambdas per row — measured 36 s for the 2M-pair
  * embedding near-dup self-join at sf0.1. This expression fuses dot product
  * and both norms into one primitive loop with zero allocation; the codegen
  * body inlines into the surrounding WholeStageCodegen stage.
  *
  * Accumulation order is index-ascending, identical to the HOF form and to
  * the plain-Scala test reference, so results are bit-identical across all
  * three implementations.
  */
case class CosineSimFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == ArrayType(FloatType, false) ||
        left.dataType == ArrayType(FloatType, true)) {
      if (right.dataType == ArrayType(FloatType, false) ||
          right.dataType == ArrayType(FloatType, true))
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(s"right must be array<float>, got ${right.dataType}")
    } else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"left must be array<float>, got ${left.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          double $xi = (double) $a.getFloat($i);
          double $yi = (double) $b.getFloat($i);
          $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
        }
        ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimFloat =
    copy(left = newLeft, right = newRight)
}

/** Exact integer dot product of two `array<bigint>` columns — the
  * verification kernel for quantized embedding near-dup
  * (q_dedup_embed_q). Same motivation as [[CosineSimFloat]]: one fused
  * primitive loop instead of zip_with+aggregate lambda interpretation per
  * pair (measured 23 s → ~1 s on the 2M-pair sf0.1 self-join). Integer
  * math: no ordering concerns at all. */
case class LongVecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = (t: DataType) => t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"expected array<bigint> args, got ${left.dataType}, ${right.dataType}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0L
    var i = 0
    while (i < n) { dot += x.getLong(i) * y.getLong(i); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $dot = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $dot += $a.getLong($i) * $b.getLong($i);
        }
        ${ev.value} = $dot;
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecDot =
    copy(left = newLeft, right = newRight)
}

/** 32-bit Morton (Z-order) interleave of the low 16 bits of two BIGINT
  * columns: bit i of the left lands at position 2i, of the right at
  * 2i+1. The layout key for [[graft.operators.Layout.zorderBy]].
  *
  * Why a custom Expression: the `aggregate(sequence(0,15), ...)` HOF
  * form materializes a 16-element array and interprets a lambda 16×
  * per row — the wrong shape for a key computed for EVERY row of a
  * 100 TB table at write time. This is branch-free magic-number bit
  * spreading (5 shift-mask steps per operand), inlined into
  * whole-stage codegen. Bit-identical to the HOF form and the
  * plain-Scala reference (LayoutSpec). */
case class MortonInterleave16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val lt = org.apache.spark.sql.types.LongType
    if (left.dataType == lt && right.dataType == lt)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"expected bigint args, got ${left.dataType}, ${right.dataType}")
  }

  @inline private def spread(v: Long): Long = {
    var s = v & 0xFFFFL
    s = (s | (s << 8)) & 0x00FF00FFL
    s = (s | (s << 4)) & 0x0F0F0F0FL
    s = (s | (s << 2)) & 0x33333333L
    s = (s | (s << 1)) & 0x55555555L
    s
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    spread(a.asInstanceOf[Long]) | (spread(b.asInstanceOf[Long]) << 1)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val sx = ctx.freshName("sx")
      val sy = ctx.freshName("sy")
      s"""
        long $sx = $a & 0xFFFFL;
        $sx = ($sx | ($sx << 8)) & 0x00FF00FFL;
        $sx = ($sx | ($sx << 4)) & 0x0F0F0F0FL;
        $sx = ($sx | ($sx << 2)) & 0x33333333L;
        $sx = ($sx | ($sx << 1)) & 0x55555555L;
        long $sy = $b & 0xFFFFL;
        $sy = ($sy | ($sy << 8)) & 0x00FF00FFL;
        $sy = ($sy | ($sy << 4)) & 0x0F0F0F0FL;
        $sy = ($sy | ($sy << 2)) & 0x33333333L;
        $sy = ($sy | ($sy << 1)) & 0x55555555L;
        ${ev.value} = $sx | ($sy << 1);
      """
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): MortonInterleave16 =
    copy(left = newLeft, right = newRight)
}

object VectorFunctions {
  /** Column-level wrapper: cosine similarity of two array<float> columns. */
  def cosineF(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimFloat(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact dot product of two array<bigint> columns. */
  def dotL(a: Column, b: Column): Column =
    ColumnBridge.column(LongVecDot(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Morton (Z-order) interleave of the low 16 bits of two bigint columns. */
  def morton(a: Column, b: Column): Column =
    ColumnBridge.column(MortonInterleave16(
      ColumnBridge.expression(a.cast("long")), ColumnBridge.expression(b.cast("long"))))

  /** THE milli-quantization kernel shared by every integer-exact
    * embedding operator (similarity top-k/range, embedding near-dup,
    * k-means assign/update): `round(CAST(x AS DOUBLE) · 1000)` per
    * component, int64 codes. One definition because the expression is
    * correctness-critical for cross-engine parity — the double cast is
    * LOAD-BEARING (DuckDB multiplies FLOAT·INT in float, Spark promotes
    * to double; a payload like 0.3195f diverges without it — DESIGN.md
    * §7). Its DuckDB twin is
    * `list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000)
    * AS BIGINT))`, and every oracle copy must mirror it byte-for-byte
    * (the [[graft.operators.Hashing.md5Bucket]] contract style). */
  def milliQuant(embedding: Column): Column = {
    import org.apache.spark.sql.functions.{round, transform}
    transform(embedding, x =>
      round(x.cast("double") * 1000, 0).cast("long"))
  }
}
