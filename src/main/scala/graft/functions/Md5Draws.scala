package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftx.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The five 24-bit draw windows of an md5 digest, as `array<bigint>` —
  * the codegen'd kernel behind the q_bootstrap_ci replica fan-out.
  *
  * Window k of the CONTRACT form `conv(substr(md5(s), 1 + 6·k, 6), 16,
  * 10)` reads hex characters [6k+1, 6k+6] of the digest's hex encoding;
  * six hex characters are exactly three digest BYTES (the windows are
  * nibble-aligned at byte offsets 3k), so
  *
  *   window(k) = (b[3k] << 16) | (b[3k+1] << 8) | b[3k+2]   (unsigned)
  *
  * is the identical integer read straight off the 16 raw digest bytes —
  * no hex string is ever built and no base-16 parse ever runs. The
  * DuckDB oracle keeps the textual hex-window form; Md5DrawsSpec pins
  * this expression against the hex/conv reference on fixture data.
  *
  * Why a custom Expression (the [[CosineSimFloat]] precedent): the
  * built-in chain per input row was 7 `md5` evaluations (each paying a
  * `MessageDigest.getInstance` lookup plus a 32-char hex encode) and 19
  * `conv(substr(...))` base-16 parses; this expression reuses a
  * thread-local digest instance and emits the five longs in one pass.
  * NULL input yields NULL, matching `md5`'s null propagation.
  */
case class Md5Draws24(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"expected string arg, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      Md5Draws24.draws(input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.Md5Draws24.draws($c.getBytes()))")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Draws24 = copy(child = newChild)
}

object Md5Draws24 {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** The five big-endian 24-bit windows of md5(bytes), as longs. */
  def draws(bytes: Array[Byte]): Array[Long] = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    val out = new Array[Long](5)
    var k = 0
    while (k < 5) {
      out(k) = ((h(3 * k) & 0xFFL) << 16) |
        ((h(3 * k + 1) & 0xFFL) << 8) | (h(3 * k + 2) & 0xFFL)
      k += 1
    }
    out
  }

  /** Unsigned value of the first `nHex` hex characters of md5(bytes):
    * ⌈nHex/2⌉ big-endian digest bytes, right-shifted a nibble when nHex
    * is odd. nHex ≤ 15 keeps the value in a non-negative long. */
  def prefix(bytes: Array[Byte], nHex: Int): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    val nBytes = (nHex + 1) / 2
    var v = 0L
    var i = 0
    while (i < nBytes) { v = (v << 8) | (h(i) & 0xFFL); i += 1 }
    if ((nHex & 1) == 1) v >>>= 4
    v
  }

  /** Column wrapper. */
  def md5Draws(s: Column): Column =
    ColumnBridge.column(Md5Draws24(ColumnBridge.expression(s)))

  /** Column wrapper for [[Md5HexPrefix]]. */
  def md5Prefix(s: Column, nHex: Int): Column =
    ColumnBridge.column(Md5HexPrefix(ColumnBridge.expression(s), nHex))
}

/** `conv(substring(md5(s), 1, nHex), 16, 10)` as one codegen'd kernel —
  * the engine's standard hex-prefix hash device ([[graft.operators.Hashing.md5Bucket]],
  * `Geo.derivedCoord`, the sampler/splitter percentile draws, simhash's
  * per-token 60-bit hash) computed straight off the raw digest bytes:
  * the first nHex hex characters are the first ⌈nHex/2⌉ digest bytes
  * (right-shifted one nibble when nHex is odd), so no 32-char hex
  * encode and no base-16 parse runs per row. The DuckDB oracles keep
  * the textual form; Md5DrawsSpec pins this kernel against the
  * hex/conv reference for every width in use (4, 6, 8, 15). NULL
  * propagates like `md5`. */
case class Md5HexPrefix(child: Expression, nHex: Int)
    extends UnaryExpression {
  require(nHex >= 1 && nHex <= 15,
    s"Md5HexPrefix supports 1..15 hex chars (long range), got $nHex")

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult
      .TypeCheckFailure(s"expected string arg, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Draws24.prefix(input.asInstanceOf[UTF8String].getBytes, nHex)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.Md5Draws24.prefix($c.getBytes(), $nHex)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5HexPrefix = copy(child = newChild)
}
