package graft.functions

import org.apache.spark.sql.{Column, GraftSql}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling polynomial (Karp–Rabin) fingerprint of a string: the unsigned
  * minimum over all `window`-byte windows of the degree-(window-1)
  * polynomial hash of the window's UTF-8 bytes, mod 2^64 (native Long
  * overflow). A winnowing-style document fingerprint: near-identical
  * documents share their minimum window with high probability, and the
  * whole computation is one code-generated pass over the bytes — no UDF
  * boxing, no per-row allocation beyond the byte array.
  *
  * Strings shorter than `window` hash their full length (empty → 0).
  */
case class RollingFingerprint(child: Expression, window: Int, base: Long)
  extends UnaryExpression {

  require(window > 0, "window must be positive")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_fingerprint needs a string input, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    RollingFingerprint.fingerprint(bytes, window, base)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val ww = ctx.freshName("ww")
      val bw = ctx.freshName("bw")
      val h = ctx.freshName("h")
      val mn = ctx.freshName("mn")
      val i = ctx.freshName("i")
      s"""
         |byte[] $bytes = $c.getBytes();
         |int $n = $bytes.length;
         |int $ww = ($n < $window) ? $n : $window;
         |long $bw = 1L;
         |for (int $i = 0; $i < $ww - 1; $i++) $bw *= ${base}L;
         |long $h = 0L;
         |for (int $i = 0; $i < $ww; $i++) $h = $h * ${base}L + ($bytes[$i] & 0xff);
         |long $mn = $h;
         |for (int $i = $ww; $i < $n; $i++) {
         |  $h = ($h - (($bytes[$i - $ww] & 0xff) * $bw)) * ${base}L + ($bytes[$i] & 0xff);
         |  if (Long.compareUnsigned($h, $mn) < 0) $mn = $h;
         |}
         |${ev.value} = $mn;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  val DefaultWindow = 16
  val DefaultBase = 1000003L

  /** Reference implementation — also the interpreted (non-codegen) path's
    * ground truth in tests.
    */
  def fingerprint(bytes: Array[Byte], window: Int, base: Long): Long = {
    val n = bytes.length
    val ww = math.min(window, n)
    var bw = 1L
    var i = 0
    while (i < ww - 1) { bw *= base; i += 1 }
    var h = 0L
    i = 0
    while (i < ww) { h = h * base + (bytes(i) & 0xff); i += 1 }
    var mn = h
    i = ww
    while (i < n) {
      h = (h - (bytes(i - ww) & 0xff) * bw) * base + (bytes(i) & 0xff)
      if (java.lang.Long.compareUnsigned(h, mn) < 0) mn = h
      i += 1
    }
    mn
  }

  /** Column-API entry point. */
  def apply(c: Column): Column =
    GraftSql.column(
      RollingFingerprint(GraftSql.expression(c), DefaultWindow, DefaultBase))
}
