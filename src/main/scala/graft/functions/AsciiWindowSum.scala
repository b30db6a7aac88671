package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sum of the ascii() code points of a fixed-length character window of
  * a string, space-padded past the end — ONE loop-codegen'd Catalyst
  * expression (the [[FloatVecDot]] discipline applied to the multimodal
  * stand-in encoders).
  *
  * `asciiWindowSum(str, pos, len)` (pos 1-based, in CHARACTERS) equals
  * the builtin chain
  *
  *   (1 to len).map(i => ascii(substring(rpad(substring(str, pos, len),
  *     len, " "), i, 1))).reduce(_ + _)
  *
  * value-for-value: each term is the Unicode code point of the window's
  * i-th character (Spark's Ascii = codePointAt(0) of the 1-char
  * substring; a direct UTF-8 decode yields the same code point), and
  * positions past the end of the string contribute the pad space (32).
  * The builtin chain allocates 2 window copies + `len` single-character
  * UTF8Strings PER ROW — ~130 allocations per audio window — which at
  * 32 concurrent tasks is pure GC pressure (m04's measured in-suite
  * failure mode); this expression reads the backing bytes in place and
  * allocates nothing.
  *
  * Null semantics: any null input → null, like the builtin chain (a
  * null operand nulls substring/ascii and the + chain). Out-of-range
  * `pos` (< 1) is rejected — the operators only generate 1-based
  * forward windows, and silently mirroring substring's negative-index
  * semantics here would be an untested trap.
  */
case class AsciiWindowSum(str: Expression, pos: Expression, len: Expression)
  extends TernaryExpression {

  override def first: Expression = str
  override def second: Expression = pos
  override def third: Expression = len

  override def checkInputDataTypes(): TypeCheckResult =
    (str.dataType, pos.dataType, len.dataType) match {
      case (StringType, LongType | IntegerType, IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"ascii_window_sum needs (string, int/long, int), got $other")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "ascii_window_sum"

  override protected def nullSafeEval(s: Any, p: Any, l: Any): Any = {
    val posL = p match { case i: Int => i.toLong; case j: Long => j }
    AsciiWindowSum.sum(s.asInstanceOf[UTF8String], posL, l.asInstanceOf[Int])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, p, l) =>
      s"${ev.value} = graft.functions.AsciiWindowSum.sum($s, (long)$p, $l);")

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): AsciiWindowSum =
    copy(str = newFirst, pos = newSecond, len = newThird)
}

object AsciiWindowSum {
  /** The shared interpreted/codegen kernel: skip `pos - 1` characters,
    * sum the code points of the next `len`, pad the shortfall with
    * spaces. UTF-8 is decoded in place (no allocation); a code point's
    * UTF-8 decode equals codePointAt(0) of its 1-char substring, which
    * is what the builtin Ascii returns.
    */
  def sum(str: UTF8String, pos: Long, len: Int): Int = {
    require(pos >= 1, s"ascii_window_sum: pos must be >= 1, got $pos")
    require(len >= 0, s"ascii_window_sum: len must be >= 0, got $len")
    val base = str.getBaseObject
    val off = str.getBaseOffset
    val n = str.numBytes()
    var i = 0
    var skip = pos - 1
    while (skip > 0 && i < n) {
      i += UTF8String.numBytesForFirstByte(
        org.apache.spark.unsafe.Platform.getByte(base, off + i))
      skip -= 1
    }
    var total = 0
    var got = 0
    while (got < len && i < n) {
      val b = org.apache.spark.unsafe.Platform.getByte(base, off + i) & 0xFF
      if (b < 0x80) { total += b; i += 1 }
      else if (b < 0xE0) {
        total += ((b & 0x1F) << 6) |
          (org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0x3F)
        i += 2
      } else if (b < 0xF0) {
        total += ((b & 0x0F) << 12) |
          ((org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0x3F) << 6) |
          (org.apache.spark.unsafe.Platform.getByte(base, off + i + 2) & 0x3F)
        i += 3
      } else {
        total += ((b & 0x07) << 18) |
          ((org.apache.spark.unsafe.Platform.getByte(base, off + i + 1) & 0x3F) << 12) |
          ((org.apache.spark.unsafe.Platform.getByte(base, off + i + 2) & 0x3F) << 6) |
          (org.apache.spark.unsafe.Platform.getByte(base, off + i + 3) & 0x3F)
        i += 4
      }
      got += 1
    }
    total + 32 * (len - got)
  }
}
