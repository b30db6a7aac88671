package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All TABLES sign-LSH bucket codes of one embedding as ONE loop-
  * codegen'd expression — the 100x-fewer-nodes move ([[FloatVecDot]])
  * applied to s02's bucket index.
  *
  * The SQL formulation it replaces explodes each vector into DIM rows,
  * joins the 4096-row hyperplane table (a 64x fan-out: ~4096 product
  * rows PER VECTOR through the exchange) and reduces with two decimal
  * hash aggregates — profiling showed the decimal buffer updates
  * (UnsafeRow get/setDecimal on a BigDecimal-backed sum) as s02's top
  * executor frames. This expression computes the same 16 codes from
  * the same plane matrix in place: no explode, no join, no shuffle.
  *
  * VALUE-IDENTICAL by construction, spec-proven over the corpus
  * (LshBucketsSpec): the SQL chain's per-plane dot is
  * `sum(CAST(CAST(x AS DOUBLE) * hval AS DECIMAL(18,12)))` — each
  * product rounded HALF_UP to 12 decimals, then summed exactly. Here
  * each product goes through the identical rounding
  * (java.math.BigDecimal.valueOf == Spark's Cast-to-decimal path, both
  * Double.toString-based) and the scale-12 unscaled longs are summed
  * exactly in a long (|product| < 10^6 and <= DIM terms, so the sum is
  * far from overflow). The bucket bit is `dot > 0` — on the unscaled
  * long, the same comparison. The plane matrix is the same
  * seeded-deterministic [[VectorFunctions.hyperplaneRows]] sequence.
  *
  * Null semantics match the SQL chain: a null element's product is
  * null and `sum` skips nulls — the term is skipped here too; a null
  * input yields null. Arrays shorter than DIM throw like ANSI
  * GetArrayItem... except the SQL chain would silently sum fewer
  * terms via the absent exploded rows; the corpus is fixed-DIM, and a
  * loud error beats a silently shorter dot.
  */
case class LshSignBuckets(child: Expression, dim: Int, tables: Int,
    nbits: Int, seed: Long) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_sign_buckets needs array<float>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "lsh_sign_buckets"

  override protected def nullSafeEval(input: Any): Any =
    LshSignBuckets.compute(input.asInstanceOf[ArrayData], dim, tables,
      nbits, seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.LshSignBuckets.compute($v, $dim, " +
        s"$tables, $nbits, ${seed}L);")

  override protected def withNewChildInternal(newChild: Expression)
      : LshSignBuckets = copy(child = newChild)
}

object LshSignBuckets {
  // plane matrices are tiny deterministic constants (seeded LCG), one
  // per geometry per JVM — code, not data
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int, Long), Array[Double]]()

  private def planes(dim: Int, tables: Int, nbits: Int, seed: Long): Array[Double] =
    planeCache.computeIfAbsent((dim, tables, nbits, seed), { _ =>
      VectorFunctions.hyperplaneRows(dim, tables, nbits, seed)
        .map(_._4).toArray // ordered (tbl, bit, dim) — the generation order
    })

  /** Spark's double→decimal(18,12) cast, exactly: Decimal(d) parses
    * Double.toString (== BigDecimal.valueOf), changePrecision rounds
    * HALF_UP to scale 12; the unscaled long is the exact scaled value.
    */
  private def unscaled12(d: Double): Long =
    java.math.BigDecimal.valueOf(d)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()

  def compute(arr: ArrayData, dim: Int, tables: Int, nbits: Int,
      seed: Long): ArrayData = {
    if (arr.numElements() < dim) throw new IllegalArgumentException(
      s"lsh_sign_buckets: array has ${arr.numElements()} elements, needs >= $dim")
    val h = planes(dim, tables, nbits, seed)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val base = (t * nbits + b) * dim
        var dot = 0L
        var i = 0
        while (i < dim) {
          // null element -> null product, which the SQL sum skips
          if (!arr.isNullAt(i))
            dot += unscaled12(arr.getFloat(i).toDouble * h(base + i))
          i += 1
        }
        if (dot > 0) bucket += (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}
