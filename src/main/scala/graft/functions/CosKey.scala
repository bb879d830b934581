package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, Decimal, DecimalType, LongType}

/** Exact integer cosine ranking key: `floorDiv(d·|d|·10⁶, n)` over a signed
  * integer dot product `d` and a positive squared norm `n`.
  *
  * Ranking vectors by cosine against a common side reduces to ranking by
  * `d/√n` (the common side's norm divides out). The map `x → x·|x|` is
  * strictly monotone, so ranking by the exact rational `d·|d|/n` — scaled by
  * 10⁶ and floored — preserves the cosine order; the floor only merges pairs
  * whose cosines agree to ~10⁻⁶ (far below any meaningful similarity gap),
  * and merged pairs fall to the caller's id tie-break, evaluated on
  * IDENTICAL integer keys in any engine. This is what makes approximate-NN
  * rankings oracle-checkable: DuckDB replays the same key as
  * `(num - ((num % n) + n) % n) // n` over HUGEINT (the pmod trick yields an
  * exactly-divisible numerator, so `//`'s truncation semantics don't
  * matter), bit-equal to the BigInteger floor division here.
  *
  * Overflow contract (same style as [[SrpBands]]): the BigInteger numerator
  * is exact for any long `d`, but the key must fit DecimalType(38,0) —
  * |d| ≤ ~3·10¹⁵ with n ≥ 1 suffices (1e6-grid embeddings at ≤1024 dims
  * stay below 7·10¹³). Returns NULL for n ≤ 0 (undefined cosine) — callers
  * filter zero-norm vectors identically in the oracle.
  */
case class CosRatioKey(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"graft_cos_key expects (bigint, bigint), got " +
          s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
    }
  override def dataType: DataType = DecimalType(38, 0)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cos_key"

  override protected def nullSafeEval(d: Any, n: Any): Any =
    CosRatioKey.key(d.asInstanceOf[Long], n.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, n) => {
      s"""
         |${ev.value} = graft.functions.CosRatioKey.key($d, $n);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosRatioKey {
  private val Scale = BigInteger.valueOf(1000000L)

  /** floorDiv(d·|d|·10⁶, n) as Decimal(38,0); null when n ≤ 0. */
  def key(d: Long, n: Long): Decimal = {
    if (n <= 0L) return null
    val bd = BigInteger.valueOf(d)
    val num = bd.multiply(bd.abs).multiply(Scale)
    val den = BigInteger.valueOf(n)
    // BigInteger.mod with a positive modulus is non-negative, so
    // subtracting it leaves an exactly-divisible numerator: floor division
    // regardless of the sign of num
    val q = num.subtract(num.mod(den)).divide(den)
    Decimal(new java.math.BigDecimal(q), 38, 0)
  }
}
