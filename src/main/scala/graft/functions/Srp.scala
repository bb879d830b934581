package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Signed-random-projection (SRP) LSH support expressions.
  *
  * [[SrpBands]] turns one gridded embedding (`array<long>`, the exact
  * 1e-6-grid integer representation) into its 8 LSH band values in a single
  * codegen'd pass: 64 Rademacher hyperplanes whose ±1 signs derive from
  * md5("srp|p|j") — the same cross-engine-reproducible recipe the DuckDB
  * oracle replays in SQL — packed 8 bits per band. The declarative
  * formulation (explode 64 dims × 64 planes → two aggregations) shuffles
  * N·4096 rows and computes N·4096 md5s; the sign matrix depends only on
  * (plane, dim), so it is computed ONCE here and the per-row work becomes a
  * 64×64 integer multiply-add loop inside whole-stage codegen (measured 7.7 s
  * → sub-second at sf0.1). Same custom-operator preference as
  * [[DotProductFloat]]: codegen'd Expression over UDF over interpreted HOF.
  *
  * [[DotProductLong]] is the exact integer dot product used by the LSH
  * verifier's integer cosine gate (`10000·dot² ≥ 1225·‖a‖²·‖b‖²`). The sum
  * is order-insensitive (integer), so it is hash-stable by construction.
  * Callers bound the element magnitude (grid scale × dims must stay well
  * under 2^63; the 1e-6 grid on unit-ish 64-dim vectors peaks near 6.4e13).
  */
case class SrpBands(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_srp_bands expects array<long>, got ${t.simpleString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // null for null/ragged input or dims beyond the precomputed sign matrix
  override def nullable: Boolean = true
  override def prettyName: String = "graft_srp_bands"

  override protected def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n > SrpBands.MaxDims) return null
    var j = 0
    while (j < n) { if (x.isNullAt(j)) return null; j += 1 }
    val signs = SrpBands.signs
    val bands = new Array[Long](SrpBands.NumBands)
    var p = 0
    while (p < SrpBands.NumPlanes) {
      var acc = 0L
      var i = 0
      while (i < n) { acc += signs(p)(i) * x.getLong(i); i += 1 }
      if (acc > 0) bands(p >> 3) |= (1L << (p & 7))
      p += 1
    }
    new GenericArrayData(bands)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signs = ctx.addReferenceObj("srpSigns", SrpBands.signs, "long[][]")
    nullSafeCodeGen(ctx, ev, x => {
      val n = ctx.freshName("n")
      val bands = ctx.freshName("bands")
      val acc = ctx.freshName("acc")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      s"""
         |int $n = $x.numElements();
         |if ($n > ${SrpBands.MaxDims}) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $j = 0; $j < $n; $j++) {
         |    if ($x.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  }
         |  if (!${ev.isNull}) {
         |    long[] $bands = new long[${SrpBands.NumBands}];
         |    for (int $p = 0; $p < ${SrpBands.NumPlanes}; $p++) {
         |      long $acc = 0L;
         |      for (int $j = 0; $j < $n; $j++) {
         |        $acc += $signs[$p][$j] * $x.getLong($j);
         |      }
         |      if ($acc > 0) $bands[$p >> 3] |= (1L << ($p & 7));
         |    }
         |    ${ev.value} =
         |      new org.apache.spark.sql.catalyst.util.GenericArrayData($bands);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBands {
  val NumPlanes = 64
  val NumBands = 8
  /** Sign matrix precomputed for up to 1024 dims (64 KiB of longs). */
  val MaxDims = 1024

  /** signs(p)(j0) = +1 iff the first hex digit of md5("srp|p|j") is >= 8,
    * where j = j0+1 (1-based, matching the SQL oracle's
    * generate_subscripts). The first hex digit is the high nibble of the
    * digest's first byte. */
  lazy val signs: Array[Array[Long]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(NumPlanes, MaxDims) { (p, j0) =>
      md.reset()
      val d = md.digest(s"srp|$p|${j0 + 1}".getBytes("UTF-8"))
      if ((d(0) & 0x80) != 0) 1L else -1L
    }
  }
}

/** Exact left-to-right long dot product of two `array<long>` columns —
  * see [[SrpBands]] scaladoc for role and overflow contract. Null
  * semantics match [[DotProductFloat]]: length mismatch or null element
  * yields NULL. */
case class DotProductLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dotl expects two array<long> arguments, got " +
        s"${left.dataType.simpleString} and ${right.dataType.simpleString}")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_dotl"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) return null
    val n = x.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getLong(i) * y.getLong(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) {
         |      ${ev.isNull} = true;
         |      break;
         |    }
         |    $acc += $a.getLong($i) * $b.getLong($i);
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
