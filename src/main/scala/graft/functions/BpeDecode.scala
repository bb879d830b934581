package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE decode — the inverse of [[GraftBpeEncode]].
  *
  * The encoder emits a word as space-separated pieces; merges only ever
  * REMOVE piece boundaries, so regardless of which merge table produced
  * the encoding (the 50-rule learned table, the 1,024-rule synthetic one,
  * a 50k-rule production table, or none at all), decoding is exactly
  * "drop the piece separators": concatenating the pieces replays the
  * original character sequence. That makes decode∘encode the identity for
  * EVERY merge table over the tokenizer's [a-z]+ vocabulary — the
  * round-trip law `text_bpe_roundtrip` gates and `BpeSpec`
  * property-checks, and the reason this expression takes no table
  * argument where the encoder needs one.
  *
  * Byte-level: the separator is the single byte 0x20, which never occurs
  * inside a UTF-8 multi-byte sequence, so the filter is a straight byte
  * copy — no decoding pass, allocation-bounded by the input length.
  */
object BpeDecodeKernel {
  def decode(enc: UTF8String): UTF8String = {
    val b = enc.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var i = 0
    while (i < b.length) {
      if (b(i) != 0x20) { out(n) = b(i); n += 1 }
      i += 1
    }
    if (n == b.length) enc
    else UTF8String.fromBytes(java.util.Arrays.copyOf(out, n))
  }
}

/** `graft_bpe_decode(enc)` → string: the space-separated piece encoding
  * concatenated back to the original word. NULL → NULL. */
case class GraftBpeDecode(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bpe_decode expects string, got ${t.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_decode"

  override protected def nullSafeEval(input: Any): Any =
    BpeDecodeKernel.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.BpeDecodeKernel.decode($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
