package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native merge-table-driven BPE encode.
  *
  * The declarative encoder ([[graft.queries.TextOps.bpeEncodeCol]]) compiles
  * the merge table into a FOLD of nested `replace` calls — one expression
  * tree level per rule. That is the right shape for the gated 50-rule
  * learned table, but it cannot carry a production-sized table: a 50k-rule
  * fold is a 50k-deep expression tree whose generated code breaches
  * Janino's 64 KB method / constant-pool limits (and optimizer tree-walk
  * costs) long before the table is exhausted. This expression is the scale
  * path: the merge table rides along as two CONSTANT array arguments
  * (foldable literals — evaluated once at plan time, shipped to generated
  * code as a reference object, never inlined into source text), and the
  * rule application is a runtime loop in [[BpeEncodeKernel]] — table size
  * changes the loop count, not the compiled code size, so a 50k-rule table
  * is the same plan as a 50-rule one.
  *
  * Semantics are IDENTICAL to the fold (pinned by BpeSpec): the word is
  * split to space-separated characters, then each rule i rewrites every
  * `pats(i)` occurrence to `reps(i)` via literal left-to-right
  * non-overlapping string replacement — the same `replace` semantics in
  * Spark, DuckDB, and `java.lang.String.replace`, which is exactly BPE's
  * greedy-left application of one rule. Space is a safe piece separator
  * because the tokenizer's words are [a-z]+ only.
  */
object BpeEncodeKernel {
  /** Apply the merge table to one word. `pats(i)`/`reps(i)` are the rule-i
    * pattern ("a b") and replacement ("ab"). */
  def encode(word: UTF8String, pats: Array[String],
             reps: Array[String]): UTF8String = {
    val w = word.toString
    val sb = new java.lang.StringBuilder(w.length * 2)
    var i = 0
    while (i < w.length) {
      if (i > 0) sb.append(' ')
      sb.append(w.charAt(i))
      i += 1
    }
    var acc = sb.toString
    var r = 0
    while (r < pats.length) {
      // literal (non-regex) left-to-right non-overlapping replacement —
      // String.replace(CharSequence, CharSequence), matching Spark's and
      // DuckDB's `replace`
      acc = acc.replace(pats(r), reps(r))
      r += 1
    }
    UTF8String.fromString(acc)
  }
}

/** `graft_bpe_encode(word, patterns, replacements)` → string: the word
  * encoded by the (foldable constant) merge table, as space-separated
  * pieces. NULL word → NULL; the rule arrays must be foldable non-null
  * array<string> literals of equal length. */
case class GraftBpeEncode(first: Expression, second: Expression,
                          third: Expression) extends TernaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (_: StringType, ArrayType(_: StringType, _),
            ArrayType(_: StringType, _))
          if second.foldable && third.foldable =>
        if (pats == null || reps == null)
          TypeCheckResult.TypeCheckFailure(
            "graft_bpe_encode rule arrays must not be NULL")
        else if (pats.length != reps.length)
          TypeCheckResult.TypeCheckFailure(
            s"graft_bpe_encode rule arrays must have equal length, got " +
              s"${pats.length} patterns vs ${reps.length} replacements")
        else if (pats.contains(null) || reps.contains(null))
          TypeCheckResult.TypeCheckFailure(
            "graft_bpe_encode rule arrays must not contain NULL elements")
        else TypeCheckResult.TypeCheckSuccess
      case (f, s, t) => TypeCheckResult.TypeCheckFailure(
        "graft_bpe_encode expects (string, foldable array<string>, " +
          s"foldable array<string>), got (${f.simpleString}, " +
          s"${s.simpleString}, ${t.simpleString})")
    }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_bpe_encode"

  /** The constant rule table, evaluated once at plan time (both children
    * are foldable). Null elements surface as a type-check failure. */
  @transient private lazy val pats: Array[String] = constArray(second)
  @transient private lazy val reps: Array[String] = constArray(third)

  private def constArray(e: Expression): Array[String] =
    e.eval() match {
      case null => null
      case a: ArrayData =>
        val out = new Array[String](a.numElements())
        var i = 0
        while (i < out.length) {
          // a null ELEMENT is kept as null here so checkInputDataTypes
          // can reject it as a TypeCheckFailure instead of this lazy val
          // throwing a raw NPE during analysis (SQL callers can write
          // array('a b', CAST(NULL AS STRING)))
          val u = a.getUTF8String(i)
          out(i) = if (u == null) null else u.toString
          i += 1
        }
        out
    }

  override protected def nullSafeEval(word: Any, p: Any, r: Any): Any =
    BpeEncodeKernel.encode(word.asInstanceOf[UTF8String], pats, reps)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // the table goes into the generated class as a reference object (a
    // field initialized from `references` at construction), so generated
    // SOURCE size is independent of table size — the whole point
    val patsRef = ctx.addReferenceObj("bpePats", pats, "java.lang.String[]")
    val repsRef = ctx.addReferenceObj("bpeReps", reps, "java.lang.String[]")
    nullSafeCodeGen(ctx, ev, (x, _, _) =>
      s"${ev.value} = graft.functions.BpeEncodeKernel.encode(" +
        s"$x, $patsRef, $repsRef);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
