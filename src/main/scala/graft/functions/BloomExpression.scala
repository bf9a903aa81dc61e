package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftColumnShim
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Codegen'd Bloom-filter membership probe — the fact-side half of the
  * runtime semi-join filter (build half: `SketchOps.bloomBits`).
  *
  * Why a native expression and not a UDF or typed filter: the probe's
  * whole point is to kill fact rows INSIDE the scan stage, so it must sit
  * in WholeStageCodegen next to the pushed scan predicates — a typed
  * lambda would break the codegen span and force row (de)serialization
  * at 10^12-row scale (the design guidance's exact case for `doGenCode`).
  *
  * Why the bit array is a constructor field, NOT a child literal: it is
  * a runtime-built 512 KiB word array; as a `Literal` child it would be
  * copied into every plan string (`explain` dumps array literals) and
  * re-wrapped per evaluation, while `addReferenceObj` pins ONE JVM
  * reference into the generated class. This also means the expression is
  * built via [[GraftFunctions.bloomMightContain]] (ExpressionUtils) and
  * deliberately not registered in the SQL function registry — there is
  * no sane SQL literal syntax for half a megabyte of filter state.
  *
  * Null semantics: null input → null (filters drop it), matching every
  * other probe in the repo. */
case class BloomMightContain(child: Expression, words: Array[Long], k: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_bloom_might_contain requires a string argument, got $t")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(v: Any): Any =
    graft.ops.SketchOps.bloomProbe(words, v.toString, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomWords", words, "long[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.ops.SketchOps.bloomProbe($ref, $v.toString(), $k);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomExpression {
  /** Column-level probe entry point: true iff every one of `value`'s k
    * bloom bits is set in `words` (no false negatives; false positives
    * at the standard (1-e^(-kn/m))^k rate, reproduced exactly by the
    * SQL oracle). */
  def bloomMightContain(value: Column, words: Array[Long], k: Int): Column =
    GraftColumnShim.column(
      BloomMightContain(GraftColumnShim.expression(value), words, k))
}
