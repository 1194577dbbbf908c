package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native set-similarity kernel: exact Jaccard (set semantics) of two
  * string arrays in parts-per-million, one hash-set pass per side.
  *
  * The declarative equivalent
  * (`size(array_intersect) * 1e6 / size(array_distinct(concat))`,
  * Dedup.jaccardPpm) builds three intermediate arrays per row in
  * interpreted collection expressions; this computes the same number in
  * a single static call the surrounding whole-stage codegen invokes
  * directly. Differentially tested against the declarative version and
  * against the DuckDB oracle (same ppm integer).
  */
object SetOps {

  /** static entry point for generated code. Both-empty → 0 (callers
    * shingle non-empty docs; matches the declarative NULL≈no-pair
    * treatment after the ≥threshold filter). */
  def jaccardPpm(a: ArrayData, b: ArrayData): Long = {
    val setA = new java.util.HashSet[UTF8String](Math.max(8, a.numElements() * 2))
    var i = 0
    while (i < a.numElements()) { setA.add(a.getUTF8String(i)); i += 1 }
    val seenB = new java.util.HashSet[UTF8String](Math.max(8, b.numElements() * 2))
    var inter = 0L
    i = 0
    while (i < b.numElements()) {
      val e = b.getUTF8String(i)
      if (seenB.add(e) && setA.contains(e)) inter += 1
      i += 1
    }
    val union = setA.size().toLong + seenB.size().toLong - inter
    if (union == 0L) 0L else inter * 1000000L / union
  }

  def jaccardPpmCol(a: Column, b: Column): Column =
    columnOf(JaccardPpmExpr(expressionOf(a), expressionOf(b)))
}

/** (array<string>, array<string>) → bigint ppm. */
case class JaccardPpmExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"jaccard_ppm expects (ARRAY<STRING>, ARRAY<STRING>), got (${l.sql}, ${r.sql})")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "jaccard_ppm"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    SetOps.jaccardPpm(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SetOps.jaccardPpm($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
