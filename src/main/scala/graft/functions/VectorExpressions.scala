package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen dot product over two float/double array columns.
  *
  * The similarity operators' hot per-row kernel was a
  * `zip_with` + `aggregate` higher-order chain — correct, but HOF lambdas
  * evaluate INTERPRETED (one function-object dispatch per element), which
  * at a billion 64-dim vectors is ~10¹¹ boxed lambda calls inside the
  * innermost loop. This expression is a tight primitive `while` loop with
  * a static JVM entry point, so the surrounding projection stays inside
  * whole-stage codegen.
  *
  * Numeric contract: identical to the declarative chain and to DuckDB's
  * `list_dot_product` — sequential ascending-index fold, products and
  * accumulation in double — so every existing sim_ppm oracle stays
  * bit-reproducible (the q_cosine_topk / q_ann_* rows prove it).
  * Null contract (matches the zip_with chain): null array, mismatched
  * lengths, or a null element → null.
  */
object VectorOps {
  def dotFF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def dotDD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def dotFD(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getFloat(i).toDouble * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(s)
  }

  def dotDF(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      s += a.getDouble(i) * b.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(s)
  }
}

/** Σ aᵢ·bᵢ in double precision; see [[VectorOps]] for the contract. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {

  private def elem(dt: DataType): Option[DataType] = dt match {
    case ArrayType(et @ (FloatType | DoubleType), _) => Some(et)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elem(left.dataType), elem(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<FLOAT|DOUBLE> args, got " +
          s"(${left.dataType.sql}, ${right.dataType.sql})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val op: String = {
    def s(dt: DataType) = if (elem(dt).contains(FloatType)) "F" else "D"
    "dot" + s(left.dataType) + s(right.dataType)
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    op match {
      case "dotFF" => VectorOps.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotDD" => VectorOps.dotDD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case "dotFD" => VectorOps.dotFD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      case _ => VectorOps.dotDF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val tmp = ctx.freshName("dotRes")
      s"""
         |java.lang.Double $tmp = graft.functions.VectorOps.$op($a, $b);
         |if ($tmp == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $tmp.doubleValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
