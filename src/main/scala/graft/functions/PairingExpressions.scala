package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StructField, StructType}

/** Native Catalyst expressions for the pairing functions — codegen'd
  * replacements for Scala UDFs (SURVEY.md §4: "codegen Expressions for
  * elegant-pair encode/decode"). Each doGenCode emits a direct static
  * call into [[PairingOps]] — no function-object dispatch, no encoder
  * round-trip, null-safe — so the surrounding projection stays inside
  * whole-stage codegen.
  */
object PairingOps {
  // static entry points for generated code (stable JVM names)
  def szudzikPairBytes(x: Long, y: Long): Array[Byte] =
    Pairing.toLittleEndian(
      Pairing.szudzikPair(BigInteger.valueOf(x), BigInteger.valueOf(y)), Pairing.PairBytes)

  def cantorPairBytes(x: Long, y: Long): Array[Byte] =
    Pairing.toLittleEndian(
      Pairing.cantorPair(BigInteger.valueOf(x), BigInteger.valueOf(y)), Pairing.PairBytes)

  def szudzikUnpairRow(b: Array[Byte]): InternalRow = {
    val (x, y) = Pairing.szudzikUnpair(Pairing.fromLittleEndian(b))
    new GenericInternalRow(Array[Any](x.longValueExact(), y.longValueExact()))
  }

  def cantorUnpairRow(b: Array[Byte]): InternalRow = {
    val (x, y) = Pairing.cantorUnpair(Pairing.fromLittleEndian(b))
    new GenericInternalRow(Array[Any](x.longValueExact(), y.longValueExact()))
  }
}

sealed abstract class PairExpression extends BinaryExpression {
  protected def opName: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = BinaryType
  override def prettyName: String = opName.stripSuffix("Bytes")

  override protected def nullSafeEval(x: Any, y: Any): Any =
    if (opName == "szudzikPair") PairingOps.szudzikPairBytes(x.asInstanceOf[Long], y.asInstanceOf[Long])
    else PairingOps.cantorPairBytes(x.asInstanceOf[Long], y.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.PairingOps.${opName}Bytes($x, $y)")
}

/** (xLong, yLong) → binary(15) Szudzik elegant pair. */
case class SzudzikPair(left: Expression, right: Expression) extends PairExpression {
  override protected def opName: String = "szudzikPair"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** (xLong, yLong) → binary(15) Cantor pair. */
case class CantorPair(left: Expression, right: Expression) extends PairExpression {
  override protected def opName: String = "cantorPair"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

sealed abstract class UnpairExpression extends UnaryExpression {
  protected def opName: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BINARY, got ${child.dataType.sql}")
  override def dataType: DataType =
    StructType(Seq(StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false)))
  override def prettyName: String = opName.stripSuffix("Row")

  override protected def nullSafeEval(b: Any): Any =
    if (opName == "szudzikUnpair") PairingOps.szudzikUnpairRow(b.asInstanceOf[Array[Byte]])
    else PairingOps.cantorUnpairRow(b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, b => s"graft.functions.PairingOps.${opName}Row($b)")
}

/** binary(15) → struct(x: Long, y: Long), exact Szudzik inverse. */
case class SzudzikUnpair(child: Expression) extends UnpairExpression {
  override protected def opName: String = "szudzikUnpair"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** binary(15) → struct(x: Long, y: Long), exact Cantor inverse. */
case class CantorUnpair(child: Expression) extends UnpairExpression {
  override protected def opName: String = "cantorUnpair"
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
