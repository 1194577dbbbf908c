package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}

/** Hilbert curve over two 16-bit grid coordinates — the second
  * space-filling clustering key next to [[ZOrder]], and the one real
  * lakehouse optimizers prefer for multi-dimensional layout: unlike the
  * Z-curve, the Hilbert curve has NO long jumps (consecutive keys are
  * always grid neighbors), so the rows of any small spatial region land
  * in fewer distinct key ranges → fewer files touched per bbox at equal
  * file size.
  *
  * The price is that the key is NOT monotonic per coordinate, so a bbox
  * cannot be pruned with one [h(lo), h(hi)] range the way
  * [[graft.store.ZOrderStore.bboxScan]] prunes. What IS true — and what
  * [[graft.store.HilbertStore]] exploits — is that every aligned
  * quadrant at depth L maps to one CONTIGUOUS key block of length
  * 4^(order−L), so partition dirs cut on high key bits are exact
  * quadrants and the covering set of a bbox is computable driver-side
  * with [[HilbertOps.d2x]]/[[HilbertOps.d2y]].
  *
  * The per-level rotate/reflect state makes a builtin-Column unroll
  * double its expression tree per level (2^16 nodes — unplannable), so
  * encode/decode are native codegen Expressions: one static JVM loop
  * call, inside whole-stage codegen ([[PairingOps]] precedent). The
  * identical arithmetic is emitted as a 16-level CTE chain for the SQL
  * oracle by [[HilbertOps.xy2dSqlCtes]].
  *
  * Reference analogue: the reference's pairing stores
  * (/root/reference/stores/apache_parquet_cantor.py:18-55) give unique
  * but locality-free keys; Z-order/Hilbert are the locality-preserving
  * upgrades of that same key idea.
  */
object HilbertOps {

  /** Grid order: 16-bit coordinates, 32-bit keys. */
  val Order = 16
  val Side: Long = 1L << Order // 65536

  /** (x, y) → Hilbert key d ∈ [0, 4^order): top-down quadrant walk with
    * the standard rotate/reflect (public-domain conversion, e.g.
    * Wikipedia "Hilbert curve"). Coordinates are masked to 16 bits. */
  def xy2d(x0: Long, y0: Long): Long = {
    var x = x0 & (Side - 1)
    var y = y0 & (Side - 1)
    var d = 0L
    var s = Side >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate/reflect the quadrant so the sub-curve is in standard pose
      if (ry == 0) {
        if (rx == 1) { x = Side - 1 - x; y = Side - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  /** Exact inverse of [[xy2d]]: bottom-up replay of the quadrant walk. */
  def d2xy(d0: Long): (Long, Long) = {
    var t = d0 & (Side * Side - 1)
    var x = 0L
    var y = 0L
    var s = 1L
    while (s < Side) {
      val rx = 1L & (t / 2)
      val ry = 1L & (t ^ rx)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val tmp = x; x = y; y = tmp
      }
      x += s * rx
      y += s * ry
      t /= 4
      s <<= 1
    }
    (x, y)
  }

  def d2x(d: Long): Long = d2xy(d)._1
  def d2y(d: Long): Long = d2xy(d)._2

  /** static entry point for generated code */
  def d2xyRow(d: Long): InternalRow = {
    val (x, y) = d2xy(d)
    new GenericInternalRow(Array[Any](x, y))
  }

  /** The encode walk as a SQL CTE chain (one level per bit, top-down),
    * for engines with no Hilbert builtin: `baseCte` must expose columns
    * (`keyCols`..., x, y); the returned text appends `order` CTEs named
    * `hl1..hl16` (prefix `hl`) and the caller selects from the last one,
    * where column d is the key. Single source of truth with [[xy2d]]:
    * the per-level algebra below is the loop body verbatim. */
  def xy2dSqlCtes(baseCte: String, keyCols: Seq[String]): String = {
    val ks = keyCols.mkString(", ")
    val n1 = Side - 1
    val levels = (1 to Order).map { lvl =>
      val s = Side >> lvl // s for this level: 2^15 down to 1
      val prev = if (lvl == 1) baseCte else s"hl${lvl - 1}"
      // level 1 seeds the accumulator itself so baseCte only needs
      // (keyCols..., x, y) — no d = 0 column, matching the scaladoc
      val dPrev = if (lvl == 1) "CAST(0 AS BIGINT)" else "d"
      // quad = (3*rx) xor ry ∈ {0,1,3,2} spelled as a CASE (no xor needed)
      s"""hl$lvl AS (SELECT $ks,
         |  $dPrev + CAST(${s * s} AS BIGINT) * (CASE WHEN (x & $s) > 0 THEN (CASE WHEN (y & $s) > 0 THEN 2 ELSE 3 END)
         |                       ELSE (CASE WHEN (y & $s) > 0 THEN 1 ELSE 0 END) END) AS d,
         |  CASE WHEN (y & $s) > 0 THEN x
         |       WHEN (x & $s) > 0 THEN $n1 - y ELSE y END AS x,
         |  CASE WHEN (y & $s) > 0 THEN y
         |       WHEN (x & $s) > 0 THEN $n1 - x ELSE x END AS y
         |  FROM $prev)""".stripMargin
    }
    levels.mkString(",\n")
  }

  /** Name of the last CTE emitted by [[xy2dSqlCtes]]. */
  val LastCte: String = s"hl$Order"

  // Column API
  def hilbertKey(x: Column, y: Column): Column =
    graftbridge.columnOf(HilbertKey(
      graftbridge.expressionOf(x), graftbridge.expressionOf(y)))

  def hilbertXY(d: Column): Column =
    graftbridge.columnOf(HilbertXY(graftbridge.expressionOf(d)))
}

/** (xLong, yLong) → BIGINT Hilbert key (16-bit grid, 32-bit key). */
case class HilbertKey(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == LongType && right.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BIGINT, BIGINT), got (${left.dataType.sql}, ${right.dataType.sql})")
  override def dataType: DataType = LongType
  override def prettyName: String = "hilbert_key"
  override protected def nullSafeEval(x: Any, y: Any): Any =
    HilbertOps.xy2d(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (x, y) => s"graft.functions.HilbertOps.xy2d($x, $y)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** BIGINT Hilbert key → struct(x: Long, y: Long), exact inverse. */
case class HilbertXY(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects BIGINT, got ${child.dataType.sql}")
  override def dataType: DataType =
    StructType(Seq(StructField("x", LongType, nullable = false),
      StructField("y", LongType, nullable = false)))
  override def prettyName: String = "hilbert_xy"
  override protected def nullSafeEval(d: Any): Any =
    HilbertOps.d2xyRow(d.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, d => s"graft.functions.HilbertOps.d2xyRow($d)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
