package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge for graft's native Catalyst expressions.
  * `ExpressionUtils` is private[sql], so this one-file shim lives in the
  * org.apache.spark.sql package — the standard pattern for Spark
  * extension libraries that define custom expressions. */
package object graftbridge {
  def columnOf(e: Expression): Column = ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register graft's native expressions as SQL functions on a session,
    * so `spark.sql("SELECT szudzik_pair(x, y) ...")` works alongside the
    * Column API (SURVEY.md §3.2: same query from SQL plans identically
    * after parsing). Idempotent. */
  def registerFunctions(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("szudzik_pair",
      es => graft.functions.SzudzikPair(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("szudzik_unpair",
      es => graft.functions.SzudzikUnpair(es.head), "built-in")
    reg.createOrReplaceTempFunction("cantor_pair",
      es => graft.functions.CantorPair(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cantor_unpair",
      es => graft.functions.CantorUnpair(es.head), "built-in")
    reg.createOrReplaceTempFunction("jaccard_ppm",
      es => graft.functions.JaccardPpmExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_dot",
      es => graft.functions.DotProductExpr(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("char_shingles",
      es => {
        // n is baked into the expression at construction, so it must be a
        // foldable literal; check arity + foldability up front so a bad
        // call gets this message, not a raw unbound-attribute or
        // index-out-of-bounds error at analysis time (ADVICE r3)
        if (es.length != 2 || !es(1).foldable)
          throw new IllegalArgumentException(
            s"char_shingles(text, n): expects 2 args with n an integer literal, got (${es.mkString(", ")})")
        graft.functions.CharShinglesExpr(es(0), es(1).eval() match {
          case i: Int => i
          case l: Long => l.toInt
          case other => throw new IllegalArgumentException(
            s"char_shingles(text, n): n must be an integer literal, got $other")
        })
      }, "built-in")
  }
}
