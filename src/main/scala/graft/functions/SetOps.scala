package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
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

  /** static entry point for generated code: distinct character n-gram
    * shingles in ONE pass. Char byte-offsets are computed once (O(bytes)),
    * each shingle is a byte-range slice, and a LinkedHashSet dedups while
    * preserving first-occurrence order — the same output as the
    * declarative `array_distinct(transform(sequence, substr))` but
    * without the interpreted HOF lambda (re-evaluated per element) or the
    * O(grams²) interpreted array_distinct. */
  def charShingles(text: UTF8String, n: Int): ArrayData = {
    val numChars = text.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    // offs(i) = byte offset where char i starts; offs(numChars) = end
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (i < numChars) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(numChars) = bytes.length
    val nGrams = numChars - n + 1
    val out = new java.util.LinkedHashSet[UTF8String](Math.max(8, nGrams * 2))
    i = 0
    while (i < nGrams) {
      out.add(UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i)))
      i += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def charShinglesCol(text: Column, n: Int): Column =
    columnOf(CharShinglesExpr(expressionOf(text), n))

  /** static entry point for generated code: ALL char n-gram shingles in
    * document order, duplicates kept — the positional input winnowing
    * needs (element i = the shingle starting at char i). Same byte-offset
    * slicing as [[charShingles]], no set. */
  def charShinglesAll(text: UTF8String, n: Int): ArrayData = {
    val numChars = text.numChars()
    if (numChars < n) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (i < numChars) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(numChars) = bytes.length
    val nGrams = numChars - n + 1
    val out = new Array[Any](nGrams)
    i = 0
    while (i < nGrams) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  def charShinglesAllCol(text: Column, n: Int): Column =
    columnOf(CharShinglesAllExpr(expressionOf(text), n))

  /** static entry point for generated code: winnowing fingerprint
    * selection in ONE pass per document — md5 each positional k-gram,
    * slide a window of w hashes, keep each window's min, dedup
    * (first-occurrence order). Equivalent to explode → window-min →
    * distinct, but row-local: no 5M-row explode, no per-doc sort, no
    * shuffle (measured 9.4 s → sub-second at sf0.1). Text shorter than
    * k + w − 1 (no full window) → empty array. */
  def winnowHashes(text: UTF8String, k: Int, w: Int): ArrayData = {
    val numChars = text.numChars()
    if (numChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val offs = new Array[Int](numChars + 1)
    var i = 0
    var b = 0
    while (i < numChars) {
      offs(i) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      i += 1
    }
    offs(numChars) = bytes.length
    val nGrams = numChars - k + 1
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    val hashes = new Array[String](nGrams)
    i = 0
    while (i < nGrams) {
      md.reset()
      md.update(bytes, offs(i), offs(i + k) - offs(i))
      val d = md.digest()
      val cs = new Array[Char](32)
      var j = 0
      while (j < 16) {
        cs(2 * j) = hex((d(j) >> 4) & 0xF)
        cs(2 * j + 1) = hex(d(j) & 0xF)
        j += 1
      }
      hashes(i) = new String(cs)
      i += 1
    }
    val out = new java.util.LinkedHashSet[UTF8String]()
    var start = 0
    while (start <= nGrams - w) {
      var m = hashes(start)
      var j = start + 1
      while (j < start + w) {
        if (hashes(j).compareTo(m) < 0) m = hashes(j)
        j += 1
      }
      out.add(UTF8String.fromString(m))
      start += 1
    }
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  def winnowHashesCol(text: Column, k: Int, w: Int): Column =
    columnOf(WinnowExpr(expressionOf(text), k, w))
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

/** (string) → array<string>: distinct char n-gram shingles, n baked in at
  * plan time (it is a structural parameter, not data). NULL text → NULL,
  * text shorter than n → empty array — matching the DuckDB oracle's
  * `list_distinct([substr(text, i, n) for i in range(...)])`. */
case class CharShinglesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_shingles expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles"

  override protected def nullSafeEval(t: Any): Any =
    SetOps.charShingles(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SetOps.charShingles($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** (string) → array<string>: the winnowing fingerprint set (distinct
  * selected window-min md5 hex hashes, first-occurrence order). NULL
  * text → NULL; no full window → empty array. */
case class WinnowExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow"

  override protected def nullSafeEval(t: Any): Any =
    SetOps.winnowHashes(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SetOps.winnowHashes($c, $k, $w)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** (string) → array<string>: ALL positional char n-gram shingles
  * (duplicates kept, element i = shingle at char i) — the winnowing
  * input. NULL text → NULL, text shorter than n → empty array. */
case class CharShinglesAllExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"char_shingles_all expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "char_shingles_all"

  override protected def nullSafeEval(t: Any): Any =
    SetOps.charShinglesAll(t.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SetOps.charShinglesAll($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
