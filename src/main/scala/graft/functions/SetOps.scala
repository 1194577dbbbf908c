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

  // MessageDigest.getInstance does a JCA provider lookup per call —
  // hoisted out of the per-ROW winnowing path into a thread-local
  // (md.reset() before each gram; MessageDigest is not thread-safe)
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

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
    val md = md5Local.get()
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

  // murmur3's 64-bit avalanche finalizer (public-domain constants): the
  // raw polynomial prefix hash changes slowly between adjacent k-grams,
  // which would bias the window-min selection; the finalizer spreads each
  // positional hash over the full 64-bit space first.
  private def fmix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
    x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
    x ^= x >>> 33
    x
  }

  /** static entry point for generated code: winnowing with a polynomial
    * ROLLING hash — the PRODUCTION family (same dual-family pattern as
    * minhash xxhash64-vs-md5 and simhash 64-vs-32: the md5 kernel above
    * stays as the externally-reproducible oracle family). One
    * multiply-add per char position instead of one full MD5 per k-gram —
    * the ~5M MD5s/doc-corpus that dominated the md5 kernel's remaining
    * CPU at sf0.1 become O(chars) rolling updates.
    *
    * Definition: per-char values are the char's UTF-8 bytes packed
    * big-endian (injective per char); positional hash i rolls with base
    * B = the FNV-1a 64 prime (odd ⇒ multiplication invertible mod 2^64)
    * over chars i..i+k−1 and is finalized with [[fmix64]]; each window of
    * w consecutive finalized hashes contributes its UNSIGNED min; mins
    * dedup in first-occurrence order. Same selection guarantee as the md5
    * family (any shared substring of length ≥ k + w − 1 shares ≥ 1
    * fingerprint — the order the mins are taken in is total either way).
    * Output array<long>; no full window → empty array. */
  def winnowHashesRoll(text: UTF8String, k: Int, w: Int): ArrayData = {
    val numChars = text.numChars()
    if (numChars < k + w - 1) return new GenericArrayData(Array.empty[Any])
    val bytes = text.getBytes
    val vals = new Array[Long](numChars)
    var i = 0
    var b = 0
    while (i < numChars) {
      val len = UTF8String.numBytesForFirstByte(bytes(b))
      var v = 0L
      var j = 0
      while (j < len) { v = (v << 8) | (bytes(b + j) & 0xFFL); j += 1 }
      vals(i) = v
      b += len
      i += 1
    }
    val nGrams = numChars - k + 1
    val B = 0x100000001B3L
    var bk = 1L // B^(k-1): the outgoing char's removal factor
    i = 1
    while (i < k) { bk *= B; i += 1 }
    val hashes = new Array[Long](nGrams)
    var h = 0L
    i = 0
    while (i < k) { h = h * B + vals(i); i += 1 }
    hashes(0) = fmix64(h)
    i = 1
    while (i < nGrams) {
      h = (h - vals(i - 1) * bk) * B + vals(i + k - 1)
      hashes(i) = fmix64(h)
      i += 1
    }
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    var start = 0
    while (start <= nGrams - w) {
      var m = hashes(start)
      var j = start + 1
      while (j < start + w) {
        if (java.lang.Long.compareUnsigned(hashes(j), m) < 0) m = hashes(j)
        j += 1
      }
      out.add(m)
      start += 1
    }
    val arr = new Array[Any](out.size)
    val it = out.iterator
    var x = 0
    while (it.hasNext) { arr(x) = it.next().longValue(); x += 1 }
    new GenericArrayData(arr)
  }

  def winnowHashesRollCol(text: Column, k: Int, w: Int): Column =
    columnOf(WinnowRollExpr(expressionOf(text), k, w))
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

/** (string) → array<bigint>: the rolling-hash winnowing fingerprint set
  * (production family; see [[SetOps.winnowHashesRoll]]). NULL text →
  * NULL; no full window → empty array. */
case class WinnowRollExpr(child: Expression, k: Int, w: Int) extends UnaryExpression {
  require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_roll expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_roll"

  override protected def nullSafeEval(t: Any): Any =
    SetOps.winnowHashesRoll(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SetOps.winnowHashesRoll($c, $k, $w)")

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
