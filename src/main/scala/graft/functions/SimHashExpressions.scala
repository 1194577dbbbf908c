package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local SimHash kernels — the same explode-free rewrite that paid
  * off for winnowing (WinnowExpr): a document's fingerprint is a pure
  * function of its own tokens, so computing it per row in one pass beats
  * the distribute-then-reaggregate plan (explode → 32/64 vote-sum
  * aggregate columns → bit-pack) that exploded ~500k token rows and, in
  * the xxhash64 family, re-hashed the full token string once PER BIT.
  *
  * Both kernels produce BIT-IDENTICAL fingerprints to the declarative
  * frames (`Dedup.simhash32Frame`/`simhash64Frame`, kept as the
  * differential references): tokens are split on single spaces exactly
  * like `split(text, " ")` (empty tokens kept, `""` yields one empty
  * token), votes and packing follow the same MSB-first order, and the
  * 64-bit family reproduces Spark's own `xxhash64(token, j)` seed chain
  * (hash(token, seed=42), then hashLong(j, ·)) via the same XXH64
  * primitives — asserted by differential tests in DedupSpec and by the
  * DuckDB value oracle of the md5 family.
  */
object SimHash {

  /** static entry point for generated code: 32-bit md5-nibble simhash
    * (bit j votes +1 iff md5 hex nibble j ≥ 8; MSB = nibble 1) — the
    * externally-reproducible oracle family. One MD5 per token, one pass
    * over the text bytes. */
  // MessageDigest.getInstance does a JCA provider lookup — hoisted out
  // of the per-ROW path into a thread-local (reset() before each token
  // keeps digests independent; MessageDigest is not thread-safe, hence
  // per-thread instances rather than one shared one)
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash32Md5(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](32)
    val md = md5Local.get()
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var j = 0
        while (j < 32) {
          val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xF else d(j >> 1) & 0xF
          votes(j) += (if (nib >= 8) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { fp = (fp << 1) | (if (votes(j) > 0) 1L else 0L); j += 1 }
    fp
  }

  /** static entry point for generated code: 64-bit seeded-xxhash64
    * simhash (bit j votes by the sign of `xxhash64(token, j)`) — the
    * production family. The token's string hash is computed ONCE
    * (seed 42, as Spark's XxHash64 does for the first argument) and each
    * bit derives via one cheap hashLong — where the declarative plan's
    * 64 separate `xxhash64(_t, j)` expressions each re-hashed the whole
    * token string. */
  def simhash64Xx(text: UTF8String): Long = {
    val bytes = text.getBytes
    val votes = new Array[Int](64)
    val n = bytes.length
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        val tok = UTF8String.fromBytes(bytes, start, i - start)
        val base = XXH64.hashUTF8String(tok, 42L)
        var j = 0
        while (j < 64) {
          // the declarative twin writes xxhash64(_t, lit(j)) with an INT
          // literal, which Spark folds in as hashInt — mirror exactly
          votes(j) += (if (XXH64.hashInt(j + 1, base) > 0L) 1 else -1)
          j += 1
        }
        start = i + 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { fp = (fp << 1) | (if (votes(j) > 0) 1L else 0L); j += 1 }
    fp
  }

  def simhash32Md5Col(text: Column): Column = columnOf(SimHash32Md5Expr(expressionOf(text)))
  def simhash64Col(text: Column): Column = columnOf(SimHash64Expr(expressionOf(text)))
  def blobSimhash32Md5Col(content: Column, n: Int): Column =
    columnOf(BlobSimHash32Md5Expr(expressionOf(content), n))
  def blobSimhash64Col(content: Column, n: Int): Column =
    columnOf(BlobSimHash64Expr(expressionOf(content), n))

  private val HEX = "0123456789ABCDEF".getBytes("US-ASCII")

  /** Byte-n-gram 32-bit md5-nibble simhash of a BINARY blob, row-local:
    * token i is the UPPERCASE-hex rendering of bytes [i, i+n) — exactly
    * `substr(hex(content), 2i+1, 2n)` — so the fingerprint is
    * bit-identical to the explode-and-vote plan over those hex-string
    * shingles (the q_dedup_blob oracle family), at one md5 per WINDOW
    * with zero explode, zero shuffle and zero per-nibble string
    * allocation. Fewer than n bytes → caller must filter (the explode
    * plan drops such rows). */
  def blobSimhash32Md5(content: Array[Byte], n: Int): Long = {
    val m = content.length
    val votes = new Array[Int](32)
    val md = md5Local.get()
    val hexTok = new Array[Byte](2 * n)
    var i = 0
    val last = m - n
    while (i <= last) {
      var k = 0
      while (k < n) {
        val b = content(i + k) & 0xFF
        hexTok(2 * k) = HEX(b >> 4)
        hexTok(2 * k + 1) = HEX(b & 0xF)
        k += 1
      }
      md.reset()
      md.update(hexTok)
      val d = md.digest()
      var j = 0
      while (j < 32) {
        val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xF else d(j >> 1) & 0xF
        votes(j) += (if (nib >= 8) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 32) { fp = (fp << 1) | (if (votes(j) > 0) 1L else 0L); j += 1 }
    fp
  }

  /** Byte-n-gram 64-bit xxhash64 simhash of a BINARY blob, row-local:
    * same hex-window tokens, same seed chain as the declarative
    * `xxhash64(tok, lit(j))` votes (hash(tok, 42) then hashInt(j)) —
    * and the token hash computes ONCE per window where the explode plan
    * re-hashed the token string once per bit. */
  def blobSimhash64Xx(content: Array[Byte], n: Int): Long = {
    val m = content.length
    val votes = new Array[Int](64)
    val hexTok = new Array[Byte](2 * n)
    var i = 0
    val last = m - n
    while (i <= last) {
      var k = 0
      while (k < n) {
        val b = content(i + k) & 0xFF
        hexTok(2 * k) = HEX(b >> 4)
        hexTok(2 * k + 1) = HEX(b & 0xF)
        k += 1
      }
      val base = XXH64.hashUTF8String(UTF8String.fromBytes(hexTok), 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (if (XXH64.hashInt(j + 1, base) > 0L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { fp = (fp << 1) | (if (votes(j) > 0) 1L else 0L); j += 1 }
    fp
  }
}

/** (string) → bigint: 32-bit md5-nibble simhash fingerprint. NULL in →
  * NULL out. */
case class SimHash32Md5Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash32_md5 expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32_md5"

  override protected def nullSafeEval(t: Any): Any =
    SimHash.simhash32Md5(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash32Md5($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (string) → bigint: 64-bit seeded-xxhash64 simhash fingerprint. NULL
  * in → NULL out. */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects STRING, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(t: Any): Any =
    SimHash.simhash64Xx(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.simhash64Xx($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (binary) → bigint: byte-n-gram 32-bit md5-nibble simhash over
  * hex-window tokens. NULL in → NULL out. */
case class BlobSimHash32Md5Expr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"blob_simhash32_md5 expects BINARY, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "blob_simhash32_md5"

  override protected def nullSafeEval(t: Any): Any =
    SimHash.blobSimhash32Md5(t.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.blobSimhash32Md5($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** (binary) → bigint: byte-n-gram 64-bit xxhash64 simhash over
  * hex-window tokens. NULL in → NULL out. */
case class BlobSimHash64Expr(child: Expression, n: Int) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"blob_simhash64 expects BINARY, got ${t.sql}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "blob_simhash64"

  override protected def nullSafeEval(t: Any): Any =
    SimHash.blobSimhash64Xx(t.asInstanceOf[Array[Byte]], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash.blobSimhash64Xx($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
