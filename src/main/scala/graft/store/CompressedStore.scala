package graft.store

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.xerial.snappy.Snappy

/** Compressed column-vector store: per-entity time-ordered value vectors
  * rendered to CSV text and gzip/snappy-compressed into a binary column —
  * the reference's PostgreSQLCompressedSnappy / MobilityDB-batch-gzip
  * write path (/root/reference/stores/postgresql_compressed_snappy.py:68-117
  * pivot :71-91, compress :92-113;
  * /root/reference/stores/mobility_db_batch_gzip.py:139-157).
  *
  * The codecs are Scala UDFs over BinaryType (java.util.zip +
  * org.xerial.snappy, both on Spark's classpath). They run once per
  * *entity vector*, not per observation — after the pivot's groupBy the
  * row count is |entities|, so the non-codegen UDF cost is amortized over
  * each vector's full history.
  */
object CompressedStore {

  val gzipCompress = udf { (s: String) =>
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(s.getBytes(UTF_8)); gz.close()
    bos.toByteArray
  }

  val gzipDecompress = udf { (b: Array[Byte]) =>
    val in = new GZIPInputStream(new ByteArrayInputStream(b))
    try new String(in.readAllBytes(), UTF_8) finally in.close()
  }

  val snappyCompress = udf { (s: String) => Snappy.compress(s.getBytes(UTF_8)) }

  val snappyDecompress = udf { (b: Array[Byte]) => new String(Snappy.uncompress(b), UTF_8) }

  /** Time-ordered CSV rendering of one value column per entity — the
    * pivot half (postgresql_compressed_snappy.py:71-91). `valueCol` must
    * render identically across engines (longs/strings, not raw doubles). */
  def vectorCsv(tsCol: Column, valueCol: Column): Column =
    array_join(
      transform(
        sort_array(collect_list(struct(tsCol.as("t"), valueCol.cast("string").as("v")))),
        x => x.getField("v")),
      ",")

  /** Per-entity compressed column vectors: one row per key with
    * gzip(csv(values)) per requested column. */
  def pivotCompressed(
      flat: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCols: Seq[String],
      codec: String = "gzip"): DataFrame = {
    val compress: Column => Column =
      if (codec == "snappy") (c: Column) => snappyCompress(c) else (c: Column) => gzipCompress(c)
    val aggs = valueCols.map(v => compress(vectorCsv(col(tsCol), col(v))).as(s"${v}_blob"))
    flat.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }
}
