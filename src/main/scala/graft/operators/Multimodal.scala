package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque `binary`
  * columns with typed metadata, plus the Spark-side plumbing for
  * decode / feature-extract / frame-sample pipelines.
  *
  * Every decode path here is REAL (no stubs since round 12): JPEG and
  * PNG through the in-JDK `javax.imageio` codecs
  * ([[imageioFeatures]]), Netpbm P2 grammar parsing
  * ([[pgmFeatures]]/[[pgmDownsample2x]]), RIFF/WAVE PCM16 byte parsing
  * ([[wavFeatures]]), and YUV4MPEG2 frame walking with shot-boundary
  * detection ([[y4mFeatures]]) — the decode→features→resize pipeline
  * runs end-to-end with no fake step, and each format's corpus renders
  * from a closed form so the features are oracle-checkable in plain
  * SQL (for lossy JPEG via the DC-only block-constant construction,
  * see the imageio section).
  *
  * Scale notes: blobs never pass through a shuffle here; metadata extraction
  * and frame sampling are per-row projections, and the mapPartitions decode
  * preserves partitioning (one iterator pass, constant memory per batch).
  */
object Multimodal {

  /** Wrap a text corpus as a blob table: content = utf-8 bytes, metadata
    * columns (n_bytes, content md5, kind). In production the binary comes
    * from image/audio files; bytes-from-text keeps it deterministic here. */
  def toBlobTable(docs: DataFrame, idCol: String, textCol: String, kind: String): DataFrame =
    // repartition(id) before the row-local kernels (r15 optimization —
    // the q_ngram_jaccard idiom): a small corpus arrives as ONE scan
    // partition, so the md5 here and every downstream byte kernel
    // (hex/explode histograms, frame sampling, blob simhash) otherwise
    // runs the whole corpus on one core. The exchange ships each blob
    // exactly once; every consumer's per-doc work then spreads.
    docs.repartition(col(idCol)).select(
      col(idCol).cast("long").as("doc_id"),
      lit(kind).as("kind"),
      col(textCol).cast("binary").as("content"),
      octet_length(col(textCol).cast("binary")).cast("long").as("n_bytes"),
      md5(col(textCol).cast("binary")).as("content_md5"))

  /** Declarative frame sampling: every `step`-th byte offset becomes a
    * "frame" whose value is the byte at that offset (stand-in for a video
    * frame grab / audio window). Generator + projection, codegen'd. */
  def sampleFrames(blobs: DataFrame, step: Int): DataFrame =
    blobs
      .select(
        col("doc_id"),
        col("content"),
        // empty blob → empty offsets (sequence(0,-1) would throw), and the
        // posexplode then drops the row. frame_val decodes ONE BYTE — for
        // multi-byte text content this is byte-level, not char-level.
        posexplode(
          when(col("n_bytes") > 0,
            sequence(lit(0L), col("n_bytes") - 1, lit(step.toLong)))
            .otherwise(array().cast("array<bigint>"))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "byte_offset")
      .select(
        col("doc_id"),
        col("frame_idx"),
        col("byte_offset"),
        ascii(decode(col("content").substr(col("byte_offset").cast("int") + 1, lit(1)), "UTF-8"))
          .cast("long").as("frame_val"))

  /** WebDataset-style shard-packing manifest — the write plan a
    * multimodal trainer's archive builder consumes: blobs greedily
    * packed, in deterministic (pack-group, doc_id) order, into shards
    * holding at most `byteBudget` content bytes AND at most
    * `maxPerShard` records (the tar-shard record cap); a blob larger
    * than the budget ships ALONE in its own shard (the tar-writer
    * convention — never split, never dropped). Output rows are
    * (grp, shard_id, doc_id, n_bytes, byte_offset): the manifest a
    * writer streams into one archive per (grp, shard_id).
    *
    * Scale shape: only (doc_id, n_bytes) metadata shuffles — blob
    * CONTENT never moves; the sequential fold runs inside
    * group-sorted partitions ([[graft.operators.Chunking.greedyPack]]'s
    * mapPartitions idiom — no driver collect, no global window), and
    * the md5-nibble pack groups bound each fold's span. More nibbles
    * if a group outgrows a partition. */
  def packBlobs(blobs: DataFrame, byteBudget: Long, maxPerShard: Int): DataFrame = {
    require(byteBudget > 0, s"byteBudget must be positive: $byteBudget")
    require(maxPerShard > 0, s"maxPerShard must be positive: $maxPerShard")
    val spark = blobs.sparkSession
    import spark.implicits._
    val meta = blobs.select(
        col("doc_id").cast("long"),
        Sampling.hashNibble(col("doc_id")).cast("int").as("grp"),
        col("n_bytes").cast("long"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("grp"), col("doc_id"))
    meta.select(col("grp"), col("doc_id"), col("n_bytes")).as[(Int, Long, Long)]
      .mapPartitions { it =>
        var curGrp = -1
        var shard = 0L
        var fill = 0L
        var cnt = 0L
        it.map { case (grp, docId, n) =>
          if (grp != curGrp) { curGrp = grp; shard = 0L; fill = 0L; cnt = 0L }
          else if (fill + n > byteBudget || cnt == maxPerShard) {
            shard += 1L; fill = 0L; cnt = 0L
          }
          val off = fill
          fill += n
          cnt += 1L
          (grp, shard, docId, n, off)
        }
      }
      .toDF("grp", "shard_id", "doc_id", "n_bytes", "byte_offset")
  }

  /** Byte-level QC stats per blob — the codec-free corruption/quality
    * screen a multimodal ingest runs BEFORE any decode: a blob whose
    * byte distribution collapsed (one byte ≫ everything — zero padding,
    * truncated transfer) or whose magic prefix contradicts its declared
    * kind is quarantined without touching a media library. Reports the
    * distinct-byte count, the modal byte and its frequency (ppm — the
    * integer compressibility proxy; entropy would need log()), and a
    * magic-number format sniff over the 8-hex-char prefix.
    *
    * Byte extraction goes through ONE materialized hex(content) column
    * (2 chars per byte, engine-portable uppercase; a captured hex()
    * inside the HOF would re-run per element) → offset explode →
    * per-(blob, byte) count. Scale shape: the (blob, byte) frame
    * map-side-combines to ≤ 256 rows per blob; blob CONTENT never
    * shuffles — only (doc_id, byte, count) tuples move. Modal-byte ties
    * break to the smallest byte via min-of-struct.
    *
    * Output: (doc_id, n_bytes, n_distinct, top_byte, top_ppm, format);
    * empty blobs report (0, 0, NULL, 0, 'empty'). */
  def blobByteStats(blobs: DataFrame): DataFrame =
    // row-local histogram kernel (r15): the declarative plan exploded
    // every byte to a row (1.47M rows at sf0.1, each decoded by a
    // hex-substr+conv string pass) through two groupBys and a join; the
    // kernel computes the same (n_distinct, top_byte, top_count) — same
    // smallest-byte tie rule, NULL struct for empty blobs standing in
    // for the explode plan's absent rows — in one int[256] pass per
    // blob. Format detection needs only the first 4 bytes, not a
    // hex rendering of the whole blob.
    blobs
      .select(col("doc_id"), col("n_bytes"),
        graft.functions.BlobStats.byteStatsCol(col("content")).as("_st"),
        hex(substring(col("content"), 1, 4)).as("_hd"))
      .select(col("doc_id"), col("n_bytes"),
        coalesce(col("_st.n_distinct"), lit(0L)).as("n_distinct"),
        col("_st.top_byte").as("top_byte"),
        when(col("n_bytes") > 0, expr("_st.top_c * 1000000 DIV n_bytes"))
          .otherwise(0L).as("top_ppm"),
        when(col("n_bytes") === 0, "empty")
          .when(col("_hd").startsWith("89504E47"), "png")
          .when(col("_hd").startsWith("FFD8FF"), "jpeg")
          .when(col("_hd").startsWith("1F8B"), "gzip")
          .when(col("_hd").startsWith("25504446"), "pdf")
          .when(col("_hd").startsWith("52494646"), "riff")
          .otherwise("unknown").as("format"))

  /** 32-bit md5-nibble SimHash over BYTE n-gram shingles of the blob —
    * content-level near-dup fingerprints that need NO codec: a re-encoded
    * header tweak or truncated tail changes few shingles, so
    * near-identical blobs land within a small hamming radius. Shingles
    * are taken over hex(content) at byte-aligned offsets (substr of a
    * bound hex column: engine-portable — Spark and DuckDB both hex to
    * uppercase — and the md5-nibble vote family is the same one
    * q_dedup_simhash value-checks). The hex column is materialized ONCE
    * per row before the shingle HOF (a captured hex() would re-run per
    * element — see Dedup.tokenShingles); blobs with fewer than `n` bytes
    * have no shingles and drop from the fingerprint frame (they cannot
    * pair). Reuses [[Dedup.simhash32Frame]]'s explode → md5 → vote → pack
    * shape: one shuffle of (id, 32 counters), blob bytes never shuffle. */
  def blobSimhash32(blobs: DataFrame, idCol: String, n: Int = 4): DataFrame =
    // row-local kernel (r15): the explode-and-vote plan shuffled ~1.5M
    // hex-shingle strings at sf0.1 and evaluated 32 substring+ascii vote
    // expressions PER SHINGLE (the 14 s half of the 23 s simhash_fp
    // staging pair); the kernel computes the identical fingerprint —
    // same hex-window tokens, same md5-nibble votes, differential-tested
    // in DedupSpec — in one pass per blob with zero explode. Blobs
    // shorter than n have no shingles and drop, exactly like the explode
    // plan's empty-array rows.
    blobs.filter(col("n_bytes") >= n)
      .select(col(idCol),
        graft.functions.SimHash.blobSimhash32Md5Col(col("content"), n).as("fp"))

  /** The PRODUCTION blob near-dup family: same byte n-gram shingles, but
    * 64-bit xxhash64 simhash ([[Dedup.simhash64Frame]]). The scale law
    * for the downstream block join is: in-bucket candidate volume
    * ≈ n²·blocks/2^width (width = nbits/blocks), so block WIDTH — not
    * fingerprint width alone — decides whether candidates grow linearly.
    * Measured on 5× unique docs (ScaleProbe): 8-bit keys (32-bit/4-block)
    * 13×, 10-bit keys (64-bit/6-block) 12×, 16-bit keys (64-bit/4-block,
    * hamming ≤ 3) 5.9× ≈ linear. Radius trades against width through the
    * pigeonhole bound (maxHamming ≤ blocks−1); at a larger corpus, widen
    * blocks first, then fall back to the maxBucket valve. Keep
    * [[blobSimhash32]] as the value oracle — its md5-nibble votes are
    * engine-replayable — and run THIS at scale. */
  def blobSimhash64(blobs: DataFrame, idCol: String, n: Int = 4): DataFrame =
    // row-local kernel (r15), same rewrite as [[blobSimhash32]]; the
    // 64-bit declarative plan additionally re-hashed each shingle string
    // once PER BIT (64 xxhash64 calls) where the kernel hashes the token
    // once and derives the bits by hashInt — bit-identical seed chain
    blobs.filter(col("n_bytes") >= n)
      .select(col(idCol),
        graft.functions.SimHash.blobSimhash64Col(col("content"), n).as("fp"))

  // ---- JPEG / PNG via javax.imageio: REAL compressed-codec decode ------
  // The codec ships IN the JDK (ImageIO's PNG and JPEG plugins), so the
  // decode below is an honest binary-format decode of the two formats a
  // multimodal corpus actually carries — no external library, no stub.
  // Oracle strategy mirrors the PGM/WAV/Y4M trio: the corpus is rendered
  // from a CLOSED FORM and encoded with the real codec, so an external
  // SQL engine reproduces the expected features from arithmetic alone.
  // PNG is lossless, so any per-pixel form round-trips; JPEG is lossy,
  // but an image whose 8×8 blocks are CONSTANT grayscale is DC-only and
  // at ImageIO quality 1.0 the scaled quantization table is all ones, so
  // the DC coefficient quantizes losslessly and the decode is BIT-EXACT
  // (verified over ids × qualities in graft.ImgProbe) — a closed-form
  // oracle for a lossy codec.

  final case class ImgBlob(doc_id: Long, img: Array[Byte])
  final case class ImgFeatures(doc_id: Long, width: Long, height: Long,
    n_pixels: Long, n_channels: Long, ok_format: Boolean,
    mean_pixel: Long, min_pixel: Long, max_pixel: Long)
  implicit private val imgBlobEnc: Encoder[ImgBlob] = Encoders.product[ImgBlob]
  implicit private val imgFeatEnc: Encoder[ImgFeatures] = Encoders.product[ImgFeatures]

  /** Render the deterministic grayscale corpus and encode it with the
    * real in-JDK codec: per id, a w×h TYPE_BYTE_GRAY image with
    * pixel(i) = (id·31 + i·17) mod 256 (`blockConstant = false`, the
    * [[pgmBlob]] form — use with lossless "png"), or with 8×8 blocks
    * constant at block(b) = (id·31 + b·17) mod 256 (`blockConstant =
    * true`, dims must be multiples of 8 — the DC-only form that makes
    * "jpeg" at quality 1.0 bit-exact). mapPartitions batch shape: one
    * ImageWriter per partition, one image in flight at a time. */
  def imageioRenderGray(
      spark: SparkSession,
      ids: DataFrame,
      idCol: String,
      w: Int,
      h: Int,
      fmt: String,
      blockConstant: Boolean,
      quality: Float = 1.0f): DataFrame = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    require(!blockConstant || (w % 8 == 0 && h % 8 == 0),
      s"block-constant dims must be multiples of 8: ${w}x$h")
    import spark.implicits._
    // repartition the slim id frame so the encoder runs on every core
    // instead of the input file's single scan partition (r15)
    ids.select(col(idCol).cast("long")).repartition(col(idCol))
      .as[Long].mapPartitions { it =>
      val writer = javax.imageio.ImageIO.getImageWritersByFormatName(fmt).next()
      val params = writer.getDefaultWriteParam
      if (params.canWriteCompressed) {
        params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        params.setCompressionQuality(quality)
      }
      it.map { id =>
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
        val r = img.getRaster
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v =
              if (blockConstant) {
                val b = (y / 8) * (w / 8) + (x / 8)
                ((id * 31 + b * 17) % 256).toInt
              } else ((id * 31 + (y.toLong * w + x) * 17) % 256).toInt
            r.setSample(x, y, 0, v)
            x += 1
          }
          y += 1
        }
        val out = new java.io.ByteArrayOutputStream()
        val ios = javax.imageio.ImageIO.createImageOutputStream(out)
        writer.setOutput(ios)
        writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
        ios.close()
        ImgBlob(id, out.toByteArray)
      }
    }.toDF("doc_id", "img")
  }

  /** REAL compressed-image decode: parse each blob with ImageIO (PNG,
    * JPEG, GIF, BMP — whatever the in-JDK registry serves) and extract
    * dims, channel count and per-pixel luma stats. Luma is the integer
    * Rec.601 form floor((299·R + 587·G + 114·B) / 1000) for 3+ bands,
    * the raw sample for grayscale — pinned so a foreign-encoded RGB
    * fixture is spec-checkable. An unreadable/corrupt blob reports
    * ok_format = false with zeroed stats (never a task failure: a
    * 100 TB ingest must quarantine bad blobs, not die on them).
    * mapPartitions batch shape, one image in flight per task —
    * constant memory, partitioning preserved, content never shuffles. */
  def imageioFeatures(
      spark: SparkSession,
      blobs: DataFrame,
      idCol: String,
      blobCol: String): DataFrame = {
    import spark.implicits._
    blobs.select(col(idCol).cast("long").as("doc_id"), col(blobCol).as("img"))
      .as[ImgBlob]
      .mapPartitions { it =>
        it.map { b =>
          val img =
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b.img))
            catch { case _: Exception => null }
          if (img == null)
            ImgFeatures(b.doc_id, 0L, 0L, 0L, 0L, ok_format = false, 0L, 0L, 0L)
          else {
            val (w, h) = (img.getWidth, img.getHeight)
            val raster = img.getRaster
            val nch = raster.getNumBands
            var sum = 0L
            var mn = Int.MaxValue
            var mx = Int.MinValue
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val v =
                  if (nch >= 3)
                    (299 * raster.getSample(x, y, 0) +
                      587 * raster.getSample(x, y, 1) +
                      114 * raster.getSample(x, y, 2)) / 1000
                  else raster.getSample(x, y, 0)
                sum += v
                if (v < mn) mn = v
                if (v > mx) mx = v
                x += 1
              }
              y += 1
            }
            val n = w.toLong * h
            ImgFeatures(b.doc_id, w.toLong, h.toLong, n, nch.toLong,
              ok_format = true, sum / n, mn.toLong, mx.toLong)
          }
        }
      }.toDF()
  }

  // ---- Netpbm (P2 / ASCII PGM): a REAL image decode path ---------------
  // JPEG/PNG stay environmental stubs (no codec libs in this sandbox);
  // Netpbm is a real, spec'd image format whose grammar is plain text, so
  // the full decode → feature-extract → resize pipeline runs as honest
  // parsing code — the multimodal column lifecycle with no fake step.

  /** Render a P2 (ASCII PGM, Netpbm) image blob deterministically from an
    * id: pixel(i) = (id·31 + i·17) mod 256 — pure arithmetic, so an
    * external SQL engine reproduces the corpus bit-for-bit and the decode
    * below is checkable as an encode/decode ROUND-TRIP (parse(render(id))
    * must equal the closed form). */
  def pgmBlob(id: Column, w: Int, h: Int): Column = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val pix = transform(sequence(lit(0L), lit((w * h - 1).toLong)),
      i => pmod(id * 31L + i * 17L, lit(256L)))
    concat(lit(s"P2\n$w $h\n255\n"), array_join(pix, " ")).cast("binary")
  }

  /** Decode a P2 blob: whitespace-token grammar (magic, width, height,
    * maxval, then width·height pixel values). Returns the token array
    * column for downstream feature/resize stages — callers bind it ONCE
    * (withColumn) per the interpreted-HOF capture rule. */
  def pgmTokens(blob: Column): Column = split(trim(blob.cast("string")), "\\s+")

  /** Image features off the decoded tokens: dims, pixel count/mean/min/
    * max, and a format validity flag (magic == P2, token count matches
    * the declared dims). All codegen'd array ops; pixels never explode
    * to rows. */
  def pgmFeatures(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    // try_cast throughout: a malformed blob (non-numeric dim or pixel
    // tokens) must surface as ok_format = false, not an ANSI cast error.
    val withToks = df.withColumn("_t", pgmTokens(col(blobCol)))
      .withColumn("_w", expr("try_cast(element_at(_t, 2) AS BIGINT)"))
      .withColumn("_h", expr("try_cast(element_at(_t, 3) AS BIGINT)"))
      .withColumn("_px",
        expr("transform(slice(_t, 5, size(_t) - 4), s -> try_cast(s AS BIGINT))"))
    withToks.select(
      col(idCol),
      col("_w").as("width"),
      col("_h").as("height"),
      size(col("_px")).cast("long").as("n_pixels"),
      // coalesce: non-numeric width/height tokens cast to NULL, which
      // would propagate through && — a malformed blob must read
      // ok_format = false, not NULL.
      coalesce(
        element_at(col("_t"), 1) === "P2" &&
          size(col("_px")) === (col("_w") * col("_h")).cast("int") &&
          !expr("exists(_px, x -> x IS NULL)"),
        lit(false))
        .as("ok_format"),
      expr("CAST(aggregate(_px, CAST(0 AS BIGINT), (a, x) -> a + x) DIV size(_px) AS BIGINT)")
        .as("mean_pixel"),
      array_min(col("_px")).cast("long").as("min_pixel"),
      array_max(col("_px")).cast("long").as("max_pixel"))
  }

  // ---- WAV (RIFF PCM16): a REAL audio decode path ----------------------
  // Same contract as the Netpbm path: the canonical 44-byte RIFF/WAVE
  // header plus 16-bit little-endian PCM is a real, spec'd audio
  // container whose grammar is byte arithmetic — the decode below is
  // honest binary parsing (hex-materialized once, the blobByteStats
  // idiom), no codec library.

  private def hexByte(b: Column): Column = lpad(hex(b), 2, "0")

  /** Render a canonical mono 16-bit 8 kHz WAV blob deterministically
    * from an id: sample(i) = ((id·7 + i·13) mod 2000) − 1000. Pure
    * arithmetic, so an external engine reproduces the corpus and the
    * decode is checkable as a render→parse ROUND-TRIP against the
    * closed form. */
  def wavBlob(id: Column, nSamples: Int): Column = {
    require(nSamples > 0, s"nSamples must be positive: $nSamples")
    val dataSize = nSamples * 2
    val chunkSize = 36 + dataSize
    def le32(v: Int): String =
      f"${v & 0xFF}%02X${(v >> 8) & 0xFF}%02X${(v >> 16) & 0xFF}%02X${(v >> 24) & 0xFF}%02X"
    val header = "52494646" + le32(chunkSize) + "57415645" + // RIFF size WAVE
      "666D7420" + le32(16) + "0100" + "0100" +              // fmt , PCM, mono
      le32(8000) + le32(16000) + "0200" + "1000" +           // rate, byterate, align, bits
      "64617461" + le32(dataSize)                            // data, size
    val samplesHex = array_join(
      transform(sequence(lit(0L), lit(nSamples - 1L)), i => {
        val u = pmod(pmod(id * 7L + i * 13L, lit(2000L)) - 1000L + 65536L, lit(65536L))
        // little-endian: low byte first; Column `/` is double division,
        // so the high byte goes through an exact floor
        concat(hexByte(pmod(u, lit(256L))), hexByte(floor(u / 256L).cast("long")))
      }), "")
    unhex(concat(lit(header), samplesHex))
  }

  /** Decode a PCM16 WAV blob: header fields parsed from the
    * hex-materialized bytes (magic, WAVE tag, bits-per-sample, sample
    * rate, data size), samples as signed little-endian 16-bit. Features:
    * sample count/rate, peak |s|, Σ|s|, Σs² (exact DECIMAL), and the
    * zero-crossing count — the no-libm audio QC set. Row-local
    * codegen'd array ops; audio bytes never explode to rows. */
  def wavFeatures(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val withHex = df.withColumn("_hx", hex(col(blobCol)))
    // fixed-offset header byte (0-based): hex chars [2·off+1, 2·off+2]
    def b(off: Int): Column =
      conv(substring(col("_hx"), 2 * off + 1, 2), 16, 10).cast("long")
    // column-offset byte for the sample loop
    def bAt(off: Column): Column =
      conv(col("_hx").substr((off * 2L + 1L).cast("int"), lit(2)), 16, 10).cast("long")
    val parsed = withHex
      .withColumn("_rate", b(24) + b(25) * 256L + b(26) * 65536L + b(27) * 16777216L)
      .withColumn("_dsz", b(40) + b(41) * 256L + b(42) * 65536L + b(43) * 16777216L)
      // parse only bytes actually present — a truncated blob whose
      // header CLAIMS more data must not read past the buffer (it is
      // still flagged by ok_format's length check below)
      .withColumn("_n",
        floor(least(col("_dsz"),
          greatest(octet_length(col(blobCol)).cast("long") - 44L, lit(0L))) / 2L)
          .cast("long"))
      .withColumn("_ok",
        substring(col("_hx"), 1, 8) === "52494646" &&
          substring(col("_hx"), 17, 8) === "57415645" &&
          b(34) === 16L && b(35) === 0L &&
          octet_length(col(blobCol)).cast("long") === lit(44L) + col("_dsz"))
      .withColumn("_s",
        when(col("_n") > 0L,
          transform(sequence(lit(0L), col("_n") - 1L), i => {
            val u = bAt(lit(44L) + i * 2L) + bAt(lit(45L) + i * 2L) * 256L
            u - when(u >= 32768L, 65536L).otherwise(0L) // signed 16-bit LE
          })).otherwise(array().cast("array<bigint>")))
    parsed.select(
      col(idCol),
      col("_n").as("n_samples"),
      col("_rate").as("sample_rate"),
      col("_ok").as("ok_format"),
      coalesce(array_max(transform(col("_s"), s => abs(s))), lit(0L)).as("peak_abs"),
      expr("CAST(aggregate(_s, CAST(0 AS BIGINT), (a, x) -> a + abs(x)) AS BIGINT)")
        .as("sum_abs"),
      expr("CAST(aggregate(_s, CAST(0 AS DECIMAL(38,0)), (a, x) -> a + CAST(x AS DECIMAL(38,0)) * x) AS BIGINT)")
        .as("sum_sq"),
      when(col("_n") > 1L,
        expr("""CAST(aggregate(sequence(CAST(1 AS BIGINT), size(_s) - 1),
               |  CAST(0 AS BIGINT),
               |  (a, i) -> a + CAST((_s[CAST(i AS INT)] < 0) != (_s[CAST(i AS INT) - 1] < 0) AS INT))
               |  AS BIGINT)""".stripMargin))
        .otherwise(0L).as("n_zero_cross"))
  }

  // ---- Y4M (YUV4MPEG2): a REAL video decode path ------------------------
  // Completes the real-decode trio (P2 image, WAV audio): YUV4MPEG2 is a
  // real, spec'd video container — a plain-text header line, then
  // "FRAME\n"-delimited raw planes. Synthesized here as grayscale-only
  // (Y plane) clips; the decode is honest byte parsing: the header line
  // is FOUND (first 0x0A scan), dims come from its W/H tokens, every
  // frame marker is validated, and the pixel math never leaves hex.

  /** Render a deterministic grayscale Y4M clip: pixel(f, i) =
    * (id·3 + ⌊(f + id)/2⌋·97 + i·7) mod 256 — frames pair up into
    * near-identical groups whose BOUNDARIES shift with the id, so the
    * scene-cut census below varies per doc. Closed-form arithmetic:
    * an external engine reproduces the corpus exactly. */
  def y4mBlob(id: Column, w: Int, h: Int, nFrames: Int): Column = {
    require(w > 0 && h > 0 && nFrames > 0, s"bad clip ${w}x$h x$nFrames")
    def asciiHex(s: String): String =
      s.getBytes("UTF-8").map(b => f"${b & 0xFF}%02X").mkString
    val header = asciiHex(s"YUV4MPEG2 W$w H$h F25:1\n")
    val frameMark = asciiHex("FRAME\n")
    val frames = (0 until nFrames).map { f =>
      val px = array_join(
        transform(sequence(lit(0L), lit(w * h - 1L)), i =>
          hexByte(pmod(id * 3L + floor((lit(f.toLong) + id) / 2L).cast("long") * 97L
            + i * 7L, lit(256L)))), "")
      concat(lit(frameMark), px)
    }
    unhex(concat(lit(header) +: frames: _*))
  }

  /** Decode a grayscale Y4M clip: locate the header line (first 0x0A
    * within the first 64 bytes), parse W/H from its ASCII tokens,
    * validate every FRAME marker, and extract per-frame Y planes.
    * Features: dims, frame count, global mean luma, and the SCENE-CUT
    * census — the count of consecutive-frame pairs whose mean absolute
    * pixel difference reaches `cutMeanDiff` (the no-libm shot-boundary
    * detector). Row-local nested array folds; video bytes never explode
    * to rows. Output: (id, width, height, n_frames, ok_format, mean_y,
    * n_scene_cuts). */
  def y4mFeatures(
      df: DataFrame, idCol: String, blobCol: String, cutMeanDiff: Int = 30): DataFrame = {
    val withHex = df.withColumn("_hx", hex(col(blobCol)))
      .withColumn("_len", octet_length(col(blobCol)).cast("long"))
      // the byte ARRAY, materialized once per row: every downstream
      // access is an element_at integer lookup instead of a fresh
      // substr+conv string decode — the pixel folds below previously ran
      // ~2 string allocations per pixel ACCESS (≈ 5 per pixel across
      // mean/diff passes), now the whole row decodes each byte once
      .withColumn("_by", expr(
        """CASE WHEN _len > 0 THEN transform(sequence(CAST(0 AS BIGINT), _len - 1),
          |  o -> CAST(conv(substring(_hx, CAST(o * 2 + 1 AS INT), 2), 16, 10) AS BIGINT))
          |ELSE CAST(array() AS ARRAY<BIGINT>) END""".stripMargin))
    val parsed = withHex
      // first 0x0A byte in the first 64 bytes = end of the header line
      // (array_position: 1-based first index, 0 when absent — minus 1
      // reproduces the old fold's 0-based offset / -1-absent contract)
      .withColumn("_hdrNl",
        array_position(slice(col("_by"), 1, 64), 10L) - 1L)
      .withColumn("_hdr",
        when(col("_hdrNl") > 0L,
          decode(unhex(col("_hx").substr(lit(1), (col("_hdrNl") * 2L).cast("int"))), "UTF-8"))
          .otherwise(""))
      .withColumn("_w",
        when(regexp_extract(col("_hdr"), " W(\\d+)", 1) =!= "",
          regexp_extract(col("_hdr"), " W(\\d+)", 1).cast("long")).otherwise(0L))
      .withColumn("_h",
        when(regexp_extract(col("_hdr"), " H(\\d+)", 1) =!= "",
          regexp_extract(col("_hdr"), " H(\\d+)", 1).cast("long")).otherwise(0L))
      .withColumn("_hl", col("_hdrNl") + 1L)
      .withColumn("_fsz", lit(6L) + col("_w") * col("_h"))
      .withColumn("_nf",
        when(col("_fsz") > 6L, floor((col("_len") - col("_hl")) / col("_fsz")).cast("long"))
          .otherwise(0L))
      .withColumn("_marksOk", expr(
        """_nf > 0 AND aggregate(sequence(CAST(0 AS BIGINT), _nf - 1),
          |  true,
          |  (acc, f) -> acc AND substring(_hx,
          |    CAST((_hl + f * _fsz) * 2 + 1 AS INT), 12) = '4652414D450A')""".stripMargin))
      .withColumn("_ok",
        col("_hdr").startsWith("YUV4MPEG2 ") && col("_marksOk") &&
          col("_len") === col("_hl") + col("_nf") * col("_fsz"))
    // per-frame pixel sums and consecutive-frame |diff| sums, all off the
    // hex column via NESTED folds (pixel(f, i) lives at byte
    // _hl + f·_fsz + 6 + i) — video bytes never explode to rows
    def pxByte(f: Column, i: Column): Column =
      element_at(col("_by"), (col("_hl") + f * col("_fsz") + 6L + i + 1L).cast("int"))
    def pixSeq: Column = sequence(lit(0L), col("_w") * col("_h") - 1L)
    val summed = parsed
      .withColumn("_fsum",
        when(col("_nf") > 0L,
          transform(sequence(lit(0L), col("_nf") - 1L), f =>
            aggregate(pixSeq, lit(0L), (a, i) => a + pxByte(f, i))))
          .otherwise(array().cast("array<bigint>")))
      .withColumn("_dsum",
        when(col("_nf") > 1L,
          transform(sequence(lit(1L), col("_nf") - 1L), f =>
            aggregate(pixSeq, lit(0L),
              (a, i) => a + abs(pxByte(f, i) - pxByte(f - 1L, i)))))
          .otherwise(array().cast("array<bigint>")))
    summed.select(
      col(idCol),
      col("_w").as("width"),
      col("_h").as("height"),
      col("_nf").as("n_frames"),
      col("_ok").as("ok_format"),
      when(col("_nf") > 0L, expr(
        "CAST(aggregate(_fsum, CAST(0 AS BIGINT), (a, x) -> a + x) DIV (_nf * _w * _h) AS BIGINT)"))
        .otherwise(0L).as("mean_y"),
      expr(s"""CAST(size(filter(_dsum, d -> d >= $cutMeanDiff * _w * _h))
              |  AS BIGINT)""".stripMargin).as("n_scene_cuts"))
  }

  /** 2× box-filter downsample of a decoded P2 image: out(r, c) =
    * ⌊(p(2r,2c) + p(2r,2c+1) + p(2r+1,2c) + p(2r+1,2c+1)) / 4⌋ — the
    * real resize kernel, row-local over the pixel array (element_at
    * arithmetic, no explode). Output: (id, out_w, out_h, px_sum,
    * px_md5) where px_md5 fingerprints the resized image exactly. */
  def pgmDownsample2x(
      df: DataFrame, idCol: String, blobCol: String, w: Int, h: Int): DataFrame = {
    require(w % 2 == 0 && h % 2 == 0, s"dims must be even: ${w}x$h")
    val (ow, oh) = (w / 2, h / 2)
    val out = df.withColumn("_t", pgmTokens(col(blobCol)))
      .withColumn("_px",
        transform(slice(col("_t"), lit(5), size(col("_t")) - 4), s => s.cast("long")))
      .withColumn("_rs",
        transform(sequence(lit(0), lit(ow * oh - 1)), o => {
          // Column `/` is double division — block coordinates need the
          // integral quotient
          val r = floor(o / lit(ow)).cast("int") * 2
          val c = pmod(o, lit(ow)) * 2
          def p(rr: Column, cc: Column) =
            element_at(col("_px"), (rr * w + cc + 1).cast("int"))
          floor((p(r, c) + p(r, c + 1) + p(r + 1, c) + p(r + 1, c + 1)) / 4.0)
            .cast("long")
        }))
    out.select(
      col(idCol),
      lit(ow.toLong).as("out_w"),
      lit(oh.toLong).as("out_h"),
      expr("CAST(aggregate(_rs, CAST(0 AS BIGINT), (a, x) -> a + x) AS BIGINT)").as("px_sum"),
      md5(array_join(col("_rs"), " ").cast("binary")).as("px_md5"))
  }
}
