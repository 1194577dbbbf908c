package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "abcdef"),
    (2L, "0123456789" * 10)
  ).toDF("doc_id", "text")

  test("toBlobTable: binary content + typed metadata") {
    val blobs = Multimodal.toBlobTable(docs, "doc_id", "text", "text")
    assert(blobs.columns.toSeq ==
      Seq("doc_id", "kind", "content", "n_bytes", "content_md5"))
    val r = blobs.select($"doc_id", $"n_bytes", $"content_md5").as[(Long, Long, String)]
      .collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(1L)._1 == 6L && r(2L)._1 == 100L)
    // md5 of utf-8 bytes matches the well-known digest of "abcdef"
    assert(r(1L)._2 == "e80b5017098950fc58aad83c8c14978e")
    val bytes = blobs.filter($"doc_id" === 1L).select($"content").as[Array[Byte]].head()
    assert(new String(bytes, "UTF-8") == "abcdef")
  }

  test("sampleFrames: every step-th byte becomes a frame with its value") {
    val blobs = Multimodal.toBlobTable(docs, "doc_id", "text", "text")
    val frames = Multimodal.sampleFrames(blobs, 4)
      .filter($"doc_id" === 1L)
      .select($"frame_idx", $"byte_offset", $"frame_val")
      .as[(Int, Long, Long)].collect().sortBy(_._1)
    // "abcdef" step 4 → offsets 0 ('a'=97) and 4 ('e'=101)
    assert(frames.toSeq == Seq((0, 0L, 97L), (1, 4L, 101L)))
  }

  test("imageio decode: foreign-encoded PNG parses exactly; corrupt blob flagged") {
    import org.apache.spark.sql.functions._
    // hand-assembled 3x2 grayscale PNG via in-JDK Deflater/CRC32 — a
    // FOREIGN encoder (ImageIO never touches the write side here), so
    // the decoder is checked against an independent implementation of
    // the wire format, the q_audio_decode discipline. Pixels:
    //   10  20  30
    //  255   0 128
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      val len = java.nio.ByteBuffer.allocate(4).putInt(data.length).array()
      out.write(len)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      out.write(java.nio.ByteBuffer.allocate(4).putInt(crc.getValue.toInt).array())
      out.toByteArray
    }
    val ihdr = java.nio.ByteBuffer.allocate(13)
      .putInt(3).putInt(2)                    // width, height
      .put(8.toByte).put(0.toByte)            // bit depth 8, color type 0 (gray)
      .put(0.toByte).put(0.toByte).put(0.toByte) // deflate, filter 0, no interlace
      .array()
    // scanlines: filter byte 0 + row pixels
    val raw = Array[Byte](0, 10, 20, 30, 0, 255.toByte, 0, 128.toByte)
    val defl = {
      val d = new java.util.zip.Deflater()
      d.setInput(raw); d.finish()
      val buf = new Array[Byte](64)
      val n = d.deflate(buf); d.end()
      buf.take(n)
    }
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A) ++
      chunk("IHDR", ihdr) ++ chunk("IDAT", defl) ++ chunk("IEND", Array.empty)
    val corrupt = png.take(20) // truncated mid-IHDR
    val df = Seq((1L, png), (2L, corrupt)).toDF("id", "img")
    val got = Multimodal.imageioFeatures(spark, df, "id", "img")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean, Long, Long, Long)]
      .collect().toSeq
    // sum = 10+20+30+255+0+128 = 443; mean = 443/6 = 73
    assert(got.head == ((1L, 3L, 2L, 6L, 1L, true, 73L, 0L, 255L)), got.head.toString)
    assert(got(1) == ((2L, 0L, 0L, 0L, 0L, false, 0L, 0L, 0L)), got(1).toString)
  }

  test("imageio decode: RGB luma pinned; encode-decode round-trips closed forms") {
    import org.apache.spark.sql.functions._
    // 1x2 RGB PNG written via ImageIO (lossless): (255,0,0) and (0,0,255)
    // → Rec.601 integer luma floor(299R+587G+114B)/1000 = 76 and 29
    val rgb = new java.awt.image.BufferedImage(
      1, 2, java.awt.image.BufferedImage.TYPE_INT_RGB)
    rgb.setRGB(0, 0, 0xFF0000); rgb.setRGB(0, 1, 0x0000FF)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(rgb, "png", out)
    val df = Seq((1L, out.toByteArray)).toDF("id", "img")
    val got = Multimodal.imageioFeatures(spark, df, "id", "img")
      .as[(Long, Long, Long, Long, Long, Boolean, Long, Long, Long)].collect().head
    assert(got == ((1L, 1L, 2L, 2L, 3L, true, (76L + 29L) / 2, 29L, 76L)), got.toString)
    // PNG per-pixel closed form round-trips exactly (lossless)
    val ids = Seq(0L, 5L, 99L).toDF("doc_id")
    val png = Multimodal.imageioRenderGray(spark, ids, "doc_id", 16, 8, "png",
      blockConstant = false)
    val pf = Multimodal.imageioFeatures(spark, png, "doc_id", "img")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean, Long, Long, Long)].collect()
    pf.foreach { r =>
      val id = r._1
      val px = (0 until 128).map(i => (id * 31 + i * 17) % 256)
      assert(r == ((id, 16L, 8L, 128L, 1L, true,
        px.sum / 128, px.min, px.max)), r.toString)
    }
    // JPEG block-constant closed form is BIT-EXACT at quality 1.0
    // (DC-only blocks, unit quantization — the ImgProbe property)
    val jpg = Multimodal.imageioRenderGray(spark, ids, "doc_id", 32, 16, "jpeg",
      blockConstant = true)
    val jf = Multimodal.imageioFeatures(spark, jpg, "doc_id", "img")
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Boolean, Long, Long, Long)].collect()
    jf.foreach { r =>
      val id = r._1
      val bv = (0 until 8).map(b => (id * 31 + b * 17) % 256)
      assert(r == ((id, 32L, 16L, 512L, 1L, true,
        bv.sum * 64 / 512, bv.min, bv.max)), r.toString)
    }
  }

  test("blobByteStats: histogram, modal tie to smallest byte, empty blob, magic sniff") {
    import org.apache.spark.sql.functions._
    val rows = Seq(
      (1L, "aaab".getBytes("UTF-8")),            // 'a'x3 + 'b' -> top 97 @ 750000
      (2L, "ab".getBytes("UTF-8")),              // tie 1-1 -> smallest byte 97
      (3L, Array.emptyByteArray),                // empty
      (4L, Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A).map(_.toByte)), // PNG magic
      (5L, Array(0x1F, 0x8B, 0x00).map(_.toByte)))                   // GZIP magic
      .toDF("doc_id", "content")
      .withColumn("n_bytes", octet_length(col("content")).cast("long"))
    val got = Multimodal.blobByteStats(rows)
      .as[(Long, Long, Long, Option[Long], Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got(1L) == ((4L, 2L, Some(97L), 750000L, "unknown")), got.toString)
    assert(got(2L) == ((2L, 2L, Some(97L), 500000L, "unknown")), got.toString)
    assert(got(3L) == ((0L, 0L, None, 0L, "empty")), got.toString)
    assert(got(4L)._5 == "png", got.toString)
    assert(got(5L)._5 == "gzip", got.toString)
    // high-byte extraction is correct (0x89 = 137 must appear, not a
    // mangled UTF-8 decode)
    assert(got(4L)._2 == 6L && got(4L)._3.exists(_ >= 0L), got.toString)
  }

  private def pack(sizes: Seq[(Long, Long)], budget: Long, cap: Int) = {
    // bypass the nibble grouping: every doc in one group via a constant
    // nibble is NOT possible from outside, so feed blobs whose doc_ids
    // all hash to the group they actually land in and read the manifest
    // back keyed by doc_id (grouping is irrelevant to the fold under test
    // when checked per (grp, doc order) run)
    val blobs = sizes.map { case (id, n) => (id, "x", Array.fill(n.toInt)('a'.toByte), n) }
      .toDF("doc_id", "kind", "content", "n_bytes")
    Multimodal.packBlobs(blobs, budget, cap)
      .as[(Int, Long, Long, Long, Long)].collect()
      .map(r => r._3 -> ((r._1, r._2, r._4, r._5))).toMap
  }

  test("packBlobs: byte budget, record cap, and oversized-alone rules") {
    val got = pack(Seq(1L -> 4L, 2L -> 5L, 3L -> 3L, 4L -> 20L, 5L -> 1L),
      budget = 10L, cap = 8)
    // group each doc's (shard, offset) by its pack group and replay
    val byGrp = got.toSeq.groupBy(_._2._1)
    byGrp.foreach { case (_, rows) =>
      val ordered = rows.sortBy(_._1)
      var shard = 0L; var fill = 0L; var cnt = 0L; var first = true
      ordered.foreach { case (_, (_, gotShard, n, gotOff)) =>
        if (!first && (fill + n > 10L || cnt == 8L)) { shard += 1; fill = 0; cnt = 0 }
        first = false
        assert(gotShard == shard && gotOff == fill, s"rows=$ordered")
        fill += n; cnt += 1
      }
    }
    // an oversized blob (20 > 10) occupies its own shard at offset 0
    assert(got(4L)._4 == 0L, got.toString)
  }

  test("packBlobs: record cap forces a new shard before the byte budget") {
    val got = pack((1L to 5L).map(i => i -> 1L), budget = 100L, cap = 2)
    val byGrp = got.toSeq.groupBy(_._2._1)
    byGrp.foreach { case (_, rows) =>
      rows.sortBy(_._1).zipWithIndex.foreach { case ((_, (_, shard, _, off)), i) =>
        assert(shard == i / 2 && off == (i % 2).toLong, rows.toString)
      }
    }
  }

  test("y4m decode: foreign-encoded clip parses; scene cut detected; bad marker flagged") {
    import org.apache.spark.sql.functions._
    // hand-assembled 2x2 clip, 3 frames: two near-identical, then a jump
    // (the real Y4M grammar incl. extra header tokens the parser must skip)
    val header = "YUV4MPEG2 W2 H2 F25:1 Ip A1:1\n".getBytes("UTF-8")
    def frame(px: Seq[Int]): Array[Byte] =
      "FRAME\n".getBytes("UTF-8") ++ px.map(_.toByte).toArray
    val clip = header ++ frame(Seq(10, 20, 30, 40)) ++
      frame(Seq(11, 21, 29, 40)) ++ frame(Seq(200, 220, 230, 240))
    // corrupt the second frame marker
    val bad = clip.clone(); bad(header.length + 10 + 0) = 'G'.toByte
    val df = Seq((1L, clip), (2L, bad)).toDF("id", "clip")
    val got = Multimodal.y4mFeatures(df, "id", "clip", cutMeanDiff = 30)
      .orderBy("id")
      .as[(Long, Long, Long, Long, Boolean, Long, Long)].collect().toSeq
    // frame sums: 100, 101, 890 → mean = 1091/12 = 90
    // diffs: |1|+|1|+|1|+|0| = 3 (< 120); |189|+|199|+|201|+|200| = 789 → 1 cut
    assert(got.head == ((1L, 2L, 2L, 3L, true, 1091L / 12, 1L)), got.head.toString)
    assert(!got(1)._5, got(1).toString) // corrupted marker → ok_format false
  }

  test("wav decode: foreign-encoded PCM16 parses exactly; truncated blob flagged") {
    import org.apache.spark.sql.functions._
    // hand-assembled 4-sample clip at 44100 Hz: samples 100, -2, 0, -32768
    def le16(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
    def le32(v: Int): Array[Byte] =
      Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
        ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
    val samples = Seq(100, -2, 0, -32768)
    val wav: Array[Byte] =
      "RIFF".getBytes ++ le32(36 + 8) ++ "WAVE".getBytes ++
        "fmt ".getBytes ++ le32(16) ++ le16(1) ++ le16(1) ++
        le32(44100) ++ le32(88200) ++ le16(2) ++ le16(16) ++
        "data".getBytes ++ le32(8) ++
        samples.flatMap(s => le16(s & 0xFFFF)).toArray
    val truncated = wav.dropRight(2) // dataSize claims more than present
    val df = Seq((1L, wav), (2L, truncated)).toDF("id", "wav")
    val got = Multimodal.wavFeatures(df, "id", "wav")
      .orderBy("id")
      .as[(Long, Long, Long, Boolean, Long, Long, Long, Long)].collect().toSeq
    // zero crossings with sign = (s < 0): 100→-2 (1), -2→0 (1), 0→-32768 (1)
    assert(got.head == ((1L, 4L, 44100L, true, 32768L,
      100L + 2L + 0L + 32768L,
      100L * 100 + 4 + 0 + 32768L * 32768L, 3L)), got.head.toString)
    // truncated → flagged, and the parser reads only the 3 present
    // samples instead of running past the buffer
    assert(got(1) == ((2L, 3L, 44100L, false, 100L, 102L, 10004L, 2L)),
      got(1).toString)
  }

  test("pgm decode: foreign-encoded P2 parses exactly; malformed blob flagged") {
    import org.apache.spark.sql.functions._
    // hand-written 4x2 image (NOT via pgmBlob — checks the parser
    // against an independent encoder, incl. multi-space/newline mixing)
    val img = "P2\n4 2\n255\n0 10  20 30\n255 100 5 40"
    val bad = "P5\n4 2\n255\n0 1 2 3 4 5 6 7" // wrong magic
    val short = "P2\n4 2\n255\n1 2 3"           // token count mismatch
    val df = Seq((1L, img), (2L, bad), (3L, short))
      .toDF("id", "s").select($"id", $"s".cast("binary").as("img"))
    val got = Multimodal.pgmFeatures(df, "id", "img")
      .orderBy("id")
      .as[(Long, Long, Long, Long, Boolean, Long, Long, Long)].collect().toSeq
    assert(got.head == ((1L, 4L, 2L, 8L, true, 460L / 8, 0L, 255L)), got.head.toString)
    assert(!got(1)._5 && !got(2)._5, got.toString) // both flagged invalid
    // non-numeric dim/pixel tokens: try_cast yields NULL — ok_format
    // must collapse to FALSE (never NULL, never an ANSI cast error)
    val junk = Seq((9L, "P2\nX Y\n255\n1 2"), (10L, "P2\n2 1\n255\n1 Z"))
      .toDF("id", "s").select($"id", $"s".cast("binary").as("img"))
    Multimodal.pgmFeatures(junk, "id", "img").collect().foreach { jr =>
      assert(!jr.isNullAt(jr.fieldIndex("ok_format")) &&
        !jr.getBoolean(jr.fieldIndex("ok_format")), jr.toString)
    }
    // 2x downsample of the hand image: blocks ⌊(0+10+255+100)/4⌋=91,
    // ⌊(20+30+5+40)/4⌋=23
    val rs = Multimodal.pgmDownsample2x(
        df.filter($"id" === 1L), "id", "img", w = 4, h = 2)
      .as[(Long, Long, Long, Long, String)].collect().head
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("91 23".getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString
    assert(rs == ((1L, 2L, 1L, 114L, h)), rs.toString)
  }
}
