package graft

/** One-off empirical check behind the round-12 ImageIO decode design:
  * (1) PNG (lossless) round-trips arbitrary grayscale pixels exactly;
  * (2) a JPEG whose 8×8 blocks are CONSTANT, written grayscale at
  * ImageIO quality 1.0, decodes back bit-exactly (constant blocks are
  * DC-only; at quality 1.0 the scaled Annex-K luminance table is all
  * ones, so the DC coefficient quantizes losslessly) — the property
  * that lets a lossy codec carry a closed-form SQL oracle. */
object ImgProbe {
  import java.awt.image.BufferedImage
  import javax.imageio.{ImageIO, ImageWriteParam}

  def encode(img: BufferedImage, fmt: String, quality: Float): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName(fmt).next()
    val params = writer.getDefaultWriteParam
    if (params.canWriteCompressed) {
      params.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
      params.setCompressionQuality(quality)
    }
    val ios = ImageIO.createImageOutputStream(out)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), params)
    ios.close(); writer.dispose()
    out.toByteArray
  }

  def gray(w: Int, h: Int, f: (Int, Int) => Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val r = img.getRaster
    for (y <- 0 until h; x <- 0 until w) r.setSample(x, y, 0, f(x, y))
    img
  }

  def pixels(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    val (w, h) = (img.getWidth, img.getHeight)
    val px = Array.tabulate(w * h)(i => img.getRaster.getSample(i % w, i / w, 0))
    (w, h, px)
  }

  def main(args: Array[String]): Unit = {
    // PNG: arbitrary per-pixel closed form
    val (w, h) = (16, 8)
    def pxForm(id: Long)(x: Int, y: Int): Int = ((id * 31 + (y * w + x) * 17) % 256).toInt
    for (id <- Seq(0L, 1L, 7L, 123L)) {
      val bytes = encode(gray(w, h, pxForm(id)), "png", 1.0f)
      val (dw, dh, px) = pixels(bytes)
      val want = Array.tabulate(w * h)(i => pxForm(id)(i % w, i / w))
      println(s"PNG id=$id dims=${dw}x$dh exact=${px.sameElements(want)} bytes=${bytes.length}")
    }
    // JPEG: 8×8 block-constant closed form, quality sweep
    val (jw, jh) = (32, 16) // 4×2 = 8 blocks
    def blockForm(id: Long)(x: Int, y: Int): Int = {
      val b = (y / 8) * (jw / 8) + (x / 8)
      ((id * 31 + b * 17) % 256).toInt
    }
    for (id <- Seq(0L, 1L, 7L, 123L); q <- Seq(1.0f, 0.95f)) {
      val bytes = encode(gray(jw, jh, blockForm(id)), "jpeg", q)
      val (dw, dh, px) = pixels(bytes)
      val want = Array.tabulate(jw * jh)(i => blockForm(id)(i % jw, i / jw))
      val ndiff = px.zip(want).count { case (a, b) => a != b }
      val maxd = px.zip(want).map { case (a, b) => math.abs(a - b) }.max
      println(s"JPEG id=$id q=$q dims=${dw}x$dh ndiff=$ndiff maxdiff=$maxd bytes=${bytes.length}")
    }
  }
}
