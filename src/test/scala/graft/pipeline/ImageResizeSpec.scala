package graft.pipeline

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.scalatest.funsuite.AnyFunSuite

/** JavaSoundExternals.resizeImage (r13): real JDK codec path — decode,
  * area-averaging scale, same-container re-encode — for the formats a
  * stock JDK ships readers for; everything else keeps the fixture-stub
  * semantics the registered query's oracle replays. */
class ImageResizeSpec extends AnyFunSuite {

  /** 2x2-block checkerboard test card, deterministic pixels. */
  private def card(w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y,
        if (((x / 2) + (y / 2)) % 2 == 0) 0xff0000 else 0x0000ff)
    img
  }

  private def encode(fmt: String, w: Int = 40, h: Int = 30): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(card(w, h), fmt, bos), s"JDK lacks a $fmt writer?")
    bos.toByteArray
  }

  private def dims(bytes: Array[Byte]): (Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    assert(img != null, "resized payload did not decode")
    (img.getWidth, img.getHeight)
  }

  test("png resizes to target dims and stays png") {
    val out = JavaSoundExternals.resizeImage(encode("png"), 20, 15)
    assert((out(0) & 0xff) == 0x89 && out(1) == 'P', "container changed")
    assert(dims(out) == ((20, 15)))
  }

  test("jpeg resizes and stays jpeg") {
    val out = JavaSoundExternals.resizeImage(encode("jpg"), 10, 8)
    assert((out(0) & 0xff) == 0xff && (out(1) & 0xff) == 0xd8)
    assert(dims(out) == ((10, 8)))
  }

  test("bmp resizes and stays bmp") {
    val out = JavaSoundExternals.resizeImage(encode("bmp"), 8, 6)
    assert(out(0) == 'B' && out(1) == 'M')
    assert(dims(out) == ((8, 6)))
  }

  test("gif re-encodes as png (lossless) at target dims") {
    val out = JavaSoundExternals.resizeImage(encode("gif"), 12, 9)
    assert((out(0) & 0xff) == 0x89 && out(1) == 'P',
      "gif should re-encode lossless as png")
    assert(dims(out) == ((12, 9)))
  }

  test("uniform-color png survives resize pixel-exact (lossless path)") {
    val img = new java.awt.image.BufferedImage(
      16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x336699)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    val out = JavaSoundExternals.resizeImage(bos.toByteArray, 4, 4)
    val back = ImageIO.read(new ByteArrayInputStream(out))
    for (y <- 0 until 4; x <- 0 until 4)
      assert((back.getRGB(x, y) & 0xffffff) == 0x336699,
        f"pixel ($x,$y) = ${back.getRGB(x, y)}%08x")
  }

  test("upscale works too (w/h larger than source)") {
    assert(dims(JavaSoundExternals.resizeImage(encode("png", 8, 8), 32, 24))
      == ((32, 24)))
  }

  test("non-image payloads keep the stub's content-keyed semantics") {
    val payload = "definitely not an image".getBytes
    val real = JavaSoundExternals.resizeImage(payload, 64, 48)
    val stub = StubExternals.resizeImage(payload, 64, 48)
    assert(java.util.Arrays.equals(real, stub),
      "non-image payload must fall back to the oracle-replayable stub")
  }

  test("truncated image bytes fall back to the stub, never throw") {
    val png = encode("png")
    val cut = java.util.Arrays.copyOfRange(png, 0, 20) // header survives sniff
    val real = JavaSoundExternals.resizeImage(cut, 5, 5)
    val stub = StubExternals.resizeImage(cut, 5, 5)
    assert(java.util.Arrays.equals(real, stub))
  }

  test("a header claiming a multi-GB raster falls back to the stub " +
      "before any decode allocation") {
    // hand-built minimal PNG: magic + IHDR declaring 65535x65535
    // (4.3e9 pixels — a ~17 GB INT raster if decoded; ImageIO.read
    // allocates from the CLAIM, and OutOfMemoryError bypasses the
    // catch). The dimension gate must bail to stub semantics without
    // touching the decoder.
    val bos = new ByteArrayOutputStream()
    bos.write(Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte))
    val ihdr = new ByteArrayOutputStream()
    ihdr.write("IHDR".getBytes)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    ihdr.write(be32(65535)); ihdr.write(be32(65535))
    ihdr.write(Array[Byte](8, 2, 0, 0, 0)) // bitdepth rgb
    val body = ihdr.toByteArray
    bos.write(be32(body.length - 4))
    bos.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    bos.write(be32(crc.getValue))
    val hostile = bos.toByteArray
    val real = JavaSoundExternals.resizeImage(hostile, 8, 8)
    val stub = StubExternals.resizeImage(hostile, 8, 8)
    assert(java.util.Arrays.equals(real, stub),
      "over-cap claimed raster must keep stub semantics")
  }
}
