package graft

import graft.llm.Multimodal
import graft.llm.Multimodal.MediaRow

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem, AudioFileFormat}

/** Real multimodal codecs (JDK ImageIO + javax.sound) driven through the
  * Spark Dataset pipeline on in-memory generated payloads. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  private def wavBytes(sampleRate: Float, nFrames: Int, amplitude: Double): Array[Byte] = {
    val fmt = new AudioFormat(sampleRate, 16, 1, true, false)
    val raw = new Array[Byte](nFrames * 2)
    for (i <- 0 until nFrames) {
      val s = (math.sin(2 * math.Pi * 440 * i / sampleRate) * amplitude * 32767).toInt
      raw(2 * i) = (s & 0xFF).toByte
      raw(2 * i + 1) = ((s >> 8) & 0xFF).toByte
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, nFrames.toLong)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("decodeImages reads real PNGs: dimensions, channels, mean luma") {
    val media = Seq(
      MediaRow(1L, "image", pngBytes(64, 48, 0xFFFFFF)),   // white
      MediaRow(2L, "image", pngBytes(10, 10, 0x000000)),   // black
      MediaRow(3L, "image", "not an image".getBytes)).toDS()
    val feats = Multimodal.decodeImages(media).collect().map(f => f.media_id -> f).toMap
    assert(feats.keySet == Set(1L, 2L)) // corrupt payload dropped
    assert(feats(1L).width == 64 && feats(1L).height == 48 && feats(1L).channels == 3)
    assert(math.abs(feats(1L).mean_luma - 255.0) < 1e-9)
    assert(math.abs(feats(2L).mean_luma - 0.0) < 1e-9)
  }

  test("resizeImages resamples into the bounding box and stays decodable") {
    val media = Seq(MediaRow(1L, "image", pngBytes(64, 48, 0x808080))).toDS()
    val resized = Multimodal.resizeImages(media, 32, 32)
    val feats = Multimodal.decodeImages(resized).collect().head
    assert(feats.width == 32 && feats.height == 24) // aspect preserved
    // small images never upscale
    val same = Multimodal.decodeImages(Multimodal.resizeImages(media, 1000, 1000))
      .collect().head
    assert(same.width == 64 && same.height == 48)
  }

  test("binaryFile source -> decode pipeline (large-object scan analog)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_media").toString
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/img7.png"),
      pngBytes(20, 10, 0xFF0000))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/img8.png"),
      pngBytes(5, 5, 0x00FF00))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/skip.txt"),
      "not media".getBytes)
    val bin = Multimodal.readBinaryFiles(spark, dir, "*.png")
    assert(bin.count() == 2) // glob filter excluded the txt
    val media = bin.select(
      org.apache.spark.sql.functions.regexp_extract(
        org.apache.spark.sql.functions.col("path"), "img(\\d+)\\.png", 1)
        .cast("long").as("media_id"),
      org.apache.spark.sql.functions.lit("image").as("kind"),
      org.apache.spark.sql.functions.col("content").as("payload")).as[MediaRow]
    val feats = Multimodal.decodeImages(media).collect().map(f => f.media_id -> f).toMap
    assert(feats(7L).width == 20 && feats(7L).height == 10)
    assert(feats(8L).width == 5 && feats(8L).height == 5)
  }

  test("sampleFrames reads every k-th frame of an animated GIF") {
    // build a 6-frame animated GIF in memory: frame i is a solid gray
    // level i*40 (distinguishable mean luma per frame)
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until 6) {
      val level = i * 40
      val img = new BufferedImage(8, 6, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8)
        img.setRGB(x, y, (level << 16) | (level << 8) | level)
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    writer.dispose()

    val media = Seq(MediaRow(1L, "video", bos.toByteArray)).toDS()
    val frames = Multimodal.sampleFrames(media, stride = 2, maxFrames = 8).collect()
      .sortBy(_.frame_no)
    assert(frames.map(_.frame_no).toSeq == Seq(0, 2, 4)) // every 2nd of 6
    assert(frames.forall(f => f.width == 8 && f.height == 6))
    // GIF is palettized: quantization shifts levels slightly, but ordering
    // and separation of the sampled frames' luma must survive
    assert(frames(0).mean_luma < frames(1).mean_luma)
    assert(frames(1).mean_luma < frames(2).mean_luma)
    assert(frames(2).mean_luma - frames(0).mean_luma > 100)
  }

  test("corrupt-but-recognized payloads drop the row, not the task") {
    // A valid PNG header followed by garbage: ImageIO *recognizes* the
    // format, then throws mid-decode. The contract is drop-the-row.
    // The truncated fixture must be noisy enough that its IDAT spans the
    // cut point — a tiny flat image can survive 50% truncation intact.
    val noisyPng = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64)
        img.setRGB(x, y, ((x * 2654435761L) ^ (y * 40503L)).toInt & 0xFFFFFF)
      val bos = new ByteArrayOutputStream()
      ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val goodPng = pngBytes(8, 8, 0x112233)
    val truncPng = noisyPng.take(noisyPng.length / 2)
    val headerOnly = goodPng.take(12) ++ Array.fill[Byte](30)(0x5A)
    val media = Seq(
      MediaRow(1L, "image", goodPng),
      MediaRow(2L, "image", truncPng),
      MediaRow(3L, "image", headerOnly)).toDS()
    assert(Multimodal.decodeImages(media).collect().map(_.media_id).toSet == Set(1L))
    assert(Multimodal.resizeImages(media, 4, 4).collect().map(_.media_id).toSet == Set(1L))
    // same story for a truncated WAV: header recognized, body missing
    val goodWav = wavBytes(8000f, 1000, 0.5)
    val truncWav = goodWav.take(50)
    val wavs = Seq(MediaRow(1L, "audio", goodWav), MediaRow(2L, "audio", truncWav)).toDS()
    assert(Multimodal.decodeWav(wavs).collect().map(_.media_id).toSet == Set(1L))
    // and a truncated GIF through the multi-frame reader
    val gif = {
      val bos = new ByteArrayOutputStream()
      val img = new BufferedImage(4, 4, BufferedImage.TYPE_INT_RGB)
      ImageIO.write(img, "gif", bos)
      bos.toByteArray
    }
    val gifs = Seq(
      MediaRow(1L, "video", gif),
      MediaRow(2L, "video", gif.take(16))).toDS()
    assert(Multimodal.sampleFrames(gifs).collect().map(_.media_id).toSet == Set(1L))
  }

  test("24-bit WAV is rejected (unsupported depth), not mis-decoded") {
    val fmt = new AudioFormat(8000f, 24, 1, true, false)
    val raw = new Array[Byte](300 * 3) // 300 frames of max-ish amplitude
    for (i <- raw.indices) raw(i) = 0x7F.toByte
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt, 300L)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, bos)
    val media = Seq(MediaRow(1L, "audio", bos.toByteArray)).toDS()
    assert(Multimodal.decodeWav(media).collect().isEmpty)
  }

  test("decodeWav reads real WAV: rate, frames, duration, sine RMS") {
    val media = Seq(
      MediaRow(1L, "audio", wavBytes(8000f, 8000, 0.5)),
      MediaRow(2L, "audio", "not audio".getBytes)).toDS()
    val feats = Multimodal.decodeWav(media).collect()
    assert(feats.map(_.media_id).toSet == Set(1L))
    val f = feats.head
    assert(f.sample_rate == 8000 && f.channels == 1 && f.frames == 8000L)
    assert(math.abs(f.duration_sec - 1.0) < 1e-9)
    // RMS of a 0.5-amplitude sine = 0.5/sqrt(2) ~ 0.3536
    assert(math.abs(f.rms - 0.5 / math.sqrt(2)) < 0.01)
  }

  test("decodeVideoExternal pipes payloads through a stand-in decoder") {
    // Stand-in for an ffprobe wrapper: reads base64 lines, reports the
    // DECODED byte count as width — proves the payload truly crosses the
    // process boundary intact (a >76-byte payload also catches any MIME
    // line-wrapping in the base64 leg). Corrupt-output row (media 3)
    // must be dropped, audio row (media 2) never reaches the decoder.
    val script =
      """import sys, base64
        |for l in sys.stdin:
        |    b = base64.b64decode(l.strip())
        |    if len(b) == 13: print("garbage")
        |    else: print(len(b), 240, 12, 0.5)
        |    sys.stdout.flush()
        |""".stripMargin
    val media = Seq(
      MediaRow(1L, "video", Array.fill[Byte](200)(7)),
      MediaRow(2L, "audio", Array.fill[Byte](50)(1)),
      MediaRow(3L, "video", Array.fill[Byte](13)(2))).toDS()
    val feats = Multimodal.decodeVideoExternal(media,
      Seq("python3", "-c", script)).collect()
    assert(feats.toSeq == Seq(
      Multimodal.VideoFeatures(1L, 200, 240, 12L, 0.5)))
  }
}
