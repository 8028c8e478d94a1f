package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract as
  * `mapPartitions` over a typed Dataset (the Scala analog of the
  * `mapInPandas` batch shape: one iterator per partition, bounded memory,
  * schema declared up front).
  *
  * Decode is REAL for images (JDK `javax.imageio`: PNG/JPEG/BMP/GIF),
  * audio (JDK `javax.sound.sampled`: WAV/PCM), and multi-frame animated
  * GIF frame sampling — see [[decodeImages]], [[resizeImages]],
  * [[decodeWav]], [[sampleFrames]]. Opaque video codecs (MP4/AV1 etc.)
  * have no JDK decoder, so video is covered two ways: the deterministic
  * fake-feature STUB ([[extractFeatures]]/[[frameSample]]) that the
  * oracle gate exercises on the codec-less fixtures, and the opt-in
  * [[decodeVideoExternal]] path that pipes payloads through any
  * user-supplied ffmpeg/ffprobe-like decoder via the Cmd pipe operator —
  * real decode without bundling a codec.
  */
object Multimodal {

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           width: Int, height: Int, checksum: String)

  /** Large-object / media-file scan (the reference's lo_open/loread
    * streaming, `dumpers/large_object.go:35,51-160`, as a datasource):
    * Spark's binaryFile source reads each blob with path/length/mtime
    * metadata; `pathGlobFilter` scopes media types. */
  def readBinaryFiles(spark: SparkSession, path: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(path)
      .select(col("path"), col("length"), col("content"))

  /** Attach a binary payload + media metadata to a text table (stand-in
    * for reading real media blobs; schema shape is what matters). */
  def asMedia(df: DataFrame, idCol: String, textCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("media_id"),
        (when(col(idCol) % 3 === 0, "image")
          .when(col(idCol) % 3 === 1, "audio").otherwise("video")).as("kind"),
        col(textCol).cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** FAKE-payload feature extraction for the codec-less fixture tables
    * (documents carry text, not media): deterministic pseudo-features
    * derived from the bytes, so the oracle can check the pipeline shape.
    * For REAL payloads use [[decodeImages]] / [[decodeWav]] below — same
    * decoder-per-partition batch shape, actual JDK codecs. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // STUB: real implementation would initialize a codec per partition
      // (e.g. libjpeg/ffmpeg binding) and decode each payload.
      rows.map { r =>
        val n = r.payload.length.toLong
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = n.toInt,
          width = ((n * 7) % 1024L).toInt + 1, // fake "decoded" dimensions
          height = ((n * 5) % 768L).toInt + 1,
          checksum = f"${n}%016x")
      }
    }
  }

  /** Resize of the FAKE decoded dimensions (fixture path) — the real
    * pixel resample for actual images is [[resizeImages]]; this variant
    * keeps the aspect-preserving math oracle-checkable on fake media. */
  def resize(features: Dataset[MediaFeatures], maxW: Int, maxH: Int): Dataset[MediaFeatures] = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      val scale = math.min(1.0, math.min(maxW.toDouble / f.width, maxH.toDouble / f.height))
      f.copy(width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt))
    }
  }

  /** Frame-sample stub: pick every `stride`-th byte as a fake "frame"
    * (shape of video frame-sampling: explode bounded samples per row). */
  def frameSample(media: Dataset[MediaRow], stride: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video")
      .flatMap { r =>
        r.payload.grouped(stride).zipWithIndex.take(8).map { case (chunk, i) =>
          (r.media_id, i, chunk.length)
        }
      }.toDF("media_id", "frame_no", "frame_bytes")
  }

  // ---------------------------------------------------------------------
  // REAL codecs (JDK-native, no external deps). One decoder per partition,
  // streaming iterator in/out — the exact execution shape a JNI-backed
  // libjpeg/ffmpeg implementation would use, but with javax.imageio /
  // javax.sound doing the work. Undecodable payloads are dropped (flatMap),
  // mirroring a training pipeline's corrupt-sample policy.
  // ---------------------------------------------------------------------

  case class ImageFeatures(media_id: Long, width: Int, height: Int,
                           channels: Int, mean_luma: Double)
  case class AudioFeatures(media_id: Long, sample_rate: Int, channels: Int,
                           frames: Long, duration_sec: Double, rms: Double)

  /** Real image decode + per-image stats via JDK ImageIO (PNG/JPEG/BMP/GIF).
    * mean_luma = average of (r+g+b)/3 over all pixels in [0,255]. */
  def decodeImages(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      System.setProperty("java.awt.headless", "true")
      rows.flatMap { r =>
        // ImageIO returns null for unrecognized formats but THROWS on
        // truncated/corrupt streams of a recognized format — both are
        // "corrupt sample, drop the row", never "fail the task".
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            var sum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
                x += 1
              }
              y += 1
            }
            Some(ImageFeatures(r.media_id, img.getWidth, img.getHeight,
              img.getRaster.getNumBands, sum / (img.getWidth.toLong * img.getHeight)))
          }
        } catch {
          case _: java.io.IOException | _: RuntimeException => None
        }
      }
    }
  }

  /** Real aspect-preserving resample (bilinear Graphics2D) into a bounding
    * box, re-encoded as PNG — payload out is a decodable image again. */
  def resizeImages(media: Dataset[MediaRow], maxW: Int, maxH: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      System.setProperty("java.awt.headless", "true")
      rows.flatMap { r =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.payload))
          if (img == null) None
          else {
            val scale = math.min(1.0,
              math.min(maxW.toDouble / img.getWidth, maxH.toDouble / img.getHeight))
            val (w, h) = (math.max(1, (img.getWidth * scale).toInt),
              math.max(1, (img.getHeight * scale).toInt))
            val out = new java.awt.image.BufferedImage(w, h,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, w, h, null)
            g.dispose()
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", bos)
            Some(r.copy(payload = bos.toByteArray))
          }
        } catch {
          case _: java.io.IOException | _: RuntimeException => None
        }
      }
    }
  }

  case class FrameFeatures(media_id: Long, frame_no: Int, width: Int, height: Int,
                           mean_luma: Double)

  /** Real frame sampling for multi-frame images (animated GIF — the one
    * moving-picture format the JDK can decode): every `stride`-th frame,
    * up to `maxFrames`, with per-frame stats. Same decoder-per-partition
    * shape as [[decodeImages]]; single-frame formats yield frame 0 only. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 2,
                   maxFrames: Int = 8): Dataset[FrameFeatures] = {
    require(stride >= 1 && maxFrames >= 1, "sampleFrames: positive stride/maxFrames")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      System.setProperty("java.awt.headless", "true")
      rows.flatMap { r =>
        try {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val readers = javax.imageio.ImageIO.getImageReaders(iis)
          if (!readers.hasNext) { iis.close(); Nil }
          else {
            val reader = readers.next()
            try {
              reader.setInput(iis)
              val n = reader.getNumImages(true)
              (0 until n by stride).take(maxFrames).map { i =>
                val img = reader.read(i) // throws IIOException on a corrupt frame
                var sum = 0.0
                var y = 0
                while (y < img.getHeight) {
                  var x = 0
                  while (x < img.getWidth) {
                    val rgb = img.getRGB(x, y)
                    sum += (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
                    x += 1
                  }
                  y += 1
                }
                FrameFeatures(r.media_id, i, img.getWidth, img.getHeight,
                  sum / (img.getWidth.toLong * img.getHeight))
              }
            } finally { reader.dispose(); iis.close() }
          }
        } catch {
          case _: java.io.IOException | _: RuntimeException => Nil
        }
      }
    }
  }

  case class VideoFeatures(media_id: Long, width: Int, height: Int,
                           n_frames: Long, duration_sec: Double)

  /** Opt-in REAL video decode through a user-supplied external decoder
    * (any ffmpeg/ffprobe-like binary or wrapper script) — closes the
    * no-JDK-video-codec gap by reusing the Cmd pipe operator
    * ([[graft.ops.Pipe]]) instead of bundling a codec, the same way the
    * reference delegates arbitrary per-row work to an external command
    * (`transformers/cmd.go:50-140`).
    *
    * Decoder contract (text driver, one process per PARTITION): each
    * stdin line is one base64-encoded video payload; the decoder writes
    * ONE line `width height n_frames duration_sec` (whitespace-separated)
    * per input line. Output that is missing fields or non-numeric drops
    * the row — the corrupt-sample policy of the JDK decoders above. A
    * wrapper for real ffprobe is a 3-line shell script; specs pin the
    * plumbing with a stand-in decoder so no codec ships in this repo. */
  def decodeVideoExternal(media: Dataset[MediaRow], decoder: Seq[String],
                          timeoutSec: Int = 0): Dataset[VideoFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    val in = media.toDF().filter(col("kind") === "video")
      .select(col("media_id").cast("string").as("media_id"),
        // Spark's base64 is MIME-chunked (CRLF every 76 chars) — strip
        // the breaks or the one-line-per-payload framing truncates at
        // the first chunk
        translate(base64(col("payload")), "\r\n", "").as("b64"))
    graft.ops.Pipe.through(in, decoder, "text",
        graft.ops.PipeOptions(affectedColumns = Seq("b64"), timeoutSec = timeoutSec))
      .select(col("media_id").cast("long").as("media_id"),
        split(trim(col("b64")), "\\s+").as("f"))
      // try_* variants: malformed decoder output (short line, non-numeric
      // field) must DROP the row, not fail the task under ANSI casts
      .select(col("media_id"),
        expr("try_cast(try_element_at(f, 1) AS INT)").as("width"),
        expr("try_cast(try_element_at(f, 2) AS INT)").as("height"),
        expr("try_cast(try_element_at(f, 3) AS BIGINT)").as("n_frames"),
        expr("try_cast(try_element_at(f, 4) AS DOUBLE)").as("duration_sec"))
      .filter(col("width").isNotNull && col("height").isNotNull &&
        col("n_frames").isNotNull && col("duration_sec").isNotNull)
      .as[VideoFeatures]
  }

  /** Real WAV/PCM decode via javax.sound: stream frames in 64 KiB chunks
    * (bounded memory per row) computing RMS over 16-bit signed samples
    * normalized to [-1, 1]. */
  def decodeWav(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val fmt = ais.getFormat
          // Only 8-bit unsigned / 16-bit signed PCM are decoded below;
          // 24/32-bit (or float) WAVs would produce garbage RMS if stepped
          // through with the wrong sample math — reject them instead.
          if (fmt.getSampleSizeInBits != 8 && fmt.getSampleSizeInBits != 16) {
            ais.close(); throw new javax.sound.sampled.UnsupportedAudioFileException(
              s"unsupported PCM sample size ${fmt.getSampleSizeInBits}")
          }
          val frames = ais.getFrameLength
          val bytesPerSample = fmt.getSampleSizeInBits / 8
          val buf = new Array[Byte](64 * 1024 - (64 * 1024) % math.max(1, fmt.getFrameSize))
          var sumSq = 0.0
          var n = 0L
          var read = ais.read(buf)
          while (read > 0) {
            var i = 0
            while (i + bytesPerSample <= read) {
              val s =
                if (bytesPerSample == 2) {
                  val lo = buf(i) & 0xFF; val hi = buf(i + 1)
                  (if (fmt.isBigEndian) ((buf(i) << 8) | (buf(i + 1) & 0xFF))
                   else ((hi << 8) | lo)).toShort / 32768.0
                } else (buf(i) & 0xFF) / 255.0 * 2 - 1 // 8-bit unsigned PCM
              sumSq += s * s
              n += 1
              i += bytesPerSample
            }
            read = ais.read(buf)
          }
          ais.close()
          // A truncated WAV reads short without throwing (the header's
          // frame count outruns the actual bytes) — that is a corrupt
          // sample, same policy as an undecodable one.
          if (frames >= 0 && n < frames * fmt.getChannels) None
          else Some(AudioFeatures(r.media_id, fmt.getSampleRate.toInt, fmt.getChannels,
            frames, frames / fmt.getSampleRate.toDouble,
            if (n == 0) 0.0 else math.sqrt(sumSq / n)))
        } catch {
          // Unrecognized container, unsupported bit depth, or a stream
          // that is recognized but corrupt mid-read — all drop the row.
          case _: javax.sound.sampled.UnsupportedAudioFileException => None
          case _: java.io.IOException => None
        }
      }
    }
  }
}
