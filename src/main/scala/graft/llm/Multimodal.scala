package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extract as
  * `mapPartitions` over a typed Dataset (the Scala analog of the
  * `mapInPandas` batch shape: one iterator per partition, bounded memory,
  * schema declared up front).
  *
  * The decode step is a STUB — no image/audio codecs exist in this
  * container — but it is a *deterministic* fake (features derived from the
  * payload bytes), so the pipeline shape (schema, partitioning, batch
  * iteration, feature fan-out) is real and oracle-testable end-to-end.
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

  /** STUB decode/feature-extract: a real decoder would parse the payload
    * here (`???` boundary); the fake derives deterministic pseudo-features
    * from the bytes so downstream plumbing is exercised. Batch shape: one
    * process per partition, streaming iterator in/out — identical to how a
    * JNI/codec-backed implementation would run. */
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

  /** Resize stub: scale the fake decoded dimensions to fit a bounding box
    * (a real implementation would resample pixels here — `???` boundary;
    * the aspect-preserving math and the typed Dataset pipeline shape are
    * the real part). */
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
}
