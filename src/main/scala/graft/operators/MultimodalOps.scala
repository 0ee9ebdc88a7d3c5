package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-parallel batches.
  *
  * This container has no codec libraries, so the *decode step itself* is a
  * clearly-marked deterministic STUB (`FakeDecoder`) — but everything
  * Spark-side is real and tested: the binary+metadata schema, the
  * mapPartitions batch shape (one decoder instance per partition, streaming
  * iterator, no collect), frame sampling, and per-frame featurization.
  * Swapping `FakeDecoder` for a real JNI/codec call changes no plumbing.
  */
object MultimodalOps {

  /** Decoded media metadata (what a real header parse would yield). */
  final case class MediaMeta(doc_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Int)

  /** Per-frame feature row. */
  final case class FrameFeature(doc_id: Long, frame_idx: Int,
      feature: Array[Float])

  /** STUB ??? — stand-in for an image/audio decoder. Derives deterministic
    * pseudo-metadata from the payload bytes; a real implementation would
    * parse the container header here (same signature, same partition
    * shape). */
  object FakeDecoder {
    private val formats = Array("jpeg", "png", "wav", "mp4")
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(payload)
      MediaMeta(
        doc_id = docId,
        format = formats(math.floorMod(h, formats.length)),
        width = 64 + math.floorMod(h >> 2, 1024),
        height = 64 + math.floorMod(h >> 12, 1024),
        n_frames = 1 + math.floorMod(payload.length, 30),
        n_bytes = payload.length)
    }
  }

  /** Attach an opaque binary payload column (test stand-in: the UTF-8 bytes
    * of `text`; in production this is the raw media blob column). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** Partition-parallel decode: one decoder per partition, streaming
    * iterator in/out (bounded memory, no driver involvement). */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize per-partition state here (decoder handle)
        it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) }
      }
  }

  /** Frame sampling: split the payload into fixed-size "frames" and keep
    * every `everyK`-th — the Spark shape of video frame extraction
    * (explode stays narrow; no shuffle). `frame_idx` is the ORIGINAL frame
    * position (0, k, 2k, …) so features map back to the source frame;
    * payloads shorter than one frame yield no frames at all. */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 16, everyK: Int = 4): DataFrame =
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"),
        (octet_length(col("payload")) / frameBytes).cast("int").as("nf"))
      .select(col("doc_id"),
        explode(
          when(col("nf") > 0,
            filter(
              transform(sequence(lit(0), col("nf") - 1), // nf >= 1 in this branch
                i => struct(i.as("frame_idx"),
                  substring(col("payload"), i * frameBytes + 1, lit(frameBytes))
                    .as("frame"))),
              s => s.getField("frame_idx") % everyK === 0))
            .otherwise(array().cast("array<struct<frame_idx:int,frame:binary>>")))
          .as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame").as("frame"))

  /** Resized media record. */
  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize STUB: a real implementation decodes, scales to
    * `targetW`×`targetH`, and re-encodes; the fake deterministically
    * resamples the byte stream to EXACTLY targetW×targetH "pixels" (down-
    * or up-sampling, like a real resize), so payload length always equals
    * the emitted dimensions. Null/empty payloads yield zero-filled output.
    * Partition-parallel, no shuffle. */
  def resize(docs: DataFrame, targetW: Int = 32, targetH: Int = 32): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val target = targetW * targetH
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          val out =
            if (bytes.isEmpty) new Array[Byte](target)
            else Array.tabulate(target)(i =>
              bytes((i.toLong * bytes.length / target).toInt))
          ResizedMedia(id, targetW, targetH, out)
        }
      }
  }

  /** Per-frame featurization STUB: a real pipeline would run an encoder on
    * the decoded frame; the fake derives a deterministic 8-dim vector from
    * the frame bytes. Partition-parallel, streaming. */
  def featurizeFrames(frames: DataFrame): Dataset[FrameFeature] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("doc_id"), col("frame_idx"), col("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, idx, bytes) =>
          val h = java.util.Arrays.hashCode(bytes)
          FrameFeature(id, idx,
            Array.tabulate(8)(d => ((h >> d) & 0xff) / 255.0f))
        }
      }
  }

  /** Declared query (SQL-expressible metadata subset): byte length, a
    * first-byte-derived format id, and a content hash over the payload. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    withBinaryPayload(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        pmod(ascii(col("text")), lit(4)).as("format_id"),
        md5(col("payload")).as("content_hash"))
      .orderBy(col("doc_id"))
}
