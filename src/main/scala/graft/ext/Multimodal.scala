package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column support: media payloads travel as opaque `binary`
  * columns with typed metadata extracted by a per-partition batch decoder.
  *
  * The decode itself is imperative by nature (codec libraries), so this is
  * the one place the engine deliberately leaves Catalyst: a typed
  * `mapPartitions` whose iterator shape lets a real implementation batch
  * frames into a native decoder. The decoder here is a clearly-marked
  * deterministic STUB (this container ships no image/audio codecs); the
  * Spark-side plumbing — binary column, schema, encoders, partition-batch
  * signature — is real and is what the 100 TB path needs: decode
  * parallelism = partition count, no driver involvement, columnar binary
  * at rest.
  */
object Multimodal {

  /** Typed media-metadata row produced by the decoder. */
  case class MediaMeta(
      doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** STUB decoder: derives fake-but-deterministic media properties from an
    * md5 of the payload. A real build swaps `decodeBatch` for a codec call
    * with the identical signature; nothing upstream or downstream changes.
    */
  def decodeBatch(payloads: Iterator[(Long, Array[Byte])]): Iterator[MediaMeta] = {
    val md = MessageDigest.getInstance("MD5") // one instance per partition batch
    payloads.map { case (id, bytes) =>
      md.reset()
      val hex = md.digest(bytes).map("%02x".format(_)).mkString
      val hv = java.lang.Long.parseLong(hex.substring(0, 15), 16)
      MediaMeta(
        doc_id = id,
        n_bytes = bytes.length,
        width = (32 * (1 + hv % 8)).toInt,
        height = (32 * (1 + (hv / 8) % 8)).toInt,
        n_frames = (1 + hv % 16).toInt)
    }
  }

  /** Attach a binary payload column (here: utf-8 text bytes standing in
    * for image/audio payloads) and run the partition-batched decoder.
    */
  def extractMeta(spark: SparkSession, docs: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions(decodeBatch)
  }

  /** Resized media row: payload stays binary, dimensions carried as typed
    * metadata next to it — the at-rest shape for multimodal training data.
    */
  case class ResizedMedia(
      doc_id: Long, width: Int, height: Int, payload: Array[Byte])

  /** STUB resize: a real implementation decodes, scales to
    * (maxW, maxH)-bounded dimensions, re-encodes. The stub preserves the
    * payload and computes the bounded dimensions deterministically from
    * the decoder metadata — batch shape, schema, and partition parallelism
    * are the real thing.
    */
  def resize(spark: SparkSession, docs: DataFrame,
      maxW: Int, maxH: Int): Dataset[ResizedMedia] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val m = decodeBatch(Iterator((id, bytes))).next()
          val scale = math.min(1.0,
            math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
          ResizedMedia(id, (m.width * scale).toInt, (m.height * scale).toInt,
            bytes)
        }
      }
  }

  /** STUB frame sampling: emits every `stride`-th frame index of a fake
    * video payload as its own row (doc_id, frame_idx, frame payload) —
    * the explode-shaped decode a video pipeline needs, with deterministic
    * fake frame bytes (md5-keyed slice of the payload).
    */
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  def sampleFrames(spark: SparkSession, docs: DataFrame,
      stride: Int): Dataset[Frame] = {
    import spark.implicits._
    docs
      .select(col("doc_id").cast("long"), col("text").cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytes) =>
          val m = decodeBatch(Iterator((id, bytes))).next()
          (0 until m.n_frames by stride).map { f =>
            val start = (f * 7) % math.max(1, bytes.length)
            Frame(id, f, bytes.slice(start, math.min(bytes.length, start + 16)))
          }
        }
      }
  }
}
