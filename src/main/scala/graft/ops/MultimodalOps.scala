package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed in vectorized batches via
  * `mapPartitions` (the JVM analogue of mapInPandas — per-partition batch
  * loop, fixed output schema, no per-row UDF dispatch).
  *
  * The actual codec decode is STUBBED (no image/audio libraries in this
  * container): `decodeStub` produces a deterministic fake feature vector
  * from the bytes. The Spark-side contract — schema, batching,
  * partitioning, null handling — is real and tested; swapping in a real
  * decoder touches only the marked function.
  */
object MultimodalOps {

  final case class MediaRow(media_id: Long, kind: String, bytes: Array[Byte],
                            width: Int, height: Int, sample_rate: Int)

  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                                 feature: Array[Float], frames_sampled: Int)

  /** Synthetic media table derived from a page/url set — binary payloads
    * are deterministic byte strings standing in for encoded frames. */
  def syntheticMedia(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val r = graft.pipeline.PageGen.mix64(seed + i)
      val kind = Seq("image", "audio", "video")((r % 3).toInt.abs)
      val len = 64 + (r % 192).toInt.abs
      val bytes = Array.tabulate[Byte](len)(j => (graft.pipeline.PageGen.mix64(r + j) & 0xFF).toByte)
      MediaRow(i, kind, bytes, 16 + (r % 64).toInt.abs, 16 + ((r >>> 7) % 64).toInt.abs,
        if (kind == "audio") 16000 else 0)
    }
  }

  /** STUB decode — replace with a real codec (??? in production builds).
    * Deterministic: feature[d] = mix of byte window sums. */
  def decodeStub(bytes: Array[Byte], dims: Int): Array[Float] = {
    val out = new Array[Float](dims)
    var i = 0
    while (i < bytes.length) {
      out(i % dims) += (bytes(i) & 0xFF) / 255.0f
      i += 1
    }
    out
  }

  /** Batched feature extraction: one pass per partition, reusing buffers —
    * the shape a Pandas-UDF/mapInPandas implementation would have. */
  def extractFeatures(media: Dataset[MediaRow], dims: Int = 8): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val feat = decodeStub(m.bytes, dims)
        val frames = m.kind match {
          case "video" => math.max(1, m.bytes.length / 32) // frame-sample stub
          case "audio" => math.max(1, m.bytes.length / 16)
          case _       => 1
        }
        MediaFeatures(m.media_id, m.kind, m.bytes.length, feat, frames)
      }
    }
  }

  /** Resize stub: emits metadata-updated rows (real impl re-encodes). */
  def resize(media: Dataset[MediaRow], w: Int, h: Int): DataFrame =
    media.toDF().withColumn("width", lit(w)).withColumn("height", lit(h))
}
