package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import graft.core.Hashing

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, processed batch-wise in
  * `mapPartitions` (the Scala analogue of a vectorized/pandas UDF:
  * each partition iterator is consumed in fixed-size batches so a real
  * decoder could amortize model/codec setup per batch).
  *
  * !!! The decode step itself is a STUB: no image/audio codecs exist in
  * this container. `decodeStub` derives deterministic fake features
  * from the bytes so the schema, partitioning, batch shape and
  * downstream joins are real and testable; swap `decodeBatch` for a
  * real codec (JNI/ONNX) without touching the plumbing. !!!
  */
object Multimodal {

  val FeatureDim = 16
  val BatchSize = 64

  case class MediaRow(id: Long, media: Array[Byte], mime: String)
  case class FeatureRow(id: Long, mime: String, n_bytes: Long, features: Array[Float])

  /** Wrap a binary column + metadata into the canonical media schema. */
  def asMedia(df: DataFrame, idCol: String, binCol: String, mimeCol: String): Dataset[MediaRow] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(binCol).as("media"),
      col(mimeCol).as("mime")).as[MediaRow]
  }

  /** STUB decode: deterministic pseudo-features from a byte-histogram
    * + hash mix. Stands in for image decode / audio feature-extract. */
  private def decodeBatch(batch: Array[MediaRow]): Array[FeatureRow] =
    batch.map { r =>
      val feats = new Array[Float](FeatureDim)
      if (r.media != null && r.media.nonEmpty) {
        var i = 0
        while (i < r.media.length) {
          feats((r.media(i) & 0xff) % FeatureDim) += 1.0f
          i += 1
        }
        val inv = 1.0f / r.media.length
        var d = 0
        while (d < FeatureDim) { feats(d) *= inv; d += 1 }
      }
      FeatureRow(r.id, r.mime, if (r.media == null) 0L else r.media.length.toLong, feats)
    }

  /** Batched feature extraction over partitions — the real Spark-side
    * plumbing (schema in/out, batch shape); only `decodeBatch` is fake. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[FeatureRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap(g => decodeBatch(g.toArray))
    }
  }

  /** STUB frame sampling: deterministic byte-range slices standing in
    * for video frame extraction — emits (id, frame_no, frame bytes). */
  def sampleFrames(media: Dataset[MediaRow], frames: Int = 4): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { r =>
      val len = if (r.media == null) 0 else r.media.length
      if (len == 0) Iterator.empty
      else (0 until frames).iterator.map { f =>
        val start = (len.toLong * f / frames).toInt
        val end = (len.toLong * (f + 1) / frames).toInt
        (r.id, f, java.util.Arrays.copyOfRange(r.media, start, math.max(start + 1, end)))
      }
    }.toDF("id", "frame_no", "frame")
  }
}
