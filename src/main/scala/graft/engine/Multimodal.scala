package graft.engine

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north-star scope; BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extraction as partition-local
  * batch transforms.
  *
  * The decode step is a clearly-marked deterministic STUB — the codec
  * libraries don't exist in this container — but everything Spark-side
  * is real and tested: the schema, the binary column handling, the
  * `mapPartitions` batch shape (the Scala analogue of a Pandas UDF over
  * `mapInPandas`: one iterator in, one iterator out, per partition), and
  * the size-aware repartitioning that keeps executor memory bounded when
  * payloads are MBs each.
  */
object Multimodal {

  /** Typed row: payload + metadata, the schema a media lake table
    * carries per modality.
    */
  final case class MediaRow(
      media_id: Long,
      modality: String, // image | audio | video
      content: Array[Byte],
      mime: String,
      n_bytes: Long)

  final case class MediaFeatures(
      media_id: Long,
      modality: String,
      n_bytes: Long,
      features: Array[Float])

  /** Build a media table from any table with an id and a string payload
    * (driver testdata has no real media, so documents.text doubles as
    * payload bytes — the plumbing is identical for real codecs).
    */
  def fromText(docs: DataFrame, idCol: String, textCol: String,
      modality: String = "image"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      lit(modality).as("modality"),
      col(textCol).cast("binary").as("content"),
      lit(s"application/x-fake-$modality").as("mime"),
      length(col(textCol)).cast("long").as("n_bytes"))

  /** STUB decode ??? — replace with a real codec (JPEG/PNG/WAV/MP4
    * frame-sampling) when the native libs are present. Deterministic:
    * features are a fixed-length fold of the payload bytes, so tests and
    * oracles can rely on stable output. Signature and batch shape are
    * the real contract.
    */
  def decodeStub(content: Array[Byte], dim: Int = 16): Array[Float] = {
    val acc = new Array[Float](dim)
    var i = 0
    while (i < content.length) {
      acc(i % dim) += (content(i) & 0xff) / 255.0f
      i += 1
    }
    acc
  }

  /** Partition-local feature extraction: the Scala analogue of a Pandas
    * UDF over mapInPandas — batches stay inside the executor, one
    * iterator pass, no row-at-a-time UDF overhead, no driver collect.
    */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 16):
      Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        MediaFeatures(r.media_id, r.modality, r.n_bytes,
          decodeStub(r.content, dim))
      }
    }
  }

  /** Size-aware repartitioning: media payloads are orders of magnitude
    * wider than relational rows, so partition count follows total bytes
    * (~targetBytes per partition), not row count. At 100 TB this is the
    * difference between bounded executor memory and OOM.
    */
  def repartitionBySize(media: DataFrame, totalBytes: Long,
      targetBytes: Long = 128L << 20): DataFrame = {
    val parts = math.max(1, (totalBytes / targetBytes).toInt)
    media.repartition(parts, col("media_id"))
  }
}
