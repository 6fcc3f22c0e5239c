package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample stages as partition-parallel typed transforms.
  *
  * The actual codecs are STUBBED (this container has no image/audio
  * libraries): [[decodeStub]] derives deterministic fake features from
  * the bytes. Everything Spark-side — schema, batch shape, partition
  * parallelism, typed Encoders — is real and tested, so swapping the
  * stub for a JNI/ffmpeg call changes one function body.
  */
object Multimodal {

  /** media(media_id, kind, bytes BINARY, meta STRUCT) — the canonical
    * multimodal layout: opaque payload + queryable typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("bytes", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("tag", StringType, nullable = true))), nullable = false)))

  /** Build a media table from the documents fixture: the UTF-8 payload
    * stands in for an undecodable blob. Pure expressions → pushdown-safe. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      lit("text").as("kind"),
      encode(col("text"), "UTF-8").as("bytes"),
      struct(
        length(encode(col("text"), "UTF-8")).as("n_bytes"),
        col("source").as("tag")).as("meta"))

  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      checksum: Long, width: Int, height: Int)

  /** "Decode" each blob into features — a deterministic stand-in for an
    * image decode (checksum = byte sum; width/height from header bytes).
    * Runs as mapPartitions over the typed Dataset: the exact batch shape
    * a real decoder (or Pandas-UDF analog) needs — per-partition setup
    * amortized, no driver involvement, no shuffle. */
  def decodeStub(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // per-partition "codec init" would go here
        it.map { case (id, kind, bytes) =>
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          val w = if (bytes.length >= 1) (bytes(0) & 0xff) else 0
          val h = if (bytes.length >= 2) (bytes(1) & 0xff) else 0
          MediaFeatures(id, kind, bytes.length, sum, w, h)
        }
      }
  }

  final case class ResizedMedia(media_id: Long, kind: String, bytes: Array[Byte])

  /** Resize stub: keep every `factor`-th byte of the payload — the
    * deterministic stand-in for an image downscale. Same mapPartitions
    * batch shape as [[decodeStub]]: per-partition codec init point,
    * streaming iterator, binary-in/binary-out typed rows. */
  def resizeStub(media: DataFrame, factor: Int): Dataset[ResizedMedia] = {
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "kind", "bytes")
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, kind, bytes) =>
          val out = new Array[Byte]((bytes.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
          ResizedMedia(id, kind, out)
        }
      }
  }

  /** Frame-sample stub: byte offsets of every `stride`-th "frame" — the
    * plumbing (explode to one row per frame, bounded by payload size)
    * is what matters; a real impl yields decoded frames instead.
    * Zero-length payloads have no frames and emit NO rows — ceil(size /
    * stride) rows per doc, matching the oracle's `range(0, n_bytes,
    * stride)` which is empty for n_bytes = 0. */
  def frameSample(media: DataFrame, stride: Int): DataFrame =
    media.filter(col("meta.n_bytes") > 0)
      .select(col("media_id"),
        explode(sequence(lit(0), col("meta.n_bytes") - 1, lit(stride)))
          .as("frame_offset"))

  /** Metadata projection used by the oracle-checked query: everything
    * here is expressible over the raw text in DuckDB (octet_length,
    * ascii) so the binary plumbing gets a cell-exact check too. */
  def metaQuery(docs: DataFrame): DataFrame =
    fromDocuments(docs).select(
      col("media_id"), col("kind"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.tag").as("tag"),
      ascii(substring(decode(col("bytes"), "UTF-8"), 1, 1)).as("first_byte"))
}
