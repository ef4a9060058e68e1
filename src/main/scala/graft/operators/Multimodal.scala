package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, processed in partition-sized batches.
  *
  * The decode step is STUBBED (this environment ships no image/audio
  * codecs): [[decodeStub]] produces deterministic fake features from the
  * bytes. Everything around it — the media schema, binary metadata
  * extraction with codegen'd built-ins, and the batched `mapPartitions`
  * transform shape (the Scala analogue of `mapInPandas` batch processing)
  * — is real and tested, so a real decoder drops in by replacing one
  * function.
  */
object Multimodal {

  /** Schema of a media column: payload + typed metadata. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Wrap a binary payload column into the media struct. */
  def asMedia(bytes: org.apache.spark.sql.Column, mime: String): org.apache.spark.sql.Column =
    struct(bytes.as("bytes"), lit(mime).as("mime"),
      lit(null).cast(IntegerType).as("width"), lit(null).cast(IntegerType).as("height"))

  /** Cheap metadata over the payload — pure built-ins, no decode:
    * byte length + sha256 content hash (dedup key for media).
    */
  def binaryMeta(df: DataFrame, idCol: String, mediaCol: String): DataFrame =
    df.select(
      col(idCol),
      octet_length(col(s"$mediaCol.bytes")).cast("long").as("byte_len"),
      sha2(col(s"$mediaCol.bytes"), 256).as("content_sha256"),
      col(s"$mediaCol.mime").as("mime"))

  final case class MediaFeature(id: Long, dim: Int, value: Double)

  /** STUB decode + feature extraction, batched per partition (the real
    * implementation would hand each batch to a codec library). The fake
    * "feature" is a deterministic 4-bin byte histogram density — keeps the
    * batch shape, schema and partitioning contract of the real thing.
    */
  def decodeStub(df: DataFrame, idCol: String, mediaCol: String): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long").as("id"), col(s"$mediaCol.bytes").as("bytes"))
    implicit val enc = Encoders.product[MediaFeature]
    input.mapPartitions { rows: Iterator[Row] =>
      // batch loop: in a real decoder this is where a codec processes a
      // whole Arrow batch; here we fold bytes into a fixed histogram.
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Long](4)
        var i = 0
        while (i < bytes.length) { hist((bytes(i) & 0xff) / 64) += 1; i += 1 }
        val n = math.max(1, bytes.length).toDouble
        (0 until 4).map(d => MediaFeature(id, d, hist(d) / n))
      }
    }.toDF("id", "dim", "value")
  }

  /** Deterministic frame sampling stub: pick every `stride`-th byte offset
    * as a "frame" anchor — the real thing samples video frames; the
    * partition/batch plumbing is identical.
    */
  def frameSampleStub(df: DataFrame, idCol: String, mediaCol: String, stride: Int): DataFrame =
    df.select(col(idCol).cast("long").as("id"),
        octet_length(col(s"$mediaCol.bytes")).as("len"))
      .select(col("id"),
        explode(sequence(lit(0), greatest(col("len") - 1, lit(0)), lit(stride)))
          .as("frame_offset"))
}
