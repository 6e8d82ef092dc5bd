package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north star): image/audio/video
  * as opaque `binary` columns + typed metadata, with decode / feature-extract
  * / frame-sample stages.
  *
  * The decode step is a clearly-marked DETERMINISTIC FAKE (this environment
  * has no image/audio codecs): real Spark-side plumbing — schema, batch
  * shape, partition behavior — with a stand-in for the codec call. Swap
  * [[FakeCodec]] for a JNI/ONNX codec in production; nothing else changes.
  */
object Multimodal {

  /** media row: (id, media struct<bytes, mime>, meta struct<width, height, n_frames>) */
  def packFromText(docs: DataFrame, idCol: String, textCol: String,
                   mime: String = "image/fake"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      struct(
        encode(col(textCol), "utf-8").as("bytes"),
        lit(mime).as("mime")).as("media"),
      struct(
        (col(idCol) % 640).cast("int").as("width"),
        (col(idCol) % 480).cast("int").as("height"),
        (col(idCol) % 30 + 1).cast("int").as("n_frames")).as("meta"),
      col("source"))

  /** DETERMINISTIC FAKE decode: per-media scalar features derived from the
    * raw bytes — stands in for `decode(bytes) -> pixels -> features`.
    * Pure Column expressions, so the "model" stays inside codegen. */
  def decodeFeatures(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("source"), col("meta"),
      octet_length(col("media.bytes")).as("n_bytes"),
      ascii(substring(decode(col("media.bytes"), "utf-8"), 1, 1)).as("first_byte"),
      crc32(col("media.bytes")).as("checksum"))

  /** Frame sampling: one row per sampled frame index (every `everyN`th),
    * frame "decode" again a deterministic fake (hash of bytes + index). */
  def frameSample(media: DataFrame, everyN: Int = 5): DataFrame =
    media.select(col("media_id"), col("source"), col("media"),
        explode(sequence(lit(0), col("meta.n_frames") - 1, lit(everyN))).as("frame_idx"))
      .select(col("media_id"), col("source"), col("frame_idx"),
        xxhash64(col("media.bytes"), col("frame_idx")).as("frame_sig"))

  /** The batch-inference shape: partition-local micro-batches (as a GPU model
    * server would take), via mapPartitions + grouped — the Scala analogue of
    * a pandas-batch UDF. The "model" is [[FakeCodec.embed]]. */
  def batchEmbed(media: DataFrame, batchSize: Int = 64): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[(Long, Array[Byte])] = media
      .select(col("media_id").cast("long"), col("media.bytes")).as[(Long, Array[Byte])]
    ds.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        val embedded = FakeCodec.embed(batch.map(_._2).toArray) // one "model call" per batch
        batch.iterator.zip(embedded.iterator).map { case ((id, _), vec) => (id, vec) }
      }
    }.toDF("media_id", "embedding")
  }
}

/** Stand-in for the real codec/model runtime (none available here). */
object FakeCodec {
  /** Deterministic 8-dim "embedding" per byte payload. */
  def embed(batch: Array[Array[Byte]]): Array[Array[Float]] =
    batch.map { bytes =>
      val h = java.util.Arrays.hashCode(bytes)
      Array.tabulate(8)(i => ((h * (i + 1)).toFloat / Int.MaxValue))
    }
}
