package graft.llm

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` payloads with typed
  * metadata, processed per-partition in batches (the Scala analog of
  * mapInPandas). The container has no image/audio codecs, so the decode
  * step is a clearly-marked deterministic STUB — the Spark-side plumbing
  * (schema, payload packing, partition-batched iteration, feature output
  * shape) is real and tested.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], kind: String,
                            meta_len: Long)
  final case class MediaFeat(doc_id: Long, payload_len: Long, stub_feature: Long)

  /** Pack a text column as the opaque binary payload + metadata struct.
    * In a real pipeline this is the parquet `binary` column written at
    * ingest (image bytes, audio frames, …).
    */
  def packBinary(docs: DataFrame, idCol: String = "doc_id",
                 textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("bigint").as("doc_id"),
      col(textCol).cast("binary").as("payload"),
      lit("text/plain").as("kind"),
      length(col(textCol).cast("binary")).cast("bigint").as("meta_len"))

  /** STUB decode: a real deployment decodes/resizes/frame-samples here.
    * Deterministic fake so the batch plumbing is verifiable end-to-end:
    * feature = (len·31 + firstByte) mod 997.
    */
  private def decodeStub(payload: Array[Byte]): Long = {
    val firstByte = if (payload.nonEmpty) payload(0) & 0xff else 0
    (payload.length.toLong * 31 + firstByte) % 997
  }

  /** Per-partition batched feature extraction over the binary column —
    * the iterator shape is what a vectorized decode (mapInPandas /
    * mapPartitions with a native lib handle per partition) needs: one
    * expensive init per partition, streaming rows through it.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { it =>
      // per-partition init point (codec handle / model session goes here)
      it.map(m => MediaFeat(m.doc_id, m.payload.length.toLong, decodeStub(m.payload)))
    }.toDF()
  }

  /** Convenience: text table → packed binary → features. */
  def stubPipeline(docs: DataFrame): DataFrame =
    extractFeatures(packBinary(docs))

  /** UTF-8 byte length sanity helper used by tests. */
  def utf8Len(s: String): Int = s.getBytes(StandardCharsets.UTF_8).length
}
