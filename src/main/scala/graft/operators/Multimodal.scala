package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (SURVEY §2b): media as opaque `binary` columns
  * plus typed metadata, with the decode/feature-extract step batched per
  * partition (the shape a Pandas-UDF / mapInPandas pipeline has in
  * production). The actual codec is STUBBED — image/audio libs are not in
  * this container — with a deterministic fake so the Spark-side schema,
  * partitioning and batch plumbing are real and testable.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("payload", BinaryType),
    StructField("n_bytes", LongType)))

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes.
    * In production this column would be the raw image/audio bytes read from
    * a binary-file source (`spark.read.format("binaryFile")`).
    */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).cast("long").as("doc_id"),
      (when(col(idCol) % 2 === 0, "image").otherwise("audio")).as("media_type"),
      encode(col(textCol), "UTF-8").as("payload"),
      octet_length(encode(col(textCol), "UTF-8")).cast("long").as("n_bytes"))

  /** STUB decoder: deterministic fake of an image-decode. A real pipeline
    * swaps `decodeStub` for the codec call; everything around it (partition
    * batching, output schema, null passthrough) is production-shaped.
    */
  private def decodeStub(payload: Array[Byte]): (Long, Long, Long) = {
    // ??? real codec goes here; deterministic fake derived from the bytes:
    val checksum = payload.foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xFF)) % 1000000007L)
    val w = 16 + (checksum % 1920)
    val h = 16 + ((checksum / 7) % 1080)
    (w, h, checksum)
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("checksum", LongType)))

  /** Batched decode: one stub call per row, executed per partition — no
    * per-row task overhead, no driver involvement; the 100 TB path just
    * raises partition count.
    */
  // read nullable long columns as raw boxed values: getAs[Long] would unbox
  // a NULL to 0L, silently corrupting ids (and colliding with doc_id 0)
  private def raw(r: Row, name: String): Any = r.get(r.fieldIndex(name))

  def decode(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("doc_id", "media_type", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          if (payload == null) {
            // null passthrough: missing blobs keep their row, metadata null
            Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
              raw(r, "n_bytes"), null, null, null)
          } else {
            val (w, h, cs) = decodeStub(payload)
            Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
              raw(r, "n_bytes"), w, h, cs)
          }
        }
      }(enc)
  }

  /** Same decode with explicit intra-partition micro-batches — the batch
    * shape a Pandas-UDF/`mapInPandas` (or Arrow-batched JNI codec) pipeline
    * has: the codec is handed `batchSize` payloads at once and returns a
    * batch of results, amortizing per-call overhead. Output is identical to
    * [[decode]].
    */
  def decodeBatched(media: DataFrame, batchSize: Int): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("doc_id", "media_type", "payload", "n_bytes")
      .mapPartitions { rows =>
        rows.grouped(batchSize).flatMap { batch =>
          // a real pipeline passes the whole batch to the codec in one call
          val decoded = batch.map { r =>
            Option(r.getAs[Array[Byte]]("payload")).map(decodeStub)
          }
          batch.iterator.zip(decoded.iterator).map {
            case (r, Some((w, h, cs))) =>
              Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
                raw(r, "n_bytes"), w, h, cs)
            case (r, None) =>
              Row(raw(r, "doc_id"), r.getAs[String]("media_type"),
                raw(r, "n_bytes"), null, null, null)
          }
        }
      }(enc)
  }
}
