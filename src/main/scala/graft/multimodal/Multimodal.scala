package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (binary) column plumbing.
  *
  * Real pipelines carry image/audio/video as opaque `binary` columns and
  * decode them in batched, vectorized UDFs (mapInPandas-style). The
  * decode libraries are not in this container, so `decodeStub` is a
  * deterministic fake — but the Spark-side plumbing is real: typed
  * Dataset, batched mapPartitions (one decoder init + batch loop per
  * partition, the shape a JNI/FFI decoder needs), explicit schema, and
  * no driver-side collection.
  */
object Multimodal {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte])
  case class DecodedMeta(doc_id: Long, byte_len: Int, width: Int, height: Int,
      format: String)

  /** STUB decode: in production this calls the image codec on the byte
    * buffer; here it derives metadata deterministically from the payload
    * so correctness is oracle-checkable. */
  private[multimodal] def decodeStub(id: Long, bytes: Array[Byte]): DecodedMeta = {
    val len = bytes.length
    DecodedMeta(id, len, len % 640, len % 480,
      (len % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webp" })
  }

  /** Batched decode over a binary column: partition-local, batch-shaped
    * (batchSize rows per decoder call), streaming iterators throughout. */
  def decodeMeta(docs: DataFrame, idCol: String, payloadCol: String,
      batchSize: Int = 64): Dataset[DecodedMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[BinaryDoc]
      .mapPartitions { it =>
        // one "decoder context" per partition, reused across batches
        it.grouped(batchSize).flatMap { batch =>
          batch.map(d => decodeStub(d.doc_id, d.payload))
        }
      }
  }

  /** Frame sampling plumbing: every `stride`-th byte of the payload is a
    * "frame" (stand-in for video frame extraction). Declarative explode —
    * distributes and prunes like any other lateral view. */
  def sampleFrames(docs: DataFrame, idCol: String, textCol: String,
      stride: Int): DataFrame = {
    // empty payloads emit NO frames: without the guard, sequence(0, -1)
    // evaluates with step -1 to [0, -1] and fabricates two bogus frames
    docs.select(col(idCol),
        expr(s"length($textCol)").as("_len"),
        posexplode(expr(
          s"CASE WHEN length($textCol) = 0 THEN cast(array() as array<int>) " +
          s"ELSE transform(sequence(0, cast(floor((length($textCol) - 1) / $stride) as int)), " +
          s"i -> ascii(substr($textCol, i * $stride + 1, 1))) END"))
          .as(Seq("frame_idx", "frame_byte")))
      .select(col(idCol), col("frame_idx"), col("frame_byte"))
  }
}
