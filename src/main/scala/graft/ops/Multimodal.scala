package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with a
  * typed metadata struct, processed in BATCHED mapPartitions stages (the
  * Scala analog of `mapInPandas` — same contract: the operator sees an
  * iterator of batches, never one row at a time, so per-batch setup such as
  * a decoder context is amortized).
  *
  * The actual codec work is STUBBED with deterministic fakes — the image /
  * audio libraries are not in this container — but everything Spark-side is
  * real and tested: the schema, the binary column plumbing, the batch
  * shape, the partitioning, and the feature-column contract downstream
  * consumers (Similarity.bruteForceTopK) rely on.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int,
      sampleRate: Int, durationMs: Int)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, features: Seq[Float])

  case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Deterministic synthetic media table (seeded per id): payload bytes are
    * a pure function of the id; kind cycles image/audio/video. */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val rng = new scala.util.Random(i * 2654435761L + 17)
      val size = 256 + rng.nextInt(768)
      val payload = Array.fill(size)(rng.nextInt(256).toByte)
      val meta = kind match {
        case "image" => MediaMeta(64 + rng.nextInt(192), 64 + rng.nextInt(192), 3, 0, 0)
        case "audio" => MediaMeta(0, 0, 1, 16000, 500 + rng.nextInt(4500))
        case _ => MediaMeta(128, 96, 3, 0, 1000 + rng.nextInt(9000))
      }
      MediaRow(i, kind, payload, meta)
    }
  }

  /** ===== STUB ===== Deterministic fake "decode + feature extraction":
    * a 16-bin byte histogram, L1-normalized. A real deployment swaps ONLY
    * the body of `fakeDecodeFeatures` for a codec call (JNI/arrow batch);
    * the operator contract (batched iterator in, feature rows out) is the
    * real, load-bearing part. */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Int](16)
    for (b <- payload) bins((b & 0xff) >> 4) += 1
    val total = math.max(1, payload.length)
    bins.map(_.toFloat / total)
  }

  val BatchSize = 64

  /** Batched feature extraction: `grouped(BatchSize)` inside mapPartitions
    * is the explicit batch shape (mapInPandas' batch semantics). */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(BatchSize).flatMap { batch =>
        // per-batch decoder setup would happen here (amortized)
        batch.iterator.map { m =>
          MediaFeatures(m.media_id, m.kind, fakeDecodeFeatures(m.payload).toSeq)
        }
      }
    }
  }

  /** ===== STUB ===== "Resize": real implementations re-encode the payload;
    * the fake scales metadata deterministically and truncates the payload
    * proportionally, preserving the schema contract. */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image" || math.max(m.meta.width, m.meta.height) <= maxSide) m
      else {
        val scale = maxSide.toDouble / math.max(m.meta.width, m.meta.height)
        val nw = math.max(1, (m.meta.width * scale).toInt)
        val nh = math.max(1, (m.meta.height * scale).toInt)
        val keep = math.max(1, (m.payload.length * scale * scale).toInt)
        m.copy(payload = m.payload.take(keep),
          meta = m.meta.copy(width = nw, height = nh))
      }
    }
  }

  /** Frame sampling for video rows: every `stride`-th fixed-size block of
    * the payload becomes one frame row (flatMap expansion — the UDTF
    * shape). */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      frameBytes: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, idx) => idx % stride == 0 }
        .map { case (block, idx) => Frame(m.media_id, idx, block) }
    }
  }
}
