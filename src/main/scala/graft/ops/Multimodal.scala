package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with a
  * typed metadata struct, processed in BATCHED mapPartitions stages (the
  * Scala analog of `mapInPandas` — same contract: the operator sees an
  * iterator of batches, never one row at a time, so per-batch setup such as
  * a decoder context is amortized).
  *
  * The IMAGE path is real end-to-end: payloads are actual binary PPM (P6)
  * files (BMP also accepted), decoded to pixels by ImageCodec, with
  * features extracted from a luminance histogram and resize operating on
  * decoded pixels. The AUDIO path is real too: payloads are actual
  * RIFF/WAVE PCM-16 files decoded to samples by AudioCodec, features from
  * an amplitude histogram. The VIDEO path is real for uncompressed
  * YUV4MPEG2 (Y4M) streams (VideoCodec: luma-plane histograms, real frame
  * sampling) AND for LZW-compressed animated GIF87a/89a (GifCodec: full
  * LZW + compositing decode). Native-codec video (H.264 & co.) remains
  * the one declared stub — those codecs genuinely need native libraries
  * this container lacks — and falls through to a deterministic fake, with
  * everything Spark-side (schema, binary column plumbing, batch shape,
  * partitioning, feature-column contract) real and tested either way.
  */
object Multimodal {

  case class MediaMeta(width: Int, height: Int, channels: Int,
      sampleRate: Int, durationMs: Int)

  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
      meta: MediaMeta)

  case class MediaFeatures(media_id: Long, kind: String, features: Seq[Float])

  case class Frame(media_id: Long, frame_idx: Int, payload: Array[Byte])

  /** Deterministic synthetic media table (seeded per id): payload bytes are
    * a pure function of the id; kind cycles image/audio/video. Image rows
    * carry a REAL binary PPM whose pixels are a deterministic gradient +
    * noise pattern — the decode path exercises an actual codec. */
  def syntheticMedia(spark: SparkSession, n: Long): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val rng = new scala.util.Random(i * 2654435761L + 17)
      kind match {
        case "image" =>
          val w = 16 + rng.nextInt(48)
          val h = 16 + rng.nextInt(48)
          val rgb = new Array[Byte](w * h * 3)
          var p = 0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              rgb(p) = ((x * 255 / w + rng.nextInt(32)) & 0xff).toByte
              rgb(p + 1) = ((y * 255 / h + rng.nextInt(32)) & 0xff).toByte
              rgb(p + 2) = (((x + y) * 128 / (w + h)) & 0xff).toByte
              p += 3; x += 1
            }
            y += 1
          }
          MediaRow(i, kind, ImageCodec.encodePpm(w, h, rgb),
            MediaMeta(w, h, 3, 0, 0))
        case "audio" =>
          // a REAL PCM-16 WAV: two-tone sine mixture + noise (seeded);
          // StrictMath keeps the waveform bit-identical across JVMs
          val sr = 8000
          val n = 160 + rng.nextInt(480)
          val f1 = 200 + rng.nextInt(1800)
          val a1 = 4000 + rng.nextInt(8000)
          val a2 = 1000 + rng.nextInt(4000)
          val samples = Array.tabulate(n) { t =>
            val v = a1 * StrictMath.sin(2 * StrictMath.PI * f1 * t / sr) +
              a2 * StrictMath.sin(2 * StrictMath.PI * (2 * f1) * t / sr) +
              (rng.nextInt(512) - 256)
            math.max(Short.MinValue, math.min(Short.MaxValue, v.toInt)).toShort
          }
          MediaRow(i, kind, AudioCodec.encodeWav(sr, samples),
            MediaMeta(0, 0, 1, sr, n * 1000 / sr))
        case _ =>
          val size = 256 + rng.nextInt(768)
          MediaRow(i, kind, Array.fill(size)(rng.nextInt(256).toByte),
            MediaMeta(128, 96, 3, 0, 1000 + rng.nextInt(9000)))
      }
    }
  }

  /** ===== STUB (native-codec video only: H.264 & co.) ===== Deterministic
    * fake "decode + feature extraction": a 16-bin byte histogram,
    * L1-normalized. A real deployment swaps ONLY this body for a codec
    * call (JNI/arrow batch); the operator contract (batched iterator in,
    * feature rows out) is the real, load-bearing part. Image, audio, Y4M
    * video AND animated-GIF video rows never reach this — they decode for
    * real via ImageCodec / AudioCodec / VideoCodec / GifCodec — except as
    * the malformed-payload fallback. */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Int](16)
    for (b <- payload) bins((b & 0xff) >> 4) += 1
    val total = math.max(1, payload.length)
    bins.map(_.toFloat / total)
  }

  /** Feature vector per row: images DECODE (PPM/BMP → pixels → 16-bin
    * luminance histogram), audio DECODES (PCM-16 WAV → samples → 16-bin
    * amplitude histogram); video falls through to the declared stub. A
    * payload that fails to decode also falls through — the operator never
    * throws on malformed media (quarantine-adjacent behavior). */
  def decodeFeatures(kind: String, payload: Array[Byte]): Array[Float] = {
    // Try is the contract's backstop: the codecs bounds-check in Long and
    // return None on malformed headers, but untrusted bytes in executor
    // code get defense in depth — a decode that still throws falls back,
    // never crashing the mapPartitions stage
    val decoded = scala.util.Try(kind match {
      case "image" =>
        ImageCodec.decode(payload).map { case (_, _, rgb) =>
          ImageCodec.luminanceHistogram(rgb)
        }
      case "audio" =>
        AudioCodec.decodeWav(payload).map { case (_, _, samples) =>
          AudioCodec.amplitudeHistogram(samples)
        }
      case "video" =>
        // REAL for uncompressed Y4M AND LZW-compressed GIF87a/89a
        // (luma-plane histogram — Y4M's Y plane and GIF's palette-derived
        // luma are both the BT.601 luminance the image path computes from
        // RGB); other compressed codecs fall through to the stub below
        VideoCodec.decodeY4m(payload)
          .orElse(GifCodec.decode(payload))
          .map { case (_, _, lumaPlanes) =>
            VideoCodec.lumaHistogram(lumaPlanes)
          }
      case _ => None
    }).toOption.flatten
    decoded.getOrElse(fakeDecodeFeatures(payload))
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
          MediaFeatures(m.media_id, m.kind,
            decodeFeatures(m.kind, m.payload).toSeq)
        }
      }
    }
  }

  /** Resize: REAL for decodable images — decode, nearest-neighbor resample
    * to fit `maxSide`, re-encode as PPM, update metadata. Undecodable
    * image payloads keep the old deterministic truncation fallback (the
    * schema contract either way). */
  def resizeImages(media: Dataset[MediaRow], maxSide: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.map { m =>
      if (m.kind != "image" || math.max(m.meta.width, m.meta.height) <= maxSide) m
      else scala.util.Try(ImageCodec.decode(m.payload)).toOption.flatten match {
        case Some((w, h, rgb)) =>
          val scale = maxSide.toDouble / math.max(w, h)
          val nw = math.max(1, (w * scale).toInt)
          val nh = math.max(1, (h * scale).toInt)
          val out = ImageCodec.resizeNearest(w, h, rgb, nw, nh)
          m.copy(payload = ImageCodec.encodePpm(nw, nh, out),
            meta = m.meta.copy(width = nw, height = nh))
        case None =>
          val scale = maxSide.toDouble / math.max(m.meta.width, m.meta.height)
          val nw = math.max(1, (m.meta.width * scale).toInt)
          val nh = math.max(1, (m.meta.height * scale).toInt)
          val keep = math.max(1, (m.payload.length * scale * scale).toInt)
          m.copy(payload = m.payload.take(keep),
            meta = m.meta.copy(width = nw, height = nh))
      }
    }
  }

  /** Frame sampling for video rows (flatMap expansion — the UDTF shape):
    * REAL for Y4M payloads — every `stride`-th DECODED luma frame becomes
    * one frame row; undecodable (compressed) payloads keep the
    * fixed-size-block fallback so the downstream schema contract holds
    * either way. */
  def sampleFrames(media: Dataset[MediaRow], stride: Int,
      frameBytes: Int = 64): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      scala.util.Try(VideoCodec.decodeY4m(m.payload)
        .orElse(GifCodec.decode(m.payload))).toOption.flatten match {
        case Some((_, _, lumaPlanes)) =>
          lumaPlanes.iterator.zipWithIndex
            .filter { case (_, idx) => idx % stride == 0 }
            .map { case (plane, idx) => Frame(m.media_id, idx, plane) }
        case None =>
          m.payload.grouped(frameBytes).zipWithIndex
            .filter { case (_, idx) => idx % stride == 0 }
            .map { case (block, idx) => Frame(m.media_id, idx, block) }
      }
    }
  }
}
