package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing for a training-data
  * pipeline: media travel as opaque `binary` columns with typed metadata,
  * and decode / feature-extract / frame-sample run as batched
  * per-partition functions (the Scala analog of `mapInPandas` batches —
  * one buffer reused per partition, schema declared up front).
  *
  * STUB BOUNDARY: this container ships no image/audio codecs, so `decode`
  * parses a deterministic synthetic container header instead of calling a
  * real codec — the function marked `decodeStub` is the single seam where
  * a real JNI/codec call would slot in. Everything around it (schema,
  * partitioning, batch shape, null handling) is real and tested.
  *
  * Synthetic container layout (big-endian):
  *   bytes 0-1  magic 0x4D4D ("MM")
  *   byte  2    kind: 0=image 1=audio 2=video
  *   bytes 3-4  width  (image/video) | sample-rate/1000 (audio)
  *   bytes 5-6  height (image/video) | channels (audio)
  *   bytes 7-8  n_frames
  *   bytes 9..  payload (the "pixels"/"samples")
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, blob: Array[Byte])
  case class MediaMeta(media_id: Long, kind: String, width: Int, height: Int,
                       n_frames: Int, payload_bytes: Int, valid: Boolean)
  case class MediaFeature(media_id: Long, kind: String, features: Array[Double])
  case class Frame(media_id: Long, frame_no: Int, frame: Array[Byte])

  private val kinds = Array("image", "audio", "video")

  /** Deterministic synthetic media corpus (pure function of (seed, id)). */
  def synthMedia(spark: SparkSession, n: Long, seed: Long = 42L): Dataset[Media] = {
    import spark.implicits._
    spark.range(n).mapPartitions(_.map { i =>
      val h = graft.data.Synth.mix64(seed ^ graft.data.Synth.mix64(i))
      val kind = (Math.floorMod(h, 3L)).toInt
      val w = 16 + Math.floorMod(h >>> 8, 64L).toInt
      val hgt = 16 + Math.floorMod(h >>> 16, 64L).toInt
      val frames = 1 + Math.floorMod(h >>> 24, 8L).toInt
      val payloadLen = 64 + Math.floorMod(h >>> 32, 192L).toInt
      val b = new Array[Byte](9 + payloadLen)
      b(0) = 0x4D; b(1) = 0x4D; b(2) = kind.toByte
      b(3) = (w >> 8).toByte; b(4) = w.toByte
      b(5) = (hgt >> 8).toByte; b(6) = hgt.toByte
      b(7) = (frames >> 8).toByte; b(8) = frames.toByte
      var j = 0
      var s = h
      while (j < payloadLen) {
        s = graft.data.Synth.mix64(s)
        b(9 + j) = (s & 0xFF).toByte
        j += 1
      }
      Media(i, kinds(kind), b)
    })
  }

  /** Decode stub: parse the synthetic header. A real implementation would
    * call an image/audio codec HERE (per partition, reusing one decoder
    * instance); malformed blobs yield valid=false rows, never exceptions. */
  private def decodeStub(id: Long, kind: String, blob: Array[Byte]): MediaMeta = {
    if (blob == null || blob.length < 9 || blob(0) != 0x4D || blob(1) != 0x4D)
      MediaMeta(id, kind, 0, 0, 0, if (blob == null) 0 else blob.length, valid = false)
    else {
      def u16(o: Int) = ((blob(o) & 0xFF) << 8) | (blob(o + 1) & 0xFF)
      MediaMeta(id, kind, u16(3), u16(5), u16(7), blob.length - 9, valid = true)
    }
  }

  /** Batched decode: one pass per partition, decoder state reusable. */
  def decode(media: Dataset[Media]): Dataset[MediaMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition "decoder" init would go here (codec handle, buffers)
      it.map(m => decodeStub(m.media_id, m.kind, m.blob))
    }
  }

  /** Feature extraction: normalized 16-bin byte histogram of the payload —
    * the stand-in for an embedding/feature model, batch-shaped like the
    * real thing (fixed-width Array[Double] per row). */
  def features(media: Dataset[Media], bins: Int = 16): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      val hist = new Array[Double](bins) // reused per partition, like a batch buffer
      it.map { m =>
        java.util.Arrays.fill(hist, 0.0)
        val payload = if (m.blob.length > 9) m.blob.drop(9) else Array.empty[Byte]
        payload.foreach(b => hist(((b & 0xFF) * bins) / 256) += 1.0)
        val tot = math.max(payload.length, 1)
        MediaFeature(m.media_id, m.kind, hist.map(_ / tot))
      }
    }
  }

  /** Frame sampling: split the payload into n_frames chunks and emit every
    * `stride`-th — the flatMap (generator) shape of video frame extraction. */
  def sampleFrames(media: Dataset[Media], stride: Int = 2): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val meta = decodeStub(m.media_id, m.kind, m.blob)
      if (!meta.valid || meta.n_frames == 0 || meta.payload_bytes == 0) Iterator.empty
      else {
        val payload = m.blob.drop(9)
        val sz = math.max(payload.length / meta.n_frames, 1)
        (0 until meta.n_frames by stride).iterator.map { f =>
          Frame(m.media_id, f,
            payload.slice(f * sz, math.min((f + 1) * sz, payload.length)))
        }
      }
    }
  }

  /** Roll-up used as a rows-only SparkEntry query: per-kind decode summary +
    * mean feature vector (exercises decode + features + agg end-to-end). */
  def summary(spark: SparkSession, n: Long = 2000, seed: Long = 42L): DataFrame = {
    val media = synthMedia(spark, n, seed)
    val meta = decode(media).toDF()
    val feat = features(media).toDF()
      .select(col("media_id"), explode(col("features")).as("f"))
      .groupBy(col("media_id")).agg(round(sum(col("f")), 6).as("fsum"))
    meta.join(feat, "media_id")
      .groupBy(col("kind"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("valid"), 1).otherwise(0)).as("n_valid"),
        round(avg(col("width")), 6).as("avg_w"),
        round(avg(col("height")), 6).as("avg_h"),
        round(avg(col("fsum")), 6).as("avg_fsum"))
  }
}
