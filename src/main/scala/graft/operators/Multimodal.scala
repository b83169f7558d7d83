package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media as opaque `binary` payloads plus typed
 * metadata, with decode / feature-extract / frame-sample stages.
 *
 * The Spark-side machinery is real — schema (binary + struct metadata),
 * per-partition batched processing via mapPartitions over a typed Dataset
 * (the Scala analogue of mapInPandas: one iterator per partition, no
 * per-row driver involvement, executor-parallel) — while the actual codec
 * is a STUB (this container ships no image/audio libraries): `decodeStub`
 * derives deterministic fake dimensions/frames from the payload bytes.
 * Swapping in a real codec touches only that one function.
 *
 * Scale notes: payloads never pass through a shuffle here — all stages are
 * map-side; metadata-only queries prune the binary column at the parquet
 * scan (columnar layout means the bytes aren't even read).
 */
object Multimodal {

  /** Typed media row: payload + metadata as it would land from ingestion. */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features (decode stub → per-frame byte statistics). */
  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      frame_means: Array[Double])

  /** Build a media table from documents: payload = UTF-8 bytes of the text
    * (a deterministic stand-in for image/audio blobs). */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 2 === 0, "image").otherwise("audio").as("kind"),
      col("text").cast("binary").as("payload"))

  /** STUB decode: pretend the payload is a media container. Deterministic
    * fake: width/height from the first bytes, 64-byte "frames". A real
    * implementation would call the codec here — signature stays identical. */
  private def decodeStub(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
    val w = 1 + (payload.headOption.getOrElse(0: Byte) & 0x3F)
    val h = 1 + (payload.lift(1).getOrElse(0: Byte) & 0x3F)
    val frames = payload.grouped(64).toArray
    (w, h, frames)
  }

  /** Decode + feature-extract, batched per partition (mapPartitions — the
    * Scala mapInPandas analogue: setup cost amortized per partition). */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      // per-partition setup (a real codec would init here, once)
      rows.map { r =>
        val (w, h, frames) = decodeStub(r.payload)
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = r.payload.length,
          width = w,
          height = h,
          n_frames = frames.length,
          frame_means = frames.map(f =>
            f.map(b => (b & 0xFF).toDouble).sum / f.length))
      }
    }
  }

  /** Frame sampling: keep every `stride`-th frame's mean (bounded output —
    * the shape a vision pipeline feeds to embedding models). */
  def sampleFrames(features: Dataset[MediaFeatures], stride: Int = 4): DataFrame = {
    val spark = features.sparkSession
    import spark.implicits._
    features.map { f =>
      (f.media_id, f.frame_means.zipWithIndex.collect {
        case (m, i) if i % stride == 0 => math.rint(m * 1e6) / 1e6
      })
    }.toDF("media_id", "sampled_frame_means")
  }

  /** Per-SAMPLED-FRAME exact statistics — the oracle-gated face of the
    * codec path: every `stride`-th frame of each decoded blob reports
    * its byte length, exact byte sum, and integer-micro mean. Unlike
    * [[sampleFrames]]' double means, every output here is an exact
    * BIGINT (sum and floor-divided micro mean, both nonnegative), so
    * the DuckDB oracle reproduces the mapPartitions decode→sample
    * pipeline bit-for-bit — the multimodal plumbing (typed Dataset,
    * per-partition codec setup, frame fan-out) is hash-gated, not just
    * spec-tested. Map-side flatMap: output rows ∝ frames/stride, no
    * shuffle before the result sort. */
  def sampleFrameStats(documents: DataFrame, stride: Int = 4): DataFrame = {
    val spark = documents.sparkSession
    import spark.implicits._
    mediaTable(documents).as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val (_, _, frames) = decodeStub(r.payload)
        frames.iterator.zipWithIndex.collect {
          case (f, i) if i % stride == 0 =>
            val s = f.map(b => (b & 0xFF).toLong).sum
            (r.media_id, i.toLong, f.length.toLong, s,
              s * 1000000L / f.length)
        }
      }
    }.toDF("media_id", "frame_idx", "frame_len", "frame_sum",
      "mean_micro")
      .orderBy(col("media_id"), col("frame_idx"))
  }

  /** Byte-range CHUNK PLAN for distributed decode — the scheduling read a
    * 100 TB media pipeline runs BEFORE touching payloads: each blob maps
    * to the [byte_start, byte_end) fetch ranges a decoder fleet pulls in
    * parallel (object-store range GETs). Pure arithmetic on the byte
    * length — in a production table `n_bytes` is a stored metadata
    * column, so the plan never reads a payload byte (columnar pruning);
    * here it derives from `length(payload)` on the synthetic blobs. The
    * explode fan-out is ceil(n_bytes / chunkBytes) rows per blob —
    * data-proportional output, map-side, no shuffle. */
  def mediaChunkPlan(documents: DataFrame,
      chunkBytes: Long = 256L): DataFrame =
    mediaTable(documents)
      .select(col("media_id"), col("kind"),
        length(col("payload")).cast("long").as("n_bytes"))
      .filter(col("n_bytes") > 0)
      .select(col("media_id"), col("kind"), col("n_bytes"),
        explode(sequence(lit(0L),
          expr(s"(n_bytes - 1) div ${chunkBytes}L"))).as("chunk_idx"))
      .select(col("media_id"), col("kind"), col("chunk_idx"),
        (col("chunk_idx") * chunkBytes).as("byte_start"),
        least(col("n_bytes"), (col("chunk_idx") + 1) * chunkBytes)
          .as("byte_end"))
      .orderBy(col("media_id"), col("chunk_idx"))

  /** Metadata/feature summary — the oracle-checked surface: byte length,
    * frame count, byte sum (exact integer — engine-portable, no float
    * rounding ambiguity), md5 digest. Pure column expressions (built-ins
    * plus the codegen'd ByteSum) — unlike the codec path, nothing here
    * needs per-partition setup, so the typed mapPartitions form it
    * replaces only paid encoder/decoder overhead per row. */
  def mediaSummary(documents: DataFrame): DataFrame = {
    import graft.functions.ByteOps.byte_sum
    mediaTable(documents).select(
      col("media_id"),
      col("kind"),
      length(col("payload")).cast("long").as("n_bytes"),
      ((length(col("payload")) + 63) / 64).cast("long").as("n_frames"),
      byte_sum(col("payload")).as("byte_sum"),
      md5(col("payload")).as("md5"))
      .orderBy(col("media_id"))
  }

  /** Per-media perceptual fingerprint bands — the aHash idea (mean-
    * threshold of downscaled cells) riding the decode path: the payload's
    * decoded bytes fold into 60 interleaved stripe means, each stripe
    * contributes one bit (stripe mean ≥ whole-media mean, both exact
    * toward-zero micro integers), giving a 60-bit fingerprint packed
    * like [[graft.operators.Dedup.simhashPairs]]'s. mapPartitions is the
    * codec seam ([[extractFeatures]]' contract): a real image pipeline
    * computes the same 60 cells from decoded pixels; the stripe fold
    * over payload bytes is the stub's deterministic stand-in. */
  private[graft] case class MediaPhash(media_id: Long, phash: Long)

  def perceptualHash(media: DataFrame): Dataset[MediaPhash] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRow].mapPartitions { rows =>
      rows.flatMap { r =>
        val bytes = r.payload
        if (bytes.isEmpty) None
        else {
          val sums = new Array[Long](60)
          val cnts = new Array[Long](60)
          var total = 0L
          var i = 0
          while (i < bytes.length) {
            val v = (bytes(i) & 0xFF).toLong
            val c = i % 60
            sums(c) += v; cnts(c) += 1; total += v
            i += 1
          }
          val thr = total * 1000000L / bytes.length
          var ph = 0L
          var c = 0
          while (c < 60) {
            val mean = if (cnts(c) == 0L) 0L else sums(c) * 1000000L / cnts(c)
            if (mean >= thr) ph |= (1L << c)
            c += 1
          }
          Some(MediaPhash(r.media_id, ph))
        }
      }
    }
  }

  /** Perceptual-hash near-dup pairs over the media corpus — the image/
    * audio twin of SimHash text dedup, and the multimodal pipeline's
    * core dedup primitive (exact byte dedup misses re-encoded copies; a
    * perceptual hash is robust to smooth perturbations by construction).
    * Same 4×15-bit pigeonhole banding as [[graft.operators.Dedup
    * .simhashPairs]]: Hamming ≤ 3 ⇒ at least one 15-bit chunk equal, so
    * candidates come from an equi-join on (chunk, value) — never the
    * O(n²) cross join — and the exact Hamming verify runs on candidates
    * only. Payloads never shuffle: the band relation carries three
    * integers per row. */
  def mediaPhashDups(documents: DataFrame, maxDist: Int = 3): DataFrame = {
    require(maxDist < 4, "pigeonhole banding assumes maxDist < bands")
    val ph = perceptualHash(mediaTable(documents)).toDF()
    val chunks = (0 until 4).map { c =>
      struct(lit(c).as("chunk"),
        shiftright(col("phash"), c * 15).bitwiseAND(0x7FFFL).as("cv"))
    }
    val banded = ph.select(col("media_id"), col("phash"),
      explode(array(chunks: _*)).as("bk"))
      .select(col("media_id"), col("phash"), col("bk.chunk"), col("bk.cv"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk") === col("b.chunk") && col("a.cv") === col("b.cv") &&
        col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id_a"), col("b.media_id").as("id_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("dist"))
      .filter(col("dist") <= maxDist)
      .distinct()
      .orderBy(col("id_a"), col("id_b"))
  }
}
