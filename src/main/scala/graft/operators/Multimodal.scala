package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: opaque binary payloads with typed
  * metadata, plus a batched decode/feature-extract stage.
  *
  * Design (what a 100 TB media pipeline needs from the engine):
  *  - media is an opaque `BINARY` column + a `STRUCT` of metadata
  *    (format, width, height, n_bytes) — schema'd, prunable, never
  *    interpreted by Catalyst;
  *  - cheap features (sizes, header bytes, checksums) are pure
  *    expressions, computed scan-side;
  *  - real decode (image/audio codecs) runs partition-batched via
  *    `mapPartitions` over a typed Dataset — rows stream through the
  *    decoder in executor-local batches, nothing collects to the driver,
  *    and partitioning (`repartition(n)`) controls decoder parallelism
  *    independently of upstream shuffles.
  *
  * The decoder body here is a STUB: the container has no codec libraries,
  * so [[decodeStub]] derives a deterministic fake feature vector from the
  * payload bytes. The Spark-side plumbing — schema, typed batching,
  * partitioning — is the real, tested surface; swap `decodeStub` for a
  * JNI/codec call in production.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, payload: Array[Byte], format: String, width: Int, height: Int)
  final case class MediaFeatures(doc_id: Long, n_bytes: Int, mean_byte: Double, features: Array[Float])

  /** Pack a text table into a multimodal shape: payload = UTF-8 bytes of
    * `textCol`, metadata struct derived from it. Pure expressions.
    */
  def pack(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(
      col(idCol).as("doc_id"),
      encode(col(textCol), "UTF-8").as("payload"),
      struct(
        lit("text/plain").as("format"),
        (length(col(textCol)) % 1024).cast("int").as("width"),
        (length(col(textCol)) % 768).cast("int").as("height"),
        length(encode(col(textCol), "UTF-8")).cast("int").as("n_bytes")).as("meta"))

  /** Scan-side cheap features: byte length and first payload byte. */
  def headerFeatures(packed: DataFrame): DataFrame =
    packed.select(
      col("doc_id"),
      col("meta.n_bytes").as("n_bytes"),
      col("meta.width").as("width"),
      col("meta.height").as("height"),
      // first BYTE of the payload as an int via hex (a UTF-8 decode would
      // mangle real binary payloads — PNG magic 0x89 is not valid UTF-8);
      // empty payloads yield 0
      coalesce(conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("int"), lit(0)).as("first_byte"))

  /** 64-bit perceptual average-hash (aHash) of a binary payload — the
    * classic image near-dup fingerprint: 64 relative-position cells
    * (the 8x8-thumbnail step), bit j = cell mean above global mean, via
    * exact integer cross-multiplication (oracle-reproducible, no fp).
    * Exactly invariant to uniform brightness shift; robust to sparse
    * noise — i.e. to what a re-encode/recompress does. Native codegen'd
    * kernel ([[graft.functions.HashRuntime.aHash64]]), computed
    * scan-side: one long per payload, the payload itself never rides a
    * shuffle.
    */
  def aHash(payload: Column): Column = graft.functions.HashExprs.aHash64(payload)

  /** STUB re-encode: brightness shift + sparse saturating noise (see
    * [[graft.functions.HashRuntime.reencodeStub]]) — the deterministic
    * stand-in for "decode, recompress at different quality". Real
    * plumbing (binary-in/binary-out native expression), fake codec.
    */
  def reencodeStub(payload: Column, brightness: Int, noisePeriod: Int, noiseDelta: Int): Column =
    graft.functions.HashExprs.reencodeStub(payload, brightness, noisePeriod, noiseDelta)

  /** Perceptual-hash near-duplicate pairs over binary payloads: aHash
    * fingerprints + the pigeonhole Hamming chunk join of
    * [[SimHash.nearPairs]] (maxHamming+1 chunks; two fingerprints within
    * maxHamming bits must agree on a chunk — all candidates found with
    * (maxHamming+1) ids-only shuffled rows per doc, never all-pairs).
    * Output: (id_a, id_b, hamming), id_a < id_b. At 100 TB the hash is
    * computed while the media scan streams; only (id, long) pairs enter
    * the join, and a degenerate-payload guard (fp == 0 dropped) keeps
    * trivial media out of the buckets.
    */
  def phashPairs(df: DataFrame, idCol: String, payloadCol: String, maxHamming: Int): DataFrame =
    SimHash.nearPairs(
      df.select(col(idCol), aHash(col(payloadCol)).as("__fp")), idCol, "__fp", maxHamming)

  /** Per-frame perceptual hashes of a "video" payload: frame k is the
    * `frameSize`-byte slice at byte offset k*frameSize*stride (i.e.
    * every `stride`-th frame is sampled, [[frameSampleStub]]'s policy,
    * built with pure expressions so the hash stays in codegen);
    * trailing partial frames are dropped. Output: (idCol, k, h) — one
    * long per kept frame, the payload never leaves the scan.
    */
  def frameHashes(videos: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int, stride: Int): DataFrame = {
    require(frameSize >= 1 && stride >= 1, s"frameSize/stride must be >= 1")
    val span = frameSize * stride
    val n = length(col(payloadCol))
    videos.where(n >= frameSize)
      .select(col(idCol), col(payloadCol),
        explode(sequence(lit(0L),
          call_function("div", (n - frameSize).cast("long"), lit(span.toLong)))).as("k"))
      .select(col(idCol), col("k"),
        aHash(col(payloadCol).substr(
          (col("k") * span + 1).cast("int"), lit(frameSize))).as("h"))
  }

  /** Frame-fingerprint VOTING dedup for video-shaped media: two videos
    * match if >= `minVotes` sampled frames agree on (frame index,
    * perceptual hash) — the aligned-frame voting device video dedup
    * pipelines use (robust to per-frame noise: a corrupted frame loses
    * one vote, not the match). Output: (id_a, id_b, n_match, frames_a,
    * frames_b), id_a < id_b.
    *
    * Scale shape: one (k, h) equi self-join over ids-only frame rows —
    * never all-pairs; `maxFrameDf` drops degenerate (k, h) keys (a
    * boilerplate frame shared by B videos would fan candidates B ways —
    * the q95/MinHash bucket-cap reasoning) BEFORE the join; per-video
    * frame counts come from one idCol-sized agg.
    */
  def frameMatchPairs(videos: DataFrame, idCol: String, payloadCol: String,
      frameSize: Int, stride: Int, maxFrameDf: Int, minVotes: Int): DataFrame = {
    require(maxFrameDf >= 2, s"maxFrameDf must be >= 2, got $maxFrameDf")
    require(minVotes >= 1, s"minVotes must be >= 1, got $minVotes")
    val fr = frameHashes(videos, idCol, payloadCol, frameSize, stride)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nf = fr.groupBy(col(idCol)).agg(count(lit(1)).as("__nf"))
    val ok = fr.groupBy(col("k"), col("h")).agg(count(lit(1)).as("__c"))
      .where(col("__c") <= maxFrameDf).select(col("k"), col("h"))
    val kept = fr.join(ok, Seq("k", "h"), "left_semi")
    val m = kept.select(col(idCol).as("id_a"), col("k"), col("h"))
      .join(kept.select(col(idCol).as("id_b"), col("k"), col("h")), Seq("k", "h"))
      .where(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("n_match"))
      .where(col("n_match") >= minVotes)
    m.join(nf.select(col(idCol).as("id_a"), col("__nf").as("frames_a")), Seq("id_a"))
      .join(nf.select(col(idCol).as("id_b"), col("__nf").as("frames_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"), col("n_match"), col("frames_a"), col("frames_b"))
  }

  /** STUB decoder: a real implementation would hand `payload` to an image
    * /audio codec. This deterministic fake emits an 8-dim feature vector
    * of byte-histogram moments so downstream stages (similarity, dedup)
    * are exercised with realistic shapes.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val n = math.max(payload.length, 1)
    val feats = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      feats(i % 8) += (payload(i) & 0xff).toFloat / n
      i += 1
    }
    feats
  }

  /** Partition-batched decode: MediaRow -> MediaFeatures. `parallelism`
    * controls decoder task count (decoders are usually CPU-bound and want
    * more, smaller partitions than the upstream scan).
    */
  def decodeFeatures(spark: SparkSession, media: Dataset[MediaRow], parallelism: Int): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.repartition(parallelism).mapPartitions { rows =>
      // per-partition setup would open the codec once here
      rows.map { r =>
        val f = decodeStub(r.payload)
        // Long accumulator: an Int byte-sum overflows past ~8.4 MB of
        // payload (255 * 2^31/255 bytes) — exactly the large-media case
        val bsum = r.payload.foldLeft(0L)((a, b) => a + (b & 0xff))
        val mean = if (r.payload.isEmpty) 0.0 else bsum.toDouble / r.payload.length
        MediaFeatures(r.doc_id, r.payload.length, mean, f)
      }
    }
  }

  /** STUB resize: a real implementation re-encodes the image at (w, h).
    * The deterministic fake truncates/pads the payload to w*h bytes so
    * downstream size invariants hold and the batching shape is real.
    */
  def resizeStub(payload: Array[Byte], w: Int, h: Int): Array[Byte] =
    java.util.Arrays.copyOf(payload, w * h)

  /** STUB frame sampling: a real implementation decodes a video and
    * keeps every `stride`-th frame. The fake treats the payload as
    * `frameSize`-byte frames and keeps every stride-th slice —
    * deterministic, shape-faithful (N bytes -> ceil(frames/stride)
    * slices).
    */
  def frameSampleStub(payload: Array[Byte], frameSize: Int, stride: Int): Seq[Array[Byte]] =
    payload.grouped(frameSize).zipWithIndex.collect {
      // drop the trailing partial group — emitted "frames" must honor the
      // fixed-frame-size invariant downstream decoders assume
      case (frame, i) if i % stride == 0 && frame.length == frameSize => frame
    }.toSeq

  final case class FrameRow(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Partition-batched frame sampling: one input row fans out to its kept
    * frames (flatMap — streaming through the decoder, never materializing
    * all frames of a partition at once).
    */
  def sampleFrames(
      spark: SparkSession,
      media: Dataset[MediaRow],
      frameSize: Int,
      stride: Int,
      parallelism: Int): Dataset[FrameRow] = {
    import spark.implicits._
    media.repartition(parallelism).flatMap { r =>
      frameSampleStub(r.payload, frameSize, stride).zipWithIndex.map {
        case (f, i) => FrameRow(r.doc_id, i, f)
      }
    }
  }
}
