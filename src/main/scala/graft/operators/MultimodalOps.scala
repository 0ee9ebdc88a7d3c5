package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, decoded/feature-extracted in partition-parallel batches.
  *
  * This container has no codec libraries, so the *decode step itself* is a
  * clearly-marked deterministic STUB (`FakeDecoder`) — but everything
  * Spark-side is real and tested: the binary+metadata schema, the
  * mapPartitions batch shape (one decoder instance per partition, streaming
  * iterator, no collect), frame sampling, and per-frame featurization.
  * Swapping `FakeDecoder` for a real JNI/codec call changes no plumbing.
  */
object MultimodalOps {

  /** Decoded media metadata (what a real header parse would yield). */
  final case class MediaMeta(doc_id: Long, format: String, width: Int,
      height: Int, n_frames: Int, n_bytes: Int)

  /** Per-frame feature row. */
  final case class FrameFeature(doc_id: Long, frame_idx: Int,
      feature: Array[Float])

  /** STUB ??? — stand-in for an image/audio decoder. Derives deterministic
    * pseudo-metadata from the payload bytes; a real implementation would
    * parse the container header here (same signature, same partition
    * shape). */
  object FakeDecoder {
    private val formats = Array("jpeg", "png", "wav", "mp4")
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val h = java.util.Arrays.hashCode(payload)
      MediaMeta(
        doc_id = docId,
        format = formats(math.floorMod(h, formats.length)),
        width = 64 + math.floorMod(h >> 2, 1024),
        height = 64 + math.floorMod(h >> 12, 1024),
        n_frames = 1 + math.floorMod(payload.length, 30),
        n_bytes = payload.length)
    }
  }

  /** Attach an opaque binary payload column (test stand-in: the UTF-8 bytes
    * of `text`; in production this is the raw media blob column). A
    * pre-existing `payload` column — a REAL blob — is left untouched. */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    if (docs.columns.contains("payload")) docs
    else docs.withColumn("payload", col("text").cast("binary"))

  /** Partition-parallel decode: one decoder per partition, streaming
    * iterator in/out (bounded memory, no driver involvement). */
  def decodeMeta(docs: DataFrame): Dataset[MediaMeta] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // real codecs initialize per-partition state here (decoder handle)
        it.map { case (id, bytes) => FakeDecoder.decode(id, bytes) }
      }
  }

  /** Frame sampling: split the payload into fixed-size "frames" and keep
    * every `everyK`-th — the Spark shape of video frame extraction
    * (explode stays narrow; no shuffle). `frame_idx` is the ORIGINAL frame
    * position (0, k, 2k, …) so features map back to the source frame;
    * payloads shorter than one frame yield no frames at all. */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 16, everyK: Int = 4): DataFrame =
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"),
        (octet_length(col("payload")) / frameBytes).cast("int").as("nf"))
      .select(col("doc_id"),
        explode(
          when(col("nf") > 0,
            filter(
              transform(sequence(lit(0), col("nf") - 1), // nf >= 1 in this branch
                i => struct(i.as("frame_idx"),
                  substring(col("payload"), i * frameBytes + 1, lit(frameBytes))
                    .as("frame"))),
              s => s.getField("frame_idx") % everyK === 0))
            .otherwise(array().cast("array<struct<frame_idx:int,frame:binary>>")))
          .as("f"))
      .select(col("doc_id"), col("f.frame_idx").as("frame_idx"),
        col("f.frame").as("frame"))

  /** Resized media record. */
  final case class ResizedMedia(doc_id: Long, width: Int, height: Int,
      payload: Array[Byte])

  /** Resize STUB: a real implementation decodes, scales to
    * `targetW`×`targetH`, and re-encodes; the fake deterministically
    * resamples the byte stream to EXACTLY targetW×targetH "pixels" (down-
    * or up-sampling, like a real resize), so payload length always equals
    * the emitted dimensions. Null/empty payloads yield zero-filled output.
    * Partition-parallel, no shuffle. */
  def resize(docs: DataFrame, targetW: Int = 32, targetH: Int = 32): Dataset[ResizedMedia] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val target = targetW * targetH
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytesOrNull) =>
          val bytes = if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          val out =
            if (bytes.isEmpty) new Array[Byte](target)
            else Array.tabulate(target)(i =>
              bytes((i.toLong * bytes.length / target).toInt))
          ResizedMedia(id, targetW, targetH, out)
        }
      }
  }

  /** Per-frame featurization STUB: a real pipeline would run an encoder on
    * the decoded frame; the fake derives a deterministic 8-dim vector from
    * the frame bytes. Partition-parallel, streaming.
    *
    * Feature d = md5-digest byte d of the frame, scaled to [0, 1] — md5
    * (not a JVM-specific hash) for the same reason as the round-9 MinHash
    * port: the vector is then reproducible in plain SQL
    * (`('0x' || substr(md5(frame), 2d+1, 2))::INT / 255.0`), so even the
    * stubbed featurizer path is oracle-checked end to end. The scale
    * divide goes through DOUBLE and narrows to the encoder's float32
    * (matching SQL `CAST(x/255.0 AS REAL)` by construction — direct
    * float division would double-round differently in rare cases). */
  def featurizeFrames(frames: DataFrame): Dataset[FrameFeature] = {
    val spark = frames.sparkSession
    import spark.implicits._
    frames.select(col("doc_id"), col("frame_idx"), col("frame"))
      .as[(Long, Int, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, idx, bytes) =>
          md.reset()
          val dg = md.digest(bytes)
          FrameFeature(id, idx,
            Array.tabulate(8)(d => ((dg(d) & 0xFF) / 255.0).toFloat))
        }
      }
  }

  /** Parsed container header (real, not stubbed): detected format plus
    * pixel dimensions where the container carries them. */
  final case class MediaHeader(doc_id: Long, format: String,
      width: Option[Int], height: Option[Int], n_bytes: Int)

  /** REAL container-header parsing — unlike the pixel decode (which needs
    * codec libraries and stays behind [[FakeDecoder]]), image dimensions
    * live in the first bytes of the container and parse with pure byte
    * arithmetic: PNG IHDR (big-endian at offset 16/20), JPEG SOF marker
    * scan, GIF logical screen descriptor (little-endian), BMP
    * BITMAPINFOHEADER. Anything else is "unknown" with null dimensions —
    * never an exception, so one corrupt blob cannot kill a 100 TB scan. */
  object HeaderParser {
    private def be32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) |
        ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    private def be16(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)
    private def le32(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
        ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
    private def le16(b: Array[Byte], o: Int): Int =
      (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

    /** (format, width, height); dimensions None when the format carries
      * none or the header is truncated. */
    def parse(b: Array[Byte]): (String, Option[Int], Option[Int]) = {
      if (b == null || b.length < 10) ("unknown", None, None)
      else if (b.length >= 24 && (b(0) & 0xff) == 0x89 && b(1) == 'P' &&
          b(2) == 'N' && b(3) == 'G')
        ("png", Some(be32(b, 16)), Some(be32(b, 20)))
      else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
        // JPEG: walk the marker segments to the first SOFn (which holds
        // the frame dimensions); DHT/DAC/RST/EOI are not SOF markers.
        var i = 2
        var out: (String, Option[Int], Option[Int]) = ("jpeg", None, None)
        var done = false
        while (!done && i + 9 < b.length && (b(i) & 0xff) == 0xff) {
          val m = b(i + 1) & 0xff
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            out = ("jpeg", Some(be16(b, i + 7)), Some(be16(b, i + 5)))
            done = true
          } else i += 2 + be16(b, i + 2)
        }
        out
      }
      else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8')
        ("gif", Some(le16(b, 6)), Some(le16(b, 8)))
      else if (b.length >= 26 && b(0) == 'B' && b(1) == 'M')
        ("bmp", Some(le32(b, 18)), Some(le32(b, 22)))
      else ("unknown", None, None)
    }
  }

  /** Partition-parallel REAL header parse over the payload column — same
    * streaming mapPartitions shape as [[decodeMeta]], but nothing here is
    * a stub: feed it genuine PNG/JPEG/GIF/BMP blobs and the dimensions
    * are the true ones (MultimodalSpec does exactly that with hand-built
    * headers). */
  def parseHeaders(docs: DataFrame): Dataset[MediaHeader] = {
    val spark = docs.sparkSession
    import spark.implicits._
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (fmt, w, h) = HeaderParser.parse(bytes)
          MediaHeader(id, fmt, w, h,
            if (bytes == null) 0 else bytes.length)
        }
      }
  }

  /** Declared query (SQL-expressible metadata subset): byte length, a
    * first-byte-derived format id, and a content hash over the payload. */
  def multimodalMeta(spark: SparkSession, dir: String): DataFrame =
    withBinaryPayload(Tables.documents(spark, dir))
      .select(
        col("doc_id"),
        octet_length(col("payload")).as("n_bytes"),
        pmod(ascii(col("text")), lit(4)).as("format_id"),
        md5(col("payload")).as("content_hash"))
      .orderBy(col("doc_id"))

  /** q_frame_sample: the declared face of [[sampleFrames]] — every 4th
    * 16-byte "frame" of each payload, reported as (frame_idx, size, md5).
    * The frame digest is what a real video pipeline ships downstream
    * (frame-level dedup, perceptual-hash joins); the md5 here doubles as
    * the oracle handle, since the payload is the UTF-8 text and the corpus
    * is pure ASCII, so DuckDB's substring+md5 reproduces the byte slices
    * exactly. Narrow scan + bounded explode — no shuffle at any size. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    sampleFrames(Tables.documents(spark, dir))
      .select(col("doc_id"), col("frame_idx"),
        octet_length(col("frame")).as("n_bytes"),
        md5(col("frame")).as("frame_hash"))
      .orderBy(col("doc_id"), col("frame_idx"))

  /** q_frame_features: the declared face of [[featurizeFrames]] — sampled
    * frames through the per-partition featurizer, 8-dim vectors flattened
    * to columns. Oracle-checked since the round-9 md5 featurizer port
    * (digest-byte features are plain SQL; the float32 narrowing is
    * reproduced with CAST(... AS REAL)); MultimodalSpec keeps the shape,
    * determinism and range pins, and the frame sampling underneath is
    * the same path q_frame_sample hash-checks. */
  def frameFeatures(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    import graft.functions.NumericFunctions.stableRound4
    val outCols = Seq(col("doc_id"), col("frame_idx")) ++
      (0 until 8).map(d => stableRound4(
        element_at(col("feature"), d + 1).cast("double")).as(s"f$d"))
    featurizeFrames(sampleFrames(Tables.documents(spark, dir)))
      .toDF()
      .select(outCols: _*)
      .orderBy(col("doc_id"), col("frame_idx"))
  }

  /** q_resize_meta: the declared face of [[resize]] — every payload
    * deterministically resampled to a fixed 32×32 "pixel" budget, reported
    * as (dims, content digest). The digest doubles as the oracle handle:
    * the fake resample picks byte (i·len)/1024 for output position i, which
    * DuckDB reproduces with substring arithmetic on the ASCII corpus, so
    * the partition-parallel mapPartitions path is hash-checked end-to-end
    * (empty payloads are excluded on both sides — the zero-fill branch has
    * no string representation in SQL). */
  def resizeMeta(spark: SparkSession, dir: String): DataFrame = {
    val spark2 = spark
    import spark2.implicits._
    resize(Tables.documents(spark, dir).filter(col("n_chars") > 0))
      .toDF()
      .select(col("doc_id"), col("width"), col("height"),
        md5(col("payload")).as("payload_hash"))
      .orderBy(col("doc_id"))
  }

  /** Perceptual-hash record (60-bit average hash). */
  final case class PHash(doc_id: Long, phash: Long)

  /** Pixel-level perceptual hash (average-hash recipe): resample the
    * decoded payload to a fixed `bits`-pixel grayscale thumbnail — the
    * same deterministic byte resample as [[resize]]; a real build decodes
    * and luma-converts here, changing no plumbing — then bit i = pixel i
    * brighter than the thumbnail mean, packed into a 60-bit fingerprint
    * (60 = the width that stays a non-negative BIGINT in every engine,
    * matching the SimHash convention). The mean compare is INTEGER
    * arithmetic (pixel·bits > Σpixels), so no float ever crosses an
    * engine boundary and the DuckDB oracle reproduces the fingerprint
    * bit-for-bit with substring/ascii arithmetic. Empty payloads are
    * excluded (same contract as [[resizeMeta]] — the zero-fill branch has
    * no string representation in SQL). Partition-parallel map, no
    * shuffle: at 100 TB the hash stage runs at decode speed. */
  def phashMedia(docs: DataFrame, bits: Int = 60): Dataset[PHash] = {
    val spark = docs.sparkSession
    import spark.implicits._
    require(bits <= 60, "fingerprint must fit a non-negative 64-bit long")
    withBinaryPayload(docs)
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, bytesOrNull) =>
          val bytes =
            if (bytesOrNull == null) Array.empty[Byte] else bytesOrNull
          if (bytes.isEmpty) None
          else {
            val px = Array.tabulate(bits)(i =>
              bytes((i.toLong * bytes.length / bits).toInt) & 0xFF)
            var s = 0L
            var i = 0
            while (i < bits) { s += px(i); i += 1 }
            var h = 0L
            i = 0
            while (i < bits) {
              if (px(i).toLong * bits > s) h |= (1L << i)
              i += 1
            }
            Some(PHash(id, h))
          }
        }
      }
  }

  /** q_phash_dedup: pixel-level media near-dup — the Manku-style
    * Hamming-band join ([[DedupOps.hammingBandPairs]], 4×15-bit bands,
    * exact for distance ≤ 3) over [[phashMedia]] fingerprints, reported
    * PER ITEM: each doc's cluster representative = min(doc_id) among
    * {self} ∪ Hamming-≤3 neighbors, plus the neighbor count — always
    * |docs| output rows. The per-item contract is deliberate: the
    * ScaleSpot gate measured the pair-enumerating form at 20M output rows
    * on the 100× corpus (perceptual fingerprints are insensitive to
    * small text edits — that's their JOB — so near-dup cluster sizes grow
    * with the corpus and pair output is inherently quadratic in them;
    * the same output-bound failure mode q_dedup_embed_lsh documents).
    * The map-side partial aggregation collapses pair rows before the
    * shuffle, so neither shuffle nor result scales with pair count.
    *
    * This is the MEDIA-side complement of q_caption_dedup(_lsh): caption
    * dedup catches same-image-different-caption; pHash catches
    * re-encoded / slightly-retouched copies of the same pixels that
    * byte-exact dedup misses. Oracle-checked end to end (resample,
    * integer-mean bits, banding, bit_count verify are all plain SQL on
    * the ASCII stand-in corpus); MultimodalSpec pins the hand-computed
    * fingerprint, identical-payload collision, and agreement with an
    * all-pairs Hamming driver recompute. */
  def phashDedup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir).filter(col("n_chars") > 0)
    val sigs = Materialize(phashMedia(docs).toDF())
    val pairs = DedupOps.hammingBandPairs(
      sigs.select(col("doc_id"), col("phash").as("sig")), maxHamming = 3)
    val edges = pairs.select(col("da").as("doc_id"), col("db").as("nbr"))
      .union(pairs.select(col("db").as("doc_id"), col("da").as("nbr")))
    // the fingerprint itself is part of the declared output: on a corpus
    // with no near-dup pair the rep/count columns are trivially
    // self-valued in BOTH engines, so without the phash column the oracle
    // would be vacuous about fingerprint agreement (the round-9 review's
    // integer-division bug hid behind exactly that) — exposing it makes
    // every row a 60-bit cross-engine check at every SF
    sigs.select(col("doc_id"), col("phash"))
      .join(edges, Seq("doc_id"), "left")
      .groupBy(col("doc_id"), col("phash"))
      .agg(
        least(min(col("nbr")), col("doc_id").cast("long")).as("cluster_rep"),
        sum(when(col("nbr").isNotNull, 1L).otherwise(0L)).as("n_near_dups"))
      .orderBy(col("doc_id"))
  }

  /** q_caption_dedup: cross-modal curation — find item pairs whose
    * EMBEDDINGS near-duplicate while their TEXTS do not: the "same image,
    * different caption" (or paraphrase) inventory an image-text or
    * instruction corpus mines for caption consolidation, and the
    * complement of what shingle dedup can see. `vec_id = doc_id` is the
    * container's stand-in for the media↔caption key a real pipeline
    * carries.
    *
    * Shape: the top-k exact cosine pairs come from
    * [[DedupOps.embeddingTopPairs]] (blocked distributed pass; the LSH
    * path is the declared scale sibling there), then ONE broadcast-sized
    * join back to `documents` per side fetches the two shingle sets, and
    * the text-side Jaccard is computed per pair with codegen'd
    * array_intersect/array_union — k rows of narrow work, no text×text
    * join anywhere. */
  def captionDedup(spark: SparkSession, dir: String, k: Int = 20)
      : DataFrame =
    captionJoin(spark, dir,
      DedupOps.embeddingTopPairs(Tables.embeddings(spark, dir), k))
      .orderBy(col("cos_sim").desc, col("va"), col("vb"))

  /** The scale sibling of [[captionDedup]] (the measured convention:
    * q_caption_dedup's exact top-k core is the quadratic contrast
    * baseline, SCALE.md e=1.63 at 100× vectors) — same caption join, but
    * candidate pairs come from the LSH sign-bucket join, so only same-
    * bucket pairs are ever scored and the plan scales with bucket
    * populations, not |V|². Oracle-proven since round 9 (plane-literal
    * bucket SQL, SparkEntry.embedBucketCtes); SimilaritySpec keeps the
    * subset-of-exact agreement pin. */
  def captionDedupLsh(spark: SparkSession, dir: String,
      threshold: Double = 0.25, numPlanes: Int = 6): DataFrame =
    captionJoin(spark, dir,
      DedupOps.embeddingNearDupLsh(
        Tables.embeddings(spark, dir), threshold, numPlanes))
      .orderBy(col("va"), col("vb"))

  /** q_audio_trim: windowed-energy silence trimming — the audio-pipeline
    * pass that drops leading/trailing silence and reports how much of a
    * clip is silent (VAD's cheap cousin, run before any ASR/captioning
    * stage). As with [[FakeDecoder]], the PCM decode is the documented
    * offline stand-in — the "sample stream" is the token-length sequence
    * of the payload text (a real build decodes the blob to amplitudes
    * here; every downstream expression is unchanged). The analysis is
    * real: non-overlapping 16-sample windows, RMS energy per window
    * (exact integer sum of squares → one sqrt), a silence threshold, the
    * silent-window fraction, and first/last non-silent window as the trim
    * pointers (−1 sentinels when the clip is all-silent or shorter than
    * one window). Everything is higher-order array functions on ONE
    * narrow scan — no explode, no shuffle, no window function; at 100 TB
    * this runs at parquet-scan speed. */
  def audioTrim(spark: SparkSession, dir: String, windowSize: Int = 16,
      silenceRms: Double = 4.5): DataFrame = {
    import graft.functions.TextFunctions.tokens
    val samples = transform(tokens(col("text")), t => length(t))
    val df = Tables.documents(spark, dir)
      .select(col("doc_id"), samples.as("s"))
      .select(col("doc_id"), size(col("s")).as("n_samples"),
        (size(col("s")) / windowSize).cast("int").as("nw"), col("s"))
      .select(col("doc_id"), col("n_samples"), col("nw"),
        when(col("nw") > 0, transform(sequence(lit(0), col("nw") - 1),
          w => sqrt(
            aggregate(slice(col("s"), w * windowSize + 1, lit(windowSize)),
              lit(0L), (acc, x) => acc + x.cast("long") * x)
              .cast("double") / windowSize)))
          .otherwise(array().cast("array<double>")).as("rms"))
      .select(col("doc_id"), col("n_samples"), col("nw").as("n_windows"),
        when(col("nw") > 0,
          filter(sequence(lit(0), col("nw") - 1),
            w => element_at(col("rms"), w + 1) >= silenceRms))
          .otherwise(array().cast("array<int>")).as("voiced"))
    df.select(col("doc_id"), col("n_samples"), col("n_windows"),
      graft.functions.NumericFunctions.stableRound4(
        when(col("n_windows") > 0,
          (col("n_windows") - size(col("voiced"))).cast("double")
            / col("n_windows")).otherwise(0.0)).as("silence_frac"),
      when(size(col("voiced")) > 0, element_at(col("voiced"), 1))
        .otherwise(lit(-1)).as("trim_start"),
      when(size(col("voiced")) > 0, element_at(col("voiced"), -1))
        .otherwise(lit(-1)).as("trim_end"))
      .orderBy(col("doc_id"))
  }

  /** Scene-cut L1 threshold (q_video_scene) — shared with the oracle.
    * The stub features are 8 iid U[0,1] dims (L1 mean 8/3 ≈ 2.67,
    * σ ≈ 0.67), so 3.5 ≈ mean + 1.25σ tags the upper tail as cuts. */
  val SceneCutThreshold = 3.5

  /** q_video_scene: shot-boundary detection — the video-pipeline pass
    * that segments a clip into scenes before per-scene sampling or
    * captioning. Consecutive SAMPLED frames (the [[sampleFrames]] stream)
    * are compared by L1 distance over their [[featurizeFrames]] vectors;
    * a distance above [[SceneCutThreshold]] is a cut, and the declared
    * report is per-clip: frame count, scene count (cuts + 1), first cut
    * position. As everywhere in this module the decoder is the
    * documented stand-in; the windowed delta logic downstream is the
    * real thing and runs unchanged on real encoder features.
    *
    * Determinism: features are the 4-dp stable-rounded digest dims the
    * q_frame_features oracle already replays; the L1 is a chained
    * fixed-order sum of 8 absolute differences of those identical
    * doubles, so the cut decisions are bit-stable across engines. Scale
    * shape: decode/featurize is partition-parallel; the only shuffle is
    * the per-clip window (partitionBy doc_id — millions of independent
    * tiny partitions) plus the per-clip aggregate. */
  def videoScene(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.NumericFunctions.stableRound4
    val f = featurizeFrames(sampleFrames(Tables.documents(spark, dir))).toDF()
    val feats = f.select(
      Seq(col("doc_id"), col("frame_idx")) ++
        (0 until 8).map(d => stableRound4(
          element_at(col("feature"), d + 1).cast("double")).as(s"f$d")): _*)
    val w = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    val l1 = (0 until 8)
      .map(d => abs(col(s"f$d") - lag(col(s"f$d"), 1).over(w)))
      .reduce(_ + _)
    feats
      .withColumn("cut", when(l1 > lit(SceneCutThreshold), 1).otherwise(0))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_frames"),
        (sum(col("cut")) + 1).cast("int").as("n_scenes"),
        coalesce(min(when(col("cut") === 1, col("frame_idx"))), lit(-1))
          .as("first_cut_idx"))
      .orderBy(col("doc_id"))
  }

  /** q_audio_vad: voice-activity segmentation — the full gaps-and-islands
    * companion to [[audioTrim]] (which only reports the outer trim
    * pointers): how many CONTIGUOUS voiced segments a clip has, the
    * longest one, and the voiced fraction — the stats an ASR pipeline
    * uses to split clips and drop dead air. Same documented stand-in
    * sample stream and the same windowed-RMS voiced set as audioTrim;
    * the segmentation itself is a pure array fold over the sorted voiced
    * window indices (runs break where consecutive indices differ by more
    * than 1) — exact integer state, no window function, no shuffle: at
    * 100 TB this stays parquet-scan-bound like the trim pass. */
  def audioVad(spark: SparkSession, dir: String, windowSize: Int = 16,
      silenceRms: Double = 4.5): DataFrame = {
    import graft.functions.TextFunctions.tokens
    import graft.functions.NumericFunctions.stableRound4
    val samples = transform(tokens(col("text")), t => length(t))
    val df = Tables.documents(spark, dir)
      .select(col("doc_id"), samples.as("s"))
      .select(col("doc_id"),
        (size(col("s")) / windowSize).cast("int").as("nw"), col("s"))
      .select(col("doc_id"), col("nw"),
        when(col("nw") > 0, transform(sequence(lit(0), col("nw") - 1),
          w => sqrt(
            aggregate(slice(col("s"), w * windowSize + 1, lit(windowSize)),
              lit(0L), (acc, x) => acc + x.cast("long") * x)
              .cast("double") / windowSize)))
          .otherwise(array().cast("array<double>")).as("rms"))
      .select(col("doc_id"), col("nw").as("n_windows"),
        when(col("nw") > 0,
          filter(sequence(lit(0), col("nw") - 1),
            w => element_at(col("rms"), w + 1) >= silenceRms))
          .otherwise(array().cast("array<int>")).as("voiced"))
    df.select(col("doc_id"), col("n_windows"),
      size(col("voiced")).as("n_voiced"),
      expr("aggregate(voiced, named_struct('prev', -2, 'n', 0), " +
        "(acc, x) -> named_struct('prev', x, " +
        "'n', acc.n + IF(x = acc.prev + 1, 0, 1)), acc -> acc.n)")
        .as("n_segments"),
      expr("aggregate(voiced, named_struct('prev', -2, 'cur', 0, 'best', 0), " +
        "(acc, x) -> named_struct('prev', x, " +
        "'cur', IF(x = acc.prev + 1, acc.cur + 1, 1), " +
        "'best', greatest(acc.best, IF(x = acc.prev + 1, acc.cur + 1, 1))), " +
        "acc -> acc.best)").as("longest_run"),
      stableRound4(when(col("n_windows") > 0,
        size(col("voiced")).cast("double") / col("n_windows"))
        .otherwise(0.0)).as("voiced_frac"))
      .orderBy(col("doc_id"))
  }

  /** Caption shingle-Jaccard over any (va, vb, cos_sim) pair frame. */
  private def captionJoin(spark: SparkSession, dir: String,
      pairs: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.{shingles, tokensLower}
    val sh = Tables.documents(spark, dir)
      .select(col("doc_id"),
        shingles(tokensLower(col("text"))).as("sh"))
    val inter = size(array_intersect(col("a.sh"), col("b.sh")))
    val uni = size(array_union(col("a.sh"), col("b.sh")))
    pairs
      .join(sh.as("a"), col("va") === col("a.doc_id"))
      .join(sh.as("b"), col("vb") === col("b.doc_id"))
      .select(col("va"), col("vb"), col("cos_sim"),
        round(when(uni === 0, 0.0)
          .otherwise(inter.cast("double") / uni), 4).as("text_jaccard"))
      .withColumn("caption_mismatch",
        col("cos_sim") >= 0.3 && col("text_jaccard") < lit(0.5))
  }
}
