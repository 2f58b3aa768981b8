package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftQuery
import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads with typed
  * metadata, processed by a batched per-partition decoder.
  *
  * The testdata ships no real media, so the payload is the document
  * text encoded as bytes and the DECODER IS A DETERMINISTIC STUB
  * (clearly marked below) — what's real and tested is the Spark-side
  * shape: binary column + metadata struct, a mapPartitions decode
  * stage that iterates batches without materializing a partition in
  * memory (the Scala analog of a Pandas-UDF `mapInPandas` pipeline),
  * and frame-sampling that yields multiple rows per asset. The DECODE
  * stage (mm_decode_features) routes through the
  * [[Multimodal.AssetCodec]] interface (`-Dgraft.codec.class=<FQCN>`
  * or `AssetCodec.install`; stub is the sandbox default) — that is
  * the one stage a real JNI/ffmpeg build replaces. The OTHER queries
  * here (metadata, frame sampling, pHash/energy/cuts) deliberately
  * compute byte-arithmetic features with relational expressions so
  * they stay DuckDB-oracle-checkable; a production deployment would
  * layer codec-derived columns NEXT TO them via the same seam, not
  * swap their oracle-gated math.
  *
  * Scale posture: assets never shuffle — decode is map-side; only
  * extracted (small) features flow into joins/aggregates downstream.
  */
object Multimodal {

  /** Bytes per sampled "frame" in the stub decoder. */
  val FrameSize = 256

  /** Typed per-asset record after decode. */
  final case class AssetFeatures(
      doc_id: Long,
      n_bytes: Long,
      n_frames: Long,
      mean_byte: Double,
      first_frame_checksum: Long
  )

  /** Pluggable per-asset decoder — the seam where a codec-bearing
    * environment lights up real media decoding WITHOUT code change.
    *
    * Contract: `decode` must be a pure function of (docId, payload)
    * (task retries and speculative execution re-decode), and the
    * byte-arithmetic features the registered queries oracle-check
    * (n_bytes, n_frames as ⌈bytes/FrameSize⌉, mean_byte) must be
    * computed exactly as [[Multimodal.decodeStub]] computes them —
    * they describe the payload, not its decoded content, so any codec
    * can and must reproduce them. Codec-specific signal goes in
    * first_frame_checksum (and, in a real deployment, additional
    * columns outside the oracle-gated set). Implementations must be
    * Serializable: the instance rides the task closure to executors.
    */
  trait AssetCodec extends Serializable {
    def decode(docId: Long, payload: Array[Byte]): AssetFeatures
  }

  object AssetCodec {
    /** The sandbox default: [[decodeStub]] behind the interface. */
    object Stub extends AssetCodec {
      override def decode(docId: Long, payload: Array[Byte]): AssetFeatures =
        decodeStub(docId, payload)
    }

    /** Resolution order: an explicitly [[install]]ed codec (tests,
      * programmatic setup), else `-Dgraft.codec.class=<FQCN>` (a
      * no-arg-constructible AssetCodec on the classpath — the
      * deploy-time hook for a JNI/ffmpeg build), else the stub.
      */
    @volatile private var installed: Option[AssetCodec] = None

    def install(c: AssetCodec): Unit = { installed = Some(c) }
    def reset(): Unit = { installed = None }

    def current: AssetCodec = installed.getOrElse {
      sys.props.get("graft.codec.class") match {
        case Some(cn) =>
          Class.forName(cn).getDeclaredConstructor()
            .newInstance().asInstanceOf[AssetCodec]
        case None => Stub
      }
    }
  }

  /** ======== STUB ========
    * Deterministic fake decoder: real media decoding (image/audio/
    * video libs) is unavailable in this environment. Consumes the
    * payload bytes as if they were frames of FrameSize bytes and
    * emits per-asset features. Deterministic in the payload, so
    * results are reproducible and oracle-friendly for the metadata
    * part. A real codec plugs in through [[AssetCodec]] — no call
    * site changes.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): AssetFeatures = {
    val n = payload.length.toLong
    val frames = if (n == 0) 0L else (n - 1) / FrameSize + 1
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xff; i += 1 }
    val mean = if (n == 0) 0.0 else sum.toDouble / n
    var checksum = 0L
    val lim = math.min(FrameSize, payload.length)
    i = 0
    while (i < lim) { checksum = checksum * 31 + (payload(i) & 0xff); i += 1 }
    AssetFeatures(docId, n, frames, mean, checksum)
  }

  /** Binary assets with metadata struct — the storage-side shape.
    * Metadata (sizes, frame counts, mime) is SQL-derivable, so this
    * query is oracle-checked; the decode features are not (see
    * mm_decode_features).
    */
  val mmBinaryMetadata = GraftQuery(
    "mm_binary_metadata",
    (s, dir) => {
      val t = Tables(s, dir)
      t.documents
        .select(
          col("doc_id"),
          encode(col("text"), "UTF-8").as("payload"),
          lit("application/octet-stream").as("mime")
        )
        .select(
          col("doc_id"), col("mime"),
          length(col("payload")).cast("long").as("n_bytes"),
          (floor((length(col("payload")) - 1) / FrameSize) + 1)
            .cast("long").as("n_frames")
        )
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
             'application/octet-stream' AS mime,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(floor((octet_length(encode(text)) - 1) / $FrameSize) + 1 AS BIGINT) AS n_frames
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** The FULL decoded-asset frame — batched decode via mapPartitions
    * over the typed Dataset, codec-specific columns included
    * (first_frame_checksum) — the surface a production pipeline joins
    * downstream of the seam. The registered query below keeps only
    * the oracle-checkable byte-arithmetic subset (sizes, frame
    * counts, mean byte — the corpus is ASCII, so DuckDB's per-char
    * codes equal payload bytes); the checksum column stays out of the
    * registered output and is pinned by MultimodalStreamSpec, which
    * also drives THIS frame to prove an installed codec's signal
    * actually flows through the distributed decode, not just a
    * driver-side lookup.
    */
  def decodedAssets(s: SparkSession, dir: String): DataFrame = {
    val t = Tables(s, dir)
    decodeAssetFrame(
      t.documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload")))
  }

  /** Frame-level decode: run any `(doc_id: long, payload: binary)`
    * frame through the current [[AssetCodec]] — the entry a real
    * ingest pipeline (object-store listing, streaming attachment
    * feed) uses, and the one the codec specs drive with GENUINE
    * binary assets (BMP/WAV) to prove the executor-side decode path
    * on true media bytes. Map-side only; assets never shuffle.
    */
  def decodeAssetFrame(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    // resolve the codec ON THE DRIVER (one instance, shipped in the
    // task closure) — resolving inside the lambda would re-reflect
    // per partition and let executors disagree with the driver
    val codec = AssetCodec.current
    df.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => codec.decode(id, bytes) })
      .toDF()
  }

  val mmDecodeFeatures = GraftQuery(
    "mm_decode_features",
    (s, dir) => {
      decodedAssets(s, dir)
        .select(col("doc_id"), col("n_bytes"), col("n_frames"),
          round(col("mean_byte"), 6).as("mean_byte"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      SELECT doc_id,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
             CAST(floor((octet_length(encode(text)) - 1) / $FrameSize) + 1 AS BIGINT) AS n_frames,
             round(coalesce(
               CAST(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) AS DOUBLE)
                 / nullif(octet_length(encode(text)), 0), 0.0), 6) AS mean_byte
      FROM documents
      ORDER BY doc_id
    """)
  )

  /** Frame sampling: one row per sampled frame index per asset (every
    * 4th frame) — the explode-style fan-out a video pipeline needs,
    * kept fully relational. Oracle-checked via generate_subscripts-
    * free arithmetic on both sides.
    */
  val mmFrameSample = GraftQuery(
    "mm_frame_sample",
    (s, dir) => {
      val t = Tables(s, dir)
      val nFrames = (floor((length(encode(col("text"), "UTF-8")) - 1) / FrameSize) + 1)
        .cast("long")
      t.documents
        .select(col("doc_id"), nFrames.as("n_frames"))
        // empty payloads have 0 frames: sequence(0,-1) would throw in
        // Spark while the oracle's range(0,0) emits nothing — filter
        .filter(col("n_frames") > 0)
        .withColumn("frame_idx",
          explode(sequence(lit(0L), col("n_frames") - 1, lit(4L))))
        .select(col("doc_id"), col("frame_idx"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some(s"""
      WITH f AS (
        SELECT doc_id,
               CAST(floor((octet_length(encode(text)) - 1) / $FrameSize) + 1 AS BIGINT) AS n_frames
        FROM documents)
      SELECT doc_id, CAST(unnest(range(0, n_frames, 4)) AS BIGINT) AS frame_idx
      FROM f
      ORDER BY doc_id, frame_idx
    """)
  )

  /** Perceptual-hash blocks over the first frame: 16 blocks of 16
    * bytes each (aHash geometry — a real image pipeline feeds pixel
    * blocks of the decoded thumbnail through the identical shape).
    */
  val PhashBlocks = 16
  val PhashBlockLen = 16

  /** Perceptual-hash duplicate candidates: an aHash-style 16-bit
    * signature of each asset's first frame (bit b = "block b's mean
    * byte exceeds the frame mean"), grouped to emit candidate
    * duplicate sets — the image-dedup front end (exact-signature
    * grouping; the Hamming-tolerant upgrade is the SimHash multi-probe
    * banding already shipped in [[graft.operators.Dedup]]).
    *
    * Exactness: the mean comparison is done in INTEGER cross-products
    * (`bsum·flen > fsum·blen` ⇔ `bsum/blen > fsum/flen`) so no float
    * division exists on either engine and the hash is bit-identical
    * by construction. Scale: hashing is one codegen projection over
    * the asset scan (no decode fan-out leaves the map side); the only
    * shuffle is the group-by on the 16-bit signature — uniform,
    * bounded key domain.
    */
  val mmPhashDupes = GraftQuery(
    "mm_phash_dupes",
    (s, dir) => {
      val t = Tables(s, dir)
      // Spark's split(_, "") keeps a trailing "" (Java split limit -1)
      // that DuckDB's string_split drops — filter before ascii()
      val codes = transform(
        filter(
          split(substring(col("text"), 1, PhashBlocks * PhashBlockLen), ""),
          c => c =!= lit("")),
        c => ascii(c))
      val withCodes = t.documents.select(col("doc_id"), codes.as("codes"))
        .select(col("doc_id"), col("codes"),
          aggregate(col("codes"), lit(0L), (a, x) => a + x).as("fsum"),
          size(col("codes")).cast("long").as("flen"))
      val bits = (0 until PhashBlocks).map { i =>
        val block = slice(col("codes"), i * PhashBlockLen + 1, PhashBlockLen)
        val bsum = aggregate(block, lit(0L), (a, x) => a + x)
        val blen = size(block).cast("long")
        when(bsum * col("flen") > col("fsum") * blen, lit(1L << i))
          .otherwise(lit(0L))
      }
      withCodes
        .select(col("doc_id"), bits.reduce(_ + _).as("phash"))
        .groupBy(col("phash"))
        .agg(count(lit(1)).as("n_assets"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .filter(col("n_assets") > 1)
        .orderBy(col("phash"))
    },
    Some {
      val terms = (0 until PhashBlocks).map { i =>
        val lo = i * PhashBlockLen + 1
        val hi = i * PhashBlockLen + PhashBlockLen
        s"""CASE WHEN coalesce(list_sum(codes[$lo:$hi]), 0) * flen
           |  > fsum * len(codes[$lo:$hi]) THEN ${1L << i} ELSE 0 END"""
          .stripMargin
      }.mkString(" + ")
      s"""
      WITH c AS (
        SELECT doc_id,
               list_transform(string_split(substr(text, 1, ${PhashBlocks * PhashBlockLen}), ''),
                              ch -> ascii(ch)) AS codes
        FROM documents),
      f AS (SELECT doc_id, codes,
                   coalesce(list_sum(codes), 0) AS fsum, len(codes) AS flen
            FROM c),
      sigs AS (SELECT doc_id, CAST($terms AS BIGINT) AS phash FROM f)
      SELECT phash, COUNT(*) AS n_assets,
             MIN(doc_id) AS min_doc, MAX(doc_id) AS max_doc
      FROM sigs GROUP BY phash HAVING COUNT(*) > 1
      ORDER BY phash
      """
    }
  )

  /** Typed per-frame record from the audio-style decode. */
  final case class FrameEnergy(
      doc_id: Long,
      frame_idx: Long,
      n_samples: Long,
      energy: Long
  )

  /** Per-frame signal energy — the VAD/silence-detection front end of
    * an audio pipeline, over the same stubbed decode (payload bytes
    * read as 8-bit PCM centered at 128; a real codec swap changes
    * only the byte source). One row per frame via a typed
    * mapPartitions flatMap — the decode fan-out stays map-side, no
    * asset bytes ever shuffle; only the (doc, frame, energy) rows
    * flow on. Energy is an exact LONG sum of squared deviations, and
    * rms = sqrt(energy/n) uses only correctly-rounded IEEE ops, so
    * the doubles hash-match the oracle bit-for-bit.
    *
    * Corpus invariant: the engine walks UTF-8 BYTES while the oracle
    * walks CHARACTERS (ascii()), so the two agree iff the corpus is
    * pure ASCII — asserted by name in TestdataSchemaSpec ("documents
    * corpus is ASCII-only"), which fails loudly on fixture drift
    * before any mm_* hash gate can.
    */
  val mmAudioEnergy = GraftQuery(
    "mm_audio_energy",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      t.documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          val nFrames = if (bytes.isEmpty) 0L else (bytes.length - 1L) / FrameSize + 1
          (0L until nFrames).iterator.map { fi =>
            val from = (fi * FrameSize).toInt
            val until = math.min(from + FrameSize, bytes.length)
            var energy = 0L
            var i = from
            while (i < until) {
              val d = (bytes(i) & 0xff) - 128L
              energy += d * d
              i += 1
            }
            FrameEnergy(id, fi, until - from, energy)
          }
        })
        .toDF()
        .select(col("doc_id"), col("frame_idx"), col("n_samples"), col("energy"),
          sqrt(col("energy").cast("double") / col("n_samples").cast("double"))
            .as("rms"))
        .orderBy(col("doc_id"), col("frame_idx"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               list_transform(string_split(text, ''), c -> ascii(c)) AS bytes
        FROM documents),
      f AS (
        SELECT doc_id, bytes,
               unnest(range(0, CAST(floor((len(bytes) - 1) / $FrameSize) + 1
                 AS BIGINT))) AS frame_idx
        FROM b WHERE len(bytes) > 0),
      e AS (
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(len(list_slice(bytes, frame_idx * $FrameSize + 1,
                 frame_idx * $FrameSize + $FrameSize)) AS BIGINT) AS n_samples,
               CAST(list_sum(list_transform(
                 list_slice(bytes, frame_idx * $FrameSize + 1,
                   frame_idx * $FrameSize + $FrameSize),
                 x -> (x - 128) * (x - 128))) AS BIGINT) AS energy
        FROM f)
      SELECT doc_id, frame_idx, n_samples, energy,
             sqrt(CAST(energy AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms
      FROM e
      ORDER BY doc_id, frame_idx
    """)
  )

  /** Typed per-frame byte-sum record for the scene-cut detector. */
  final case class FrameSum(
      doc_id: Long,
      frame_idx: Long,
      n_bytes: Long,
      bsum: Long
  )

  /** Relative mean-level change (percent) that counts as a cut. */
  val SceneCutPct = 3L

  /** Scene-cut (shot-boundary) detection over the stubbed video
    * decode: frames are [[FrameSize]]-byte windows of the payload, a
    * cut fires where a frame's MEAN byte level moves more than
    * [[SceneCutPct]] % vs the previous frame — the classic luminance-
    * delta shot detector; a real codec swap changes only the byte
    * source, exactly like mm_audio_energy. Exactness: means never
    * materialize — the compare is the integer cross-product
    * |bsumₜ·lenₜ₋₁ − bsumₜ₋₁·lenₜ|·100 > pct·bsumₜ₋₁·lenₜ (products
    * ≤ ~10⁹, long-trivial), so the flag is bit-identical by
    * construction. Scale: the decode fan-out stays map-side in a
    * typed mapPartitions (no asset bytes shuffle); the lag window
    * partitions by asset over per-asset frame counts; output is one
    * row per asset.
    */
  val mmSceneCuts = GraftQuery(
    "mm_scene_cuts",
    (s, dir) => {
      import s.implicits._
      val t = Tables(s, dir)
      val frames = t.documents
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
        .as[(Long, Array[Byte])]
        .mapPartitions(_.flatMap { case (id, bytes) =>
          val nFrames =
            if (bytes.isEmpty) 0L else (bytes.length - 1L) / FrameSize + 1
          (0L until nFrames).iterator.map { fi =>
            val from = (fi * FrameSize).toInt
            val until = math.min(from + FrameSize, bytes.length)
            var sum = 0L
            var i = from
            while (i < until) { sum += (bytes(i) & 0xff).toLong; i += 1 }
            FrameSum(id, fi, until - from, sum)
          }
        })
        .toDF()
      val wD = org.apache.spark.sql.expressions.Window
        .partitionBy(col("doc_id")).orderBy(col("frame_idx"))
      frames
        .withColumn("psum", lag(col("bsum"), 1).over(wD))
        .withColumn("plen", lag(col("n_bytes"), 1).over(wD))
        .withColumn("cut", col("psum").isNotNull &&
          abs(col("bsum") * col("plen") - col("psum") * col("n_bytes")) *
            100L > lit(SceneCutPct) * col("psum") * col("n_bytes"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_frames"),
          sum(when(col("cut"), 1L).otherwise(0L)).as("n_cuts"),
          min(when(col("cut"), col("frame_idx"))).as("first_cut_idx"))
        .orderBy(col("doc_id"))
    },
    Some(s"""
      WITH b AS (
        SELECT doc_id,
               list_transform(string_split(text, ''), c -> ascii(c)) AS bytes
        FROM documents),
      f AS (
        SELECT doc_id, bytes,
               unnest(range(0, CAST(floor((len(bytes) - 1) / $FrameSize) + 1
                 AS BIGINT))) AS frame_idx
        FROM b WHERE len(bytes) > 0),
      e AS (
        SELECT doc_id, CAST(frame_idx AS BIGINT) AS frame_idx,
               CAST(len(list_slice(bytes, frame_idx * $FrameSize + 1,
                 frame_idx * $FrameSize + $FrameSize)) AS BIGINT) AS n_bytes,
               CAST(list_sum(list_slice(bytes, frame_idx * $FrameSize + 1,
                 frame_idx * $FrameSize + $FrameSize)) AS BIGINT) AS bsum
        FROM f),
      l AS (
        SELECT doc_id, frame_idx, n_bytes, bsum,
               lag(bsum) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                 AS psum,
               lag(n_bytes) OVER (PARTITION BY doc_id ORDER BY frame_idx)
                 AS plen
        FROM e),
      c AS (
        SELECT doc_id, frame_idx,
               psum IS NOT NULL AND
               ABS(bsum * plen - psum * n_bytes) * 100
                 > $SceneCutPct * psum * n_bytes AS cut
        FROM l)
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_frames,
             CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_cuts,
             CAST(MIN(CASE WHEN cut THEN frame_idx END) AS BIGINT)
               AS first_cut_idx
      FROM c
      GROUP BY doc_id
      ORDER BY doc_id
    """)
  )

  def all: Seq[GraftQuery] =
    Seq(mmBinaryMetadata, mmDecodeFeatures, mmFrameSample, mmPhashDupes,
      mmAudioEnergy, mmSceneCuts)
}
