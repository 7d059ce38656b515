package graft.ops

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** Multimodal-column plumbing (builder mandate: image/audio/video as opaque
  * binary columns + typed metadata, with distributed decode/feature
  * extraction).
  *
  * The decode step is real for images: payloads whose magic number says
  * PNG/JPEG/GIF/BMP decode through the JDK's own `javax.imageio` into
  * pixel-level stats ([[imageDecode]], exercised on genuine encoded
  * images by MultimodalCodecSpec). Non-image payloads (the container has
  * no audio/video codecs) take a clearly-marked deterministic stand-in
  * ([[fakeDecode]]); everything Spark-side is identical either way:
  * binary payload column, metadata struct, partition-batched processing
  * through a typed Dataset, and a stable feature-vector schema.
  *
  * Scale posture: payloads travel as parquet BINARY (never through the
  * driver); [[qMultimodalDecode]] processes them with `mapPartitions` so a
  * real decoder would amortize model/codec init per partition (the same
  * batch shape `mapInPandas`/`mapInArrow` gives Python UDFs). Feature
  * extraction emits fixed-width vectors → downstream joins/ANN shuffle
  * small columns, not blobs.
  */
object Multimodal {

  /** Payload table: text bytes stand in for encoded media. */
  private def payloads(s: SparkSession, d: String): DataFrame =
    documents(s, d).select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(col("text")).cast("long").as("byte_len"),
        (octet_length(col("text")) % 640).cast("long").as("width"),
        (octet_length(col("text")) * 7 % 480).cast("long").as("height"))
        .as("meta"))

  /** Oracle-checkable metadata projection over the binary column. */
  def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    payloads(s, d).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      col("meta.byte_len").as("byte_len"),
      col("meta.width").as("width"),
      col("meta.height").as("height"))
      .orderBy("doc_id")

  /** Magic-number sniff: true iff the payload starts with a PNG, JPEG,
    * GIF or BMP signature — the formats the JDK's built-in `javax.imageio`
    * readers handle. Cheap (≤ 8 byte compares), so running it on every
    * payload before attempting a decode costs nothing at scale. */
  private[ops] def looksLikeImage(b: Array[Byte]): Boolean =
    (b.length > 8 &&
      (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') ||
    (b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) ||
    (b.length > 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') ||
    (b.length > 2 && b(0) == 'B' && b(1) == 'M')

  /** REAL image decode via `javax.imageio` (JDK-only, no external codec):
    * returns the same (mean, feature) shape as [[fakeDecode]], derived
    * from decoded PIXELS instead of raw bytes — mean is the average
    * 8-bit gray luminance (ITU-R BT.601 integer weights) over all pixels,
    * and the feature vector carries (width, height, gray at 6 evenly
    * spaced pixels in row-major order). Returns None when ImageIO has no
    * reader for the bytes (corrupt or unsupported payload), in which case
    * the caller falls back to the byte-level fake — so a mixed corpus
    * (text standing in for media, plus genuine images) decodes in one
    * pass with no schema change. */
  private[ops] def imageDecode(payload: Array[Byte])
      : Option[(Double, Array[Float])] = {
    // NonFatal, not just IOException: JDK image readers throw
    // RuntimeExceptions (IllegalArgumentException, CMMException,
    // ArrayIndexOutOfBounds) on malformed payloads that PASS the
    // magic-number sniff — one truncated image must degrade to the
    // stand-in decode, never kill a whole mapPartitions stage.
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val n = w.toLong * h
      var sum = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          sum += gray(img.getRGB(x, y))
          x += 1
        }
        y += 1
      }
      val feat = new Array[Float](8)
      feat(0) = w.toFloat
      feat(1) = h.toFloat
      var i = 0
      while (i < 6) { // 6 evenly spaced row-major sample points
        val p = (n - 1) * i / 5
        feat(i + 2) = gray(img.getRGB((p % w).toInt, (p / w).toInt)).toFloat
        i += 1
      }
      Some((sum.toDouble / n, feat))
    }
  }

  /** 64-bit perceptual dHash (difference hash — public algorithm: gradient
    * sign over a 9×8 downsample): box-average the decoded image's BT.601
    * gray channel onto a 9-column × 8-row grid with pure integer
    * arithmetic, then set bit r·8+c iff cell (r,c) is brighter than its
    * right neighbor (r,c+1). The hash keys on gradient DIRECTION, not
    * absolute luminance, so it is invariant to uniform
    * brightness/contrast shifts and — because the grid is an area
    * average — to rescaling; Hamming distance orders images by visual
    * similarity. A 64-bit signature per image means image near-dup dedup
    * reuses the SimHash banding machinery unchanged (band the 64 bits,
    * verify candidates by Hamming), making visual dedup a first-class
    * corpus operator next to text near-dup. None when the payload
    * doesn't decode. */
  private[graft] def imageDHash(payload: Array[Byte]): Option[Long] = {
    val img =
      try ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) None
    else {
      val w = img.getWidth
      val h = img.getHeight
      val cell = Array.ofDim[Int](8, 9)
      var r = 0
      while (r < 8) {
        val y0 = r * h / 8
        val y1 = math.max(y0 + 1, (r + 1) * h / 8)
        var c = 0
        while (c < 9) {
          val x0 = c * w / 9
          val x1 = math.max(x0 + 1, (c + 1) * w / 9)
          var sum = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) { sum += gray(img.getRGB(x, y)); x += 1 }
            y += 1
          }
          cell(r)(c) = (sum / ((y1 - y0).toLong * (x1 - x0))).toInt
          c += 1
        }
        r += 1
      }
      Some(dHashBits((r, c) => cell(r)(c)))
    }
  }

  /** Deterministic stand-in dHash for non-image payloads: the same 9×8
    * difference rule over 72 bytes sampled evenly across the payload —
    * same bit semantics, so mixed corpora carry ONE signature column. */
  private[graft] def byteDHash(payload: Array[Byte]): Long = {
    val n = payload.length
    def at(i: Int): Int =
      if (n == 0) 0 else payload(((n - 1).toLong * i / 71).toInt) & 0xFF
    dHashBits((r, c) => at(r * 9 + c))
  }

  /** The shared dHash bit rule: bit r·8+c set iff g(r,c) > g(r,c+1). */
  private def dHashBits(g: (Int, Int) => Int): Long = {
    var bits = 0L
    var r = 0
    while (r < 8) {
      var c = 0
      while (c < 8) {
        if (g(r, c) > g(r, c + 1)) bits |= 1L << (r * 8 + c)
        c += 1
      }
      r += 1
    }
    bits
  }

  /** 8-bit BT.601 luminance from a packed ARGB int (integer arithmetic →
    * bit-reproducible across JVMs). */
  private def gray(argb: Int): Int = {
    val r = (argb >> 16) & 0xFF
    val g = (argb >> 8) & 0xFF
    val b = argb & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** STUB decode for non-image payloads (audio resample, frame sample
    * would FFI into real codecs here). Deterministic fake: mean byte
    * value + an 8-dim "feature" from the first 8 bytes. */
  private def fakeDecode(payload: Array[Byte]): (Double, Array[Float]) = {
    var sum = 0L
    var i = 0
    while (i < payload.length) { sum += payload(i) & 0xFF; i += 1 }
    val mean = if (payload.length == 0) 0.0 else sum.toDouble / payload.length
    val feat = new Array[Float](8)
    i = 0
    while (i < 8) {
      feat(i) = if (i < payload.length) (payload(i) & 0xFF).toFloat else 0f
      i += 1
    }
    (mean, feat)
  }

  /** Distributed decode/feature-extract over the binary column via
    * mapPartitions (per-partition batch processing — codec init would be
    * amortized here).
    *
    * Oracle-checkable: the feature vector is rendered as a canonical
    * comma-joined integer string (arrays are unsortable in the driver's
    * pandas comparison), and `mean_byte` is computed as one integer sum
    * followed by a single double division — bit-identical to DuckDB's
    * codepoint arithmetic since the corpus is pure ASCII. */
  def qMultimodalDecode(s: SparkSession, d: String): DataFrame =
    decodePayloads(s, payloads(s, d).select(col("doc_id"), col("payload")))

  /** The decode kernel over any (doc_id BIGINT, payload BINARY) frame:
    * per payload, sniff the magic number — genuine PNG/JPEG/GIF/BMP bytes
    * decode through `javax.imageio` into pixel-level stats
    * ([[imageDecode]]); anything else takes the byte-level stand-in
    * ([[fakeDecode]]). The testdata corpus is text-as-bytes, so its
    * oracle rows are unchanged; MultimodalCodecSpec drives this same
    * entry point with real encoded images. */
  private[graft] def decodePayloads(s: SparkSession, df: DataFrame)
      : DataFrame = {
    import s.implicits._
    df.as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (mean, feat) =
            (if (looksLikeImage(bytes)) imageDecode(bytes) else None)
              .getOrElse(fakeDecode(bytes))
          (id, bytes.length.toLong, mean, feat)
        }
      }
      .toDF("doc_id", "byte_len", "mean_byte", "feature_vec")
      .select(
        col("doc_id"), col("byte_len"), col("mean_byte"),
        array_join(transform(col("feature_vec"), f => f.cast("int")), ",")
          .as("feature"))
      .orderBy("doc_id")
  }

  /** Frame sampling over the binary payload — the video-style access
    * pattern: treat the payload as fixed-64-byte frames, keep every 4th
    * frame, fingerprint each sampled frame with md5. All slicing happens
    * on the binary column inside the scan stage (substr on BINARY is
    * zero-copy into the payload buffer); only (doc_id, idx, md5) rows —
    * never frame bytes — leave the stage. A real codec would decode the
    * sampled frames here via the same mapPartitions shape as
    * [[qMultimodalDecode]]; the sampling/fingerprint plumbing is the
    * Spark-side contract and is oracle-checked byte-exact. */
  def qMultimodalFrames(s: SparkSession, d: String): DataFrame = {
    val frameSize = 64
    val stride = 4
    payloads(s, d)
      .select(col("doc_id"), col("payload"),
        expr(s"(meta.byte_len + ${frameSize - 1}) div $frameSize")
          .as("n_frames"))
      .select(col("doc_id"), col("payload"), col("n_frames"),
        explode(sequence(lit(0L), col("n_frames") - 1L, lit(stride.toLong)))
          .as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"),
        md5(col("payload").substr(
          (col("frame_idx") * frameSize + 1).cast("int"), lit(frameSize)))
          .as("frame_md5"))
      .orderBy("doc_id", "frame_idx")
  }

  /** Resize: stride-2 nearest-neighbor downsample of the payload (see
    * [[graft.functions.ByteStride]]) with metadata halved accordingly;
    * the output row carries the resized length and an md5 of the resized
    * bytes — never the blob itself — so only fixed-width columns leave
    * the stage. Oracle-checked byte-exact: with the ASCII corpus the
    * strided payload equals the strided character string. */
  def qMultimodalResize(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ByteStride.byteStride
    payloads(s, d)
      .select(col("doc_id"),
        col("meta.byte_len").as("byte_len"),
        (col("meta.width") - col("meta.width") % 2).as("new_width"),
        byteStride(col("payload"), 2).as("resized"))
      .select(col("doc_id"), col("byte_len"),
        octet_length(col("resized")).cast("long").as("resized_len"),
        col("new_width"),
        md5(col("resized")).as("resized_md5"))
      .orderBy("doc_id")
  }

  /** Per-payload 64-bit perceptual hash: images get the pixel-level
    * [[imageDHash]], everything else the byte-level stand-in
    * ([[byteDHash]]) — one signature column for a mixed corpus, rendered
    * as 16 hex chars. Rows-only key (the sampled-byte stand-in is not
    * reproducible in one DuckDB expression); MultimodalCodecSpec pins
    * the image path's scale/brightness invariance and
    * similar-close/different-far Hamming behavior on real encoded
    * fixtures. Near-dup image dedup = SimHash-style banding over this
    * column (the 64-bit signature is drop-in for the banded join). */
  def qImagePhash(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    payloads(s, d).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val (h, src) =
            (if (looksLikeImage(bytes)) imageDHash(bytes) else None)
              .map((_, "image"))
              .getOrElse((byteDHash(bytes), "bytes"))
          (id, f"$h%016x", src)
        }
      }
      .toDF("doc_id", "phash", "decoded_as")
      .orderBy("doc_id")
  }

  /** Visual near-dup dedup report — the image counterpart of text
    * SimHash dedup, closing the multimodal dedup DAG: per-payload
    * 64-bit dHash (pixel path for images, byte stand-in otherwise) →
    * the SAME Manku 3-of-6 block banding qSimhash uses
    * ([[Sketches.hammingBandedPairs]] — a 64-bit signature is a 64-bit
    * signature) → per-document partner stats. dHash's brightness/scale
    * invariance means a re-encoded, resized or brightness-shifted copy
    * of an image lands within a few bits of the original, and the
    * banding finds it without any all-pairs pass.
    *
    * Shaped as a per-doc REPORT (every doc emits one row: signature,
    * Hamming-≤3 partner count, closest partner distance or -1) rather
    * than a bare pair list, because a corpus with no visual dups —
    * like the testdata text corpus, which has zero byte-identical
    * payloads — legitimately produces an empty pair set, and the
    * report keeps the operator observable either way. Rows-only key
    * (hash pipeline not expressible in DuckDB); MultimodalCodecSpec
    * drives the underlying pair generator on real encoded fixtures
    * (scaled, re-encoded and brightness-shifted copies pair up,
    * distinct patterns don't). */
  def qImageNearDup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sigs = payloads(s, d).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = (if (looksLikeImage(bytes)) imageDHash(bytes) else None)
            .getOrElse(byteDHash(bytes))
          (id, h)
        }
      }
      .toDF("doc_id", "phash")
    val pairs = graft.ops.Sketches
      .hammingBandedPairs(sigs, "doc_id", "phash")
    // symmetrize so each doc aggregates its partners from either side
    val sided = pairs.select(col("da").as("doc_id"), col("hamming"))
      .unionAll(pairs.select(col("db").as("doc_id"), col("hamming")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_partners"), min(col("hamming")).as("mh"))
    sigs.join(sided, Seq("doc_id"), "left")
      .select(col("doc_id"),
        format_string("%016x", col("phash")).as("phash"),
        coalesce(col("n_partners"), lit(0L)).as("n_near_dups"),
        coalesce(col("mh"), lit(-1L)).as("min_hamming"))
      .orderBy("doc_id")
  }

  /** Visual dedup DAG, completed: dHash signatures → Manku-banded
    * Hamming pairs (same generator as [[qImageNearDup]]) → connected-
    * component clustering via the SAME label propagation that closes the
    * text dedup DAG ([[Sketches.labelPropagation]]) — so text and visual
    * dedup share one clustering engine, differing only in the candidate
    * generator (MinHash bands over shingles vs Manku blocks over pixel
    * hashes).
    *
    * Emitted as a full per-doc assignment (cluster_rep = the component's
    * minimum doc_id, singleton docs map to themselves, plus the cluster
    * size) rather than only paired docs, because "keep one doc per
    * cluster" needs every doc to know its cluster — and a corpus with no
    * visual dups stays observable as 500 singletons instead of an empty
    * frame. Rows-only key (hash pipeline not in DuckDB);
    * MultimodalCodecSpec drives clustering on real encoded fixtures
    * (original + resized + re-encoded copies land in ONE cluster). */
  def qImageDedupCluster(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val sigs = payloads(s, d).select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val h = (if (looksLikeImage(bytes)) imageDHash(bytes) else None)
            .getOrElse(byteDHash(bytes))
          (id, h)
        }
      }
      .toDF("doc_id", "phash")
    clusterSignatures(sigs)
  }

  /** The generator-independent tail of the visual dedup DAG: banded
    * Hamming pairs over (doc_id, phash) → label propagation → full
    * per-doc (doc_id, cluster_rep, cluster_size) assignment.
    * MultimodalCodecSpec drives this directly on real encoded fixtures. */
  /** The returned frame still reads the cached signatures, so the cache
    * is held here and dropped on the NEXT invocation — the same
    * one-retained-round discipline as labelPropagation's cache.
    * Registered with [[graft.ops.Text.clearCaches]] (via
    * [[clearSigCache]]) so the bench's order-independence contract
    * ("memoized intermediates are cleared before EVERY timed run",
    * BenchProtocol.scala) covers it — the r14 round shipped this cache
    * unregistered and the retained signatures frame survived into every
    * subsequent bench key. */
  private var lastSigCache: DataFrame = null

  /** Drop the retained signatures cache (bench order-independence). */
  def clearSigCache(): Unit = synchronized {
    if (lastSigCache != null) {
      try lastSigCache.unpersist(blocking = false)
      catch { case _: Throwable => () }
      lastSigCache = null
    }
  }

  private[graft] def clusterSignatures(sigs: DataFrame): DataFrame = {
    // capture the freshly persisted frame INSIDE the lock: reading
    // lastSigCache after release would let a concurrent invocation swap
    // (and unpersist) the cache between release and read, silently
    // clustering the OTHER caller's signatures
    val sig = synchronized {
      if (lastSigCache != null) {
        try lastSigCache.unpersist(blocking = false)
        catch { case _: Throwable => () }
      }
      lastSigCache = sigs.persist()
      lastSigCache
    }
    // signatures feed BOTH the pair generator and the final assignment
    // join — materialize once, or the dHash mapPartitions pass (and the
    // payload scan under it) runs twice
    val pairs = graft.ops.Sketches
      .hammingBandedPairs(sig, "doc_id", "phash")
    val clustered = graft.ops.Sketches
      .labelPropagation(pairs.select(col("da"), col("db")), maxIter = 20)
    val assigned = sig.join(clustered,
        sig("doc_id") === clustered("id"), "left")
      .select(col("doc_id"),
        coalesce(col("lbl"), col("doc_id")).as("cluster_rep"))
    // cluster_size over a window on the SAME key the frame is about
    // to shuffle on anyway — one pass, where the old
    // groupBy(cluster_rep) + equi-join shape paid a second shuffle
    // plus a join for the identical answer
    assigned
      .withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy("cluster_rep")))
      .select(col("doc_id"), col("cluster_rep"), col("cluster_size"))
      .orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_multimodal_meta"   -> qMultimodalMeta _,
    "q_multimodal_decode" -> qMultimodalDecode _,
    "q_multimodal_frames" -> qMultimodalFrames _,
    "q_multimodal_resize" -> qMultimodalResize _,
    "q_image_phash"       -> qImagePhash _,
    "q_image_near_dup"    -> qImageNearDup _,
    "q_image_dedup_cluster" -> qImageDedupCluster _,
  )

  val oracleSql: Map[String, String] = Map(
    "q_multimodal_meta" ->
      """SELECT doc_id,
        |  'application/octet-stream' AS mime,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height
        |FROM documents ORDER BY doc_id""".stripMargin,
    // The corpus is pure ASCII (verified: octet_length(encode(text)) ==
    // length(text) for every row at every SF), so byte values == codepoints
    // and the fake decoder's byte arithmetic is expressible over text.
    "q_multimodal_decode" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  CASE WHEN length(text) = 0 THEN 0.0
        |       ELSE CAST(list_aggregate(
        |              list_transform(string_split(text, ''), x -> ascii(x)),
        |              'sum') AS DOUBLE) / length(text)
        |  END AS mean_byte,
        |  concat_ws(',',
        |    CASE WHEN length(text) >= 1 THEN ascii(substring(text, 1, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 2 THEN ascii(substring(text, 2, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 3 THEN ascii(substring(text, 3, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 4 THEN ascii(substring(text, 4, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 5 THEN ascii(substring(text, 5, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 6 THEN ascii(substring(text, 6, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 7 THEN ascii(substring(text, 7, 1)) ELSE 0 END,
        |    CASE WHEN length(text) >= 8 THEN ascii(substring(text, 8, 1)) ELSE 0 END
        |  ) AS feature
        |FROM documents ORDER BY doc_id""".stripMargin,
    // ASCII corpus ⇒ text substrings == payload byte frames, so DuckDB's
    // md5 over character slices reproduces the binary frame fingerprints.
    "q_multimodal_frames" ->
      """WITH f AS (
        |  SELECT doc_id, text,
        |    (octet_length(encode(text)) + 63) // 64 AS n_frames
        |  FROM documents)
        |SELECT doc_id, n_frames,
        |  CAST(u AS BIGINT) AS frame_idx,
        |  md5(substring(text, CAST(u * 64 + 1 AS INT), 64)) AS frame_md5
        |FROM f, unnest(range(0, CAST(n_frames AS BIGINT), 4)) AS t(u)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    "q_multimodal_resize" ->
      """WITH r AS (
        |  SELECT doc_id,
        |    CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |    CAST(octet_length(encode(text)) % 640 AS BIGINT) AS w,
        |    array_to_string(list_transform(
        |      range(1, length(text) + 1, 2), i -> substring(text, i, 1)),
        |      '') AS resized
        |  FROM documents)
        |SELECT doc_id, byte_len,
        |  CAST(length(resized) AS BIGINT) AS resized_len,
        |  w - w % 2 AS new_width,
        |  md5(resized) AS resized_md5
        |FROM r ORDER BY doc_id""".stripMargin,
    // r16 (verdict task 7): the three formerly rows-only image keys are
    // in fact oracle-expressible — the corpus payloads carry no image
    // magic numbers, so every row takes the byteDHash path, whose 9×8
    // byte-sample difference rule is pure integer arithmetic over ASCII
    // bytes (== codepoints, proven by q_multimodal_decode's green
    // oracle). The banded pair generator is EXACT for Hamming ≤ 3
    // (Manku 3-of-6 pigeonhole, recall 1.0, plus the explicit bit_count
    // cut), so a DuckDB all-pairs recompute must hash-match it — the
    // oracle now proves the banding loses nothing, per-row.
    "q_image_phash" ->
      s"""WITH $dhashCte
         |SELECT doc_id, lower(lpad(to_hex(bits), 16, '0')) AS phash,
         |  'bytes' AS decoded_as
         |FROM h ORDER BY doc_id""".stripMargin,
    "q_image_near_dup" ->
      s"""WITH $dhashCte,
         |pairs AS (
         |  SELECT x.doc_id AS da, y.doc_id AS db,
         |    CAST(bit_count(xor(x.bits, y.bits)) AS BIGINT) AS hamming
         |  FROM h x JOIN h y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.bits, y.bits)) <= 3),
         |sided AS (SELECT da AS doc_id, hamming FROM pairs
         |          UNION ALL SELECT db AS doc_id, hamming FROM pairs),
         |agg AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_partners,
         |               CAST(MIN(hamming) AS BIGINT) AS mh
         |        FROM sided GROUP BY doc_id)
         |SELECT h.doc_id, lower(lpad(to_hex(bits), 16, '0')) AS phash,
         |  COALESCE(n_partners, CAST(0 AS BIGINT)) AS n_near_dups,
         |  COALESCE(mh, CAST(-1 AS BIGINT)) AS min_hamming
         |FROM h LEFT JOIN agg ON h.doc_id = agg.doc_id
         |ORDER BY h.doc_id""".stripMargin,
    // connected components via the same recursive-CTE min-label closure
    // as Sketches.clusterSql; label propagation's 20 rounds converge on
    // these Hamming-ball components (diameter ≪ 20)
    "q_image_dedup_cluster" ->
      s"""WITH RECURSIVE $dhashCte,
         |pairs AS (
         |  SELECT x.doc_id AS da, y.doc_id AS db
         |  FROM h x JOIN h y ON x.doc_id < y.doc_id
         |  WHERE bit_count(xor(x.bits, y.bits)) <= 3),
         |edges AS (SELECT da AS src, db AS dst FROM pairs
         |          UNION SELECT db, da FROM pairs),
         |reach(id, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.dst, r.r FROM reach r JOIN edges e ON e.src = r.id),
         |lbl AS (SELECT id, MIN(r) AS rep FROM reach GROUP BY id),
         |asg AS (SELECT h.doc_id, COALESCE(l.rep, h.doc_id) AS cluster_rep
         |        FROM h LEFT JOIN lbl l ON h.doc_id = l.id)
         |SELECT doc_id, cluster_rep,
         |  CAST(COUNT(*) OVER (PARTITION BY cluster_rep) AS BIGINT)
         |    AS cluster_size
         |FROM asg ORDER BY doc_id""".stripMargin,
  )

  /** [[byteDHash]]'s 64 bit terms rendered as DuckDB SQL. Bit 63 is the
    * BIGINT sign bit, so its term adds Long.MinValue instead of 2^63 —
    * the sum then reproduces the Scala Long bit-for-bit and
    * `to_hex`/`lpad` renders the same 16 hex digits as `f"$h%%016x"`. */
  private lazy val dhashBitsSql: String =
    (for { r <- 0 until 8; c <- 0 until 8 } yield {
      val k = r * 8 + c
      val a = r * 9 + c
      val coef =
        if (k == 63) "-9223372036854775808" else (1L << k).toString
      s"(CASE WHEN a[${a + 1}] > a[${a + 2}] THEN CAST($coef AS BIGINT)" +
        s" ELSE CAST(0 AS BIGINT) END)"
    }).mkString(" + ")

  /** Shared CTE prefix: per-doc 72-byte sample (byteDHash's evenly-
    * spaced index rule, `(n-1)·i/71` in integer math) → signature bits. */
  private lazy val dhashCte: String =
    s"""p AS (SELECT doc_id, text, strlen(text) AS n FROM documents),
       |b AS (SELECT doc_id,
       |  list_transform(range(0, 72),
       |    i -> CASE WHEN n = 0 THEN 0
       |         ELSE ord(substr(text,
       |                CAST((n - 1) * i // 71 AS INTEGER) + 1, 1)) END)
       |    AS a
       |  FROM p),
       |h AS (SELECT doc_id, $dhashBitsSql AS bits FROM b)""".stripMargin
}
