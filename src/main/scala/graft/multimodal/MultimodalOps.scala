package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Media record: an opaque binary payload plus typed metadata — the
  * multimodal column model (image/audio/video as `binary` + struct).
  */
final case class MediaRecord(
    doc_id: Long,
    media_type: String,
    payload: Array[Byte])

final case class DecodedMedia(
    doc_id: Long,
    media_type: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    n_frames: Int)

final case class FrameSample(
    doc_id: Long,
    frame_idx: Int,
    frame_hash: Long)

final case class ResizedMedia(
    doc_id: Long,
    width: Int,
    height: Int,
    out_w: Int,
    out_h: Int)

final case class MediaFeatures(
    doc_id: Long,
    f0: Long, f1: Long, f2: Long, f3: Long,
    f4: Long, f5: Long, f6: Long, f7: Long)

/** Multimodal-column plumbing: binary payloads flow through typed
  * Datasets; decode/feature-extract runs per-partition (mapPartitions —
  * the Scala analog of an Arrow-batched pandas UDF: one decoder
  * instance per partition, rows streamed through it, never collected).
  *
  * The codec itself is STUBBED — no image/audio libraries ship in this
  * container — with a deterministic fake that derives dimensions from a
  * stable byte hash. The Spark-side contract (schema, partitioning,
  * batch shape, per-partition init) is real and tested; swapping
  * `decodeStub` for a JNI/javacv call changes nothing structurally.
  */
object MultimodalOps {
  type Q = (SparkSession, String) => DataFrame

  /** Stable 64-bit FNV-1a over the payload — drives the fake decoder. */
  private def byteHash(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) {
      h = (h ^ (b(i) & 0xff)) * 0x100000001b3L
      i += 1
    }
    h
  }

  /** STUB decoder — deterministic fake in place of a real codec. */
  private def decodeStub(r: MediaRecord): DecodedMedia = {
    val h = byteHash(r.payload)
    val width = 16 + (math.abs(h % 1905L)).toInt
    val height = 16 + (math.abs((h >>> 17) % 1065L)).toInt
    val frames = r.media_type match {
      case "video" => 1 + (math.abs((h >>> 31) % 240L)).toInt
      case _ => 1
    }
    DecodedMedia(r.doc_id, r.media_type, r.payload.length.toLong,
      width, height, frames)
  }

  /** The documents table reinterpreted as a media corpus: text bytes as
    * the opaque payload, media type assigned deterministically.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents")
      .select(col("doc_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("media_type"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[MediaRecord]
  }

  /** Per-partition decode: one decoder per partition, rows streamed. */
  def decodeAll(media: Dataset[MediaRecord]): Dataset[DecodedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder init would go here (real codecs are
      // expensive to construct — never per-row)
      rows.map(decodeStub)
    }
  }

  /** Frame sampling: every k-th frame of video payloads, hash per frame
    * (stand-in for a thumbnail/feature tensor).
    */
  def sampleFrames(media: Dataset[MediaRecord], everyK: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val d = decodeStub(r)
        if (r.media_type != "video") Iterator.empty
        else (0 until d.n_frames by everyK).iterator.map(i =>
          FrameSample(r.doc_id, i, byteHash(r.payload) + i))
      }
    }
  }

  /** Aspect-preserving resize planning (letterbox fit into tw×th):
    * INTEGER-EXACT throughout — the limiting side is chosen by
    * cross-multiplication (tw·height ≤ th·width ⇔ width-limited, no
    * float ratio), the scaled side is a floor division. A real codec
    * would consume these target dims; the arithmetic that PICKS them is
    * the part worth pinning cross-engine, and it replays exactly in the
    * DuckDB oracle.
    */
  def resizeAll(media: Dataset[MediaRecord], tw: Int,
      th: Int): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val d = decodeStub(r)
        val widthLimited = tw.toLong * d.height <= th.toLong * d.width
        val (ow, oh) =
          if (widthLimited)
            (tw, math.max(1L, tw.toLong * d.height / d.width).toInt)
          else
            (math.max(1L, th.toLong * d.width / d.height).toInt, th)
        ResizedMedia(r.doc_id, d.width, d.height, ow, oh)
      }
    }
  }

  /** Per-partition feature extraction: the payload folded into an
    * 8-lane byte histogram (lane j sums bytes at positions ≡ j mod 8) —
    * the stand-in for a real embedding pass, with the same shape: one
    * extractor per partition, a fixed-width numeric vector per row,
    * integer-exact so the oracle can replay it. Lanes emitted as
    * columns (f0..f7) because the driver gate hashes scalars.
    */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val acc = new Array[Long](8)
        val b = r.payload
        var i = 0
        while (i < b.length) { acc(i & 7) += (b(i) & 0xff); i += 1 }
        MediaFeatures(r.doc_id, acc(0), acc(1), acc(2), acc(3),
          acc(4), acc(5), acc(6), acc(7))
      }
    }
  }

  /** Oracle-checkable metadata pass: payload size + content hash, all
    * Catalyst built-ins (no stub involvement).
    */
  private val multimodalMeta: Q = (spark, dir) =>
    Tables.load(spark, dir, "documents").select(
      col("doc_id"),
      octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
      sha2(encode(col("text"), "UTF-8"), 256).as("sha"))
      .orderBy("doc_id")

  /** Decode pipeline end-to-end (stubbed codec, real plumbing). */
  private val multimodalDecode: Q = (spark, dir) =>
    decodeAll(mediaTable(spark, dir)).toDF().orderBy("doc_id")

  /** REAL codec behind the same boundary: a PNG corpus whose image
    * dimensions are known arithmetic functions of doc_id, encoded with
    * the JDK's own ImageIO (genuine PNG bytes — magic, IHDR, zlib
    * chunks), then decoded back by a per-partition PNG ImageReader.
    * The oracle predicts width/height from the doc_id arithmetic, so
    * the driver hash-checks that a REAL decoder recovered exactly the
    * dimensions that went in; the decode cannot be faked because the
    * reader parses actual PNG structure. The stubbed decode queries
    * keep their byte-fold replays — this lane proves the boundary
    * carries a true codec without losing the oracle.
    */
  def pngTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions { ids =>
        // per-partition encoder config: ImageIO's disk cache off once,
        // not per row (the writer itself is looked up inside write())
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val w = 8 + (id % 32).toInt
          val h = 8 + ((id * 7) % 24).toInt
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          // deterministic pixel content (payload bytes stable per id)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((id * 31 + x * 7 + y) & 0xffffff).toInt)
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRecord(id, "image", out.toByteArray)
        }
      }
  }

  final case class PngMeta(doc_id: Long, png_w: Int, png_h: Int)

  /** Header-only metadata decode with ONE reusable PNG ImageReader per
    * partition (the expensive-codec-init pattern for real): getWidth/
    * getHeight parse the IHDR chunk without decoding pixel data — the
    * metadata fast path a 100 TB media crawl actually wants.
    */
  def decodePngMeta(media: Dataset[MediaRecord]): Dataset[PngMeta] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next() // once per partition
      rows.map { r =>
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        try {
          reader.setInput(in)
          PngMeta(r.doc_id, reader.getWidth(0), reader.getHeight(0))
        } finally in.close()
      }
    }
  }

  private val multimodalPng: Q = (spark, dir) =>
    decodePngMeta(pngTable(spark, dir)).toDF().orderBy("doc_id")

  // ---------------------------------------------------------------
  // Perceptual image near-dup (dHash + Hamming-band join)
  // ---------------------------------------------------------------

  final case class DHashed(doc_id: Long, dhash: Long)

  /** PNG corpus for the DEDUP lane: image identity is driven by
    * doc_id % 97, so the corpus carries real duplicate images
    * (~500/97 exact copies of each of 97 distinct gradients at
    * sf0.01) — the shape an image-dedup pass exists to catch. Width ≥
    * 9 and height ≥ 8 guarantee every dHash grid cell is non-empty.
    * Same real-codec boundary as [[pngTable]]: genuine PNG bytes via
    * ImageIO, deterministic pixel arithmetic the oracle can predict.
    */
  def dedupPngTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables.load(spark, dir, "documents").select("doc_id").as[Long]
      .mapPartitions { ids =>
        javax.imageio.ImageIO.setUseCache(false)
        ids.map { id =>
          val k = (id % 97).toInt
          val w = 9 + (k % 32)
          val h = 8 + ((k * 7) % 24)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y, ((k * 31 + x * 7 + y) % 16777216))
              x += 1
            }
            y += 1
          }
          val out = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", out)
          MediaRecord(id, "image", out.toByteArray)
        }
      }
  }

  /** 63-bit dHash (difference hash — the standard perceptual
    * image-dedup fingerprint): average-pool the decoded image onto a
    * 9×8 luminance grid (cell = integer box x·9/w, y·8/h), then bit
    * (gy·8+gx) compares horizontally adjacent cell MEANS by integer
    * cross-multiplication (sumA·nB > sumB·nA — no float division
    * anywhere). Bit 63 is deliberately dropped: the value stays a
    * positive BIGINT, which both engines shift and band identically
    * (DuckDB raises on 1::BIGINT << 63). Decode is a REAL ImageIO
    * pixel decode — one reader per partition, the full-decode sibling
    * of [[decodePngMeta]]'s header-only fast path.
    */
  def dHashAll(media: Dataset[MediaRecord]): Dataset[DHashed] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val reader = javax.imageio.ImageIO
        .getImageReadersByFormatName("png").next() // once per partition
      rows.map { r =>
        val in = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(r.payload))
        val img =
          try { reader.setInput(in); reader.read(0) }
          finally in.close()
        val w = img.getWidth
        val h = img.getHeight
        val s = Array.ofDim[Long](8, 9)
        val n = Array.ofDim[Long](8, 9)
        var y = 0
        while (y < h) {
          val gy = y * 8 / h
          var x = 0
          while (x < w) {
            val gx = x * 9 / w
            val p = img.getRGB(x, y) & 0xffffff
            s(gy)(gx) += ((p >> 16) & 255) + ((p >> 8) & 255) + (p & 255)
            n(gy)(gx) += 1
            x += 1
          }
          y += 1
        }
        var hash = 0L
        var gy = 0
        while (gy < 8) {
          var gx = 0
          while (gx < 8 && gy * 8 + gx < 63) {
            if (s(gy)(gx) * n(gy)(gx + 1) > s(gy)(gx + 1) * n(gy)(gx))
              hash |= 1L << (gy * 8 + gx)
            gx += 1
          }
          gy += 1
        }
        DHashed(r.doc_id, hash)
      }
    }
  }

  /** Image near-dup removal: dHash per image, Manku-style banding
    * (4 bands × 16 bits — the [[graft.operators.DedupOps]] simhash
    * machinery verbatim, candidate pairs ONLY from shared band
    * buckets, never all-pairs), Hamming ≤ `maxHamming` verify, larger
    * doc_id of each verified pair removed. At 100 TB: one real decode
    * pass map-side, 16 bytes of fingerprint per image into one
    * band-keyed shuffle — the image analog of text MinHash dedup.
    */
  // persist-once (the DedupOps.persistOnce contract): the dHash frame
  // feeds five plan branches and every bench pass — one pinned copy
  // per (app, dataset), not one per invocation; CacheRegistry-managed
  // so a marathon session eventually evicts and a later call rebuilds
  def imageDedup(spark: SparkSession, dir: String,
      maxHamming: Int = 3): DataFrame = {
    val dh = graft.engine.CacheRegistry.memo("mm.dhash",
      s"${spark.sparkContext.applicationId}#$dir")(
      dHashAll(dedupPngTable(spark, dir)).toDF().persist())(
      _.unpersist(blocking = false))
    val withBands = dh.select(col("doc_id"),
      array((0 until 4).map { j =>
        struct(lit(j).as("band"),
          shiftright(col("dhash"), j * 16).bitwiseAND(lit(0xffffL)).as("key"))
      }: _*).as("bands"))
    val pairs = graft.operators.DedupOps.bandPairs(withBands, "doc_id")
    val side = (a: String) => dh.select(
      col("doc_id").as(s"id_$a"), col("dhash").as(s"dh_$a"))
    val dups = pairs
      .join(side("a"), "id_a").join(side("b"), "id_b")
      .where(bit_count(col("dh_a").bitwiseXOR(col("dh_b"))) <= maxHamming)
      .select(col("id_b").as("doc_id")).distinct()
    val out = dh.join(dups, Seq("doc_id"), "left_anti").orderBy("doc_id")
    out
  }

  private val multimodalDedup: Q = (spark, dir) => imageDedup(spark, dir)

  /** Frame sampling over the video subset. */
  private val multimodalFrames: Q = (spark, dir) =>
    sampleFrames(mediaTable(spark, dir), everyK = 30).toDF()
      .orderBy("doc_id", "frame_idx")

  /** Resize planning to a 224×224 target (the standard vision-model
    * input) over the media corpus.
    */
  private val multimodalResize: Q = (spark, dir) =>
    resizeAll(mediaTable(spark, dir), tw = 224, th = 224)
      .toDF().orderBy("doc_id")

  /** Feature extraction over the media corpus. */
  private val multimodalFeatures: Q = (spark, dir) =>
    extractFeatures(mediaTable(spark, dir)).toDF().orderBy("doc_id")

  val queries: Map[String, Q] = Map(
    "e_multimodal_meta" -> multimodalMeta,
    "e_multimodal_png" -> multimodalPng,
    "e_multimodal_dedup" -> multimodalDedup,
    "e_multimodal_decode" -> multimodalDecode,
    "e_multimodal_frames" -> multimodalFrames,
    "e_multimodal_resize" -> multimodalResize,
    "e_multimodal_features" -> multimodalFeatures,
  )

  /** The decode/frames stub is a pure function of the payload bytes
    * (FNV-1a fold), so DuckDB can replay it: the fold runs as a
    * recursive CTE in HUGEINT arithmetic mod 2⁶⁴ (XOR emulated on the
    * low byte — the only byte the XOR can touch), then width/height/
    * frame fields derive from the hash exactly as in [[decodeStub]].
    * ascii(substr(..)) == the UTF-8 byte because the corpus is pure
    * ASCII (verified in the rolling-hash oracle's notes).
    */
  private val fnvCte: String =
    """RECURSIVE fnv(doc_id, i, n, h) AS (
      |  SELECT doc_id, 0, length(text), 14695981039346656037::HUGEINT
      |  FROM documents
      |  UNION ALL
      |  SELECT f.doc_id, f.i + 1, f.n,
      |    (((f.h - (f.h % 256))
      |       + xor((f.h % 256)::BIGINT,
      |             ascii(substr(d.text, f.i + 1, 1)))::HUGEINT)
      |      * 1099511628211) % 18446744073709551616::HUGEINT
      |  FROM fnv f JOIN documents d ON f.doc_id = d.doc_id WHERE f.i < f.n
      |), hashed AS (
      |  SELECT doc_id, h,
      |    CASE WHEN h >= 9223372036854775808::HUGEINT
      |         THEN (h - 18446744073709551616::HUGEINT)::BIGINT
      |         ELSE h::BIGINT END AS hs
      |  FROM fnv WHERE i = n
      |), media AS (
      |  SELECT d.doc_id,
      |    CASE d.doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
      |         ELSE 'video' END AS media_type,
      |    length(d.text)::BIGINT AS n_bytes, h.h, h.hs
      |  FROM documents d JOIN hashed h USING (doc_id)
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    // dHash dedup replay: the oracle predicts from the doc_id
    // arithmetic exactly what the REAL pixel decode must recover, then
    // replays the 9×8 cross-multiplied pooling, the 63-bit hash, the
    // 4×16-bit banding with the bucket cap, and the Hamming ≤ 3
    // verify + anti join (the simhash-md5 oracle shape)
    "e_multimodal_dedup" ->
      """WITH dims AS (
        |  SELECT doc_id, doc_id % 97 AS k,
        |    (9 + (doc_id % 97) % 32)::BIGINT AS w,
        |    (8 + ((doc_id % 97) * 7) % 24)::BIGINT AS h
        |  FROM documents
        |), cells AS (
        |  SELECT doc_id, (y.y * 8) // h AS gy, (x.x * 9) // w AS gx,
        |    sum(((p // 65536) % 256) + ((p // 256) % 256) + (p % 256))::BIGINT AS s,
        |    count(*)::BIGINT AS n
        |  FROM dims,
        |    LATERAL (SELECT unnest(generate_series(0, CAST(w - 1 AS INT))) AS x) x,
        |    LATERAL (SELECT unnest(generate_series(0, CAST(h - 1 AS INT))) AS y) y,
        |    LATERAL (SELECT (k * 31 + x.x * 7 + y.y) % 16777216 AS p) pp
        |  GROUP BY doc_id, gy, gx
        |), bits AS (
        |  SELECT a.doc_id,
        |    CASE WHEN a.s * b.n > b.s * a.n
        |      THEN (1::BIGINT << CAST(a.gy * 8 + a.gx AS INT))
        |      ELSE 0::BIGINT END AS bit
        |  FROM cells a JOIN cells b
        |    ON a.doc_id = b.doc_id AND a.gy = b.gy AND b.gx = a.gx + 1
        |  WHERE a.gx < 8 AND a.gy * 8 + a.gx < 63
        |), dh AS (
        |  SELECT doc_id, sum(bit)::BIGINT AS dhash FROM bits GROUP BY doc_id
        |), bands AS (
        |  SELECT doc_id, 0 AS band, (dhash >> 0) & 65535 AS key FROM dh
        |  UNION ALL SELECT doc_id, 1, (dhash >> 16) & 65535 FROM dh
        |  UNION ALL SELECT doc_id, 2, (dhash >> 32) & 65535 FROM dh
        |  UNION ALL SELECT doc_id, 3, (dhash >> 48) & 65535 FROM dh
        |), okbuckets AS (
        |  SELECT * FROM bands
        |  QUALIFY count(*) OVER (PARTITION BY band, key) <= 1000
        |), pairs AS (
        |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM okbuckets a JOIN okbuckets b
        |    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
        |), dups AS (
        |  SELECT DISTINCT p.id_b AS doc_id
        |  FROM pairs p
        |  JOIN dh da ON da.doc_id = p.id_a
        |  JOIN dh db ON db.doc_id = p.id_b
        |  WHERE bit_count(xor(da.dhash, db.dhash)) <= 3
        |)
        |SELECT d.doc_id, d.dhash FROM dh d
        |LEFT JOIN dups USING (doc_id) WHERE dups.doc_id IS NULL
        |ORDER BY d.doc_id""".stripMargin,
    // the oracle predicts what the REAL PNG decoder must recover: the
    // encode dims are pure doc_id arithmetic, the decode is ImageIO
    "e_multimodal_png" ->
      """SELECT doc_id, (8 + doc_id % 32)::INT AS png_w,
        |(8 + (doc_id * 7) % 24)::INT AS png_h
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |sha256(text) AS sha
        |FROM documents ORDER BY doc_id""".stripMargin,
    "e_multimodal_decode" -> (s"WITH $fnvCte\n" +
      """SELECT doc_id, media_type, n_bytes,
        |  (16 + abs(hs % 1905))::INT AS width,
        |  (16 + ((h // 131072) % 1065)::BIGINT)::INT AS height,
        |  CASE WHEN media_type = 'video'
        |       THEN (1 + ((h // 2147483648) % 240)::BIGINT)::INT
        |       ELSE 1 END AS n_frames
        |FROM media ORDER BY doc_id""".stripMargin),
    // width/height derive from the fnv hash exactly as in decode; the
    // letterbox choice is the same integer cross-multiplication and
    // floor division as resizeAll (// floors for positives in DuckDB)
    "e_multimodal_resize" -> (s"WITH $fnvCte\n" +
      """, dims AS (
        |  SELECT doc_id,
        |    (16 + abs(hs % 1905))::BIGINT AS width,
        |    (16 + ((h // 131072) % 1065)::BIGINT)::BIGINT AS height
        |  FROM media
        |)
        |SELECT doc_id, width::INT AS width, height::INT AS height,
        |  CASE WHEN 224 * height <= 224 * width THEN 224
        |       ELSE greatest(1, (224 * width) // height)::INT END AS out_w,
        |  CASE WHEN 224 * height <= 224 * width
        |       THEN greatest(1, (224 * height) // width)::INT
        |       ELSE 224 END AS out_h
        |FROM dims ORDER BY doc_id""".stripMargin),
    // lane j = sum of UTF-8 byte values at positions ≡ j mod 8; the
    // corpus is pure ASCII so ascii(char) == the byte. LEFT JOIN keeps
    // zero-length payloads as all-zero lanes, matching the Scala fold.
    "e_multimodal_features" ->
      """WITH pos AS (
        |  SELECT doc_id, p, ascii(substr(text, p + 1, 1)) AS a
        |  FROM documents, LATERAL (
        |    SELECT unnest(generate_series(0, length(text) - 1)) AS p) t
        |)
        |SELECT d.doc_id,
        |  coalesce(sum(CASE WHEN p % 8 = 0 THEN a END), 0)::BIGINT AS f0,
        |  coalesce(sum(CASE WHEN p % 8 = 1 THEN a END), 0)::BIGINT AS f1,
        |  coalesce(sum(CASE WHEN p % 8 = 2 THEN a END), 0)::BIGINT AS f2,
        |  coalesce(sum(CASE WHEN p % 8 = 3 THEN a END), 0)::BIGINT AS f3,
        |  coalesce(sum(CASE WHEN p % 8 = 4 THEN a END), 0)::BIGINT AS f4,
        |  coalesce(sum(CASE WHEN p % 8 = 5 THEN a END), 0)::BIGINT AS f5,
        |  coalesce(sum(CASE WHEN p % 8 = 6 THEN a END), 0)::BIGINT AS f6,
        |  coalesce(sum(CASE WHEN p % 8 = 7 THEN a END), 0)::BIGINT AS f7
        |FROM documents d LEFT JOIN pos USING (doc_id)
        |GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin,
    "e_multimodal_frames" -> (s"WITH $fnvCte\n" +
      """SELECT doc_id, frame_idx,
        |  CASE WHEN hw >= 9223372036854775808::HUGEINT
        |       THEN (hw - 18446744073709551616::HUGEINT)::BIGINT
        |       ELSE hw::BIGINT END AS frame_hash
        |FROM (
        |  SELECT doc_id, h,
        |    unnest(generate_series(0,
        |      (1 + ((h // 2147483648) % 240)::BIGINT)::INT - 1, 30))::INT
        |      AS frame_idx
        |  FROM media WHERE media_type = 'video'
        |) f, LATERAL (SELECT (f.h + f.frame_idx)
        |              % 18446744073709551616::HUGEINT AS hw) x
        |ORDER BY doc_id, frame_idx""".stripMargin),
  )
}
