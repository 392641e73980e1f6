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

  /** Frame sampling over the video subset. */
  private val multimodalFrames: Q = (spark, dir) =>
    sampleFrames(mediaTable(spark, dir), everyK = 30).toDF()
      .orderBy("doc_id", "frame_idx")

  val queries: Map[String, Q] = Map(
    "e_multimodal_meta" -> multimodalMeta,
    "e_multimodal_decode" -> multimodalDecode,
    "e_multimodal_frames" -> multimodalFrames,
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
