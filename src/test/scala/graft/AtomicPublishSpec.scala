package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.AtomicPublish

/** The commit protocol's crash contract: readers never see a torn
  * snapshot — any failure before the manifest move leaves the
  * previous version fully readable.
  */
class AtomicPublishSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_pub_spec").toString

  test("publish commits versions and readLatest follows the manifest") {
    val root = freshRoot()
    assert(AtomicPublish.current(root).isEmpty)
    intercept[IllegalStateException] {
      AtomicPublish.readLatest(spark, root)
    }
    val v1 = AtomicPublish.publish(
      Seq((1L, "a"), (2L, "b")).toDF("id", "s"), root)
    assert(v1 == 1L)
    assert(AtomicPublish.readLatest(spark, root).count() == 2)
    val v2 = AtomicPublish.publish(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s"), root)
    assert(v2 == 2L)
    assert(AtomicPublish.readLatest(spark, root)
      .orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("a crash mid data-write leaves the previous snapshot intact") {
    val root = freshRoot()
    AtomicPublish.publish(Seq((1L, "x")).toDF("id", "s"), root)
    // simulate a writer dying after creating the next version dir and
    // some partial files, BEFORE the manifest swap
    val torn = Paths.get(root, "v2")
    Files.createDirectories(torn)
    Files.write(torn.resolve("part-00000.parquet"),
      "not a parquet file".getBytes(StandardCharsets.UTF_8))
    val seen = AtomicPublish.readLatest(spark, root)
      .as[(Long, String)].collect().toSeq
    assert(seen == Seq((1L, "x")), "reader saw the torn version")
    // the next successful publish reclaims the orphan version number
    // path by moving past it
    val v = AtomicPublish.publish(Seq((2L, "y")).toDF("id", "s"), root)
    assert(v == 2L)
    assert(AtomicPublish.readLatest(spark, root)
      .as[(Long, String)].collect().toSeq == Seq((2L, "y")))
  }

  test("a crash mid manifest-write is invisible to readers") {
    val root = freshRoot()
    AtomicPublish.publish(Seq((1L, "x")).toDF("id", "s"), root)
    // a stale half-written manifest temp never shadows the manifest
    Files.write(Paths.get(root, "_manifest.tmp"),
      """{"version":99,"dir":""".getBytes(StandardCharsets.UTF_8))
    assert(AtomicPublish.current(root).map(_._1) == Some(1L))
    assert(AtomicPublish.readLatest(spark, root).count() == 1)
  }

  test("publish GCs versions older than the previous one") {
    val root = freshRoot()
    for (i <- 1 to 4)
      AtomicPublish.publish(Seq((i.toLong, "r")).toDF("id", "s"), root)
    val dirs = Files.list(Paths.get(root)).toArray.map(_.toString)
      .filter(p => Files.isDirectory(Paths.get(p)))
      .map(p => Paths.get(p).getFileName.toString).sorted.toSeq
    assert(dirs == Seq("v3", "v4"), s"expected v3+v4 kept, got $dirs")
  }
}
