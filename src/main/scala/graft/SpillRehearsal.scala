package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** Memory-pressure rehearsal: run the full query set at the synthetic
  * 10× with executor memory deliberately constrained so sorts, hash
  * aggregates, and joins actually SPILL — and assert that everything
  * still completes (spill, not OOM). The 128 GiB sandbox never forces
  * a spill naturally; at 100 TB every wide operator will, so this is
  * the rehearsal for the property the suite otherwise cannot observe:
  * graceful degradation under memory pressure.
  *
  * Mechanism: `spark.testing.memory` caps the memory the
  * UnifiedMemoryManager believes it has (the knob Spark's own test
  * suites use for exactly this; JVM heap stays large, so parquet
  * buffers/codegen are unaffected — only the managed
  * execution+storage pool shrinks). Default 512 MB across the worker
  * threads (r15 ran green at 768; r16 tightened to find the next
  * break point) ⇒ a few MB of execution memory per task at 10× data,
  * which forces multi-pass external sorts/aggregations. The
  * CacheRegistry byte budget is tied to a quarter of the cap so memo
  * eviction engages at the simulated pressure. Spill bytes are
  * collected per query from task metrics via a listener.
  *
  * Output: one JSON line per query (seconds, memory/disk spill bytes,
  * ok flag), then a summary (`n_failed` — expect 0, total spill,
  * queries-that-spilled count), mirrored to SWEEP_SPILL.json.
  *
  * Run: `sbt "runMain graft.SpillRehearsal"` (reuses the cached 10×
  * fixture; generate once via ScaleSweep or SweepCurve).
  */
object SpillRehearsal {
  def main(args: Array[String]): Unit = {
    val synth = args.headOption.getOrElse("/tmp/graft_sf1_synth")
    val capBytes = sys.env.getOrElse("SPARK_GRAFT_SPILL_MEM",
      (512L * 1024 * 1024).toString)
    // Task slots scale WITH the cap (~64 MB of managed pool per slot,
    // floor 4): a genuinely small executor has proportionally few
    // cores. The r16 512 MB run at the old fixed 32 slots measured the
    // alternative — ~5 MB of execution memory per task once the
    // storage floor is carved out, a ratio no deployment guide
    // permits: eight dedup/TPC-H queries died UNABLE_TO_ACQUIRE and
    // the leaked task buffers of those failures cascaded into a heap
    // OOM mid-marathon. 512 MB / 8 slots is the honest small-executor
    // shape (64 MB/slot); SPARK_GRAFT_CPUS still overrides.
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.max(4L, capBytes.toLong / (64L * 1024 * 1024)).toString)
    // The CacheRegistry's default byte budget derives from the JVM
    // heap, but this rehearsal caps the MANAGED pool far below it —
    // tie the memo budget to the capped pool (a quarter, the same
    // ratio as the default) so eviction engages at the pressure the
    // rehearsal simulates, exactly as it would on a genuinely small
    // executor.
    if (sys.props.get("graft.cache.maxResidentBytes").isEmpty)
      sys.props("graft.cache.maxResidentBytes") =
        (capBytes.toLong / 4).toString
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .config("spark.testing.memory", capBytes)
      // memory-tight deployments tune the protected storage floor DOWN
      // (Spark tuning guide): at 512 MB the default 0.5 floor protects
      // 150+ MB of persisted blocks while a streaming micro-batch's
      // aggregation starves 256 KB short of a page — measured r16 on
      // e_stream_ingest_dedup / e_stream_static_replay, the last two
      // 512 MB victims, both green at 0.1
      .config("spark.memory.storageFraction", "0.1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.SyntheticScale.ensure(spark,
      "/root/testdata/sf0.1", synth)

    val spillMem = new AtomicLong(0)
    val spillDisk = new AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          spillMem.addAndGet(m.memoryBytesSpilled)
          spillDisk.addAndGet(m.diskBytesSpilled)
        }
      }
    })

    def runFull(name: String): Unit = graft.engine.CacheRegistry.scoped {
      SparkEntry.queries(name)(spark, synth)
        .write.format("noop").mode("overwrite").save()
    }

    val only = args.drop(1).toSet
    val names = (SparkEntry.queries.keySet - "r_catalog").toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    runFull("r_inner_join")

    val out = new StringBuilder
    var failed = List.empty[String]
    var spilled = 0
    names.foreach { name =>
      val m0 = spillMem.get(); val d0 = spillDisk.get()
      val t0 = System.nanoTime()
      val ok =
        try { runFull(name); true }
        catch { case e: Throwable =>
          System.err.println(s"[spill] $name FAILED: ${e.getMessage}")
          failed ::= name
          false
        }
      // listener events drain asynchronously (listenerBus is
      // private[spark]); a short settle keeps per-query attribution
      // honest — totals are exact regardless
      Thread.sleep(150)
      val secs = (System.nanoTime() - t0) / 1e9
      val dm = spillMem.get() - m0
      val dd = spillDisk.get() - d0
      if (dm + dd > 0) spilled += 1
      System.err.println(
        f"[spill] $name%-28s $secs%7.2f s  mem=${dm / 1e6}%9.1f MB  disk=${dd / 1e6}%9.1f MB  ok=$ok")
      val line =
        s"""{"query":"$name","secs":${f"$secs%.3f"},"spill_mem_bytes":$dm,"spill_disk_bytes":$dd,"ok":$ok}"""
      println(line)
      out.append(line).append('\n')
    }
    val summary = s"""{"metric":"spill_rehearsal","mem_cap_bytes":$capBytes,""" +
      s""""n_queries":${names.size},"n_failed":${failed.size},""" +
      s""""failed":[${failed.map("\"" + _ + "\"").mkString(",")}],""" +
      s""""n_spilled":$spilled,"total_spill_mem":${spillMem.get()},""" +
      s""""total_spill_disk":${spillDisk.get()}}"""
    println(summary)
    out.append(summary).append('\n')
    java.nio.file.Files.write(
      java.nio.file.Paths.get("/root/repo/SWEEP_SPILL.json"),
      out.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
