package graft

import org.apache.spark.sql.SparkSession

/** BPE merge-DEPTH rehearsal: run the induction loop to a realistic
  * merge count (default 256 — two orders past the gate's 8) at sweep
  * scale and MEASURE the per-round cost trend, instead of
  * extrapolating from single-digit rounds. Prints one JSON line per
  * round — (mode, round, merges applied, wall ms, |touched| proxy via
  * count-table size) — then a summary comparing the sequential loop
  * against the batched one ([[graft.operators.CorpusOps.bpeMergeLoopBatched]],
  * batch=8): if the per-round driver round-trip dominates (it does at
  * fixture scale — each round is a fixed number of tiny Spark jobs),
  * batching is the lever that divides the job-wave count, and this
  * artifact records the measured division.
  *
  * Run: `sbt "runMain graft.BpeDepth [merges] [batch]"`; capture
  * stdout JSON to SWEEP_BPE.json.
  */
object BpeDepth {
  def main(args: Array[String]): Unit = {
    val merges = args.headOption.map(_.toInt).getOrElse(256)
    val batch = args.lift(1).map(_.toInt).getOrElse(8)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")

    def run(mode: String, b: Int): (Double, Seq[Long]) = {
      val times = scala.collection.mutable.ArrayBuffer.empty[Long]
      val t0 = System.nanoTime()
      val r = graft.operators.CorpusOps.bpeMergeLoopBatched(docs, merges, b,
        (round, n, ms) => {
          times += ms
          println(s"""{"mode":"$mode","round":$round,"n_merges":$n,"ms":$ms}""")
        })
      val total = (System.nanoTime() - t0) / 1e9
      require(r.vocab.size == merges, s"$mode stopped at ${r.vocab.size}")
      r.seqs.unpersist()
      (total, times.toSeq)
    }

    val (seqTotal, seqTimes) = run("seq", 1)
    val (batTotal, batTimes) = run(s"b$batch", batch)
    def avg(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0.0 else xs.sum.toDouble / xs.size
    val q = seqTimes.size / 4
    println(s"""{"metric":"bpe_depth","sf_dir":"$dir","merges":$merges,""" +
      s""""seq_total_sec":${math.round(seqTotal * 100) / 100.0},""" +
      s""""seq_ms_first_quarter":${math.round(avg(seqTimes.take(q)))},""" +
      s""""seq_ms_last_quarter":${math.round(avg(seqTimes.takeRight(q)))},""" +
      s""""batch":$batch,"batch_rounds":${batTimes.size},""" +
      s""""batch_total_sec":${math.round(batTotal * 100) / 100.0},""" +
      s""""speedup":${math.round(seqTotal / batTotal * 100) / 100.0}}""")
    spark.stop()
  }
}
