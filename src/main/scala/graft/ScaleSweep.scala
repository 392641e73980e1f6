package graft

import org.apache.spark.sql.SparkSession

/** Full-query-set scale sweep: time every registered query at sf0.1 and
  * at a synthetic 10x of it ([[graft.sources.SyntheticScale]] — replica
  * keys disjoint, structure preserved, so cost must grow ~linearly),
  * and flag supralinear growth. This is the harness that catches the
  * next O(n^2) trap (the interpreted-HOF and pushdown-inlining traps of
  * earlier rounds were only caught because a bigger-input measurement
  * existed) BEFORE a 100x user does.
  *
  * Run: `sbt "runMain graft.ScaleSweep"` (~15-25 min; the 10x fixture is
  * generated once into /tmp and reused). Output: one JSON line per
  * query, slowest-growth first, then a summary line; growth beyond
  * `BAR` (10x data on fixed parallelism => ~10x work is linear; 30x
  * tolerates partition-count and constant-factor noise) lists the query
  * in "flagged" — expect an empty list.
  */
object ScaleSweep {
  def main(args: Array[String]): Unit = {
    val base = "/root/testdata/sf0.1"
    // --skew: sweep against the Zipfian-hot-key 10x variant instead of
    // the uniform one (SyntheticScale.ensureSkewed) and additionally
    // verify AQE's skew-join split actually engages on the hot key.
    // Same 30x bar: a skew pathology (one straggler task carrying the
    // hot partition) shows up as growth, exactly like any other
    // superlinearity.
    val skewMode = args.contains("--skew")
    // strip ALL flags before positional parsing: leaving --longgram in
    // posArgs once made the flag itself the synth-dir argument, so the
    // 10x fixture (153 MB) was generated into a cwd-relative
    // "./--longgram" directory and committed
    val posArgs = args.filterNot(_.startsWith("--"))
    val synth = posArgs.headOption.getOrElse(
      if (skewMode) "/tmp/graft_sf1_skew" else "/tmp/graft_sf1_synth")
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

    if (skewMode) graft.sources.SyntheticScale.ensureSkewed(spark, base, synth)
    else graft.sources.SyntheticScale.ensure(spark, base, synth)

    // --longgram: measure the text-vs-hashed shuffle lanes at the gram
    // and paragraph sizes they are DESIGNED for (Lee et al. dedups at
    // ~50 BPE tokens ≈ 200+ chars; the fixture gate runs k=20 chars /
    // p=4 tokens, where a 24-byte hash pair is no narrower than the
    // text it replaces). One row per (family, size, lane) at 1x and
    // the synthetic 10x — the crossover artifact SURVEY cites.
    if (args.contains("--longgram")) {
      runLongGram(spark, base, synth)
      spark.stop()
      return
    }

    def runFull(name: String, dir: String): Unit =
      graft.engine.CacheRegistry.scoped {
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
      }
    def timed(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      runFull(name, dir)
      (System.nanoTime() - t0) / 1e9
    }

    // posArgs(1..) optionally restrict the sweep to named queries — the
    // targeted re-measure loop after optimizing a flagged grower. A
    // typo'd name must fail fast, not produce an empty sweep whose
    // flagged=[] reads as a clean pass.
    val only = posArgs.drop(1).toSet
    // Validate against the POST-exclusion name set: `r_catalog` passes
    // the registry check but is excluded from the sweep (metadata-only,
    // no data dependency), so accepting it here would produce exactly
    // the silent empty sweep with flagged=[] this guard exists to
    // prevent.
    val sweepable = SparkEntry.queries.keySet - "r_catalog"
    val unknown = only -- sweepable
    require(unknown.isEmpty,
      s"unknown or unsweepable queries: ${unknown.mkString(", ")}")
    val names = sweepable.toSeq.sorted
      .filter(n => only.isEmpty || only.contains(n))
    runFull("r_inner_join", base)  // JIT + footer-cache warmup
    runFull("r_inner_join", synth)

    // min-of-2 at BOTH scales: several operators intentionally memoize
    // per-dir build artifacts (the IVF index, the CC label table, the
    // persistOnce staged features) exactly as a production deployment
    // reuses an on-disk index — so pass 1 pays the build and pass 2 is
    // the steady state. Taking the min on one side only would compare a
    // cached 1x against a cold 10x and report build-vs-probe asymmetry
    // as fake superlinear growth (the first sweep run did: e_dedup_cc
    // "85x", e_ann_ivf "48x"). Min-of-2 both sides compares steady
    // state to steady state; cold-path growth still surfaces via the
    // t10 absolute column.
    val rows = names.map { n =>
      val t1 = math.min(timed(n, base), timed(n, base))
      val t10 = math.min(timed(n, synth), timed(n, synth))
      val growth = t10 / math.max(t1, 0.05)
      System.err.println(f"[sweep] $n%-28s 1x=$t1%6.2f s  10x=$t10%7.2f s  growth=$growth%6.1fx")
      (n, t1, t10, growth)
    }.sortBy(-_._4)

    // One bar for everything, streaming replays included: their ~2 s
    // fixed start/drain cost only LOWERS the raw t10/t1 ratio, so 30x
    // is conservative for them too. (An earlier 60x replay carve-out
    // existed solely for e_stream_quality_replay's 26x — which turned
    // out to be a real O(|eval sets|) per-row scan in the
    // decontamination UDF, not fixed-cost noise; with the inverted
    // shingle index it measures 2.3x. The sweep was right to complain.)
    val BAR = 30.0
    val flagged = rows.filter(r => r._4 > BAR && r._3 > 5.0).map(_._1)
    rows.foreach { case (n, t1, t10, g) =>
      println(f"""{"query":"$n","t1_sec":$t1%.3f,"t10_sec":$t10%.3f,"growth":$g%.2f}""")
    }
    val skewField =
      if (skewMode) s""","aqe_skew_split":${aqeSkewSplit(spark, synth)}"""
      else ""
    println(s"""{"metric":"sweep_total","t1_sec":${rows.map(_._2).sum},""" +
      s""""t10_sec":${rows.map(_._3).sum},"n_queries":${rows.size},""" +
      s""""mode":"${if (skewMode) "skew" else "uniform"}",""" +
      s""""flagged":${flagged.mkString("[\"", "\",\"", "\"]").replace("[\"\"]", "[]")}""" +
      skewField + "}")
    spark.stop()
  }

  /** Time the text-vs-hashed lanes of the substring and paragraph
    * dedups across gram/paragraph sizes, 1x and 10x. Gate sizes
    * (k=20 chars / p=4 tokens) ride along as the reference points;
    * the long sizes are where the hashed lane's fixed-width shuffle
    * row is narrower than the text it replaces.
    */
  private def runLongGram(spark: SparkSession, base: String,
      synth: String): Unit = {
    import graft.operators.CorpusOps
    def timed(df: => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def docs(dir: String) = Tables.load(spark, dir, "documents")
    // paragraph has no hashed twin anymore: paragraphs PARTITION the
    // text, so the narrow-key premise fails structurally — the r13
    // sweep measured the hashed lane losing at every tested size and
    // it was retired (see dedupParagraphs' scaladoc)
    val lanes: Seq[(String, Seq[Int], Seq[Boolean],
        (String, Int, Boolean) => org.apache.spark.sql.DataFrame)] = Seq(
      ("substring", Seq(20, 100, 200), Seq(false, true),
        (dir, k, h) => CorpusOps.dedupSubstring(docs(dir), k, h)),
      ("paragraph", Seq(4, 50), Seq(false),
        (dir, p, _) => CorpusOps.dedupParagraphs(docs(dir), p)))
    for ((fam, ks, lanesOf, f) <- lanes; k <- ks; hashed <- lanesOf) {
      val lane = s"${fam}_${if (hashed) "hashed" else "text"}_$k"
      // min-of-2 at both scales (the sweep's steady-state discipline)
      val t1 = math.min(timed(f(base, k, hashed)), timed(f(base, k, hashed)))
      val t10 = math.min(timed(f(synth, k, hashed)), timed(f(synth, k, hashed)))
      val g = t10 / math.max(t1, 0.05)
      System.err.println(
        f"[longgram] $lane%-24s 1x=$t1%6.2f s  10x=$t10%7.2f s  growth=$g%6.1fx")
      println(f"""{"metric":"longgram","lane":"$lane","t1_sec":$t1%.3f,"t10_sec":$t10%.3f,"growth":$g%.2f}""")
    }
  }

  /** Prove AQE's skew-join machinery ENGAGES on the forged hot key: a
    * sort-merge join of lineitem (10% of rows on one orderkey) against
    * orders must show a skew-split AQEShuffleRead in the final adaptive
    * plan. The skew thresholds are lowered for the check — at sf1 the
    * hot shuffle partition is ~tens of MB, below the 256 MB production
    * default that a 100 TB corpus would trip naturally; the lowered
    * threshold exercises the identical code path at fixture scale.
    */
  private def aqeSkewSplit(spark: SparkSession, dir: String): Boolean = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.files.maxPartitionBytes")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
      // hot partition ≈ 4x the median at 32 shuffle partitions — the
      // default factor-5 trigger just misses it at fixture scale
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
      // several map tasks per scan: a skewed reduce partition is only
      // splittable at MAP CHUNK boundaries, so a one-mapper stage can
      // never be skew-split no matter the thresholds (production scans
      // have thousands of mappers; the fixture write uses 8 MB row
      // groups so byte-range splits actually produce them)
      conf.set("spark.sql.files.maxPartitionBytes", "16m")
      val l = spark.read.parquet(s"$dir/lineitem.parquet")
      val o = spark.read.parquet(s"$dir/orders.parquet")
      // carry real measure columns through the join shuffle: a
      // key-only projection compresses the hot partition (one repeated
      // long) below any skew threshold, hiding the very imbalance the
      // check exists to expose
      import org.apache.spark.sql.functions.{count, lit, sum}
      val j = l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1L)), sum("l_extendedprice"), sum("l_quantity"),
          sum("l_discount"), sum("l_tax"))
      // collect(), not a writer: the writer executes its OWN
      // QueryExecution, leaving j's adaptive plan unfinalized — the
      // skew-split decision only exists in the finalized plan
      j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // Spark 4 prints the split as "AQEShuffleRead skewed" (or
      // "coalesced and skewed"); match on the node line, not a bare
      // "skew" substring — the fixture PATH contains "skew"
      val engaged = plan.linesIterator.exists(ln =>
        ln.contains("AQEShuffleRead") && ln.contains("skewed"))
      System.err.println(s"[sweep] aqe_skew_split=$engaged")
      if (!engaged) System.err.println(s"[sweep] final plan:\n$plan")
      engaged
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
