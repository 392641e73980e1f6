package graft

import org.apache.spark.sql.functions._
import graft.engine.CacheRegistry

/** The marathon-session memory discipline: memoized build artifacts
  * are LRU-evictable (storage released, entry forgotten) and a
  * post-eviction rebuild returns the IDENTICAL answer — the contract
  * that lets a 100 TB session run the full suite at a tight memory
  * cap without accumulating unevictable state (the r14 SWEEP_SPILL
  * failure mode).
  */
class CacheRegistrySpec extends SparkSpec {

  private def md5Of(df: org.apache.spark.sql.DataFrame): String = {
    val cols = df.columns.sorted.map(c => col(c).cast("string"))
    df.select(md5(concat_ws("", cols: _*)).as("h"))
      .agg(md5(concat_ws("", collect_list(col("h")))).as("all"))
      .head().getString(0)
  }

  test("LRU: inserting past the cap evicts the least-recently-used " +
      "entry, runs its free thunk, and leaves recent entries resident") {
    CacheRegistry.evictAll()
    val saved = sys.props.get("graft.cache.maxResident")
    sys.props("graft.cache.maxResident") = "2"
    try {
      var freed = List.empty[String]
      def put(k: String): String =
        CacheRegistry.memo("spec.lru", k)(k + "!")(v => freed ::= v)
      put("a"); put("b")
      assert(CacheRegistry.resident == 2 && freed.isEmpty)
      put("a") // refresh recency: now b is LRU
      put("c")
      assert(CacheRegistry.resident == 2)
      assert(freed == List("b!"), s"expected b evicted first, got $freed")
      // a hit must not rebuild
      var built = 0
      CacheRegistry.memo("spec.lru", "a")({ built += 1; "x" })(_ => ())
      assert(built == 0, "hit rebuilt a resident entry")
    } finally {
      saved match {
        case Some(v) => sys.props("graft.cache.maxResident") = v
        case None => sys.props -= "graft.cache.maxResident"
      }
      CacheRegistry.evictAll()
    }
  }

  test("a free thunk that throws is contained: the entry still leaves " +
      "and later memo calls keep working") {
    CacheRegistry.evictAll()
    CacheRegistry.memo("spec.bad", "k")("v")(_ =>
      throw new RuntimeException("boom"))
    CacheRegistry.evictAll()
    assert(CacheRegistry.resident == 0)
    assert(CacheRegistry.memo("spec.bad", "k")("v2")(_ => ()) == "v2")
    CacheRegistry.evictAll()
  }

  test("evicted persisted frame: storage released, rebuild " +
      "hash-identical (the staged-features family)") {
    CacheRegistry.evictAll()
    val first = md5Of(
      graft.operators.SimilarityOps.buildIvfIndex(spark, sf).assigned
        .orderBy("vec_id"))
    assert(CacheRegistry.resident >= 1, "build should register")
    CacheRegistry.evictAll()
    assert(CacheRegistry.resident == 0)
    val second = md5Of(
      graft.operators.SimilarityOps.buildIvfIndex(spark, sf).assigned
        .orderBy("vec_id"))
    assert(second == first, "post-eviction rebuild diverged")
    CacheRegistry.evictAll()
  }

  test("evicted checkpoint-backed frame: blocks released, rebuild " +
      "hash-identical (the CC-label family)") {
    CacheRegistry.evictAll()
    val rddsBefore = spark.sparkContext.getPersistentRDDs.keySet
    val first = md5Of(graft.operators.DedupOps.lshCcLabels(spark, sf))
    val pinned = spark.sparkContext.getPersistentRDDs.keySet -- rddsBefore
    assert(pinned.nonEmpty, "CC build should pin checkpoint RDDs")
    CacheRegistry.evictAll()
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(pinned.forall(id => !after.contains(id)),
      s"eviction left checkpoint RDDs pinned: ${pinned.intersect(after)}")
    val second = md5Of(graft.operators.DedupOps.lshCcLabels(spark, sf))
    assert(second == first, "post-eviction CC rebuild diverged")
    CacheRegistry.evictAll()
  }

  test("the gate queries that ride memoized indexes survive " +
      "evict-rebuild cycles (IVF probe + BPE vocab)") {
    CacheRegistry.evictAll()
    val ivf1 = md5Of(SparkEntry.queries("e_ann_ivf")(spark, sf))
    val bpe1 = md5Of(SparkEntry.queries("e_bpe_vocab")(spark, sf))
    CacheRegistry.evictAll()
    assert(CacheRegistry.resident == 0)
    val ivf2 = md5Of(SparkEntry.queries("e_ann_ivf")(spark, sf))
    val bpe2 = md5Of(SparkEntry.queries("e_bpe_vocab")(spark, sf))
    assert(ivf2 == ivf1, "IVF probe diverged after eviction")
    assert(bpe2 == bpe1, "BPE vocab diverged after eviction")
    CacheRegistry.evictAll()
  }
}
