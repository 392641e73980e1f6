package graft.engine

import org.apache.spark.sql.DataFrame

/** Session-lifetime eviction registry for the per-(app, dataset) memo
  * caches — the marathon-session memory discipline.
  *
  * The operators memoize expensive build artifacts (staged feature
  * frames, the CC label table, the IVF assignment, BPE merge output)
  * per (application, dataset) so repeated invocations — bench warm
  * passes, r_catalog's schema walk, composed pipelines — pay each
  * build once. That is the right production shape, but an UNBOUNDED
  * memo is a session-lifecycle scale-killer: the r14 768 MB spill
  * rehearsal measured `e_dedup_simhash_md5` dying with
  * UNABLE_TO_ACQUIRE_MEMORY after 243 prior queries' pinned blocks
  * had accumulated, while the same query passed solo at the same cap.
  * A 100 TB deployment is exactly such a marathon.
  *
  * So every storage-holding memo routes through here instead of a
  * private ConcurrentHashMap. The registry is an LRU keyed on the
  * (site, key) pairs the callers already use:
  *
  *  - `memo(site, key)(build)(free)` returns the cached value or
  *    builds (and registers) it. Each hit refreshes recency.
  *  - When the resident-entry count exceeds `maxResident`
  *    (`-Dgraft.cache.maxResident`, default 16), the least-recently
  *    used entry is EVICTED: its `free` thunk releases the Spark
  *    storage (unpersist / checkpoint-RDD release) and the entry is
  *    dropped, so the next request REBUILDS it — to the identical
  *    answer, because every build here is deterministic by the
  *    engine-wide oracle contract (CacheRegistrySpec pins this).
  *    The default is sized to the full query suite's working set
  *    (~15 entries per dataset): a first cut at 8 made the bench's
  *    interleaved passes re-pay the four driver-side builds (CC
  *    labels, incremental minhash, stream drain) on every pass —
  *    measured +18 s over 246 queries — while the 768 MB spill
  *    marathon passes at 16 just as it did at 8 (the r14 failure was
  *    UNBOUNDED accumulation plus the per-round checkpoint leaks, not
  *    the last factor-2 of resident entries).
  *  - `evictAll()` is the explicit phase boundary a long pipeline
  *    calls between stages (and specs call between scenarios).
  *
  * Consistency contract: callers obtain a value and consume it within
  * one query execution (build → action), so LRU only ever evicts
  * entries from PRIOR queries as long as no single query touches more
  * than `maxResident` memo sites (the widest composition today
  * touches 5). Eviction of a checkpoint-backed frame frees blocks
  * that have no lineage to recompute from — safe precisely because
  * the entry is removed in the same critical section, so no caller
  * can reach the freed frame afterwards.
  *
  * The registry is a plain synchronized monitor: builds run Spark
  * jobs while holding it, which serializes concurrent memo calls
  * exactly like the per-key `computeIfAbsent` blocking it replaces;
  * nested memo calls during a build (the split→IVF, lshCc→staged
  * chains) re-enter the same monitor safely.
  */
object CacheRegistry {

  private final case class Entry(value: AnyRef, free: () => Unit)

  // access-order LinkedHashMap = LRU order maintained on get()
  private val entries =
    new java.util.LinkedHashMap[String, Entry](32, 0.75f, true)

  /** Eviction events observable by specs: (site#key) in order. */
  private[graft] val evicted =
    new java.util.concurrent.atomic.AtomicLong(0L)

  def maxResident: Int =
    sys.props.get("graft.cache.maxResident").map(_.toInt).getOrElse(16)

  def resident: Int = synchronized(entries.size)

  /** The memo: cached value for (site, key), else build + register.
    * `free` must release every Spark storage handle the value pins
    * (persisted frames, checkpoint RDDs); it runs at eviction, under
    * the registry monitor, and must not throw (wrapped defensively).
    */
  def memo[T <: AnyRef](site: String, key: String)(build: => T)(
      free: T => Unit): T = synchronized {
    val k = site + "#" + key
    val hit = entries.get(k) // refreshes LRU recency
    if (hit != null) hit.value.asInstanceOf[T]
    else {
      val v = build
      entries.put(k, Entry(v, () => free(v)))
      // evict AFTER inserting: the fresh entry is MRU, never a victim
      while (entries.size > maxResident) {
        val it = entries.entrySet().iterator()
        val victim = it.next()
        it.remove()
        evicted.incrementAndGet()
        runFree(victim.getKey, victim.getValue)
      }
      v
    }
  }

  /** Drop and free every entry — the explicit phase boundary. */
  def evictAll(): Unit = synchronized {
    val it = entries.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      it.remove()
      runFree(e.getKey, e.getValue)
    }
  }

  private def runFree(key: String, e: Entry): Unit =
    try e.free()
    catch {
      case t: Throwable =>
        // a dead SparkSession at JVM teardown must not poison the
        // registry; blocks die with the app anyway
        System.err.println(s"[cache-registry] free($key) failed: $t")
    }

  /** Release every Spark storage handle a cached FRAME pins: the
    * CacheManager entry (persisted frames; exact-plan match, no
    * cascade) and any checkpoint RDD the plan roots at (eager
    * localCheckpoint output — LogicalRDD leaves). After this the
    * frame object must not be used: checkpoint blocks are the data's
    * only copy, which is exactly why eviction removes the memo entry
    * in the same critical section.
    */
  def freeFrame(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
