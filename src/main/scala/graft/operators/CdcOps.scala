package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Change-data-capture operators — MERGE (upsert/delete apply) and
  * snapshot diff. The reference's write path is not-implemented
  * (`/root/reference/index.js:427-429` returns NIY for create/update/
  * delete); a lakehouse pipeline still needs the READ-side semantics of
  * those writes: apply a change batch to a snapshot, and explain how
  * two snapshots differ. Both are single-join, shuffle-on-key plans.
  *
  * 100 TB shape, mergeUpsert: the snapshot never moves — one pass,
  * joined against the change batch on the primary key. A real CDC
  * increment is small relative to the snapshot (a day of changes vs
  * years of accumulation), so the change side is broadcast and the
  * snapshot side streams through map tasks with NO shuffle at all;
  * if an increment ever outgrows broadcast, removing the hint falls
  * back to a shuffle hash join on the key — same semantics. The
  * deleted/updated/inserted lanes partition the key space exactly
  * (op is single-valued per key), so no dedup pass is needed.
  *
  * snapshotDiff: full-outer on the key, classify each key into
  * added/removed/changed/unchanged, aggregate counts + an integer key
  * fingerprint per class. One shuffle; the output is 4 rows no matter
  * the input size — the standard "what did this pipeline run change"
  * audit artifact.
  */
object CdcOps {
  type Q = (SparkSession, String) => DataFrame

  /** Inserted keys land above every snapshot key (fixture keys are
    * dense from 0; the offset keeps the two ranges disjoint). 10^10
    * clears every reachable key range — TPC-H orderkeys stay below
    * 6M·SF and the 10× synthetic sweep shifts replicas by i·10M (max
    * ~10^8); the assert_true in [[changeBatch]] still fails loudly if
    * a corpus ever crosses it (the r10 spill rehearsal caught exactly
    * that with the old 10M offset at the synthetic 10×).
    */
  private val InsertOffset = 10000000000L

  /** Deterministic change batch derived from the snapshot itself:
    * keys ≡ 0,1 (mod 10) get an update (+1000.0 — exact double
    * arithmetic, no re-rounding), ≡ 2 a delete, ≡ 3 an insert at
    * key + InsertOffset. Derivation is keyed arithmetic only, so the
    * DuckDB oracle reconstructs the identical batch.
    */
  def changeBatch(orders: DataFrame): DataFrame = orders
    .where(col("o_orderkey") % 10 <= 3)
    .select(
      // Disjointness guard: at TPC-H SF >= ~2 orderkeys pass 10M and the
      // inserted range would collide with the snapshot; assert_true turns
      // that silent degeneracy into a loud failure (NULL + 0 otherwise,
      // so the key arithmetic is byte-identical to the oracle's replay).
      when(col("o_orderkey") % 10 === 3,
        col("o_orderkey") + InsertOffset
          + coalesce(assert_true(col("o_orderkey") < lit(InsertOffset),
              lit(s"o_orderkey >= $InsertOffset: insert range collides " +
                "with snapshot keys; raise InsertOffset")).cast("long"),
            lit(0L)))
        .otherwise(col("o_orderkey")).as("key"),
      when(col("o_orderkey") % 10 <= 1, lit("U"))
        .when(col("o_orderkey") % 10 === 2, lit("D"))
        .otherwise(lit("I")).as("op"),
      (col("o_totalprice") + 1000.0).as("new_price"))

  /** MERGE semantics: update matched 'U' rows in place, drop matched
    * 'D' rows, append 'I' rows. `row_src` tags each output row with
    * its provenance so the result doubles as an audit.
    */
  def mergeUpsert(snapshot: DataFrame, changes: DataFrame): DataFrame = {
    val surviving = snapshot
      .join(broadcast(changes),
        snapshot("o_orderkey") === changes("key"), "left_outer")
      .where(col("op").isNull || col("op") =!= "D")
      .select(snapshot("o_orderkey"),
        col("o_orderstatus"),
        when(col("op") === "U", col("new_price"))
          .otherwise(col("o_totalprice")).as("o_totalprice"),
        when(col("op") === "U", lit("updated"))
          .otherwise(lit("kept")).as("row_src"))
    val inserted = changes
      .where(col("op") === "I")
      .select(col("key").as("o_orderkey"),
        lit("I").as("o_orderstatus"),
        col("new_price").as("o_totalprice"),
        lit("inserted").as("row_src"))
    surviving.unionByName(inserted).orderBy("o_orderkey")
  }

  /** Classify every key across two snapshots — any key/value column
    * pair — and report per-class counts plus an exact integer
    * fingerprint (sum of keys): enough to pin WHICH keys moved, not
    * just how many. One full-outer shuffle on the key; 4 output rows
    * no matter the input size.
    */
  def diffByKey(before: DataFrame, after: DataFrame,
      keyCol: String, valCol: String): DataFrame = {
    // Row presence is carried by an explicit lit(true) flag per side —
    // NOT inferred from value nullability, which would misclassify any
    // nullable value column (key present on both sides with a NULL
    // `before` value is "changed"/"unchanged", never "added").
    val a = before.select(col(keyCol).as("key"), col(valCol).as("val_a"),
      lit(true).as("in_a"))
    val b = after.select(col(keyCol).as("key"), col(valCol).as("val_b"),
      lit(true).as("in_b"))
    a.join(b, Seq("key"), "full_outer")
      .select(col("key"),
        when(col("in_a").isNull, "added")
          .when(col("in_b").isNull, "removed")
          // null-safe compare: NULL vs non-NULL is a real change,
          // NULL vs NULL is not — =!= would send both to "unchanged"
          .when(!(col("val_a") <=> col("val_b")), "changed")
          .otherwise("unchanged").as("diff_kind"))
      .groupBy("diff_kind")
      .agg(count(lit(1)).as("n_rows"), sum(col("key")).as("key_fp"))
      .orderBy("diff_kind")
  }

  def snapshotDiff(before: DataFrame, after: DataFrame): DataFrame =
    diffByKey(before, after, "o_orderkey", "o_totalprice")

  private val mergeUpsertQ: Q = (spark, dir) => {
    val orders = Tables.load(spark, dir, "orders")
    mergeUpsert(orders, changeBatch(orders))
  }

  private val snapshotDiffQ: Q = (spark, dir) => {
    val orders = Tables.load(spark, dir, "orders")
    snapshotDiff(orders, mergeUpsert(orders, changeBatch(orders)))
  }

  val queries: Map[String, Q] = Map(
    "e_merge_upsert" -> mergeUpsertQ,
    "e_snapshot_diff" -> snapshotDiffQ,
  )

  private val changesCte: String =
    """changes AS (
      |  SELECT CASE WHEN o_orderkey % 10 = 3 THEN o_orderkey + 10000000000
      |              ELSE o_orderkey END AS key,
      |         CASE WHEN o_orderkey % 10 IN (0, 1) THEN 'U'
      |              WHEN o_orderkey % 10 = 2 THEN 'D'
      |              ELSE 'I' END AS op,
      |         o_totalprice + 1000.0 AS new_price
      |  FROM orders WHERE o_orderkey % 10 <= 3
      |),
      |merged AS (
      |  SELECT o.o_orderkey AS o_orderkey, o.o_orderstatus AS o_orderstatus,
      |         CASE WHEN c.op = 'U' THEN c.new_price
      |              ELSE o.o_totalprice END AS o_totalprice,
      |         CASE WHEN c.op = 'U' THEN 'updated' ELSE 'kept' END AS row_src
      |  FROM orders o LEFT JOIN changes c ON o.o_orderkey = c.key
      |  WHERE c.op IS NULL OR c.op <> 'D'
      |  UNION ALL
      |  SELECT key, 'I', new_price, 'inserted' FROM changes WHERE op = 'I'
      |)""".stripMargin

  val oracles: Map[String, String] = Map(
    "e_merge_upsert" ->
      s"""WITH $changesCte
         |SELECT * FROM merged ORDER BY o_orderkey""".stripMargin,
    "e_snapshot_diff" ->
      s"""WITH $changesCte
         |SELECT diff_kind, CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(key) AS BIGINT) AS key_fp
         |FROM (
         |  SELECT COALESCE(a.key, b.key) AS key,
         |    CASE WHEN a.key IS NULL THEN 'added'
         |         WHEN b.key IS NULL THEN 'removed'
         |         WHEN a.price_a <> b.price_b THEN 'changed'
         |         ELSE 'unchanged' END AS diff_kind
         |  FROM (SELECT o_orderkey AS key, o_totalprice AS price_a
         |        FROM orders) a
         |  FULL OUTER JOIN (SELECT o_orderkey AS key,
         |        o_totalprice AS price_b FROM merged) b
         |    ON a.key = b.key
         |)
         |GROUP BY diff_kind ORDER BY diff_kind""".stripMargin,
  )
}
