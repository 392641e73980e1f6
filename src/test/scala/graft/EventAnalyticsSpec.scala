package graft

import org.apache.spark.sql.functions._

/** Semantic invariants + plan shapes for the event-analytics family
  * (sessionize / funnel / cohort / z-score / grouping sets / SCD2 /
  * shard shuffle). Oracle hashes pin exact values at sf0.01; these pin
  * the cross-query consistency laws and the 100 TB plan shapes at
  * sf0.001.
  */
class EventAnalyticsSpec extends SparkSpec {

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("sessionize agrees with the session-window aggregate on session count") {
    // Same 30-minute-gap semantics two ways: per-event assignment
    // (lag + running sum) vs session_window aggregation. The number of
    // (user, session) groups must match exactly.
    val perEvent = q("e_sessionize")
      .select("user_id", "session_seq").distinct().count()
    val aggregated = q("e_stream_session").count()
    assert(perEvent == aggregated,
      s"sessionize produced $perEvent sessions, session_window $aggregated")
  }

  test("sessionize covers every event exactly once, seq non-decreasing") {
    val ev = Tables.load(spark, sf, "events")
    val s = q("e_sessionize")
    assert(s.count() == ev.count())
    val bad = s.groupBy("user_id")
      .agg(min("session_seq").as("lo"), max("session_seq").as("hi"),
        countDistinct("session_seq").as("n"))
      .where(col("lo") =!= 0L || col("hi") =!= col("n") - 1)
    assert(bad.count() == 0, "session_seq must be dense 0..n-1 per user")
  }

  test("funnel stages are monotone non-increasing and bounded by users") {
    val rows = q("e_funnel").orderBy("stage").collect()
    assert(rows.length == 3)
    val counts = rows.map(_.getAs[Long]("n_users"))
    assert(counts(0) >= counts(1) && counts(1) >= counts(2),
      s"funnel must narrow: ${counts.mkString(",")}")
    val nUsers = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(counts(0) <= nUsers)
  }

  test("cohort retention: week-0 activity equals cohort size") {
    val ret = q("e_cohort_retention")
    assert(ret.where(col("week_offset") < 0).count() == 0)
    val week0 = ret.where(col("week_offset") === 0)
      .agg(sum("n_active")).first().getLong(0)
    val nUsers = Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    // every user is active in their own first week by construction
    assert(week0 == nUsers, s"week-0 actives $week0 != $nUsers users")
  }

  test("z-score outliers are a strict, correctly-thresholded subset") {
    val ev = Tables.load(spark, sf, "events")
    val out = q("e_anomaly_zscore")
    val n = out.count()
    assert(n > 0 && n < ev.count(), "outliers must be a proper subset")
    assert(out.where(abs(col("z")) < 2.5).count() == 0)
    // outliers under this threshold are all in the distribution's upper
    // tail (value exponential-ish: mean ~= sd, so z >= 2.5 implies
    // value >> mean while z <= -2.5 would need value < -75)
    assert(out.where(col("z") < 0).count() == 0)
  }

  test("grouping sets partition the total row count in each dimension") {
    val total = Tables.load(spark, sf, "lineitem").count()
    val gs = q("e_grouping_sets")
    val byRf = gs.where(col("ls") === "ALL").agg(sum("cnt")).first().getLong(0)
    val byLs = gs.where(col("rf") === "ALL").agg(sum("cnt")).first().getLong(0)
    assert(byRf == total && byLs == total,
      s"each grouping set must partition all $total rows (rf=$byRf ls=$byLs)")
  }

  test("scd2 runs reconstruct per-user event counts; one open row per user") {
    val ev = Tables.load(spark, sf, "events")
    val runs = q("e_scd2")
    val perUserEvents = ev.groupBy("user_id").count()
    val perUserRuns = runs.groupBy("user_id")
      .agg(sum("n_in_run").as("n"),
        sum(when(col("valid_to").isNull, 1).otherwise(0)).as("open"))
    val joined = perUserEvents.join(perUserRuns, "user_id")
    assert(joined.where(col("count") =!= col("n")).count() == 0,
      "run lengths must sum to the user's event count")
    assert(joined.where(col("open") =!= 1).count() == 0,
      "exactly one current (valid_to IS NULL) row per user")
  }

  test("shard shuffle is total and balanced-ish") {
    val docs = Tables.load(spark, sf, "documents")
    val sh = q("e_shuffle_shard")
    assert(sh.agg(sum("n_docs")).first().getLong(0) == docs.count())
    assert(sh.where(col("shard") < 0 || col("shard") >= 64).count() == 0)
    // content-hash sharding: no shard may swallow the corpus
    val maxShard = sh.agg(max("n_docs")).first().getLong(0)
    assert(maxShard <= math.max(4L, docs.count() / 8),
      s"one shard holds $maxShard docs — hash sharding is broken")
  }

  test("dau accounting conserves users across days") {
    val daily = Tables.load(spark, sf, "events")
      .select(col("user_id"), date_trunc("day", col("ts")).as("day")).distinct()
    val dau = daily.groupBy("day").count()
    val r = q("e_dau_churn")
    // new + retained == that day's distinct actives
    val mismatch = r.join(dau, "day")
      .where(col("n_new") + col("n_retained") =!= col("count"))
    assert(mismatch.count() == 0, "n_new + n_retained must equal DAU")
    // conservation between consecutive days: churn(d) = DAU(d-1) - retained(d)
    val w = org.apache.spark.sql.expressions.Window.orderBy("day")
    val chk = r.join(dau, "day")
      .withColumn("prev_dau", lag(col("count"), 1).over(w))
      .withColumn("prev_day", lag(col("day"), 1).over(w))
      .where(col("prev_day") === col("day") - expr("INTERVAL 1 DAY"))
      .where(col("n_churned") =!= col("prev_dau") - col("n_retained"))
    assert(chk.count() == 0, "churn(d) must equal DAU(d-1) - retained(d)")
  }

  test("histogram median equals the rank-pick median exactly") {
    // two independent exact-median algorithms (full per-stratum sort
    // vs histogram + in-bucket refinement) must agree to the bit
    val viaMad = q("e_mad").select("event_type", "median")
    val viaHist = q("e_median_hist")
      .select(col("event_type"), col("median_hist"))
    val joined = viaMad.join(viaHist, "event_type")
    assert(joined.count() == 5)
    assert(joined.where(col("median") =!= col("median_hist")).count() == 0,
      "histogram refinement must reproduce the sort-based median")
  }

  test("markov transitions account for every consecutive event pair") {
    val ev = Tables.load(spark, sf, "events")
    val totalPairs = q("e_markov").agg(sum("cnt")).first().getLong(0)
    val nEvents = ev.count()
    val nUsers = ev.select("user_id").distinct().count()
    // each user contributes (n_i - 1) pairs; summed = N - U
    assert(totalPairs == nEvents - nUsers,
      s"pairs $totalPairs != events $nEvents - users $nUsers")
    // conditional probabilities sum to ~1 per from-state
    val badP = q("e_markov").groupBy("from_type")
      .agg(sum("p").as("sp")).where(abs(col("sp") - 1.0) > 0.001)
    assert(badP.count() == 0, "P(.|from) must sum to 1")
  }

  test("newest relational queries hold their range invariants") {
    val norm = SparkEntry.queries("e_minmax_norm")(spark, sf)
    assert(norm.where(col("v_norm") < 0 || col("v_norm") > 1).count() == 0,
      "min-max normalization must land in [0,1]")
    val prof = SparkEntry.queries("e_profile")(spark, sf)
    assert(prof.where(col("n_nulls") =!= 0).count() == 0,
      "fixture documents have no nulls")
    val docIdRow = prof.where(col("column_name") === "doc_id").first()
    assert(docIdRow.getAs[Long]("n_distinct") ==
      Tables.load(spark, sf, "documents").count(), "doc_id must be unique")
    val wr = SparkEntry.queries("e_window_range")(spark, sf)
    assert(wr.where(col("n_nearby") < 1).count() == 0,
      "every row is within range of itself")
    val share = SparkEntry.queries("e_share_of_total")(spark, sf)
      .agg(sum("share")).first().getDouble(0)
    assert(math.abs(share - 1.0) < 0.001, s"shares must sum to ~1, got $share")
  }

  // ------------------------- plan shapes ------------------------- //

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("sessionize windows share one user_id exchange (plus final sort)") {
    val p = plan("e_sessionize")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"lag + running-sum must reuse one user_id exchange, saw $hashEx in:\n$p")
  }

  test("scd2 reuses the user_id exchange across windows and the run groupBy") {
    // HashPartitioning(user_id) satisfies the grouped distribution on
    // (user_id, run_id, event_type) — no second hash exchange.
    val p = plan("e_scd2")
    val hashEx = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(hashEx == 1,
      s"windows + groupBy + lead must share one exchange, saw $hashEx in:\n$p")
  }

  test("z-score stats dim joins back as broadcast") {
    val p = plan("e_anomaly_zscore")
    assert(p.contains("BroadcastHashJoin"), s"expected broadcast join in:\n$p")
  }

  test("grouping sets plan is a single Expand + two-phase aggregate") {
    val p = plan("e_grouping_sets")
    assert(p.contains("Expand"), "grouping sets must use the Expand operator")
    assert("HashAggregate".r.findAllIn(p).size >= 2,
      "expected partial+final aggregation")
  }

  test("funnel plans with hash joins only — no cartesian, no nested loop") {
    val p = plan("e_funnel")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"funnel must join on user_id:\n$p")
  }
}
