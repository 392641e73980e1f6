package graft

import graft.functions.{KmvBuffer, KmvDistinct}
import org.apache.spark.sql.functions._

class KmvSpec extends SparkSpec {
  import spark.implicits._

  test("exact below k; bounded error above k; deterministic") {
    // below k distinct → exact
    val small = (1 to 100).map(i => s"v$i").toDF("s")
    val exact = small.select(KmvDistinct.kmvDistinct(spark, col("s")))
      .as[Long].head()
    assert(exact == 100L)

    // far above k → within KMV's expected relative error (~1/sqrt(k))
    val big = (1 to 50000).map(i => s"value_$i").toDF("s").repartition(8)
    val est = big.select(KmvDistinct.kmvDistinct(spark, col("s"))).as[Long].head()
    val relErr = math.abs(est - 50000.0) / 50000.0
    assert(relErr < 0.2, s"estimate $est rel-err $relErr")

    // determinism across runs and partitionings (set function)
    val est2 = big.repartition(3)
      .select(KmvDistinct.kmvDistinct(spark, col("s"))).as[Long].head()
    assert(est == est2, "KMV must be partition-order independent")
  }

  test("duplicates do not move the estimate") {
    val dups = ((1 to 1000) ++ (1 to 1000)).map(i => s"d$i").toDF("s")
    val est = dups.select(KmvDistinct.kmvDistinct(spark, col("s"))).as[Long].head()
    val once = (1 to 1000).map(i => s"d$i").toDF("s")
    val est2 = once.select(KmvDistinct.kmvDistinct(spark, col("s"))).as[Long].head()
    assert(est == est2)
  }

  test("buffer serde round-trips and merge is commutative") {
    val a = new KmvBuffer(16)
    val b = new KmvBuffer(16)
    (1L to 100L).foreach(i => a.insert(i * 7919L))
    (50L to 150L).foreach(i => b.insert(i * 7919L))
    val ab = new KmvBuffer(16); ab.merge(a); ab.merge(b)
    val ba = new KmvBuffer(16); ba.merge(b); ba.merge(a)
    assert(ab.estimate == ba.estimate)
    val agg = KmvDistinct(org.apache.spark.sql.catalyst.expressions.Literal("x"), k = 16)
    val round = agg.deserialize(agg.serialize(ab))
    assert(round.estimate == ab.estimate)
  }

  test("usable from SQL after registration") {
    KmvDistinct.register(spark)
    Tables.load(spark, sf, "documents").createOrReplaceTempView("kmv_docs")
    val est = spark.sql("SELECT kmv_distinct(text) FROM kmv_docs").as[Long].head()
    // 500 distinct > k=256, so this is an estimate; KMV rel-err ~1/sqrt(k)
    assert(math.abs(est - 500.0) / 500.0 < 0.2, s"500 distinct texts, got $est")
  }

  test("kmv set-operation estimates land near exact on the fixture") {
    val r = graft.SparkEntry.queries("e_kmv_setops")(spark, sf)
      .collect().head
    val (exU, exI, esU, esI, j) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getDouble(4))
    assert(exU > 0 && exI > 0)
    // k=256 over a few-hundred-element universe: tight estimates
    assert(math.abs(esU - exU).toDouble / exU < 0.2, s"union $esU vs $exU")
    assert(math.abs(esI - exI).toDouble / exI < 0.2, s"inter $esI vs $exI")
    assert(j > 0.0 && j <= 1.0)
  }
}
