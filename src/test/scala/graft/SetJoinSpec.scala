package graft

import graft.operators.SetJoinOps
import org.apache.spark.sql.functions._

/** The prefix-filter machinery must be invisible: every suite compares
  * against an independent brute-force all-pairs Jaccard. The boundary
  * cases target the ⌈τ·n⌉ integer-arithmetic requirement — a floating
  * ceil is off by one exactly when τ·n is an integer, which silently
  * drops true pairs at J = τ.
  */
class SetJoinSpec extends SparkSpec {
  import spark.implicits._

  private def run(sets: Seq[(Long, Seq[Long])]) =
    SetJoinOps.jaccardJoin(sets.toDF("doc_id", "feat"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toList

  private def brute(sets: Seq[(Long, Seq[Long])]) =
    (for {
      (ia, fa) <- sets; (ib, fb) <- sets if ia < ib
      inter = fa.toSet.intersect(fb.toSet).size.toLong
      union = fa.toSet.union(fb.toSet).size.toLong
      if inter * SetJoinOps.TauDen >= union * SetJoinOps.TauNum
    } yield (ia, ib,
      // BigDecimal.valueOf (shortest decimal repr), matching Spark's
      // round(); new BigDecimal(double) would expand the exact binary
      BigDecimal(java.math.BigDecimal.valueOf(inter.toDouble / union))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
      .sortBy(p => (p._1, p._2)).toList

  test("pair at EXACTLY J = tau survives (the float-ceil trap)") {
    // |A|=4 ⊂ |B|=5: J = 4/5 = τ precisely; prefix lengths hit the
    // ⌈0.8·5⌉ = 4 integer boundary where float ceil gives 5
    val sets = Seq(1L -> Seq(1L, 2L, 3L, 4L), 2L -> Seq(1L, 2L, 3L, 4L, 5L))
    assert(run(sets) === List((1L, 2L, 0.8)))
  }

  test("J just under tau is excluded") {
    val sets = Seq(1L -> Seq(1L, 2L, 3L, 4L), 2L -> Seq(1L, 2L, 3L, 5L))
    assert(run(sets) === Nil) // inter 3, union 5 -> 0.6
  }

  test("equals brute force on random set corpora") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val sets = (1L to 60L).map { i =>
        // overlapping universes so near-identical sets occur
        val base = rnd.nextInt(8) * 10
        i -> rnd.shuffle((0 until 40).map(x => (base + x).toLong))
          .take(8 + rnd.nextInt(12)).distinct.toSeq
      }
      assert(run(sets) === brute(sets), s"trial $trial")
    }
  }

  test("minhash recall: found is a subset of exact, ratio in (0.5, 1]") {
    val r = graft.operators.DedupOps.minhashRecall(spark, sf).collect().head
    val (nExact, nFound, recall) =
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    assert(nExact > 0, "fixture must contain exact pairs")
    assert(nFound <= nExact) // verified candidates can never exceed truth
    assert(recall > 0.5 && recall <= 1.0, s"recall $recall")
  }

  test("shingle features match doc-level Jaccard expectations on the fixture") {
    val feats = SetJoinOps.shingleFeats(Tables.load(spark, sf, "documents"))
    val pairs = SetJoinOps.jaccardJoin(feats).collect()
    assert(pairs.nonEmpty, "near-dup fixture must contain J>=0.8 pairs")
    assert(pairs.forall(r => r.getDouble(2) >= 0.8 && r.getDouble(2) <= 1.0))
    // invariant: ordered unique pairs
    val keys = pairs.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.forall { case (a, b) => a < b })
    assert(keys.length === keys.distinct.length)
  }
}
