package graft

import org.apache.spark.sql.functions._
import graft.operators.QualityModelOps

/** The trained quality classifier: GD actually descends (monotone loss
  * over the trajectory), the learned weights beat the trivial
  * majority-class baseline on the fixture labels, and training is
  * partitioning-invariant (the decimal-sum determinism contract).
  */
class QualityModelSpec extends SparkSpec {

  private lazy val feats =
    QualityModelOps.features(Tables.load(spark, sf, "documents"))

  private def loss(w: Array[Double]): Double = {
    val pred = lit(w(0)) + lit(w(1)) * col("x1") +
      lit(w(2)) * col("x2") + lit(w(3)) * col("x3")
    feats.agg(avg(pow(pred - col("y"), 2))).head().getDouble(0)
  }

  test("gradient descent: loss strictly decreases every iteration") {
    val traj = QualityModelOps.train(feats)
    assert(traj.length == QualityModelOps.Iters)
    val losses = loss(Array(0, 0, 0, 0)) +: traj.map(t => loss(t._2))
    losses.sliding(2).foreach { case Seq(a, b) =>
      assert(b < a, s"loss did not descend: $losses")
    }
  }

  test("classifier beats the majority-class baseline on fixture labels") {
    val out = SparkEntry.queries("e_quality_infer")(spark, sf)
    val n = out.count().toDouble
    val acc = out.where(col("pred") === col("label")).count() / n
    val majority = math.max(
      out.where(col("label") === 1).count() / n,
      out.where(col("label") === 0).count() / n)
    assert(acc > majority,
      s"trained accuracy $acc must beat majority baseline $majority")
    assert(acc > 0.85, s"expected ~0.94 fixture accuracy, got $acc")
  }

  test("training is partitioning-invariant (decimal gradient sums)") {
    val w1 = QualityModelOps.train(feats).last._2
    val w2 = QualityModelOps.train(feats.repartition(13)).last._2
    assert(w1.toSeq == w2.toSeq)
  }
}
