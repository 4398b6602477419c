package graft

import graft.functions.Scoring
import org.apache.spark.sql.functions._

/** Unit + property tests for the scoring expression library —
  * tolerant projection (main.py:107 semantics), map augmentation,
  * heuristic fallback, threshold classify. */
class ScoringSpec extends SparkSpec {
  import spark.implicits._

  private def features(m: Map[String, Double]) =
    Seq(("x", m)).toDF("id", "features")

  test("P1 tolerant projection: present, missing, extra keys") {
    val df = features(Map("amount" -> 12.5, "merchant_risk" -> 0.3, "extra" -> 9.0))
      .select(Scoring.featureVector(col("features")).as("v"))
    assert(df.head.getSeq[Double](0) == Seq(12.5, 0.0, 0.3, 0.0))
  }

  test("P1 empty map projects to all-zero vector") {
    val df = features(Map.empty[String, Double])
      .select(Scoring.featureVector(col("features")).as("v"))
    assert(df.head.getSeq[Double](0) == Seq(0.0, 0.0, 0.0, 0.0))
  }

  test("P2 map augmentation overrides amount under the DEFAULT dedup policy") {
    // Must work without LAST_WIN: the default EXCEPTION policy throws
    // on duplicate map keys, so withAmount has to pre-drop the key.
    assert(spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION")
    val df = features(Map("amount" -> 1.0, "hour" -> 4.0))
      .select(
        Scoring.featureAt(
          Scoring.withAmount(col("features"), lit(99.0)), "amount").as("a"),
        Scoring.featureAt(
          Scoring.withAmount(col("features"), lit(99.0)), "hour").as("h"))
    val r = df.head
    assert(r.getDouble(0) == 99.0 && r.getDouble(1) == 4.0)
  }

  test("P2 map augmentation inserts amount when absent") {
    val df = features(Map("hour" -> 4.0))
      .select(Scoring.featureAt(
        Scoring.withAmount(col("features"), lit(7.5)), "amount").as("a"))
    assert(df.head.getDouble(0) == 7.5)
  }

  test("P4 heuristic: 1.0 above threshold else 0.05") {
    val df = Seq(1500.0, 1000.0, 3.0).toDF("amount")
      .select(Scoring.heuristicProba(col("amount")).as("p"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(1.0, 0.05, 0.05))
  }

  test("P3 threshold classify at 0.5 boundary") {
    val df = Seq(0.49999, 0.5, 0.51).toDF("p")
      .select(Scoring.classify(col("p")).as("c"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 1, 1))
  }

  test("property: projection always yields FeatureOrder-length vector with 0.0 defaults") {
    val keys = Vector("amount", "num_items", "merchant_risk", "hour", "junk1", "junk2")
    val rng = new scala.util.Random(1234)
    val cases = Vector.fill(40) {
      keys.filter(_ => rng.nextBoolean())
        .map(k => k -> (rng.nextDouble() * 2e6 - 1e6)).toMap
    }
    // run all cases through ONE plan (arbitrary maps as a column)
    val df = cases.zipWithIndex.map { case (m, i) => (i, m) }.toDF("i", "features")
      .select(col("i"), Scoring.featureVector(col("features")).as("v"))
    val got = df.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    for ((m, i) <- cases.zipWithIndex) {
      assert(got(i).length == Scoring.FeatureOrder.length)
      assert(got(i) == Scoring.FeatureOrder.map(k => m.getOrElse(k, 0.0)))
    }
  }

  test("logistic closed form equals reference sigmoid formula") {
    val means = Seq(10.0, 2.0); val stds = Seq(5.0, 1.0)
    val coef = Seq(0.7, -1.3); val b = 0.2
    val df = Seq((12.0, 3.0)).toDF("f1", "f2")
      .select(Scoring.logisticProba(Seq(col("f1"), col("f2")), means, stds, coef, b).as("p"))
    val z1 = (12.0 - 10.0) / 5.0; val z2 = (3.0 - 2.0) / 1.0
    val expected = 1.0 / (1.0 + math.exp(-(0.7 * z1 + -1.3 * z2 + 0.2)))
    assert(math.abs(df.head.getDouble(0) - expected) < 1e-12)
  }
}
