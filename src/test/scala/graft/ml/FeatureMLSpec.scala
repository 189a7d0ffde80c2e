package graft.ml

import java.nio.file.Files

import org.apache.spark.ml.regression.RandomForestRegressionModel

import graft.SparkSpec

/** ML smoke tests (SURVEY.md §5.3: sklearn↔MLlib RNGs differ, so assert
  * bounds, never golden values). Covers K4/S6: model save → load → predict. */
class FeatureMLSpec extends SparkSpec {

  test("train → save → load → predict roundtrip with bounded predictions") {
    import spark.implicits._
    val rng = new scala.util.Random(42)
    // y = 2x + noise: any sane forest learns it
    val df = Seq.tabulate(500) { _ =>
      val x = rng.nextDouble() * 10
      (x, 2 * x + rng.nextGaussian() * 0.1)
    }.toDF("x", "y")

    val r = FeatureML.trainRegressor(df, Seq("x"), "y", numTrees = 20)
    assert(r.nTrain + r.nTest == 500)
    assert(r.mse.isFinite && r.mse < 1.0, s"mse ${r.mse} unexpectedly high")

    val dir = Files.createTempDirectory("ml_spec_").resolve("model").toString
    r.model.write.overwrite().save(dir)
    val loaded = RandomForestRegressionModel.load(dir)

    val preds = FeatureML.predict(loaded, Seq(1.0, 5.0, 9.0).toDF("x"), Seq("x"))
      .select("prediction").as[Double].collect()
    preds.zip(Seq(2.0, 10.0, 18.0)).foreach { case (p, expected) =>
      assert(math.abs(p - expected) < 2.0, s"prediction $p far from $expected")
    }
  }

  test("hash split: deterministic, disjoint, ~80/20, and content-addressed") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, concat_ws}
    val rng = new scala.util.Random(11)
    val df = Seq.tabulate(2000) { i =>
      val x = rng.nextDouble() * 10
      (i.toLong, x, 2 * x + rng.nextGaussian() * 0.1)
    }.toDF("id", "x", "y")

    val r1 = FeatureML.trainRegressor(df, Seq("x"), "y", numTrees = 5,
      splitKeyCols = Seq("id"))
    val r2 = FeatureML.trainRegressor(df, Seq("x"), "y", numTrees = 5,
      splitKeyCols = Seq("id"))
    // the frames are content-addressed: identical counts on re-run, exact
    // partition of the input, and the ratio lands near 80/20
    assert(r1.nTrain == r2.nTrain && r1.nTest == r2.nTest)
    assert(r1.nTrain + r1.nTest == 2000)
    assert(r1.nTrain > 1500 && r1.nTrain < 1700, s"train ${r1.nTrain} not ~80%")
    // and the assignment matches the library-level bucket rule row-for-row
    val nTrainDirect = df.filter(
      graft.functions.GraftFunctions.hashSplitBucket(concat_ws("/", col("id")), 100) < 80)
      .count()
    assert(nTrainDirect == r1.nTrain)
  }

  test("inferForKey: online lookup -> 0.0-defaulted features -> driver predict") {
    import spark.implicits._
    import graft.core.{FType, FeatureDef, FeatureGroup, FeatureStore}
    val rng = new scala.util.Random(7)
    val train = Seq.tabulate(300) { _ =>
      val x = rng.nextDouble() * 10; (x, 3 * x + rng.nextGaussian() * 0.1)
    }.toDF("latest_purchase_value", "latest_loyalty_score")
    val r = FeatureML.trainRegressor(train, Seq("latest_purchase_value"), "latest_loyalty_score", numTrees = 20)

    val fs = new FeatureStore(spark, java.nio.file.Files.createTempDirectory("infer_spec_").toString)
    fs.createGroup(FeatureGroup("cust", "customer_id", "event_time", Seq(
      FeatureDef("customer_id", FType.Integral),
      FeatureDef("event_time", FType.FTimestamp),
      FeatureDef("latest_purchase_value", FType.Fractional))))
    fs.putRecord("cust", Map("customer_id" -> "86",
      "event_time" -> "2022-06-01T00:00:00Z", "latest_purchase_value" -> "5.0"))

    val p = FeatureML.inferForKey(fs, "cust", r.model, 86L, Seq("latest_purchase_value"))
    assert(p.isDefined && math.abs(p.get - 15.0) < 3.0, s"prediction $p far from 15")
    assert(FeatureML.inferForKey(fs, "cust", r.model, 999L, Seq("latest_purchase_value")).isEmpty)

    // missing feature name defaults to 0.0 (reference real_time_inference.py:47)
    val pDefault = FeatureML.inferForKey(fs, "cust", r.model, 86L, Seq("no_such_feature"))
    assert(pDefault.isDefined)
  }
}
