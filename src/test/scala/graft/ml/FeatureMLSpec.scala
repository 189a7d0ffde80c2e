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
}
