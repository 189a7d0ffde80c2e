package graft.ml

import org.apache.spark.ml.evaluation.RegressionEvaluator
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.regression.{RandomForestRegressionModel, RandomForestRegressor}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, concat_ws}

import graft.functions.GraftFunctions

/** Train/infer loop matching the reference's ML surface (SURVEY.md §2.9):
  * single-feature RandomForest regression, 100 trees, seed 42, 80/20 split,
  * MSE metric (historical_features.py:77-90). sklearn and MLlib RNGs differ,
  * so model outputs are smoke-tested (finite, bounded MSE), never
  * golden-compared (SURVEY.md §7 risk 4).
  *
  * The SPLIT, however, is fully auditable when `splitKeyCols` is given: rows
  * are assigned train/test by [[GraftFunctions.hashSplitBucket]] over the key
  * (bucket < 80 → train), so the exact frames are content-addressed and
  * re-derivable by any engine — stronger reproducibility than the reference's
  * seed-42 `train_test_split` (historical_features.py:81), whose frames only
  * replay inside the same sklearn version. `splitKeyCols = Nil` falls back to
  * MLlib's positional `randomSplit` for API parity with M1.
  */
object FeatureML {

  final case class TrainResult(model: RandomForestRegressionModel, mse: Double,
      nTrain: Long, nTest: Long)

  def trainRegressor(
      df: DataFrame,
      featureCols: Seq[String],
      labelCol: String,
      numTrees: Int = 100,
      seed: Long = 42L,
      splitKeyCols: Seq[String] = Nil): TrainResult = {

    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df.na.drop(featureCols :+ labelCol))
    val Array(train, test) =
      if (splitKeyCols.nonEmpty) {
        val bucket = GraftFunctions.hashSplitBucket(
          concat_ws("/", splitKeyCols.map(col): _*), 100)
        val b = assembled.withColumn("__split_bucket", bucket)
        Array(b.filter(col("__split_bucket") < 80).drop("__split_bucket"),
          b.filter(col("__split_bucket") >= 80).drop("__split_bucket"))
      } else assembled.randomSplit(Array(0.8, 0.2), seed)

    val model = new RandomForestRegressor()
      .setNumTrees(numTrees).setSeed(seed)
      .setFeaturesCol("features").setLabelCol(labelCol)
      .fit(train)

    val mse = new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction").setMetricName("mse")
      .evaluate(model.transform(test))
    TrainResult(model, mse, train.count(), test.count())
  }

  /** Batch score (reference: real_time_inference.py:50-61 scores one row;
    * `model.transform` is the set-oriented equivalent). */
  def predict(model: RandomForestRegressionModel, df: DataFrame, featureCols: Seq[String]): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
      .transform(df)
    model.transform(assembled)
  }

  /** Serve-time inference for one entity key, mirroring the reference's full
    * path (real_time_inference.py:42-61): online point lookup → stringly
    * features → missing/unparseable features DEFAULT TO 0.0 (`:47
    * float(features.get(..., 0.0))`) → driver-side single-vector predict (no
    * Spark job at serve time). None when the key has no online record
    * (`:20-22`). */
  def inferForKey(
      fs: graft.core.FeatureStore,
      groupName: String,
      model: RandomForestRegressionModel,
      key: Any,
      featureCols: Seq[String]): Option[Double] =
    fs.getRecord(groupName, key).map { rec =>
      val vec = org.apache.spark.ml.linalg.Vectors.dense(
        featureCols.map(c => rec.get(c).flatMap(_.toDoubleOption).getOrElse(0.0)).toArray)
      model.predict(vec)
    }
}
