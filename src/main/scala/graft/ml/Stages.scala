package graft.ml

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.{MulticlassClassificationEvaluator, RegressionEvaluator}
import org.apache.spark.ml.feature.{PCA, StandardScaler, VectorAssembler}
import org.apache.spark.ml.regression.LinearRegression
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame

/** The reference's *intended* ML scope beyond the main pipeline — its
  * imports that never got call sites (crime.py:10-31: LogisticRegression,
  * LinearRegression, Ridge/Lasso/ElasticNetCV, PCA, KFold/cross_val_score)
  * — mapped to their MLlib equivalents as small composable stages
  * (SURVEY.md §2.6 "imported but never used").
  */
object Stages {

  /** Multinomial logistic regression as the pluggable classifier for
    * [[CrimePipeline.build]] (crime.py:10 import).
    */
  def logistic(maxIter: Int = 50, regParam: Double = 0.0): LogisticRegression =
    new LogisticRegression()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxIter(maxIter).setRegParam(regParam).setFamily("multinomial")

  /** Linear regression with elastic-net mixing — α=0 is RidgeCV's penalty,
    * α=1 LassoCV's, in between ElasticNetCV (crime.py:12-13 imports).
    */
  def linear(featureCols: Seq[String], labelCol: String,
             regParam: Double = 0.0, elasticNetParam: Double = 0.0): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val lr = new LinearRegression()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setRegParam(regParam).setElasticNetParam(elasticNetParam)
    new Pipeline().setStages(Array(assembler, lr))
  }

  /** PCA over standardized features (crime.py:24 import): returns the
    * fitted model's transform plus explained-variance vector.
    */
  def pca(df: DataFrame, cols: Seq[String], k: Int): (DataFrame, Array[Double]) = {
    val assembled = new VectorAssembler()
      .setInputCols(cols.toArray).setOutputCol("__raw").transform(df)
    val scaled = new StandardScaler()
      .setInputCol("__raw").setOutputCol("__scaled")
      .setWithMean(true).setWithStd(true).fit(assembled).transform(assembled)
    val model = new PCA().setInputCol("__scaled").setOutputCol("pca")
      .setK(k).fit(scaled)
    (model.transform(scaled).drop("__raw", "__scaled"),
      model.explainedVariance.toArray)
  }

  /** K-fold cross-validation (crime.py:26-27 KFold/cross_val_score):
    * grid-search the classifier over `numFolds` folds, return the best
    * model and its average metric.
    */
  def crossValidate(df: DataFrame, schema: CrimePipeline.Schema,
                    numFolds: Int = 3): (org.apache.spark.ml.Model[_], Double) = {
    // construct the classifier directly instead of downcasting
    // pipeline.getStages.last — build()'s classifier is documented as
    // pluggable, so a positional cast would break on the next swap
    val rf = CrimePipeline.defaultClassifier
    val pipeline = CrimePipeline.build(schema, rf)
    val grid = new ParamGridBuilder()
      .addGrid(rf.maxDepth, Array(5, 10))
      .build()
    val cv = new CrossValidator()
      .setEstimator(pipeline)
      .setEvaluator(new MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName("accuracy"))
      .setEstimatorParamMaps(grid)
      .setNumFolds(numFolds).setSeed(0L)
    val model = cv.fit(df)
    (model.bestModel, model.avgMetrics.max)
  }

  /** Univariate feature selection — the role of the reference's
    * mutual_info_regression import (crime.py:25), filled with the scoring
    * MLlib actually ships: UnivariateFeatureSelector's ANOVA F-test
    * (f_classif) by default, since MLlib has no mutual-information
    * scorer. `labelType` must match the label: "categorical" (default,
    * classification-style F-test) or "continuous" (regression F-test) —
    * a continuous label left as "categorical" would treat every distinct
    * value as a class.
    */
  def selectFeatures(df: DataFrame, featureCols: Seq[String],
                     labelCol: String, k: Int,
                     labelType: String = "categorical",
                     featureType: String = "continuous"): DataFrame = {
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("__f").transform(df)
    new org.apache.spark.ml.feature.UnivariateFeatureSelector()
      .setFeaturesCol("__f").setLabelCol(labelCol).setOutputCol("selected")
      .setFeatureType(featureType).setLabelType(labelType)
      .setSelectionMode("numTopFeatures").setSelectionThreshold(k)
      .fit(assembled).transform(assembled)
      .drop("__f")
  }

  /** RMSE / R² evaluation for the regression stages (crime.py:28-29
    * mean_squared_error import).
    */
  def evaluateRegression(predictions: DataFrame, labelCol: String,
                         metric: String = "rmse"): Double =
    new RegressionEvaluator()
      .setLabelCol(labelCol).setPredictionCol("prediction")
      .setMetricName(metric).evaluate(predictions)

  /** Boosted-tree regression — the `XGBRegressor` import's MLlib mapping
    * (crime.py:21; imported, never called). GBTRegressor IS gradient
    * boosting (sequential trees on residuals), the same family XGBoost
    * implements; per-tree training is distributed.
    */
  def boostedRegression(featureCols: Seq[String], labelCol: String,
                        maxIter: Int = 20, maxDepth: Int = 5): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(featureCols.toArray).setOutputCol("features")
    val gbt = new org.apache.spark.ml.regression.GBTRegressor()
      .setLabelCol(labelCol).setFeaturesCol("features")
      .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(0L)
    new Pipeline().setStages(Array(assembler, gbt))
  }

  /** ROC-AUC for a binary prediction frame — the `roc_auc_score` import's
    * mapping (crime.py:29; imported, never called). Reads the raw score
    * column, distributed threshold sweep.
    */
  def rocAuc(predictions: DataFrame, labelCol: String,
             scoreCol: String = "rawPrediction"): Double =
    new org.apache.spark.ml.evaluation.BinaryClassificationEvaluator()
      .setLabelCol(labelCol).setRawPredictionCol(scoreCol)
      .setMetricName("areaUnderROC").evaluate(predictions)
}
