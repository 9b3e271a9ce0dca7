package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel, Estimator}
import org.apache.spark.ml.classification.{GBTClassifier, OneVsRest, RandomForestClassifier}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.evaluation.MulticlassClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler, StringIndexer, VectorAssembler}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML surface (SURVEY.md §2.6 ML1–ML7) as one MLlib
  * pipeline: label/categorical encoding → lon/lat standardization → KMeans
  * cluster feature → multiclass classifier → accuracy.
  *
  * Fidelity notes (SURVEY.md §7.4):
  *  - StringIndexer uses `alphabetAsc` — sklearn's LabelEncoder assigns
  *    codes in sorted order while Spark defaults to frequencyDesc
  *    (crime.py:38-39,107-120); this is the #1 silent-divergence trap.
  *  - KMeans k=10, seed=0 mirrors crime.py:136-137; parity is metric-level
  *    (WSSSE / cluster-size distribution), never exact ids.
  *  - The classifier is pluggable: LightGBM (crime.py:171-181) has no MLlib
  *    equivalent, so RandomForest(maxDepth=10) is the default stand-in.
  *  - The reference re-fits encoders on test data (crime.py:117-120,152-153)
  *    — a leakage bug we deliberately do NOT reproduce: fit once on train,
  *    transform test.
  */
object CrimePipeline {

  /** Column roles for a crime-shaped frame. */
  case class Schema(labelCol: String, categoricalCols: Seq[String],
                    lonCol: String, latCol: String)

  /** ML1–ML5 as pipeline stages. Every stage is a distributed fit: indexer
    * = distinct job per column, scaler = one stats pass, kmeans = iterative
    * broadcast-centroid jobs, forest = per-tree distributed training.
    */
  def build(schema: Schema,
            classifier: Estimator[_] = defaultClassifier,
            clusterer: Estimator[_] = defaultKMeans): Pipeline = {
    // handleInvalid=keep: categories absent from the training split map to
    // an extra index instead of failing at scoring time. The reference
    // avoided unseen labels by re-fitting encoders on test data
    // (crime.py:117-120) — the leakage bug we deliberately don't copy, so
    // unseen categories are a normal condition here.
    val labelIndexer = new StringIndexer()
      .setInputCol(schema.labelCol).setOutputCol("label")
      .setStringOrderType("alphabetAsc") // sklearn LabelEncoder parity (ML1)
      .setHandleInvalid("keep")
    val catIndexers = schema.categoricalCols.map { c =>
      new StringIndexer().setInputCol(c).setOutputCol(s"${c}_idx")
        .setStringOrderType("alphabetAsc")
        .setHandleInvalid("keep")
    }
    val geoAssembler = new VectorAssembler()
      .setInputCols(Array(schema.lonCol, schema.latCol)).setOutputCol("geo_raw")
    val scaler = new StandardScaler() // ML2: z-score, sample std like pandas
      .setInputCol("geo_raw").setOutputCol("geo_scaled")
      .setWithMean(true).setWithStd(true)
    val kmeans = clusterer // ML3: cluster id becomes a feature
    // The reference hands label-encoded ints to LightGBM as plain numeric
    // features (crime.py:111-120 — no categorical declaration), so indexed
    // columns are demoted to bare doubles here too. The CAST drops the
    // nominal metadata StringIndexer attaches; without this, tree training
    // rejects high-cardinality columns (Address) against maxBins.
    val demote =
      if (schema.categoricalCols.isEmpty) Seq.empty // SELECT *, FROM is a parse error
      else Seq(new org.apache.spark.ml.feature.SQLTransformer().setStatement(
        "SELECT *, " + schema.categoricalCols
          .map(c => s"CAST(${c}_idx AS DOUBLE) AS ${c}_num").mkString(", ") +
          " FROM __THIS__"))
    val featureAssembler = new VectorAssembler()
      .setInputCols((schema.categoricalCols.map(c => s"${c}_num") ++
        Seq("geo_scaled", "cluster")).toArray)
      .setOutputCol("features")
    new Pipeline().setStages(
      (Seq(labelIndexer) ++ catIndexers ++ demote ++
        Seq(geoAssembler, scaler, kmeans, featureAssembler, classifier)).toArray)
  }

  /** ML3 default: one seeded k-means|| fit (k=10, seed=0, crime.py:136-137).
    * Parity is metric-level (WSSSE / size distribution), never exact ids.
    */
  def defaultKMeans: KMeans = new KMeans()
    .setK(10).setSeed(0L).setFeaturesCol("geo_scaled").setPredictionCol("cluster")

  /** ML3 sklearn-parity variant: sklearn's KMeans takes the best of
    * `n_init=10` restarts by inertia (crime.py:136 leaves the default);
    * [[BestOfKMeans]] reproduces that restart loop over seeded
    * k-means|| fits. Selectable, not default — 10× the clustering fits
    * for a metric-level-only refinement, the same cost call the
    * OneVsRest(GBT) classifier variant makes.
    */
  def bestOfKMeans(nInit: Int = 10): BestOfKMeans = new BestOfKMeans()
    .setK(10).setNInit(nInit).setBaseSeed(0L)
    .setFeaturesCol("geo_scaled").setPredictionCol("cluster")

  /** ML5 default: RandomForest is MLlib's native-multiclass tree ensemble
    * (GBTClassifier is binary-only); depth matches the reference config.
    */
  def defaultClassifier: RandomForestClassifier =
    new RandomForestClassifier()
      .setLabelCol("label").setFeaturesCol("features")
      .setMaxDepth(10).setNumTrees(20).setSeed(0L)

  /** ML5 boosted variant: the reference's model IS boosted trees (a
    * 100-round LightGBM multiclass GBDT, crime.py:171-181). MLlib's
    * GBTClassifier is binary-only, so the multiclass boosted path is
    * one-vs-rest over per-class GBTs — k sequential boosted fits, each
    * itself distributed. Selectable, not default: k× boosting rounds make
    * it the expensive fidelity option (same tradeoff LightGBM's own
    * `multiclassova` objective makes vs multinomial softmax).
    */
  def ovrGbtClassifier(maxIter: Int = 20, maxDepth: Int = 5): OneVsRest =
    new OneVsRest()
      .setClassifier(new GBTClassifier()
        .setMaxIter(maxIter).setMaxDepth(maxDepth).setSeed(0L))
      .setLabelCol("label").setFeaturesCol("features")

  /** ML4 + ML6: 70/30 split (seed 0, crime.py:168-169), fit on train only,
    * report holdout accuracy.
    */
  def trainAndEvaluate(df: DataFrame, schema: Schema): (PipelineModel, Double) = {
    val (model, metrics) = trainAndEvaluateMetrics(df, schema)
    (model, metrics("accuracy"))
  }

  /** ML4 + ML6 with the reference's actual training metric alongside:
    * `multi_logloss` (crime.py:177) next to accuracy, from ONE transform
    * of the holdout. logLoss needs per-class probabilities; classifiers
    * that emit none (OneVsRest picks an argmax over per-class margins,
    * with no joint distribution) report NaN there rather than a fake.
    */
  def trainAndEvaluateMetrics(df: DataFrame, schema: Schema,
                              classifier: Estimator[_] = defaultClassifier)
      : (PipelineModel, Map[String, Double]) = {
    val Array(train, test) = df.randomSplit(Array(0.7, 0.3), seed = 0L)
    val model = build(schema, classifier).fit(train)
    val full = model.transform(test)
    val hasProb = full.columns.contains("probability")
    // both evaluators read ONE cached transform of the holdout (narrowed
    // to the metric columns) instead of re-scoring the model per metric
    val preds = full.select((col("label") +: col("prediction") +:
      (if (hasProb) Seq(col("probability")) else Nil)): _*).cache()
    try {
      def eval(metric: String) = new MulticlassClassificationEvaluator()
        .setLabelCol("label").setPredictionCol("prediction")
        .setMetricName(metric).evaluate(preds)
      val logLoss = if (hasProb) eval("logLoss") else Double.NaN
      (model, Map("accuracy" -> eval("accuracy"), "logLoss" -> logLoss))
    } finally preds.unpersist(blocking = false)
  }

  /** The label-decode column of ML7: predicted index back to its string
    * form, usable on any frame that already carries `prediction` (so a
    * cached transform can be scored without re-running the pipeline).
    */
  def decodePrediction(model: PipelineModel, schema: Schema)
      : org.apache.spark.sql.Column = {
    val labels = model.stages.collectFirst {
      case m: org.apache.spark.ml.feature.StringIndexerModel
        if m.getInputCol == schema.labelCol => m.labelsArray(0)
    }.getOrElse(Array.empty[String])
    // handleInvalid=keep reserves index numLabels for unseen categories; a
    // prediction can only land there if such rows were trained on. Pure
    // codegen'd lookup — element_at over an embedded literal array (the
    // labels are k strings, never data-sized); the when() guard keeps the
    // out-of-range branch from ever reaching element_at, which is an
    // INVALID_ARRAY_INDEX runtime error under ANSI mode.
    val idx = col("prediction").cast("int")
    when(idx < labels.length,
      element_at(typedlit(labels.toSeq), idx + 1))
      .otherwise(lit("__unseen__"))
  }

  /** ML7 (crime.py:200-206): submission-style (Id, Category) frame, with
    * the predicted label decoded back to its string form.
    */
  def score(model: PipelineModel, df: DataFrame, idCol: String,
            schema: Schema): DataFrame =
    model.transform(df)
      .select(col(idCol).as("Id"),
        decodePrediction(model, schema).as("Category"))
}
