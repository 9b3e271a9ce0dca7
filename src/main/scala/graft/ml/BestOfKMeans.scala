package graft.ml

import org.apache.spark.ml.Estimator
import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.param.ParamMap
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.Dataset
import org.apache.spark.sql.types.StructType

/** sklearn `n_init` parity for the KMeans stage (reference crime.py:136:
  * sklearn's KMeans defaults to the best of 10 random restarts by
  * inertia). MLlib runs ONE k-means|| init per fit, so the restart loop
  * lives here: fit `nInit` seeded models (baseSeed, baseSeed+1, …) and
  * keep the lowest WSSSE (`summary.trainingCost` — sklearn's inertia),
  * ties broken to the lowest restart index so the winner is
  * deterministic.
  *
  * Scale: each restart is itself a fully distributed k-means|| fit; the
  * loop multiplies driver-side orchestration only (N sequential fits, the
  * exact shape sklearn runs single-node). The input is cached for the
  * duration of the restarts — an iterative multi-pass consumer is THE
  * case executor caching exists for — and released on exit.
  */
class BestOfKMeans(override val uid: String) extends Estimator[KMeansModel] {

  def this() = this(Identifiable.randomUID("bestOfKMeans"))

  private var k = 10
  private var nInit = 10
  private var baseSeed = 0L
  private var featuresCol = "features"
  private var predictionCol = "prediction"

  def setK(v: Int): this.type = { k = v; this }
  def setNInit(v: Int): this.type = {
    require(v >= 1, s"nInit must be >= 1: $v"); nInit = v; this
  }
  def setBaseSeed(v: Long): this.type = { baseSeed = v; this }
  def setFeaturesCol(v: String): this.type = { featuresCol = v; this }
  def setPredictionCol(v: String): this.type = { predictionCol = v; this }

  private def base(seed: Long): KMeans = new KMeans()
    .setK(k).setSeed(seed)
    .setFeaturesCol(featuresCol).setPredictionCol(predictionCol)

  override def fit(ds: Dataset[_]): KMeansModel = {
    val frame = ds.toDF().cache()
    try {
      (0 until nInit).map { i =>
        val m = base(baseSeed + i).fit(frame)
        (m.summary.trainingCost, i, m)
      }.minBy { case (cost, i, _) => (cost, i) }._3
    } finally frame.unpersist(blocking = false)
  }

  override def copy(extra: ParamMap): BestOfKMeans =
    new BestOfKMeans(uid).setK(k).setNInit(nInit).setBaseSeed(baseSeed)
      .setFeaturesCol(featuresCol).setPredictionCol(predictionCol)

  override def transformSchema(schema: StructType): StructType =
    base(baseSeed).transformSchema(schema)
}
