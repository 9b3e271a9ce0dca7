package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column `Array[Float]`
  * (SURVEY.md §7.2.5).
  *
  * Numeric contract: all arithmetic is double-precision with a sequential
  * left-fold over the array (`aggregate`), matching the oracle's list_sum
  * fold order, so scores are reproducible to the last bit before rounding.
  *
  * Scale design: brute-force top-k broadcasts the (small) query set and
  * keeps per-partition heaps via TakeOrderedAndProject — no N×Q shuffle of
  * score rows. The LSH variant bounds candidate generation for pair search;
  * at 100 TB brute force is the rerank stage, LSH/IVF the recall stage.
  */
object Similarity {

  /** Sequential-fold dot product in double precision. */
  def dotProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Sequential-fold squared L2 norm in double precision. */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def l2Norm(a: Column): Column = sqrt(normSq(a))

  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (l2Norm(a) * l2Norm(b))

  /** Brute-force cosine top-k: every query (a small broadcast set) against
    * the full corpus, rank per query. Exact baseline for the ANN variants.
    */
  def knnBruteForce(corpus: DataFrame, queries: DataFrame, k: Int,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding"): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val w = Window.partitionBy("query_id").orderBy(desc("score"), asc("neighbor_id"))
    c.join(q, col("query_id") =!= col("neighbor_id")) // broadcast nested loop
      .select(col("query_id"), col("neighbor_id"),
        round(cosine(col("cv"), col("qv")), 6).as("score"))
      .withColumn("rk", row_number().over(w).cast("bigint"))
      .filter(col("rk") <= k)
      .select("query_id", "rk", "neighbor_id", "score")
  }

  /** LSH-bucketed near-neighbor pairs: random-hyperplane buckets via
    * BucketedRandomProjectionLSH over unit-normalized vectors. On unit
    * vectors, euclidean distance d ↔ cosine = 1 - d²/2, so a cosine floor
    * maps to a euclidean ceiling. Candidate pairs come from bucket joins —
    * never the N² cross product.
    */
  def lshCosinePairs(corpus: DataFrame, minCosine: Double,
                     idCol: String = "vec_id", vecCol: String = "embedding",
                     bucketLength: Double = 0.5,
                     numHashTables: Int = 4): DataFrame = {
    import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
    import org.apache.spark.ml.linalg.Vectors
    import org.apache.spark.ml.functions.array_to_vector

    val unit = corpus.select(col(idCol),
      transform(col(vecCol), x => x.cast("double") / l2Norm(col(vecCol))).as("u"))
      .withColumn("uv", array_to_vector(col("u")))
      .select(idCol, "uv")
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("uv").setOutputCol("hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(unit)
    val maxDist = math.sqrt(2.0 * (1.0 - minCosine))
    model.approxSimilarityJoin(unit, unit, maxDist, "dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
              col(s"datasetB.$idCol").as("id_b"),
              round(lit(1.0) - col("dist") * col("dist") / 2.0, 6).as("cosine"))
      .filter(col("id_a") < col("id_b"))
  }
}
