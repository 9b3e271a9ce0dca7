package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables.table

/** Harness wiring for the statistics operators (A7/A8/F4). */
object StatsQueries {

  type Q = (SparkSession, String) => DataFrame

  private val liCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")

  /** A7 (crime.py:42,53): full Pearson matrix in long form. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame =
    Stats.corrMatrix(table(spark, dir, "lineitem"), liCols)
      .orderBy("col_a", "col_b")

  /** A8 (crime.py:51-52): features most correlated with the target. */
  def topCorrelated(spark: SparkSession, dir: String): DataFrame =
    Stats.topCorrelated(table(spark, dir, "lineitem"), liCols,
      target = "l_extendedprice", k = 3)

  /** F4 (crime.py:184,203): np.argmax over an array column. */
  def argmaxEmbedding(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "embeddings")
      .select(col("vec_id"), Stats.argmax(col("embedding")).as("arg_max"))
      .orderBy("vec_id")

  val all: Map[String, Q] = Map(
    "q_corr_matrix" -> (corrMatrix _),
    "q_top_correlated" -> (topCorrelated _),
    "q_argmax_embedding" -> (argmaxEmbedding _)
  )

  private def corrPair(a: String, b: String): String =
    s"SELECT '$a' AS col_a, '$b' AS col_b, round(corr($a, $b), 6) AS corr FROM lineitem"

  val oracle: Map[String, String] = Map(
    "q_corr_matrix" -> (
      (for { a <- liCols; b <- liCols } yield corrPair(a, b))
        .mkString("", "\nUNION ALL\n", "\nORDER BY col_a, col_b")),

    "q_top_correlated" ->
      s"""WITH m AS (
         |${liCols.filter(_ != "l_extendedprice")
             .map(c => corrPair("l_extendedprice", c)).mkString("\nUNION ALL\n")})
         |SELECT col_b AS feature, corr FROM m
         |ORDER BY corr DESC, feature ASC
         |LIMIT 3""".stripMargin,

    "q_argmax_embedding" ->
      """SELECT vec_id,
        |  CAST(list_indexof(embedding, list_max(embedding)) - 1 AS BIGINT) AS arg_max
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin
  )
}
