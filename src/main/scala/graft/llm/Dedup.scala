package graft.llm

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY.md §7.2.5): exact, MinHash+LSH near-dup,
  * SimHash near-dup, n-gram Jaccard.
  *
  * Scale design: exact dedup shuffles 16-byte md5 keys, never full
  * documents; MinHash/LSH bound the near-dup candidate set (band-bucket
  * join instead of all-pairs); the exact Jaccard join is the verification
  * tool, used on bounded/blocked subsets only.
  */
object Dedup {

  /** Exact dedup groups: one row per distinct text with the id to keep
    * (min) and the copy count. Grouping key is the md5 fingerprint, so the
    * shuffle carries 16 bytes per row regardless of document size.
    */
  def exactDupGroups(docs: DataFrame, textCol: String = "text",
                     idCol: String = "doc_id"): DataFrame =
    docs.select(TextStats.fingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("copies"))

  /** Exact dedup keep-first: the retained rows (min id per distinct text). */
  def exactDedupKeepFirst(docs: DataFrame, textCol: String = "text",
                          idCol: String = "doc_id"): DataFrame = {
    val keep = exactDupGroups(docs, textCol, idCol).select("keep_id")
    docs.join(keep, docs(idCol) === keep("keep_id"), "left_semi")
  }

  /** MinHash+LSH near-duplicate pairs over word sets: shingle → binary
    * term-frequency vector → MinHash signatures → LSH band-bucket join.
    * `maxJaccardDistance` bounds the join (1 - Jaccard similarity).
    * Seeded, so signatures are deterministic. This is the 100 TB near-dup
    * path: candidate generation is a bucket join, never N².
    */
  def minhashNearDupPairs(docs: DataFrame, maxJaccardDistance: Double,
                          textCol: String = "text", idCol: String = "doc_id",
                          numHashTables: Int = 8): DataFrame = {
    val tokenizer = new RegexTokenizer()
      .setInputCol(textCol).setOutputCol("toks").setPattern(" ")
    val tf = new HashingTF()
      .setInputCol("toks").setOutputCol("tf").setNumFeatures(1 << 18)
      .setBinary(true) // word SETS: Jaccard over presence, not counts
    val lsh = new MinHashLSH()
      .setInputCol("tf").setOutputCol("sig").setNumHashTables(numHashTables)
      .setSeed(42L)
    val vectorized = tf.transform(tokenizer.transform(docs.select(idCol, textCol)))
    val model = lsh.fit(vectorized)
    model.approxSimilarityJoin(vectorized, vectorized, maxJaccardDistance, "dist")
      .select(col(s"datasetA.$idCol").as("id_a"),
              col(s"datasetB.$idCol").as("id_b"),
              round(col("dist"), 6).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** SimHash near-duplicate pairs: 64-bit signatures, then pairs within
    * `maxHamming` bits. The pair join here is bounded by `maxId` (exact
    * verification form); the scale path joins on signature bands, same as
    * MinHash.
    */
  def simhashPairs(docs: DataFrame, maxHamming: Int, maxId: Long,
                   textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val sigs = docs.filter(col(idCol) < maxId)
      .select(col(idCol), TextStats.simhash64(col(textCol)).as("sig"))
    val a = sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val b = sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming")
  }

  /** Exact n-gram (word shingle) Jaccard pairs via inverted-index join:
    * explode distinct shingles, join docs sharing a shingle, count shared,
    * Jaccard = |∩| / (|A|+|B|-|∩|). `maxId` bounds the block — at corpus
    * scale this runs per LSH bucket or blocking key, not globally.
    */
  def ngramJaccardPairs(docs: DataFrame, n: Int, minJaccard: Double,
                        maxId: Long, textCol: String = "text",
                        idCol: String = "doc_id"): DataFrame = {
    val toks = docs.filter(col(idCol) < maxId)
      .select(col(idCol).as("id"), TextStats.tokens(col(textCol)).as("toks"))
    val shingled = toks.select(col("id"),
      array_distinct(
        if (n == 1) col("toks")
        else transform(sequence(lit(0), size(col("toks")) - n),
          i => concat_ws(" ", slice(col("toks"), i + 1, lit(n)))))
        .as("shingles"))
    val sizes = shingled.select(col("id"), size(col("shingles")).as("n_sh"))
    val inv = shingled.select(col("id"), explode(col("shingles")).as("sh"))
    val shared = inv.as("x").join(inv.as("y"),
        col("x.sh") === col("y.sh") && col("x.id") < col("y.id"))
      .groupBy(col("x.id").as("id_a"), col("y.id").as("id_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "na"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "nb"), "id_b")
      .withColumn("jaccard",
        round(col("shared").cast("double") / (col("na") + col("nb") - col("shared")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }
}
