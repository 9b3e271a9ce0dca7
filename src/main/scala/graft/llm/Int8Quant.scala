package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE int8 (asymmetric min/max) quantization contract — one definition
  * shared by the storage query ([[LlmQueries.embeddingInt8]]) and the
  * search query ([[Similarity.int8TopK]]), so the two can never drift
  * (they are spec-gated to agree, but agreement by one shared formula
  * beats agreement by two audited copies).
  *
  * The formula, per vector with extrema (mn, mx):
  *   sc      = (mx − mn) / 255
  *   code(x) = min(floor((x − mn) / sc), 255)        — floor, not round:
  *             a .5 rounding tie would be engine-dependent; floor is
  *             exact in both Spark and the DuckDB oracle
  *   deq(x)  = mn + code(x)·sc, except sc = 0 (a constant vector)
  *             dequantizes to mn exactly instead of tripping 0/0.
  * Every op is plain double arithmetic in the same order on both engines,
  * which is why the "approximate" queries still hash exactly.
  */
object Int8Quant {

  /** Quantization step for a vector with extrema (mn, mx). */
  def scale(mn: Column, mx: Column): Column = (mx - mn) / 255.0

  /** 256-level code of element x; LongType (exact integer checksum math
    * downstream). Caller guards sc = 0 — code is unused there.
    */
  def code(x: Column, mn: Column, sc: Column): Column =
    least(floor((x - mn) / sc), lit(255L))

  /** Dequantized element value, constant-vector-safe. */
  def dequant(x: Column, mn: Column, sc: Column): Column =
    when(sc === 0.0, mn).otherwise(mn + code(x, mn, sc) * sc)
}
