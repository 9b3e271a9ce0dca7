package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd 64-bit SimHash over a token array: one pass hashing each
  * token (the same XXH64(seed=42) as SQL `xxhash64`) and accumulating all
  * 64 bit counters; bit b of the result is set when more than half the
  * tokens have bit b set in their hash.
  *
  * Bit-identical to the declarative form
  * `(0 until 64).map(b => filter(transform(toks, xxhash64), ...))` on
  * null-free token arrays — but that form is 64 interpreted higher-order
  * `filter` passes per document (HOFs are CodegenFallback): this is a
  * single primitive loop inside whole-stage codegen. Two deliberate
  * divergences from the HOF form: a NULL input array yields NULL (the
  * HOF stack yields 0L, silently pairing all null-text docs at hamming
  * 0), and null token slots count toward the majority denominator but
  * contribute no bits (the HOF hashes them to the seed). Whitespace
  * tokenization never produces null slots, so these only matter for
  * direct callers with hand-built arrays.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SimHash64 needs array<string> input, got ${other.simpleString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      if (!xs.isNullAt(i)) {
        val s = xs.getUTF8String(i)
        val h = XXH64.hashUTF8String(s, 42L)
        var b = 0
        while (b < 64) {
          cnt(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) * 2L > n) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64
         |      .hashUTF8String($a.getUTF8String($i), 42L);
         |    for (int $b = 0; $b < 64; $b++) {
         |      $cnt[$b] += (int) (($h >>> $b) & 1L);
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($cnt[$b] * 2L > $n) $sig |= (1L << $b);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object TextHash {
  /** Column API for [[SimHash64]]. */
  def simhash64(tokens: Column): Column =
    org.apache.spark.sql.graftbridge.Bridge.column(
      SimHash64(org.apache.spark.sql.graftbridge.Bridge.expression(tokens)))
}
