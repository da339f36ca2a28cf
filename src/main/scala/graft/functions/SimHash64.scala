package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array in one
  * generated loop — per token, each bit of xxhash64(token) (seed 42, the
  * builtin's) votes +1/-1; bit j of the result is set iff the vote sum is
  * strictly positive.
  *
  * Bit-identical to the composed form (explode + groupBy(doc) with 64
  * conditional SUMs — q37's original definition, spec-pinned), but
  * map-side: the composed form SHUFFLES every token of the corpus to
  * aggregate votes, which at 100 TB means a full-corpus-size exchange
  * before any near-dup work starts. As an expression the signature costs
  * one pass over each row's tokens and nothing moves — the only shuffle
  * left in the SimHash pipeline is the (chunk, value) candidate join on
  * 8-byte keys.
  *
  * Callers pass the DISTINCT token set (as q37 always did): vote counts
  * are per distinct token, so duplicates would change the hash. A null
  * element votes with h = 42 (the seed) — exactly what the composed form
  * does, because the xxhash64 builtin returns its seed unchanged for a
  * null input; the bit-identical contract therefore holds for arrays WITH
  * null elements too.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var t = 0
    while (t < n) {
      // null element: the builtin xxhash64 leaves the seed untouched, so
      // the composed (explode + xxhash64) form votes with 42 — match it
      val h =
        if (arr.isNullAt(t)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val votes = ctx.freshName("votes"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |int[] $votes = new int[64];
         |for (int $t = 0; $t < $n; $t++) {
         |  long $h = $a.isNullAt($t)
         |    ? 42L : $xxh.hashUTF8String($a.getUTF8String($t), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $votes[$j]++; else $votes[$j]--;
         |  }
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($votes[$j] > 0) $out |= (1L << $j);
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
