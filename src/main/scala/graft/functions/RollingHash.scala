package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: Rabin-Karp rolling hash over a token array —
  * the fused form of the composed fold
  * `aggregate(toks, 0L, (acc, t) => pmod(acc*31 + pmod(xxhash64(t), p), p))`
  * with p = 2^31 - 1 (Mersenne prime; every intermediate stays below 2^36,
  * so the math is exact under ANSI arithmetic with no overflow).
  *
  * Bit-identical to the composed form (q62's original definition, pinned by
  * spec): per token it computes Spark's own xxhash64 (seed 42; a null token
  * contributes the seed, exactly like the builtin on null input) and folds
  * with the same pmod chain — but in ONE generated loop instead of an
  * interpreted lambda dispatch per token, which is the difference between
  * fingerprinting a corpus at scan speed and at lambda-interpreter speed.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  val modulus: Long = 2147483647L // 2^31 - 1

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      // xxhash64(null) = the seed — match the builtin's null contract.
      // XXH64.hashUTF8String is the exact call the builtin's own codegen
      // emits for string input, so parity with the HOF fold is structural.
      val h = if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      val hm = ((h % modulus) + modulus) % modulus
      acc = (acc * 31L + hm) % modulus // operands < 2^36: no overflow
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val h = ctx.freshName("h"); val hm = ctx.freshName("hm")
      val acc = ctx.freshName("acc")
      val xxh = classOf[XXH64].getName
      s"""
         |int $n = $a.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  long $hm = (($h % ${modulus}L) + ${modulus}L) % ${modulus}L;
         |  $acc = ($acc * 31L + $hm) % ${modulus}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
