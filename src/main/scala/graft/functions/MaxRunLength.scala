package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: length of the longest run of equal adjacent
  * elements in a SORTED string array — i.e. the multiplicity of the most
  * frequent element, in one codegen'd pass with zero allocation.
  *
  * This is what turns the Gopher-style top-n-gram share (q126) into a pure
  * MAP: the composed form explodes every n-gram occurrence into a
  * (doc_id, gram) aggregate and joins the per-doc max back — a corpus-size
  * shuffle plus a second scan of the gram arrays — while
  * `graft_max_run(array_sort(grams))` computes the same integer inside the
  * projection that already built the array. Same contract discipline as
  * [[JaccardSorted]]: input ascending-sorted; null elements break runs and
  * never count (the callers' grams are non-null by construction).
  */
case class MaxRunLength(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_max_run"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var best = 0
    var run = 0
    var prev: UTF8String = null
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) { run = 0; prev = null }
      else {
        val cur = arr.getUTF8String(i)
        run = if (prev != null && cur.equals(prev)) run + 1 else 1
        if (run > best) best = run
        prev = cur
      }
      i += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val utf8 = classOf[UTF8String].getName
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val best = ctx.freshName("best"); val run = ctx.freshName("run")
      val prev = ctx.freshName("prev"); val cur = ctx.freshName("cur")
      s"""
         |int $n = $a.numElements();
         |int $best = 0;
         |int $run = 0;
         |$utf8 $prev = null;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($i)) { $run = 0; $prev = null; }
         |  else {
         |    $utf8 $cur = $a.getUTF8String($i);
         |    $run = ($prev != null && $cur.equals($prev)) ? $run + 1 : 1;
         |    if ($run > $best) $best = $run;
         |    $prev = $cur;
         |  }
         |}
         |${ev.value} = $best;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
