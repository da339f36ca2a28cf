package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: sorted-distinct word n-gram shingles of a
  * token array — the fused form of
  * `sort_array(array_distinct(transform(sequence(0, greatest(size(toks)-n,
  * 0)), i => array_join(slice(toks, i+1, n), " "))))`.
  *
  * Why native: in the composed form the lambda body's `slice(toks, ...)`
  * references the TOKEN EXPRESSION, so after projection collapse the
  * tokenizer (split/trim/lower over the document) re-evaluates once PER
  * SHINGLE POSITION — ~50 re-splits of every document, interpreted
  * (measured: the shingle projection alone cost 6.6 s at sf0.1, ~85% of
  * the whole near-dup query). Here the token array is evaluated once and
  * one generated loop builds the shingles into a binary-ordered TreeSet
  * (the same UTF8String ordering `sort_array` uses), so dedup+sort come
  * out of the walk for free.
  *
  * Exact-parity contract with the composed form (pinned by spec):
  * max(size-n, 0)+1 positions; a slice past the end truncates (documents
  * shorter than n tokens yield their full token join); null tokens are
  * skipped by the join exactly like `array_join`; empty input yields one
  * empty-string shingle.
  */
case class NgramShingles(child: Expression, n: Int) extends UnaryExpression {

  require(n > 0, s"shingle width must be positive, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_shingles"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val cnt = math.max(m - n, 0) + 1
    val set = new java.util.TreeSet[UTF8String]()
    var i = 0
    while (i < cnt) {
      val end = math.min(i + n, m)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) {
        parts(j - i) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
        j += 1
      }
      set.add(UTF8String.concatWs(space, parts: _*))
      i += 1
    }
    new GenericArrayData(set.toArray.asInstanceOf[Array[AnyRef]])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val utf8 = classOf[UTF8String].getName
    val sep = ctx.addReferenceObj("shingleSep", space, utf8)
    nullSafeCodeGen(ctx, ev, a => {
      val m = ctx.freshName("m"); val cnt = ctx.freshName("cnt")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val end = ctx.freshName("end"); val parts = ctx.freshName("parts")
      val set = ctx.freshName("set")
      // raw TreeSet: Janino has no generics; UTF8String's compareTo is the
      // binary ordering sort_array(StringType) uses
      s"""
         |int $m = $a.numElements();
         |int $cnt = java.lang.Math.max($m - $n, 0) + 1;
         |java.util.TreeSet $set = new java.util.TreeSet();
         |for (int $i = 0; $i < $cnt; $i++) {
         |  int $end = java.lang.Math.min($i + $n, $m);
         |  $utf8[] $parts = new $utf8[$end - $i];
         |  for (int $j = $i; $j < $end; $j++) {
         |    $parts[$j - $i] = $a.isNullAt($j) ? null : $a.getUTF8String($j);
         |  }
         |  $set.add($utf8.concatWs($sep, $parts));
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($set.toArray());
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
