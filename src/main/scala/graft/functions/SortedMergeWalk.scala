package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.BinaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, StringType}

/** The one sorted-set merge walk shared by [[JaccardSorted]] and
  * [[IntersectSorted]]: |a ∩ b| of two ascending-sorted, distinct string
  * arrays in O(n+m) comparisons with zero allocation, in both the
  * interpreted and generated paths. Keeping the walk here means a fix
  * (ordering, null handling) lands in every expression at once instead of
  * drifting across copies.
  *
  * Null ELEMENTS violate the sorted-distinct contract and fail with a
  * clear message instead of an opaque executor NPE (the array-level null
  * case is already handled by `nullSafeEval`/`nullSafeCodeGen`).
  */
trait SortedMergeWalk { self: BinaryExpression =>

  protected def walkTypeCheck(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  /** Interpreted |a ∩ b| on sorted-distinct arrays. */
  protected def intersectCount(a: Any, b: Any): Int = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val na = x.numElements(); val nb = y.numElements()
    var i = 0; var j = 0; var inter = 0
    while (i < na && j < nb) {
      val sa = x.getUTF8String(i); val sb = y.getUTF8String(j)
      if (sa == null || sb == null) throw new IllegalArgumentException(
        s"$prettyName: null array element (inputs must be sorted, distinct, non-null)")
      val c = sa.compareTo(sb)
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter
  }

  /** Generated walk: emits code declaring fresh vars and leaving the
    * intersection count in the returned variable name. */
  protected def genWalk(ctx: CodegenContext, a: String, b: String): (String, String) = {
    val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val inter = ctx.freshName("inter"); val c = ctx.freshName("c")
    val sa = ctx.freshName("sa"); val sb = ctx.freshName("sb")
    val code =
      s"""
         |int $na = $a.numElements(); int $nb = $b.numElements();
         |int $i = 0, $j = 0, $inter = 0;
         |while ($i < $na && $j < $nb) {
         |  org.apache.spark.unsafe.types.UTF8String $sa = $a.getUTF8String($i);
         |  org.apache.spark.unsafe.types.UTF8String $sb = $b.getUTF8String($j);
         |  if ($sa == null || $sb == null) throw new IllegalArgumentException(
         |    "$prettyName: null array element (inputs must be sorted, distinct, non-null)");
         |  int $c = $sa.compareTo($sb);
         |  if ($c == 0) { $inter++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
       """.stripMargin
    (code, inter)
  }
}
