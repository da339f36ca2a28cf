package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: LSH band keys of a string set's MinHash
  * signature, fused into one loop — `bands` longs out, one pass over the
  * set in.
  *
  * Why native (the q36-style composed form exists and is correct): the
  * Column composition `array((0 until k).map(i => array_min(transform(set,
  * t => xxhash64(concat(lit("s<i>:"), t))))))` evaluates k interpreted
  * higher-order lambdas per row — and worse, any projection that fans the
  * resulting array out into per-band keys (element_at x bands) gets
  * collapse-inlined by Catalyst into bands COPIES of the whole signature
  * construction unless a persist/exchange barrier sits between them
  * (measured: q38's un-persisted pipeline spent ~200 s at sf0.1 evaluating
  * 16x32 inlined shingle+hash trees per row). This expression is one
  * codegen'd loop with no intermediate arrays, so it is safe to inline
  * anywhere — including directly under a posexplode generator.
  *
  * Hash family (fixed, engine-internal — candidates are verified exactly
  * downstream, so the family never reaches an oracle):
  *   base(t)  = XXH64(utf8 bytes of t, seed 42)       — one string hash per member
  *   h_i(t)   = XXH64.hashLong(base(t), seed i)       — k cheap mixes, not k string hashes
  *   sig_i    = min over members of h_i(t)            (empty set: Long.MaxValue)
  *   band_b   = fold XXH64.hashLong over sig[b*r .. b*r+r-1], seed 42, r = k/bands
  * Band keys are joined as (band_index, band_key) downstream, so cross-band
  * key collisions are harmless. Null members are skipped.
  */
case class MinHashBands(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {

  require(k > 0 && bands > 0 && k % bands == 0,
    s"k ($k) must be a positive multiple of bands ($bands)")
  private val r = k / bands

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      if (!arr.isNullAt(t)) {
        val base = XXH64.hashUTF8String(arr.getUTF8String(t), 42L)
        var i = 0
        while (i < k) {
          val h = XXH64.hashLong(base, i.toLong)
          if (h < mins(i)) mins(i) = h
          i += 1
        }
      }
      t += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 42L
      var j = 0
      while (j < r) { acc = XXH64.hashLong(mins(b * r + j), acc); j += 1 }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val t = ctx.freshName("t")
      val i = ctx.freshName("i"); val b = ctx.freshName("b")
      val j = ctx.freshName("j"); val base = ctx.freshName("base")
      val h = ctx.freshName("h"); val acc = ctx.freshName("acc")
      val mins = ctx.freshName("mins"); val out = ctx.freshName("out")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$a.isNullAt($t)) {
         |    long $base = $xxh.hashUTF8String($a.getUTF8String($t), 42L);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $h = $xxh.hashLong($base, (long) $i);
         |      if ($h < $mins[$i]) $mins[$i] = $h;
         |    }
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $acc = 42L;
         |  for (int $j = 0; $j < $r; $j++) {
         |    $acc = $xxh.hashLong($mins[$b * $r + $j], $acc);
         |  }
         |  $out[$b] = $acc;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
