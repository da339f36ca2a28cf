package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Pins [[GenSkew.skewKey]]'s contract — the skew-measurement fixture is
  * only as honest as its generator: hot keys must EXIST in the source key
  * space (a synthetic lo+0..2 on a sparse space would re-key rows onto
  * values no dimension row carries and inner joins would silently drop
  * them), the hot share must land near the requested percentage, and the
  * draw must be deterministic (retry-stable, regenerate-identical). */
class GenSkewSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  // deliberately SPARSE key space (multiples of 10 starting at 10): the
  // regression this spec pins is hot keys invented as min+0..2
  private val src = (1 to 2000).map(i => (i.toLong, 10L * (i % 50 + 1)))
    .toDF("id", "key")

  test("hot keys are existing smallest keys; share lands near hotPct") {
    val out = GenSkew.skewKey(src, "key", Seq("id"), 40)
    val srcKeys = src.select("key").distinct().as[Long].collect().toSet
    val outKeys = out.select("key").distinct().as[Long].collect().toSet
    assert(outKeys.subsetOf(srcKeys), "re-keying invented a key")
    // the 3 smallest keys hold ~40% (hot draws) + ~6% (their base share)
    val hotRows = out.filter(col("key").isin(10L, 20L, 30L)).count()
    assert(hotRows >= 700 && hotRows <= 1200,
      s"hot share off: $hotRows of 2000")
    // and they are HOT relative to the uniform base (~40 rows/key)
    val perHot = out.groupBy("key").count()
      .filter(col("key").isin(10L, 20L, 30L)).as[(Long, Long)].collect()
    perHot.foreach { case (k, n) => assert(n > 100, s"key $k not hot: $n") }
  }

  test("draw is deterministic and key dtype is preserved") {
    val a = GenSkew.skewKey(src, "key", Seq("id"), 40).collect().toSeq
    val b = GenSkew.skewKey(src, "key", Seq("id"), 40).collect().toSeq
    assert(a === b)
    val intSrc = (1 to 100).map(i => (i.toLong, i % 7 + 1)).toDF("id", "key")
    val out = GenSkew.skewKey(intSrc, "key", Seq("id"), 40)
    assert(out.schema("key").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("fails loudly when fewer than 3 distinct keys exist") {
    val tiny = Seq((1L, 5L), (2L, 5L), (3L, 6L)).toDF("id", "key")
    val e = intercept[IllegalArgumentException] {
      GenSkew.skewKey(tiny, "key", Seq("id"), 40)
    }
    assert(e.getMessage.contains("distinct"))
  }

  test("null keys never enter the hot set; non-integral keys are rejected") {
    // nulls sort FIRST under orderBy — before the guard a null landed in
    // the 3-row hot lookup and NPE'd on getLong; now it is filtered and
    // the hot set is the 3 smallest REAL keys
    val withNulls = ((1 to 200).map(i => (i.toLong, Some(10L * (i % 10 + 1)))) ++
      Seq((201L, None), (202L, None))).toDF("id", "key")
    val out = GenSkew.skewKey(withNulls, "key", Seq("id"), 40)
    val hot = out.groupBy("key").count()
      .orderBy(col("count").desc).limit(3)
      .select("key").as[Option[Long]].collect().flatten.toSet
    assert(hot === Set(10L, 20L, 30L))
    // null-key rows pass through unkeyed or re-keyed — but never crash
    assert(out.count() === 202)

    // a string key would cast to null and corrupt the re-key silently —
    // the guard rejects the type up front instead
    val strKey = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "key")
    val e = intercept[IllegalArgumentException] {
      GenSkew.skewKey(strKey, "key", Seq("id"), 40)
    }
    assert(e.getMessage.contains("integral"))

    // every integral width is accepted (simpleString spells them
    // tinyint/smallint/int/bigint — the guard must use those names)
    val shortKey = (1 to 30).map(i => (i.toLong, (i % 5 + 1).toShort))
      .toDF("id", "key")
    assert(GenSkew.skewKey(shortKey, "key", Seq("id"), 40).count() === 30)
    assert(GenSkew.skewKey(shortKey, "key", Seq("id"), 40)
      .schema("key").dataType === org.apache.spark.sql.types.ShortType)
  }
}
