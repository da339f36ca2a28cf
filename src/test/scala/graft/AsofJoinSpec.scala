package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.AsofJoin

class AsofJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("backward as-of: latest right at-or-before each left row") {
    val left = Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "c"),
      (2L, 15L, "d")).toDF("k", "t", "payload")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 18L, 200.0),
      (3L, 1L, 999.0)).toDF("k", "t", "rv")
    val out = AsofJoin.backward(left, right, key = "k", time = "t", attach = Seq("rv"))
      .select("k", "t", "payload", "rv").as[(Long, Long, String, Option[Double])]
      .collect().toSet
    assert(out === Set(
      (1L, 10L, "a", Some(100.0)),  // exact-time right row is visible (>=)
      (1L, 20L, "b", Some(200.0)),  // latest of the two
      (1L, 5L, "c", None),          // nothing at or before
      (2L, 15L, "d", None)))        // key has no right rows at all
  }

  test("a NULL inside the matched right row is preserved, not stitched from older rows") {
    val left = Seq((1L, 30L, "click")).toDF("k", "t", "p")
    val right = Seq(
      (1L, 10L, Option(5.0), Option(100L)),
      (1L, 20L, Option.empty[Double], Option(200L))) // matched row has NULL value
      .toDF("k", "t", "rv", "rid")
    val out = AsofJoin.backward(left, right, "k", "t", Seq("rv", "rid"))
      .select("rv", "rid").as[(Option[Double], Option[Long])].collect()
    // ASOF semantics: the whole row at t=20 attaches — rv must be NULL,
    // NOT looked-through to t=10's 5.0
    assert(out.toSeq === Seq((None, Some(200L))))
  }

  test("left row count is always preserved") {
    val left = Seq((1L, 1L, "x"), (1L, 1L, "y")).toDF("k", "t", "p")
    val right = Seq((1L, 1L, 5.0)).toDF("k", "t", "rv")
    val out = AsofJoin.backward(left, right, "k", "t", Seq("rv"))
    assert(out.count() === 2)
    assert(out.filter(out("rv") === 5.0).count() === 2)
  }
}
