package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The sf-multiplier generator must produce a corpus whose SHAPE scales
  * and whose semantics do not degenerate: valid FKs (the replicated join
  * queries must not silently lose rows), an untouched replica 0 (the
  * source SF embeds verbatim), and token-disjoint document replicas
  * (dedup pair mass scales linearly, not quadratically). */
class GenScaleSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private lazy val outDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("genscale").toString
    GenScale.main(Array(TestSpark.sf, dir, "2"))
    dir
  }
  private def src(n: String) = Tables.load(spark, TestSpark.sf, n)
  private def out(n: String) = spark.read.parquet(s"$outDir/$n.parquet")

  test("facts replicate xN with distinct keys; catalog dims stay fixed") {
    Seq("customer" -> "c_custkey", "orders" -> "o_orderkey",
      "lineitem" -> null, "events" -> "event_id",
      "documents" -> "doc_id", "embeddings" -> "vec_id").foreach {
      case (t, key) =>
        assert(out(t).count() === 2 * src(t).count(), t)
        if (key != null)
          assert(out(t).select(key).distinct().count() === out(t).count(),
            s"$t.$key must stay unique after the shift")
    }
    Seq("region", "nation", "supplier", "part").foreach { t =>
      assert(out(t).count() === src(t).count(), t)
    }
  }

  test("every replicated FK still resolves") {
    def dangling(fact: String, fk: String, dim: String, pk: String): Long =
      out(fact).select(col(fk).as("k"))
        .join(out(dim).select(col(pk).as("k")), Seq("k"), "left_anti").count()
    assert(dangling("orders", "o_custkey", "customer", "c_custkey") === 0)
    assert(dangling("lineitem", "l_orderkey", "orders", "o_orderkey") === 0)
    assert(dangling("lineitem", "l_suppkey", "supplier", "s_suppkey") === 0)
    assert(dangling("lineitem", "l_partkey", "part", "p_partkey") === 0)
    assert(dangling("events", "user_id", "customer", "c_custkey") === 0)
  }

  test("replica 0 embeds the source verbatim; document replicas are token-disjoint") {
    val docStride = src("documents").agg(max("doc_id")).as[Long].head() + 1
    // replica 0 = the source corpus byte-for-byte
    val r0 = out("documents").filter(col("doc_id") < docStride)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val s0 = src("documents")
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    assert(r0.toSeq === s0.toSeq)
    // replica 1 shares not a single token with replica 0 — cross-replica
    // near-dup pairs are impossible by construction
    val tok = (c: org.apache.spark.sql.Column) =>
      explode(split(trim(lower(c)), "[ \\t\\n\\x0B\\f\\r]+"))
    val shared = out("documents").filter(col("doc_id") < docStride)
      .select(tok(col("text")).as("t")).distinct()
      .join(out("documents").filter(col("doc_id") >= docStride)
        .select(tok(col("text")).as("t")).distinct(), Seq("t"))
      .count()
    assert(shared === 0)
  }

  test("embedding replicas jitter without degeneracy; determinism holds") {
    val vecStride = src("embeddings").agg(max("vec_id")).as[Long].head() + 1
    val dims = out("embeddings").select(size(col("embedding"))).distinct()
      .as[Int].collect()
    assert(dims.toSeq === Seq(64))
    // replica 1's vector differs from its source twin but only slightly
    val pair = out("embeddings").filter(col("vec_id") >= vecStride)
      .select((col("vec_id") - vecStride).as("vec_id"),
        col("embedding").as("e1"))
      .join(src("embeddings").select(col("vec_id"), col("embedding").as("e0")),
        "vec_id")
      .select(expr(
        """aggregate(zip_with(e0, e1, (a, b) ->
          | abs(CAST(a AS DOUBLE) - CAST(b AS DOUBLE))),
          | CAST(0.0 AS DOUBLE), (acc, x) -> greatest(acc, x))""".stripMargin)
        .as("maxdiff"))
      .agg(min("maxdiff"), max("maxdiff")).as[(Double, Double)].head()
    assert(pair._1 > 0.0, "every replica-1 vector must differ from its twin")
    assert(pair._2 <= 0.011, "jitter must stay within the +/-0.01 envelope")
    // re-running regenerates byte-identical outputs (no Random anywhere)
    val dir2 = java.nio.file.Files.createTempDirectory("genscale2").toString
    GenScale.main(Array(TestSpark.sf, dir2, "2"))
    val a = out("embeddings").orderBy("vec_id").collect().map(_.toSeq)
    val b = spark.read.parquet(s"$dir2/embeddings.parquet")
      .orderBy("vec_id").collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq)
  }
}
