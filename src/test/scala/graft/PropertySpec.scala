package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.apache.spark.sql.functions._
import graft.ingest.{AirQualitySchema, SchemaVerifier}

/** Property-based checks (ScalaCheck): the native expressions agree with
  * reference implementations on arbitrary inputs, and core invariants hold
  * regardless of data shape. */
object PropertySpec extends Properties("graft") {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // each sample runs a Spark job; 12 keeps the suite fast while still
  // exploring the input space
  override def overrideParameters(p: org.scalacheck.Test.Parameters): org.scalacheck.Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val tokenGen: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf("a", "b", "c", "dd", "ee", "ff", "g1", "g2", "hh", "zz"))

  property("merge Jaccard == set Jaccard") = Prop.forAll(tokenGen, tokenGen) {
    (xs: List[String], ys: List[String]) =>
      graft.functions.GraftFunctions.register(spark)
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      val inter = a.toSet.intersect(b.toSet).size
      val union = a.toSet.union(b.toSet).size
      val expected = if (union == 0) 0.0 else inter.toDouble / union
      val got = Seq((a, b)).toDF("a", "b")
        .select(call_function("graft_jaccard_sorted", col("a"), col("b")))
        .head.getDouble(0)
      got == expected
  }

  property("merge intersect count == set intersect size") =
    Prop.forAll(tokenGen, tokenGen) { (xs: List[String], ys: List[String]) =>
      graft.functions.GraftFunctions.register(spark)
      val a = xs.distinct.sorted
      val b = ys.distinct.sorted
      val expected = a.toSet.intersect(b.toSet).size
      val got = Seq((a, b)).toDF("a", "b")
        .select(call_function("graft_intersect_sorted", col("a"), col("b")))
        .head.getInt(0)
      got == expected
  }

  private val vecGen: Gen[List[Double]] =
    Gen.listOfN(8, Gen.choose(-100.0, 100.0)).suchThat(_.exists(_ != 0.0))

  property("max-run of sorted array == max multiset multiplicity") =
    Prop.forAll(tokenGen) { xs: List[String] =>
      graft.functions.GraftFunctions.register(spark)
      val expected =
        if (xs.isEmpty) 0 else xs.groupBy(identity).values.map(_.size).max
      val got = Seq(Tuple1(xs)).toDF("a")
        .select(call_function("graft_max_run", array_sort(col("a"))).as("m"))
        .head.getInt(0)
      got == expected
    }

  property("native cosine bit-identical to composed form") =
    Prop.forAll(vecGen, vecGen) { (xs: List[Double], ys: List[Double]) =>
      graft.functions.GraftFunctions.register(spark)
      val df = Seq((xs, ys)).toDF("a", "b")
      val native = df.select(call_function("graft_cosine", col("a"), col("b")))
        .head.getDouble(0)
      val composed = df.select(
        graft.ops.SimilarityOps.cosine(col("a"), col("b"))).head.getDouble(0)
      java.lang.Double.doubleToLongBits(native) ==
        java.lang.Double.doubleToLongBits(composed)
    }

  property("schema verifier partitions expected columns, order-insensitive") =
    Prop.forAll(Gen.someOf(AirQualitySchema.expectedColumns)) { present =>
      present.isEmpty || {
        val cols = present.map(c => lit(1).as(c)).toList
        val df = spark.range(1).select(cols: _*)
        val report = SchemaVerifier.verify(df)
        (report.missing.toSet ++ present.toSet ==
          AirQualitySchema.expectedColumns.toSet) &&
          report.unexpected.isEmpty &&
          report.ok == report.missing.isEmpty
      }
    }

  private val edgeGen: Gen[List[(Long, Long)]] =
    Gen.listOfN(25, Gen.zip(Gen.choose(0L, 15L), Gen.choose(0L, 15L)))

  property("connected components == driver-side union-find on random graphs") =
    Prop.forAll(edgeGen) { edges =>
      // reference: textbook union-find with path compression
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      val real = edges.filter { case (a, b) => a != b }
      real.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = real.flatMap { case (a, b) => Seq(a, b) }.distinct
      val expected = nodes.map(n => n -> find(n)).toMap
      // min-root canonicalization: union-find roots ARE the minima here
      // because unions always attach the larger root under the smaller
      val got = graft.ops.GraphOps.connectedComponents(edges.toDF("src", "dst"))
        .as[(Long, Long)].collect().toMap
      got == expected
    }

  property("chunk formula covers every token with stride-spaced starts") =
    // pure-function check of q74's integer chunk-count formula: for any
    // token count the windows start at 0, stride, 2*stride, ..., the last
    // start is < n (or 0 for empty docs), and the windows cover [0, n)
    Prop.forAll(Gen.choose(0, 500)) { n =>
      val window = 64; val stride = 48
      val nChunks = 1 + (math.max(n - window, 0) + stride - 1) / stride
      val starts = (0 until nChunks).map(_ * stride)
      val covered = starts.forall(s => s == 0 || s < n) &&
        (n == 0 || starts.last + window >= n)
      val dense = starts.zip(starts.drop(1)).forall { case (a, b) => b - a == stride }
      covered && dense
    }

  property("z-order interleave matches the naive bit loop and roundtrips") =
    Prop.forAll(Gen.choose(0, 0xFFFF), Gen.choose(0, 0xFFFF)) { (a: Int, b: Int) =>
      // reference: place bit i of a at position 2i, bit i of b at 2i+1
      val naive = (0 until 16).foldLeft(0L) { (z, i) =>
        z | (((a >> i) & 1).toLong << (2 * i)) | (((b >> i) & 1).toLong << (2 * i + 1))
      }
      val got = Seq((a, b)).toDF("a", "b")
        .select(graft.ops.LayoutOps.zorder2(col("a"), col("b"))).head.getLong(0)
      // deinterleave the engine's key back to the inputs
      val backA = (0 until 16).foldLeft(0) { (x, i) => x | ((((got >> (2 * i)) & 1) << i).toInt) }
      val backB = (0 until 16).foldLeft(0) { (x, i) => x | ((((got >> (2 * i + 1)) & 1) << i).toInt) }
      got == naive && backA == a && backB == b
    }

  property("decTruncDiv == BigInt truncating division on the wide grid") =
    // the r11 decimal trunc-div (Spark `div` returns LONG and overflows
    // wide quotients): (a − a%b)/b must equal BigInt's toward-zero
    // division — negatives included (DuckDB's HUGEINT `//` truncates the
    // same way, q258's pinned convention) — on magnitudes past 2^63
    Prop.forAll(
      Gen.choose(-BigInt(10).pow(22), BigInt(10).pow(22)),
      Gen.choose(1L, 1000000L), Gen.oneOf(true, false)) { (a, b0, neg) =>
      val b = if (neg) -b0 else b0
      val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
      val got = Seq((a.toString, b)).toDF("a", "b")
        .select(Tables.decTruncDiv(col("a").cast(dec38), col("b").cast(dec38)))
        .head.getDecimal(0)
      BigInt(got.toBigInteger) == a / b
    }

  property("parquet roundtrip is identity per value") =
    // NOTE deliberately not sum()-based: a double sum is NOT order-stable
    // across repartitioning (ScalaCheck falsified that version immediately
    // — the same lesson behind the engine's decimal-sum oracle convention),
    // and ANSI mode (Spark 4 default) throws on long-sum overflow.
    Prop.forAll(Gen.listOfN(20,
      Gen.zip(Gen.choose(-1000000000000L, 1000000000000L), Gen.choose(-1e6, 1e6)))) { rows =>
      rows.isEmpty || {
        val dir = java.nio.file.Files.createTempDirectory("graft_prop").toString
        rows.toDF("l", "d").write.mode("overwrite").parquet(dir)
        val back = spark.read.parquet(dir)
          .collect().map(r => (r.getLong(0), r.getDouble(1))).sorted.toList
        back == rows.sorted
      }
    }
}
