package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.TextOps

/** Corpus-index operators: inverted-index postings and PMI collocations
  * must agree with directly-computed counts. */
class TextIndexSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  private lazy val pairs = Tables.load(spark, TestSpark.sf, "documents")
    .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("term"))
    .distinct().cache()

  // ------------------------------------------------------------ q159 bpe
  /** Greedy left-to-right non-overlapping merge — the textbook BPE apply
    * the double-space replace encoding must reproduce exactly. */
  private def mergeOnce(syms: List[String], a: String, b: String): List[String] = {
    val buf = scala.collection.mutable.ListBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        buf += (a + b); i += 2
      } else { buf += syms(i); i += 1 }
    }
    buf.toList
  }

  /** Brute trainer: tokenize, filter, mark, count, then 3 greedy rounds
    * on symbol lists. Returns the learned merges in order. */
  private lazy val bruteMerges: Seq[(Int, String, Long)] = {
    val tokPat = java.util.regex.Pattern.compile(TextOps.bpePattern)
    val keep = java.util.regex.Pattern.compile("^ ?[\\p{L}\\p{N}']+$")
    val freqs = scala.collection.mutable.Map.empty[List[String], Long]
    Tables.load(spark, TestSpark.sf, "documents").select("text").collect().foreach { r =>
      val m = tokPat.matcher(r.getString(0))
      while (m.find()) {
        val tok = m.group()
        if (keep.matcher(tok).find() && tok.length >= 2) {
          val syms = tok.replace(' ', '_').map(_.toString).toList
          freqs(syms) = freqs.getOrElse(syms, 0L) + 1L
        }
      }
    }
    var wf = freqs.toList
    (1 to 3).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      wf.foreach { case (syms, f) =>
        syms.sliding(2).foreach {
          case List(a, b) => counts((a, b)) = counts.getOrElse((a, b), 0L) + f
          case _ => ()
        }
      }
      val ((a, b), cnt) = counts.minBy { case ((a, b), c) => (-c, a + " " + b) }
      wf = wf.map { case (syms, f) => (mergeOnce(syms, a, b), f) }
      (r, a + " " + b, cnt)
    }
  }

  test("bpe trainer: 3 rounds equal a symbol-list reimplementation on the corpus") {
    val got = TextOps.q159BpeTrainer(spark, TestSpark.sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq === bruteMerges)
  }

  test("bpe encode: per-doc token counts match the symbol-list encoder") {
    val got = TextOps.q163BpeEncode(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3)))).toMap
    val tokPat = java.util.regex.Pattern.compile(TextOps.bpePattern)
    val keep = java.util.regex.Pattern.compile("^ ?[\\p{L}\\p{N}']+$")
    val merges = bruteMerges.map { case (_, p, _) =>
      val Array(a, b) = p.split(" ", 2); (a, b)
    }
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
    assert(docs.nonEmpty && got.size === docs.length)
    docs.foreach { r =>
      val m = tokPat.matcher(r.getString(1))
      var nPre = 0L
      var nBpe = 0L
      while (m.find()) {
        val tok = m.group()
        nPre += 1
        nBpe += {
          if (keep.matcher(tok).find() && tok.length >= 2) {
            var syms = tok.replace(' ', '_').map(_.toString).toList
            merges.foreach { case (a, b) => syms = mergeOnce(syms, a, b) }
            syms.length.toLong
          } else tok.codePointCount(0, tok.length).toLong
        }
      }
      assert(got(r.getLong(0)) === ((nPre, nBpe)), s"doc ${r.getLong(0)}")
    }
  }

  test("bpe apply: double-space replace merges back-to-back chains greedily") {
    // " a  a  a  a " under merge (a,a) must become [aa, aa] — the
    // single-space encoding would skip the second occurrence
    val sp = " a  a  a  a "
    val merged = sp.replace(" a  a ", " aa ")
    assert(merged === " aa  aa ")
    val odd = " a  a  a ".replace(" a  a ", " aa ")
    assert(odd === " aa  a ")
  }

  test("dup spans: operator equals a raw-string brute force over the corpus") {
    // brute force with raw gram STRINGS (not md5) — also proves the
    // operator's fingerprint join introduces no collision dependence
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase
        .split("\\s+").toSeq))
    val k = 16
    val counts = scala.collection.mutable.Map.empty[Seq[String], Int]
    for ((_, ts) <- docs; p <- 0 to ts.length - k)
      counts.updateWith(ts.slice(p, p + k)) { c => Some(c.getOrElse(0) + 1) }
    val want = docs.map { case (id, ts) =>
      val spans = (0 to ts.length - k)
        .filter(p => counts(ts.slice(p, p + k)) > 1)
        .map(p => (p + 1L, p + k.toLong)) // 1-based inclusive
      var dup = 0L; var curS = -1L; var curE = -2L
      for ((st, en) <- spans) {
        if (st > curE) { dup += curE - curS + 1; curS = st; curE = en }
        else curE = math.max(curE, en)
      }
      if (curS >= 0) dup += curE - curS + 1
      val n = ts.length.toLong
      (id, n, dup, dup * 10000 / n)
    }.toSet
    val got = TextOps.q144DupSpans(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(got === want)
    // the corpus actually exercises the operator: some doc has dup spans
    assert(want.exists(_._3 > 0))
  }

  test("rank fusion: fused head equals a driver recompute from the two rankings") {
    import graft.ops.{LayoutOps, TextOps => T}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val qual = docs.select(col("doc_id"),
        T.qualityScore(col("text"), col("n_chars")).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val nll = T.q109LmDocScore(spark, TestSpark.sf)
      .select("doc_id", "avg_nll").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Double.PositiveInfinity else r.getDouble(1)))
    val rq = qual.sortBy { case (id, q) => (-q, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val rl = nll.sortBy { case (id, n) => (n, id) }.zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    val want = qual.map(_._1).map { id =>
      (id, rq(id), rl(id),
        1000000L / (60 + rq(id)) + 1000000L / (60 + rl(id)))
    }.sortBy { case (id, _, _, s) => (-s, id) }.take(50).toSet
    val got = TextOps.q151RankFusion(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got === want)
  }

  test("bm25: operator equals a rational-arithmetic driver brute force") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase
        .split("\\s+").toSeq))
    val n = docs.length.toLong
    val tTok = docs.map(_._2.length.toLong).sum
    val post = docs.flatMap { case (id, ts) =>
      ts.groupBy(identity).map { case (t, g) =>
        (t, id, ts.length.toLong, g.length.toLong)
      }
    }
    val dfm = post.groupBy(_._1).map { case (t, g) => t -> g.length.toLong }
    val qterms = dfm.toSeq.filter(_._2 * 20 >= n)
      .sortBy { case (t, df) => (df, t) }.take(10)
    val want = qterms.flatMap { case (term, df) =>
      val idf6 = BigDecimal(math.log((2.0 * n - 2 * df + 1) / (2.0 * df + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      val i6 = (idf6 * 1000000).toLongExact
      post.filter(_._1 == term).map { case (_, id, dl, tf) =>
        val num = BigInt(i6) * 44 * tf * tTok
        val den = BigInt(20) * tf * tTok + BigInt(6) * tTok +
          BigInt(18) * dl * n
        (term, id, tf, dl, (num / den).toLong)
      }.sortBy { case (_, id, _, _, sc) => (-sc, id) }
        .take(10).zipWithIndex
        .map { case ((t, id, tf, dl, sc), i) => (t, id, tf, dl, sc, i + 1) }
    }.toSet
    val got = TextOps.q149Bm25(spark, TestSpark.sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getInt(5))).toSet
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("inverted index: df and postings head match direct counts") {
    val idx = TextOps.q89InvertedIndex(spark, TestSpark.sf).collect()
    assert(idx.nonEmpty)
    // df non-increasing down the report (the top-50 cut is by df)
    val dfs = idx.map(_.getAs[Long]("df"))
    assert(dfs.zip(dfs.drop(1)).forall { case (a, b) => a >= b })
    val top = idx.head
    val term = top.getString(0)
    val expectDf = pairs.filter(col("term") === term).count()
    assert(top.getAs[Long]("df") === expectDf)
    val posted = top.getAs[String]("postings_head").split(",").map(_.toLong)
    assert(posted.length === math.min(expectDf, 20L).toInt)
    assert(posted.sorted.sameElements(posted))
    val expectHead = pairs.filter(col("term") === term)
      .orderBy("doc_id").limit(20).collect().map(_.getLong(0))
    assert(posted.sameElements(expectHead))
  }

  test("PMI pairs: ordered terms, bounded co-counts, recomputable score") {
    val pmi = TextOps.q90TokenPmi(spark, TestSpark.sf).collect()
    assert(pmi.nonEmpty)
    val nDocs = Tables.load(spark, TestSpark.sf, "documents").count()
    pmi.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a < b)
      val (ca, cb, cab) = (r.getAs[Long]("c_a"), r.getAs[Long]("c_b"), r.getAs[Long]("c_ab"))
      assert(cab <= math.min(ca, cb) && cab >= 1)
      val expect = BigDecimal(StrictMath.log(cab.toDouble * nDocs / (ca.toDouble * cb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("pmi") - expect) < 2e-6)
    }
    // the top co-count is a real count: recompute one pair directly
    val h = pmi.head
    val direct = pairs.filter(col("term") === h.getString(0)).select("doc_id")
      .intersect(pairs.filter(col("term") === h.getString(1)).select("doc_id"))
      .count()
    assert(h.getAs[Long]("c_ab") === direct)
  }

  test("vocab coverage: monotone cumulative share reaching exactly 1.0 per language") {
    val rows = TextOps.q100VocabCoverage(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_.getAs[Int]("rk"))
      assert(sorted.map(_.getAs[Int]("rk")).toSeq === (1 to rs.length))
      // counts non-increasing down the ranking; share strictly increasing to 1.0
      val ns = sorted.map(_.getAs[Long]("n"))
      assert(ns.zip(ns.tail).forall { case (a, b) => a >= b }, lang)
      val shares = sorted.map(_.getAs[Double]("cum_share"))
      assert(shares.zip(shares.tail).forall { case (a, b) => a < b }, lang)
      assert(shares.last === 1.0, lang)
    }
  }

  test("bigram LM: P(w2|w1) sums to <=1 over the top-3 and matches direct counts") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rows = TextOps.q101BigramLm(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byHead = rows.groupBy(_.getString(0))
    assert(byHead.size <= 20)
    byHead.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Int]("crk")).sorted.toSeq === (1 to rs.length))
      assert(rs.map(_.getAs[Double]("cond_p")).sum <= 1.0 + 1e-12)
    }
    // spot-check the single most frequent bigram against a direct count
    val top = rows.maxBy(_.getAs[Long]("n"))
    val toks = docs.selectExpr("split(trim(lower(text)), '\\\\s+') AS t")
      .selectExpr("explode(zip_with(slice(t, 1, greatest(size(t)-1, 0)), " +
        "slice(t, 2, greatest(size(t)-1, 0)), (a, b) -> struct(a AS w1, b AS w2))) AS x")
      .filter(col("x.w1") === top.getString(0) && col("x.w2") === top.getString(1))
      .count()
    assert(top.getAs[Long]("n") === toks)
  }

  test("contamination audit covers every eval doc; spot doc agrees with direct check") {
    import graft.ops.{DedupOps, TextOps}
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rows = TextOps.q102Contamination(spark, TestSpark.sf).collect()
    val nEval = docs.filter(TextOps.splitAssign(col("text")) === "eval").count()
    assert(rows.length === nEval)
    rows.foreach { r =>
      val (g, h) = (r.getAs[Long]("n_grams"), r.getAs[Long]("n_hit"))
      assert(h >= 0 && h <= g)
      assert(r.getAs[Double]("contaminated_share") === h.toDouble / g)
    }
    // corpus plants near-dups, so some eval doc must hit train grams
    assert(rows.exists(_.getAs[Long]("n_hit") > 0))
    // direct recheck of the most contaminated doc
    graft.functions.GraftFunctions.register(spark)
    val top = rows.maxBy(r => (r.getAs[Double]("contaminated_share"), r.getAs[Long]("doc_id")))
    val withSplit = docs.select(col("doc_id"),
      TextOps.splitAssign(col("text")).as("split"),
      array_distinct(DedupOps.shingles(col("text"))).as("grams"))
    val trainGrams = withSplit.filter(col("split") === "train")
      .select(explode(col("grams")).as("gram")).distinct()
    val docGrams = withSplit.filter(col("doc_id") === top.getAs[Long]("doc_id"))
      .select(explode(col("grams")).as("gram"))
    assert(docGrams.join(trainGrams, Seq("gram"), "left_semi").count()
      === top.getAs[Long]("n_hit"))
  }

  test("LM doc score: every doc present, totals tie out, spot doc recomputable") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rows = TextOps.q109LmDocScore(spark, TestSpark.sf).collect()
    assert(rows.length === docs.count())
    // total bigram mass = sum over docs of (n_tokens - 1), floored at 0
    val expectBg = docs.select(
      sum(greatest(size(TextOps.tokens(col("text"))) - 1, lit(0))))
      .head().getLong(0)
    assert(rows.map(_.getAs[Long]("n_bigrams")).sum === expectBg)
    rows.foreach { r =>
      val (n, s, a) = (r.getAs[Long]("n_bigrams"), r.getAs[Double]("sum_nll"),
        r.getAs[Double]("avg_nll"))
      assert(s >= 0.0) // add-one smoothing: head_n + V > c + 1 in any real corpus
      if (n > 0) assert(math.abs(a - s / n) < 1e-12) else assert(r.isNullAt(3))
    }
    // spot-recompute one document's score directly from corpus counts
    val bg = docs.select(col("doc_id"),
      explode(zip_with(
        slice(TextOps.tokens(col("text")), lit(1),
          greatest(size(TextOps.tokens(col("text"))) - 1, lit(0))),
        slice(TextOps.tokens(col("text")), lit(2),
          greatest(size(TextOps.tokens(col("text"))) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("x"))
      .select(col("doc_id"), col("x.w1").as("w1"), col("x.w2").as("w2"))
      .cache()
    val vocab = docs.select(explode(TextOps.tokens(col("text"))).as("tok"))
      .agg(countDistinct(col("tok"))).head().getLong(0)
    val cnt = bg.groupBy("w1", "w2").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val heads = cnt.groupBy(_._1._1).map { case (w1, m) => w1 -> m.values.sum }
    val target = rows.find(_.getAs[Long]("n_bigrams") > 0).get
    val docBg = bg.filter(col("doc_id") === target.getLong(0)).collect()
      .map(r => (r.getString(1), r.getString(2)))
    val expect = docBg.map { case (w1, w2) =>
      BigDecimal(StrictMath.log((heads(w1) + vocab).toDouble / (cnt((w1, w2)) + 1)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(BigDecimal(target.getAs[Double]("sum_nll")) === expect)
  }

  test("mixture sampling: exact isqrt weights, recountable draws, sqrt-mixture shape") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val rows = TextOps.q111MixtureWeights(spark, TestSpark.sf).collect()
    val bySource = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length === bySource.size)
    rows.foreach { r =>
      val (c, w) = (r.getAs[Long]("n_docs"), r.getAs[Long]("weight"))
      assert(bySource(r.getString(0)) === c)
      assert(w * w <= c && (w + 1) * (w + 1) > c) // exact integer sqrt
      assert(r.getAs[Long]("n_sampled") <= c)
      // realized rate tracks the 16-bit-grid target (binomial + grid slack)
      assert(math.abs(r.getAs[Double]("realized_rate")
        - r.getAs[Double]("target_rate")) < 0.25)
    }
    // the draw is re-countable: recompute one source's sample directly,
    // rebuilding the threshold from first principles
    val top = rows.maxBy(_.getAs[Long]("n_docs"))
    val nTotal = bySource.values.sum
    val wTotal = rows.map(_.getAs[Long]("weight")).sum
    val thr = ((nTotal / 4) * 65536L / wTotal) * top.getAs[Long]("weight") /
      top.getAs[Long]("n_docs")
    val recount = docs.filter(col("source") === top.getString(0))
      .filter(substring(md5(concat(lit("graft-mix-42:"),
        regexp_replace(lower(col("text")), "\\s+", " ")).cast("binary")), 1, 4)
        < format_string("%04x", lit(thr)))
      .count()
    assert(recount === top.getAs[Long]("n_sampled"))
    // τ=1/2 pulls rates toward parity: biggest source samples at a LOWER
    // rate than the smallest (strictly, when counts differ enough for the
    // grid to see)
    val big = rows.maxBy(_.getAs[Long]("n_docs"))
    val small = rows.minBy(_.getAs[Long]("n_docs"))
    if (big.getAs[Long]("n_docs") > 2 * small.getAs[Long]("n_docs"))
      assert(big.getAs[Double]("target_rate") < small.getAs[Double]("target_rate"))
  }

  test("ppl buckets: per-lang equal-count cut, ordered nll bands, totals tie to q109") {
    val rows = TextOps.q127PplBuckets(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byLang = rows.groupBy(_.getString(0))
    byLang.foreach { case (_, bs) =>
      // ntile: bucket sizes differ by at most 1 and are non-increasing
      val sizes = bs.sortBy(_.getInt(1)).map(_.getAs[Long]("n_docs"))
      assert(sizes.max - sizes.min <= 1)
      assert(sizes.zip(sizes.drop(1)).forall { case (a, b) => a >= b })
      // bands are ordered: bucket k's max_nll <= bucket k+1's min_nll
      val bands = bs.sortBy(_.getInt(1))
        .map(r => (r.getAs[Double]("min_nll"), r.getAs[Double]("max_nll")))
      assert(bands.forall { case (lo, hi) => lo <= hi })
      assert(bands.zip(bands.drop(1)).forall { case ((_, hi), (lo2, _)) => hi <= lo2 })
    }
    // every scored doc (q109 rows with bigrams) lands in exactly one bucket
    val scored = TextOps.q109LmDocScore(spark, TestSpark.sf)
      .filter(col("n_bigrams") > 0).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === scored)
  }

  test("k-fold assignment partitions the corpus and never moves under re-sharding") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
    val grid = TextOps.q139KfoldAssign(spark, TestSpark.sf).collect()
    assert(grid.map(_.getAs[Long]("n_docs")).sum === docs.count())
    assert(grid.map(_.getAs[Int]("fold")).distinct.sorted.toSeq.forall(f => f >= 0 && f <= 3))
    // per lang, holdout + train complement always reconstructs the total
    grid.foreach { r =>
      assert(r.getAs[Long]("n_docs") + r.getAs[Long]("n_train_held_out") ===
        grid.filter(_.getString(1) == r.getString(1)).map(_.getAs[Long]("n_docs")).sum)
    }
    // re-shard stability: fold of each doc unchanged after repartition(13)
    val a = docs.select(col("doc_id"), TextOps.foldAssign(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b = docs.repartition(13)
      .select(col("doc_id"), TextOps.foldAssign(col("text")).as("f"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a === b)
  }

  test("BPE merges: distinct-pretoken plan equals the brute per-occurrence recount") {
    val got = TextOps.q125BpeMerges(spark, TestSpark.sf).collect()
    assert(got.length === 50)
    // brute: pairs counted straight off every pre-token OCCURRENCE (no
    // word-frequency pre-aggregation) — the plan optimization must be
    // invisible in the counts
    val brute = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(regexp_extract_all(col("text"),
        lit(TextOps.bpePattern), lit(0))).as("tok"))
      .filter(length(col("tok")) >= 2)
      .select(explode(transform(sequence(lit(1), length(col("tok")) - 1),
        i => col("tok").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(count(lit(1)).as("merge_count"))
      .orderBy(col("merge_count").desc, col("pair")).limit(50)
      .collect()
    assert(got.map(_.toSeq).toSeq === brute.map(_.toSeq).toSeq)
    // counts are non-increasing and every pair is exactly 2 code points
    val counts = got.map(_.getAs[Long]("merge_count"))
    assert(counts.zip(counts.drop(1)).forall { case (a, b) => a >= b })
    assert(got.forall(_.getAs[String]("pair").codePointCount(0, 2) <= 2))
  }

  test("max-run expression equals the exploded count-max form on the corpus") {
    graft.functions.GraftFunctions.register(spark)
    val base = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), TextOps.wordGrams(TextOps.tokens(col("text")), 2).as("g2"))
    val native = base.select(col("doc_id"),
      call_function("graft_max_run", array_sort(col("g2"))).as("m"))
    val composed = base.select(col("doc_id"), explode(col("g2")).as("gram"))
      .groupBy("doc_id", "gram").agg(count(lit(1)).as("c"))
      .groupBy("doc_id").agg(max(col("c")).cast("int").as("m"))
    val joined = native.as("n").join(composed.as("c"), "doc_id")
      .filter(col("n.m") =!= col("c.m"))
    assert(joined.count() === 0)
    // docs with no 2-grams: native reports 0 (composed form has no row)
    assert(native.filter(size(col("g2")) === 0 && col("m") =!= 0).count() === 0)
  }

  test("repetition stats: degenerate loop doc flags, varied doc does not") {
    import spark.implicits._
    val docs = Seq(
      (1L, "click here ".repeat(30) + "end", "en", "s", 0L),
      (2L, (1 to 60).map(i => s"w$i").mkString(" "), "en", "s", 0L),
      (3L, "one two", "en", "s", 0L), // 1 bigram, 0 trigrams
      (4L, "solo", "en", "s", 0L))    // no n-grams at all
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val outDir = java.nio.file.Files.createTempDirectory("rep").toString
    docs.write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val r = TextOps.q126RepetitionStats(spark, outDir).collect()
      .map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Boolean]("flagged"))
    assert(r(1L).getAs[Double]("frac_top_2gram") > 0.4)
    assert(r(1L).getAs[Double]("frac_dup_3gram") > 0.8)
    assert(!r(2L).getAs[Boolean]("flagged"))
    assert(r(2L).getAs[Double]("frac_dup_2gram") === 0.0)
    // a 2-token doc has one bigram (share 1.0 → flags; run the filter
    // after a length cut, as Gopher does) and NULL trigram stats
    assert(r(3L).getAs[Double]("frac_top_2gram") === 1.0)
    assert(r(3L).isNullAt(r(3L).fieldIndex("frac_dup_3gram")))
    assert(r(3L).getAs[Boolean]("flagged"))
    assert(r(4L).isNullAt(r(4L).fieldIndex("frac_top_2gram")))
    assert(!r(4L).getAs[Boolean]("flagged"))
  }

  // ------------------------------------------------------------ q181
  test("curation funnel matches a driver-side pipeline recompute") {
    val got = TextOps.q181CurationFunnel(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val rows = docs.map { case (id, text, nChars) =>
      val toks = text.trim.toLowerCase.split("\\s+").toSeq
      val alpha = text.count(c => c >= 'a' && c <= 'z').toLong
      val stop = toks.count(Set("the", "a", "of")).toLong
      val q = BigDecimal(0.5 * (alpha.toDouble / nChars)
        + 0.5 * (1.0 - stop.toDouble / toks.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      (id, toks.size.toLong, q,
        md5hex(text.toLowerCase.replaceAll("\\s+", " ")))
    }
    val qual = rows.filter(_._3 >= 0.5)
    val dedup = qual.groupBy(_._4).map { case (nm, g) =>
      (nm, g.minBy(_._1)._2) // survivor = min doc_id; its token count
    }.toSeq
    val (train, eval) = dedup.partition(_._1.charAt(0) < 'c')
    assert(got("0_raw") === ((rows.length.toLong, rows.map(_._2).sum)))
    assert(got("1_quality") === ((qual.length.toLong, qual.map(_._2).sum)))
    assert(got("2_dedup") === ((dedup.size.toLong, dedup.map(_._2).sum)))
    assert(got("3_split_train") === ((train.size.toLong, train.map(_._2).sum)))
    assert(got("3_split_eval") === ((eval.size.toLong, eval.map(_._2).sum)))
    // the funnel only narrows
    assert(got("0_raw")._1 >= got("1_quality")._1)
    assert(got("1_quality")._1 >= got("2_dedup")._1)
  }

  // ------------------------------------------------------------ q188
  test("weighted quantiles match a driver-side discrete-threshold recompute") {
    val got = TextOps.q188WeightedQuantiles(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> (1 to 6).map(r.getLong).toVector).toMap
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select("lang", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).trim.toLowerCase.split("\\s+").length.toLong))
    docs.groupBy(_._1).foreach { case (lang, rows) =>
      val vals = rows.map(_._2).sorted
      val total = vals.sum
      def qp(p: Long): Long = {
        val t = (p * total + 99) / 100
        var cum = 0L
        vals.foreach { v => cum += v; if (cum >= t) return v }
        vals.last
      }
      assert(got(lang) === Vector(rows.length.toLong, total,
        qp(25), qp(50), qp(75), qp(90)), s"lang $lang")
      // weighted quantiles are monotone in p
      assert(qp(25) <= qp(50) && qp(50) <= qp(75) && qp(75) <= qp(90))
    }
  }

  test("textrank: top-25 are vocab members with exact frequencies, mass sane") {
    val got = TextOps.q206TextrankKeywords(spark, TestSpark.sf).collect()
    assert(got.length === 25)
    // ordered by (rank_scaled desc, term)
    val rs = got.map(r => (r.getAs[Long]("rank_scaled"), r.getAs[String]("term")))
    assert(rs.sameElements(rs.sortBy { case (r, t) => (-r, t) }))
    // term_freq ties out against a direct token recount; tids in 1..100
    val freq = Tables.load(spark, TestSpark.sf, "documents")
      .select(explode(TextOps.tokens(col("text"))).as("term"))
      .groupBy("term").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.foreach { r =>
      assert(freq(r.getAs[String]("term")) === r.getAs[Long]("term_freq"))
      val tid = r.getAs[Long]("tid")
      assert(tid >= 1L && tid <= 100L)
      // rank is the double rendering of the integer-grid value
      assert(r.getAs[Double]("rank") === r.getAs[Long]("rank_scaled").toDouble / 1e12)
    }
    // weighted PageRank must separate a Zipf vocabulary, not stay uniform
    assert(got.map(_.getAs[Long]("rank_scaled")).distinct.length > 10)
  }

  test("unicode audit: planted mojibake fixtures count exactly") {
    import spark.implicits._
    val docs = Seq(
      ("aa", "The 3 cats!"),            // upper 1, digit 1, punct 1, space 2, vowel 1 ('a')
      ("aa", "x\u0001y"),               // control char doc
      ("bb", "caf\u00e9"),              // non-ascii: 1 extra UTF-8 byte
      ("bb", "ok \uFFFDbroken\uFFFD")   // replacement chars
    ).toDF("lang", "text")
    val out = TextOps.unicodeAuditOn(docs).collect()
      .map(r => r.getAs[String]("lang") -> r).toMap
    val aa = out("aa")
    assert(aa.getAs[Long]("n_docs") === 2L)
    assert(aa.getAs[Long]("n_chars") === 14L)
    assert(aa.getAs[Long]("n_ascii_docs") === 2L) //  IS ascii (and control)
    assert(aa.getAs[Long]("n_ctrl_docs") === 1L)
    assert(aa.getAs[Long]("n_repl_docs") === 0L)
    assert(aa.getAs[Long]("extra_utf8_bytes") === 0L)
    assert(aa.getAs[Long]("digit_bp") === 10000L * 1 / 14)
    assert(aa.getAs[Long]("upper_bp") === 10000L * 1 / 14)
    assert(aa.getAs[Long]("punct_bp") === 10000L * 1 / 14)
    val bb = out("bb")
    assert(bb.getAs[Long]("n_ascii_docs") === 0L) // é and U+FFFD both non-ASCII
    assert(bb.getAs[Long]("n_repl_docs") === 1L)
    assert(bb.getAs[Long]("extra_utf8_bytes") === 1L + 2L * 2L) // é=+1, 2×FFFD=+2 each
    // the real corpus: clean ASCII, nonzero vowel/space densities
    val corpus = TextOps.q209UnicodeAudit(spark, TestSpark.sf).collect()
    corpus.foreach { r =>
      assert(r.getAs[Long]("n_ascii_docs") === r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("vowel_bp") > 0L && r.getAs[Long]("space_bp") > 0L)
    }
  }

  test("q224 skipgram: weights on the 6/d grid, top pair matches a local recompute") {
    val rows = TextOps.q224SkipgramCooc(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      val (n, w) = (r.getAs[Long]("n_cooc"), r.getAs[Long]("w6"))
      // each co-occurrence contributes 2..6 weight units (d = 3..1)
      assert(w >= 2 * n && w <= 6 * n, s"w6 $w out of [2n, 6n] for n $n")
    }
    // local recompute for the top pair over the raw tokenization
    val (lt, rt) = (rows.head.getString(0), rows.head.getString(1))
    val toks = Tables.load(spark, TestSpark.sf, "documents")
      .select(org.apache.spark.sql.functions.col("text")).collect()
      .map(_.getString(0).trim.toLowerCase
        .split("[ \\t\\n\\x0B\\f\\r]+").filter(_.nonEmpty))
    var (n, w) = (0L, 0L)
    toks.foreach { ts =>
      ts.indices.foreach { i =>
        if (ts(i) == lt) (1 to 3).foreach { dd =>
          if (i + dd < ts.length && ts(i + dd) == rt) { n += 1; w += 6 / dd }
        }
      }
    }
    assert(rows.head.getAs[Long]("n_cooc") === n)
    assert(rows.head.getAs[Long]("w6") === w)
  }

  test("q237 preference pairs: disjoint, margin-sane, ranks verified locally") {
    val rows = TextOps.q237PreferencePairs(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) !== r.getLong(3)) // chosen != rejected
      assert(r.getDouble(6) >= 0.0)         // best-vs-worst gap
      assert(math.abs(r.getDouble(6) -
        BigDecimal(r.getDouble(4) - r.getDouble(5))
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    }
    // local replay of one language's pairing
    val lang = rows.head.getString(0)
    val scored = Tables.load(spark, TestSpark.sf, "documents")
      .filter(col("lang") === lang)
      .select(col("doc_id"),
        TextOps.qualityScore(col("text"), col("n_chars")).as("q"))
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val byBest = scored.sortBy(x => (-x._2, x._1))
    val byWorst = byBest.reverse
    val langRows = rows.filter(_.getString(0) == lang).sortBy(_.getInt(1))
    langRows.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(2) === byBest(i)._1, s"chosen at rank ${i + 1}")
      assert(r.getLong(3) === byWorst(i)._1, s"rejected at rank ${i + 1}")
    }
  }

  test("q238 padding waste: buckets are powers of two and conserve tokens") {
    val rows = TextOps.q238PaddingWaste(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = Tables.load(spark, TestSpark.sf, "documents").count()
    assert(rows.map(_.getLong(1)).sum === totalDocs)
    rows.foreach { r =>
      val b = r.getLong(0)
      assert((b & (b - 1)) === 0L, s"bucket $b not a power of two")
      assert(r.getLong(3) === b * r.getLong(1))
      assert(r.getLong(2) <= r.getLong(3))
      assert(r.getLong(2) > b / 2 * r.getLong(1)) // docs belong in their bucket
      assert(r.getLong(4) === (r.getLong(3) - r.getLong(2)) * 10000L / r.getLong(3))
    }
  }
}
