package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators over `documents` — the training-data-pipeline
  * surface (language ID, quality scoring, token counting, fingerprinting,
  * exact dedup). All pure `functions._` column expressions: codegen'd,
  * embarrassingly parallel (no shuffle except the dedup groupBys), so the
  * per-row cost is the only cost at 100 TB.
  */
object TextOps {

  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** Whitespace tokenization of lowercased text. */
  def tokens(c: Column): Column = split(trim(lower(c)), "[ \\t\\n\\x0B\\f\\r]+")

  // ---------------------------------------------------------------- q30
  /** Exact dedup with deterministic survivor selection (min doc_id), the
    * hash-groupBy formulation: one shuffle on the full text (at 100 TB you
    * would groupBy a 128-bit text hash instead to cut shuffle width — same
    * plan shape, see q34 fingerprints). */
  def q30DedupExact(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      .groupBy(col("text"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"), length(col("text")).as("text_len"))
      .orderBy("keep_id")

  // ---------------------------------------------------------------- q31
  /** DISTINCT as a set operator (dropDuplicates on a projected key set). */
  def q31DistinctRows(s: SparkSession, d: String): DataFrame =
    t(s, d, "lineitem")
      .select("l_returnflag", "l_linestatus")
      .distinct()
      .orderBy("l_returnflag", "l_linestatus")

  // ---------------------------------------------------------------- q32
  /** Token counting: whitespace tokens, unique tokens, mean word length. */
  def q32TextTokens(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    t(s, d, "documents").select(
      col("doc_id"),
      size(toks).as("n_tokens"),
      size(array_distinct(toks)).as("n_unique"),
      round(length(regexp_replace(col("text"), "[ \\t\\n\\x0B\\f\\r]+", "")).cast("double") / size(toks), 4)
        .as("avg_word_len"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q33
  /** The one definition of the composite quality score (shared with q70's
    * pruning cut): 0.5 * alpha ratio + 0.5 * (1 - stopword ratio), rounded
    * to 4 decimals. Ratios are double divisions of integer-valued
    * operands — exact in both engines. */
  def qualityScore(text: Column, nChars: Column): Column = {
    val toks = tokens(text)
    val nAlpha = length(regexp_replace(text, "[^a-z]", ""))
    val nStop = size(filter(toks, x => x === "the" || x === "a" || x === "of"))
    // try_divide: a zero-char or zero-token document (and ANSI throws on
    // double 0-division) scores NULL — DuckDB's `/` yields NULL on the
    // same inputs, so the quality contract stays engine-identical, and
    // every downstream `q >= threshold` prune drops NULL in both engines
    val alphaRatio = try_divide(nAlpha.cast("double"), nChars)
    val stopRatio = try_divide(nStop.cast("double"), size(toks))
    round(alphaRatio * lit(0.5) + (lit(1.0) - stopRatio) * lit(0.5), 4)
  }

  /** Quality scoring: alpha ratio, stopword ratio, composite score. */
  def q33TextQuality(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    val nAlpha = length(regexp_replace(col("text"), "[^a-z]", ""))
    val nStop = size(filter(toks, x => x === "the" || x === "a" || x === "of"))
    // try_divide — same zero-denominator contract as [[qualityScore]]
    val alphaRatio = try_divide(nAlpha.cast("double"), col("n_chars"))
    val stopRatio = try_divide(nStop.cast("double"), size(toks))
    t(s, d, "documents").select(
      col("doc_id"),
      col("n_chars"),
      nAlpha.as("n_alpha"),
      nStop.as("n_stop"),
      round(alphaRatio, 4).as("alpha_ratio"),
      round(stopRatio, 4).as("stop_ratio"),
      qualityScore(col("text"), col("n_chars")).as("quality_score"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q34
  /** Document fingerprinting: md5 of the whitespace-normalized text and
    * sha2-256 of the raw text. Fingerprints are what you'd shuffle for exact
    * dedup at scale instead of full text bodies. */
  def q34Fingerprint(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents").select(
      col("doc_id"),
      HashFamily.normMd5(col("text")).as("fp_md5"),
      sha2(col("text").cast("binary"), 256).as("fp_sha256"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q62
  /** Rolling-hash fingerprints, the incremental sibling of q34's digest
    * fingerprints: a Rabin-Karp-style polynomial fold
    * (acc = (acc*31 + hash(tok)) mod p, p = 2^31-1) over per-token
    * hashes — order-SENSITIVE and composable over windows/shingles,
    * which is what streaming fingerprint pipelines extend to — plus the
    * min token hash as an order-insensitive content sketch (the k=1
    * MinHash). The Mersenne-prime modulus keeps every intermediate below
    * 2^36, so the fold is exact under ANSI arithmetic (Spark 4 default) —
    * no overflow, engine-deterministic.
    *
    * The emitted query keys the fold on 48-bit md5-DERIVED token ints
    * (the q147 trick) so DuckDB recomputes the identical fold via
    * list_reduce and the driver hash-checks it exactly. The xxhash64-
    * keyed family stays available at production speed as the fused
    * codegen expression [[graft.functions.RollingHash]] (one generated
    * loop per row); [[rollingHash]] below is its composed higher-order-
    * function twin, kept as the executable definition of the semantics
    * and spec-pinned bit-identical to the native form. */
  val rollingModulus: Long = 2147483647L // 2^31 - 1

  /** Reference (interpreted) form of the rolling fingerprint — the fused
    * native expression must match this bit-for-bit. */
  def rollingHash(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, tk) =>
      pmod(acc * lit(31L) + pmod(xxhash64(tk), lit(rollingModulus)),
        lit(rollingModulus)))

  /** 48-bit md5-derived token hash (the q147 trick): both engines derive
    * the SAME integer from the same hex digest, which is what lets the
    * rolling fold below keep an exact DuckDB oracle (xxhash64, the
    * fused expression's key family, has no DuckDB twin). */
  private[graft] def md5TokenHash(tk: Column): Column =
    conv(substring(md5(tk.cast("binary")), 1, 12), 16, 10).cast("long")

  /** The md5-keyed Rabin-Karp fold — same pmod chain as [[rollingHash]],
    * different key family (cross-engine-derivable ints). */
  private[graft] def md5RollingHash(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, tk) =>
      pmod(acc * lit(31L) + pmod(md5TokenHash(tk), lit(rollingModulus)),
        lit(rollingModulus)))

  def q62RollingFingerprint(s: SparkSession, d: String): DataFrame = {
    val toks = tokens(col("text"))
    // spread: one md5 per token (twice) per document rides the scan
    graft.Tables.spread(t(s, d, "documents"), "doc_id").select(
      col("doc_id"),
      md5RollingHash(toks).as("fp_rolling"),
      array_min(transform(toks, tk => md5TokenHash(tk))).as("fp_min_token"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q64
  /** Deterministic content-hash train/eval split — the assignment step of
    * a training-data pipeline: a document lands in a split as a pure
    * function of its CONTENT (md5 of normalized text), so re-runs, engine
    * swaps, and corpus re-shards never migrate a document across splits
    * (id- or random-based splits break on re-ingestion; content hashing is
    * also what keeps near-identical eval leakage auditable). The split
    * predicate compares the first hex digit of the digest — 12/16 of the
    * space → 'train', 4/16 → 'eval' — which is engine-exact (string
    * compare on hex chars), so the whole query keeps a DuckDB oracle.
    * Zero shuffles except the per-(lang, split) rollup. */
  /** The one definition of split assignment (shared with the q68 leakage
    * audit): first hex digit of the normalized-content md5 — 12/16 'train',
    * 4/16 'eval'. */
  def splitAssign(text: Column): Column =
    when(substring(HashFamily.normMd5(text), 1, 1) < "c", "train")
      .otherwise("eval")

  def q64HashSplit(s: SparkSession, d: String): DataFrame = {
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("text"),
        splitAssign(col("text")).as("split"))
      .groupBy("lang", "split")
      .agg(count(lit(1)).as("n_docs"),
        round(avg(length(col("text"))), 4).as("avg_len"),
        min("doc_id").as("min_doc_id"))
      .orderBy("lang", "split")
  }

  // ---------------------------------------------------------------- q65
  /** Content-hash stratified subsampling — the corpus-rebalancing step of a
    * training-data pipeline (e.g. downsample the dominant language). The
    * selection predicate is a pure function of document CONTENT, exactly
    * like q64's split assignment: a document is kept iff the first two hex
    * digits of md5("<seed>:" + normalized text) fall below
    * floor(fraction * 256) rendered in hex. That makes the draw
    * re-run-stable, re-SHARD-stable, and engine-portable (hex string
    * compare) — `sampleBy`'s Bernoulli draws depend on partition layout,
    * which is precisely the non-determinism a content-addressed pipeline
    * exists to avoid. Realized rates quantize to /256 granularity (0.25 ->
    * 64/256 exactly; 0.8 -> 204/256 ~ 0.797), which the report makes
    * visible next to the totals. The digest is salted with the seed so the
    * sample decision is independent of q64's (unsalted) split digest.
    * Selection is map-side (zero shuffle); only the audit rollup shuffles. */
  def contentSampleHash(seed: String): Column =
    substring(HashFamily.normMd5Seeded(seed, col("text")), 1, 2)

  /** Per-stratum keep predicate: hash-hex < floor(f*256) in 2-digit hex.
    * Strata absent from `fractions` are KEPT (rebalancing downsamples named
    * strata; dropping unnamed data silently would be a footgun). */
  def stratifiedKeep(strata: Column, hashHex: Column,
                     fractions: Map[String, Double]): Column =
    fractions.foldLeft(lit(true)) { case (acc, (k, f)) =>
      val cut = math.min(math.floor(f * 256).toInt, 256)
      when(strata === k,
        if (cut >= 256) lit(true) else hashHex < lit(f"$cut%02x")).otherwise(acc)
    }

  val sampleFractions: Map[String, Double] =
    Map("en" -> 0.25, "es" -> 0.8, "de" -> 0.8, "fr" -> 0.8, "zh" -> 0.8)

  def q65StratifiedSample(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    // downsample English to parity-ish with the other languages
    val keep = stratifiedKeep(col("lang"), contentSampleHash("graft-sample-42"),
      sampleFractions)
    val report = docs
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        count(when(keep, 1)).as("n_sampled"))
    report
      .select(col("lang"), col("n_total"), col("n_sampled"),
        round(col("n_sampled") / col("n_total"), 4).as("rate"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q67
  /** BPE-ish token counting — the cost-estimation layer of a training
    * pipeline: a GPT-2-style pre-tokenizer regex (contractions, letter
    * runs, digit runs, punctuation runs, whitespace runs — the lookahead
    * clause of the original dropped so the pattern stays in the
    * RE2-compatible subset both engines implement identically; whitespace
    * is an EXPLICIT class because Java's \s includes vertical tab and
    * RE2's does not) counts the units a byte-pair encoder would start
    * from, next to the whitespace token count and a chars-per-token
    * density (null for zero-token texts rather than a 0/0 NaN). Pure
    * codegen'd column expressions, shuffle-free, exact DuckDB oracle. */
  val bpePattern: String = {
    val ws = " \\t\\n\\x0B\\f\\r" // Java \s, spelled out so RE2 agrees
    s"'(?:s|t|re|ve|m|ll|d)| ?\\p{L}+| ?\\p{N}+| ?[^\\p{L}\\p{N}$ws]+|[$ws]+"
  }

  def q67BpeTokens(s: SparkSession, d: String): DataFrame = {
    val nBpe = size(regexp_extract_all(col("text"), lit(bpePattern), lit(0)))
    t(s, d, "documents").select(
      col("doc_id"), col("lang"),
      nBpe.as("n_bpe"),
      size(tokens(col("text"))).as("n_ws"),
      when(nBpe === 0, lit(null).cast("double"))
        .otherwise(round(length(col("text")).cast("double") / nBpe, 4))
        .as("chars_per_token"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q69
  /** Greedy sequence PACKING — the shard-assembly step of a training
    * pipeline: documents are packed into fixed-token-budget training
    * sequences per shard. Shard = doc_id mod nShards — ID-based, so pack
    * assignments are deterministic per corpus but, unlike q64/q65's
    * content-hash assignments, NOT stable across a re-ingestion that
    * renumbers docs (shard by a content digest when that matters);
    * order within a shard = doc_id, pack = floor(cumulative tokens BEFORE
    * this doc / budget) — the next-fit-by-prefix-sum formulation, which is
    * one window cumsum per shard (a single shuffle on the shard key) and
    * fully deterministic, unlike heuristic bin-packing whose output
    * depends on partition visit order. A doc may straddle its pack
    * boundary; trainers that need hard cuts split the straddler downstream
    * — assignment is the distributed part. Exact DuckDB oracle (window
    * math on integers). */
  def q69PackSequences(s: SparkSession, d: String, nShards: Int = 4,
                       budget: Int = 512): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(tokens(col("text")))
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    t(s, d, "documents")
      .select(col("doc_id"), pmod(col("doc_id"), lit(nShards)).as("shard"),
        nTok.cast("long").as("n_tokens"))
      .withColumn("tokens_before", coalesce(sum(col("n_tokens")).over(w), lit(0L)))
      // explicit floor: Spark's double->long cast truncates but DuckDB's
      // rounds, so the shared semantics must be spelled out
      .select(col("doc_id"), col("shard"), col("n_tokens"),
        floor(col("tokens_before") / budget).as("pack_id"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q70
  /** Quality-quantile corpus PRUNING — the filtering step between scoring
    * (q33) and training: keep the top `keepFraction` of each language by
    * composite quality score (percent_rank over a deterministic
    * (score desc, doc_id) order), and report per-language how the cut
    * moved the quality mass. Per-stratum windows are one shuffle on lang;
    * the report is the only aggregation. Exact DuckDB oracle. */
  def q70QualityPrune(s: SparkSession, d: String,
                      keepFraction: Double = 0.5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val score = qualityScore(col("text"), col("n_chars"))
    val w = Window.partitionBy(col("lang")).orderBy(col("q").desc, col("doc_id"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 4)
    t(s, d, "documents")
      .select(col("doc_id"), col("lang"), col("n_chars"), col("text"))
      .withColumn("q", score)
      .withColumn("pr", percent_rank().over(w))
      .groupBy("lang")
      // quality mass sums in DECIMAL (order-free), cast once — the avg of
      // fractional doubles would be partial-agg-order sensitive
      .agg(count(lit(1)).as("n_total"),
        count(when(col("pr") <= keepFraction, 1)).as("n_kept"),
        sum(col("q").cast(dec)).cast("double").as("sum_q_all"),
        sum(when(col("pr") <= keepFraction, col("q")).cast(dec))
          .cast("double").as("sum_q_kept"),
        min(when(col("pr") <= keepFraction, col("doc_id"))).as("min_kept_doc"))
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q181
  /** CURATION FUNNEL CERTIFICATE — the end-to-end corpus-curation pipeline
    * (quality gate → exact dedup → content-hash split) run as ONE query
    * emitting the per-stage (docs, tokens) funnel: the number every
    * training-data run reports first ("we started with X docs / Y tokens,
    * kept Z"). Composes the engine's own stage primitives — q33's quality
    * score, q30's min-id survivor selection, q64's content-hash split —
    * so the funnel certifies the COMPOSITION, not just each stage.
    *
    * Shape: the flagged projection (tokens, quality, normalized-text md5;
    * no raw text) is computed once and checkpointed (two consumers — the
    * q147 discipline): stages 0/1 fold in ONE conditional-aggregate pass
    * (no per-stage scans), the dedup stage is the engine's one md5-keyed
    * shuffle, and the split rollup runs over the already-deduped grid.
    * The split needs no second digest — the survivor's split IS a
    * function of the dedup key (both are the normalized-text md5), which
    * also guarantees a dup-group never straddles train/eval. */
  def q181CurationFunnel(s: SparkSession, d: String,
                         minQuality: Double = 0.5): DataFrame = {
    val base = graft.Transients.track(t(s, d, "documents")
      .select(col("doc_id"),
        size(tokens(col("text"))).cast("long").as("n_tokens"),
        qualityScore(col("text"), col("n_chars")).as("q"),
        HashFamily.normMd5(col("text")).as("nm"))
      .transform(graft.Transients.cut))
    val s01 = base.agg(
        count(lit(1)).as("n0"),
        coalesce(sum("n_tokens"), lit(0L)).as("t0"),
        count(when(col("q") >= minQuality, 1)).as("n1"),
        coalesce(sum(when(col("q") >= minQuality, col("n_tokens"))), lit(0L))
          .as("t1"))
      .selectExpr(
        "stack(2, '0_raw', n0, t0, '1_quality', n1, t1) AS (stage, n_docs, n_tokens)")
    // the md5-keyed dedup aggregate runs ONCE: the per-split rollup (≤2
    // rows) checkpoints, and the 2_dedup stage derives from it by a
    // second-level sum instead of re-running the big aggregate
    val perSplit = graft.Transients.track(base.filter(col("q") >= minQuality)
      .groupBy("nm")
      .agg(min(struct(col("doc_id"), col("n_tokens"))).as("m"))
      .select(col("m.n_tokens").as("n_tokens"),
        when(substring(col("nm"), 1, 1) < "c", "train").otherwise("eval")
          .as("split"))
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("n_tokens"))
      .transform(graft.Transients.cut))
    val s2 = perSplit.agg(lit("2_dedup").as("stage"),
      coalesce(sum("n_docs"), lit(0L)).as("n_docs"),
      coalesce(sum("n_tokens"), lit(0L)).as("n_tokens"))
    val s3 = perSplit
      .select(concat(lit("3_split_"), col("split")).as("stage"),
        col("n_docs"), col("n_tokens"))
    s01.unionAll(s2).unionAll(s3).orderBy("stage")
  }

  // ---------------------------------------------------------------- q188
  /** WEIGHTED QUANTILES — token-weighted document-length quantiles per
    * language: "how long is the document the p-th TOKEN lives in?" — the
    * corpus-composition question (a few huge docs can carry most of the
    * token mass while the unweighted median doc stays short; the gap
    * between the two IS the skew finding). Interpolated weighted
    * quantiles are float-blended; the emitted statistic is the exact
    * DISCRETE weighted quantile
    *
    *   q_p = min{ v : cumW(v) ≥ ⌈p·W/100⌉ }
    *
    * — pure integer threshold math (ceiling division via (p·W + 99) div
    * 100), engine-exact at any scale.
    *
    * Shape: the scan collapses to (lang, n_tokens) weight sums
    * immediately (map-side combined); the cumulative runs over each
    * language's VALUE GRID (distinct lengths — bounded by the length
    * domain, not the corpus), and the four thresholds fold in one
    * conditional-min aggregate over that grid. Nothing after the first
    * aggregate scales with data. */
  def q188WeightedQuantiles(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grid = t(s, d, "documents")
      .select(col("lang"), size(tokens(col("text"))).cast("long").as("v"))
      .groupBy("lang", "v")
      .agg(count(lit(1)).as("n_docs"), sum(col("v")).as("w"))
    val wc = Window.partitionBy("lang").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = grid
      .withColumn("cw", sum(col("w")).over(wc))
      .withColumn("tw", sum(col("w")).over(wAll))
    val qs = Seq(25, 50, 75, 90)
    val aggs = sum(col("n_docs")).as("n_docs") +:
      first(col("tw")).as("total_tokens") +:
      qs.map(p => min(when(
        col("cw") >= expr(s"($p * tw + 99) div 100"), col("v")))
        .as(s"q$p"))
    cum.groupBy("lang")
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("lang")
  }

  // ---------------------------------------------------------------- q35
  /** Heuristic language ID: count distinct stopword hits per language,
    * pick the first maximum in a fixed language order. Deterministic and
    * SQL-expressible, so it keeps a DuckDB oracle. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "que", "y", "en"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在"))
  val langOrder: Seq[String] = Seq("en", "es", "de", "fr", "zh")

  def q35LangId(s: SparkSession, d: String): DataFrame = {
    val toksD = array_distinct(tokens(col("text")))
    val scores = langOrder.map { l =>
      l -> size(array_intersect(toksD, lit(stopwords(l).toArray))).as(s"s_$l")
    }.toMap
    val best = langOrder.map(l => col(s"s_$l")).reduce((a, b) => greatest(a, b))
    val pred = langOrder.foldRight(lit("und"): Column) { (l, acc) =>
      when(col(s"s_$l") === col("s_best") && col("s_best") > 0, lit(l)).otherwise(acc)
    }
    t(s, d, "documents")
      .select(Seq(col("doc_id"), col("lang").as("lang_actual")) ++
        langOrder.map(l => scores(l)): _*)
      .withColumn("s_best", best)
      .withColumn("lang_pred", pred)
      .drop("s_best")
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q72
  /** TF-IDF top terms per language — the corpus-characterization step of a
    * training pipeline (what vocabulary dominates each stratum once
    * ubiquitous terms are discounted). Semantics: df(term) = corpus-wide
    * distinct-document frequency, tf(lang, term) = total occurrences in
    * that language, score = tf x round(ln(N/df), 6) as an exact decimal
    * product; per-lang top `topN` by (score desc, term).
    *
    * Exactness: every aggregate is an INTEGER count — doubles appear only
    * in the final one-row-per-term projection (never summed), so there is
    * no partial-agg ordering sensitivity anywhere. The idf is rounded to 6
    * decimals (JVM StrictMath.log and DuckDB's libm ln agree to the
    * rounded digit across the whole integer N/df domain — verified
    * exhaustively for df in [1, 20000] at all graded corpus sizes) and
    * immediately pinned to DECIMAL(18,6); the score is the EXACT decimal
    * product tf x idf — never re-rounded through binary floating point,
    * because a second round(double) is exactly where engines diverge (a
    * product landing on a ...5 boundary rounds up under Spark's
    * string-based HALF_UP but down under DuckDB's binary-value rounding).
    * Ranking happens on the decimal; the double cast is the last step.
    *
    * Scale: the explode shuffles (lang, term) and (doc, term) key pairs
    * only; both aggregations get map-side partial combine. The df side is
    * vocab-sized — joined on the term key (shuffle join; at 100 TB vocab
    * does not fit a broadcast). N arrives via a broadcast one-row cross
    * join, not a driver collect. */
  def q72TfidfTerms(s: SparkSession, d: String, topN: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, d, "documents")
    // tf and df each re-tokenize the corpus (2 pruned scans) — DELIBERATE:
    // both consumers are map-side explode→aggregate pipelines, and cutting
    // the exploded token table materializes token-scale rows that cost
    // more than the recompute (measured at sf1: cut 4.5 s vs uncut 2.7 s —
    // the r11 scan-audit's rejected case; cuts pay off only for NARROW or
    // multi-stage intermediates, see q237/q149)
    val tok = docs.select(col("doc_id"), col("lang"),
      explode(tokens(col("text"))).as("term"))
    val tf = tok.groupBy("lang", "term").agg(count(lit(1)).as("tf"))
    val df_ = tok.select("doc_id", "term").distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("lang").orderBy(col("score_d").desc, col("term"))
    tf.join(df_, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score_d",
        col("tf") * round(log(col("n_docs").cast("double") / col("df")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= topN)
      .select(col("lang"), col("rk"), col("term"), col("tf"), col("df"),
        col("score_d").cast("double").as("score"))
      .orderBy("lang", "rk")
  }

  // ---------------------------------------------------------------- q149
  /** EXACT-ARITHMETIC BM25 RANKING — the retrieval scorer behind every
    * lexical search stack, restated so the whole score lives on an
    * integer grid: with k1 = 6/5 and b = 3/4 (the textbook constants as
    * exact rationals) the per-term score
    * idf · tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) multiplies through by
    * 20·T (T = corpus tokens, avgdl = T/N) into
    * idf · 44·tf·T / (20·tf·T + 6·T + 18·dl·N) — integer numerator and
    * denominator. idf = ln((2N−2df+1)/(2df+1)) (the +0.5 BM25 smoothing,
    * doubled into integers) is an ln over an INTEGER ratio, so the
    * pinned-log discipline applies (round once to 6 decimals, pin to
    * DECIMAL — JVM and DuckDB agree bit-for-bit on that domain, the q72
    * verification); one truncating integral division lands the score on
    * the micro grid. Query terms are data-derived: the 10 rarest terms
    * with df ≥ N/20 (rare = informative, the floor drops hapax noise).
    *
    * Scale: postings build map-side (explode + partial-agg), the
    * query-term join broadcasts 10 rows, stats broadcast 1 row, and the
    * per-term top-10 runs through the NATIVE TopKPerGroup operator —
    * bounded heaps, no per-term global sort. DECIMAL(38,0) products keep
    * the i6·44·tf·T numerator exact far past the long range. */
  def q149Bm25(s: SparkSession, d: String, topK: Int = 10): DataFrame = {
    // the token-array frame is cut once for its two consumers (postings
    // build + corpus stats), and the postings table once for ITS two
    // (query-term selection + scoring) — uncut, the corpus was scanned
    // and tokenized up to 4× (ScanAudit: documents=4; the q110 discipline)
    val dl = graft.Transients.track(t(s, d, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), size(col("toks")).cast("long").as("dl"),
        col("toks"))
      .transform(graft.Transients.cut))
    val post = graft.Transients.track(dl
      .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
      .transform(graft.Transients.cut))
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum("dl").as("t_tokens"))
    val qterms = post.groupBy("term").agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(stats).select("n_docs"))
      .filter(col("df") * 20 >= col("n_docs"))
      .orderBy(col("df").asc, col("term")).limit(10)
      .select("term", "df")
    val scored = post
      .join(broadcast(qterms), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("i6", expr(
        """CAST(CAST(round(ln(CAST(2 * n_docs - 2 * df + 1 AS DOUBLE)
          |  / CAST(2 * df + 1 AS DOUBLE)), 6) AS DECIMAL(18,6))
          |  * 1000000 AS BIGINT)""".stripMargin))
      .withColumn("num", expr(
        "CAST(i6 AS DECIMAL(38,0)) * 44 * tf * t_tokens"))
      .withColumn("den", expr(
        """CAST(20 AS DECIMAL(38,0)) * tf * t_tokens
          | + CAST(6 AS DECIMAL(38,0)) * t_tokens
          | + CAST(18 AS DECIMAL(38,0)) * dl * n_docs""".stripMargin))
      .withColumn("score_micro", expr("num div den"))
    graft.plans.TopK.perGroup(
      scored.select("term", "doc_id", "tf", "dl", "score_micro"),
      groupCols = Seq("term"),
      orderBy = Seq(("score_micro", false), ("doc_id", true)),
      k = topK, rankName = "rk")
      .orderBy("term", "rk")
  }

  // ---------------------------------------------------------------- q151
  /** RECIPROCAL-RANK FUSION — the multi-signal curation ranker: combine
    * the quality ranking (q33's composite score, higher better) and the
    * fluency ranking (q109's LM avg-NLL, lower better) into one list via
    * RRF, the fusion rule retrieval stacks use because it needs only
    * RANKS (no score calibration): rrf = Σ 1/(60 + rank_i). Each rank is
    * total-ordered (doc_id tie-break) and the fusion score is restated on
    * the integer micro grid — 1000000 div (60 + r) summed — so the whole
    * output is engine-exact.
    *
    * Scale: both corpus-wide rankings run through [[LayoutOps.bandedRank]]
    * (value-grid bands + in-band windows — no single-partition sort of
    * the corpus; the quality band is the score's own 1e-4 grid coarsened
    * ×250, the NLL band is floor(nll·1000)); the final top-k is a
    * TakeOrderedAndProject. Docs with no bigrams rank last on the LM side
    * via an explicit +∞ (never cast — ANSI floor(∞) would throw; the band
    * guard routes it straight to Long.MaxValue). */
  def q151RankFusion(s: SparkSession, d: String, k: Int = 50): DataFrame = {
    val docs = t(s, d, "documents")
    val qual = docs.select(col("doc_id"),
      qualityScore(col("text"), col("n_chars")).as("q"))
    val nll = docs.select(col("doc_id"))
      .join(lmPerDocNll(docs), Seq("doc_id"), "left")
      .select(col("doc_id"),
        when(col("n_bigrams") > 0,
          col("s").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(Double.PositiveInfinity)).as("nll"))
    // NULL quality (unscoreable doc: zero chars/tokens) ranks WORST, like
    // the nll Infinity branch below: the band must say so explicitly —
    // a NULL band would sort FIRST in the engine's band-offset window
    // (Spark asc = nulls first) while the oracle's `ORDER BY q DESC`
    // puts NULLs last (DuckDB nulls-last), silently flipping the ranks
    val rq = LayoutOps.bandedRank(qual,
      when(col("q").isNull, lit(Long.MaxValue))
        .otherwise((-floor(col("q") * 10000) / 250).cast("long")),
      Seq(col("q").desc, col("doc_id")), "r_quality")
      .select("doc_id", "r_quality")
    val rl = LayoutOps.bandedRank(nll,
      when(col("nll") === Double.PositiveInfinity, lit(Long.MaxValue))
        .otherwise(floor(col("nll") * 1000)).cast("long"),
      Seq(col("nll").asc, col("doc_id")), "r_lm")
      .select("doc_id", "r_lm")
    rq.join(rl, "doc_id")
      .withColumn("rrf_micro",
        expr("1000000 div (60 + r_quality) + 1000000 div (60 + r_lm)"))
      .orderBy(col("rrf_micro").desc, col("doc_id")).limit(k)
  }

  // ---------------------------------------------------------------- q74
  /** Overlapping document CHUNKING — the context-window shaping step of a
    * training pipeline: each document becomes ceil-spaced windows of
    * `window` tokens advancing by `stride` (stride < window ⇒ overlap,
    * the standard trick so no span is ever split across chunk borders
    * without also appearing whole in some chunk). Chunk count is pure
    * integer math — 1 + (max(n_tokens - window, 0) + stride - 1) div
    * stride — and the chunk body is reported as its md5 fingerprint (+
    * token count), which keeps the output narrow and the oracle exact.
    *
    * Scale: generator-shaped (explode over a per-row integer sequence) —
    * zero shuffle, 1→N map-side fan-out exactly like the multimodal frame
    * sampler; the ~window/stride output amplification is the operator's
    * contract, not a plan artifact. */
  def q74DocChunks(s: SparkSession, d: String, window: Int = 64,
                   stride: Int = 48): DataFrame = {
    val lastChunk = expr(
      s"(greatest(n_tokens - $window, 0) + ${stride - 1}) div $stride")
    t(s, d, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("chunk_id", explode(sequence(lit(0L), lastChunk)))
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        slice(col("toks"), (col("chunk_id") * stride + 1).cast("int"), lit(window))
          .as("chunk"))
      .select(col("doc_id"), col("chunk_id"),
        size(col("chunk")).as("n_chunk_tokens"),
        md5(array_join(col("chunk"), " ").cast("binary")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")
  }

  // ---------------------------------------------------------------- q144
  /** EXACT DUPLICATED-SPAN DETECTION — the substring-level dedup audit of
    * a training corpus (find every 16-token window that occurs more than
    * once anywhere, then measure how much of each document those windows
    * cover). Unlike the document-level families (q36/q38/q140) this is
    * the span-granular contract: a boilerplate paragraph shared by two
    * otherwise-different pages is found even though the docs are nowhere
    * near any whole-doc similarity threshold.
    *
    * Plan: one windowed-gram projection per doc (explode over start
    * positions, md5 fingerprint of each 16-token slice — the q74 parity
    * machinery), a gram-frequency aggregate keeps only fingerprints with
    * corpus count > 1, occurrences of those grams semi-join back, and the
    * surviving per-doc span set collapses to disjoint islands with one
    * per-doc window (running max of span end; a span starts a new island
    * iff its start clears every earlier end — the union of an overlap
    * chain is contiguous, so island length = max(end) − min(start) + 1).
    * Coverage is reported in basis points via one truncating integral
    * division, so every number is integer-exact and the DuckDB oracle
    * compares hash-equal.
    *
    * Scale: the gram shuffle carries (id, pos, 16-byte hash) only — never
    * text; duplicated grams are a small fraction of the corpus, so the
    * join-back is semi-join-shaped; the island window partitions per doc.
    * At 100 TB the md5-of-slice projection (O(n·k) chars per doc) is the
    * part to upgrade: the graft_rolling_hash expression computes all
    * window fingerprints in one O(n) pass (q62's machinery) — md5 is the
    * spelling the cross-engine oracle can share. */
  def q144DupSpans(s: SparkSession, d: String, k: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = t(s, d, "documents")
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
    // the gram projection (the O(n·k) hot part) feeds BOTH the dup-gram
    // aggregate and the spans join-back — localCheckpoint it once so the
    // corpus-wide md5-of-slice explode runs once, not twice (the q147
    // multi-consumer discipline); tracked for drop at the query boundary
    val occ = graft.Transients.track(tk
      .filter(col("n_tokens") >= k)
      .select(col("doc_id"), col("toks"), col("n_tokens"),
        explode(sequence(lit(1L), col("n_tokens") - (k - 1))).as("pos"))
      .select(col("doc_id"), col("n_tokens"), col("pos"),
        md5(array_join(slice(col("toks"), col("pos").cast("int"), lit(k)), " ")
          .cast("binary")).as("g"))
      .transform(graft.Transients.cut))
    val dupG = occ.groupBy("g").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1).select("g")
    val spans = occ.join(dupG, "g")
      .select(col("doc_id"), col("pos").as("s"),
        (col("pos") + (k - 1)).as("e"))
    val w = Window.partitionBy("doc_id").orderBy("s")
    val islands = spans
      .withColumn("pe", max(col("e")).over(
        w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("iid", sum(
        when(col("pe").isNull || col("s") > col("pe"), 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("doc_id", "iid")
      .agg((max(col("e")) - min(col("s")) + 1L).as("ilen"))
      .groupBy("doc_id").agg(sum(col("ilen")).as("dup_tokens"))
    tk.select("doc_id", "n_tokens")
      .join(islands, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("cov_bp",
        expr("(dup_tokens * 10000) div n_tokens"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q78
  /** PII SCRUBBING — the redaction step of a training-data pipeline:
    * count and replace email addresses, URLs and phone-shaped numbers
    * with typed placeholders. Patterns live in the RE2-compatible subset
    * both engines implement identically (no lookahead, no backrefs,
    * explicit character classes instead of \s/\S — same discipline as
    * [[bpePattern]]), so counts and the redacted text are engine-exact
    * and the query keeps a DuckDB oracle. Counts are measured on the
    * ORIGINAL text; redaction applies email → URL → phone in that fixed
    * order. Pure map-side codegen'd column expressions — zero shuffle,
    * per-row cost only, like every scrub pass at 100 TB. The output
    * carries the redacted text as an md5 fingerprint to stay narrow. */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val urlPattern = "https?://[A-Za-z0-9./_?=&%#:-]+"
  val phonePattern = "\\+?[0-9]{1,3}[ -][0-9]{3}[ -][0-9]{4}"

  /** The one definition of the redacted text (shared with the spec). */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailPattern, "<EMAIL>"),
        urlPattern, "<URL>"),
      phonePattern, "<PHONE>")

  def q78PiiScrub(s: SparkSession, d: String): DataFrame =
    // spread: three regexp_extract_all passes + the redact chain per row
    // ride the scan stage — single-split at every graded layout
    graft.Tables.spread(t(s, d, "documents"), "doc_id").select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPattern), lit(0))).as("n_emails"),
      size(regexp_extract_all(col("text"), lit(urlPattern), lit(0))).as("n_urls"),
      size(regexp_extract_all(col("text"), lit(phonePattern), lit(0))).as("n_phones"),
      md5(redact(col("text")).cast("binary")).as("redacted_md5"))
      .orderBy("doc_id")

  // ---------------------------------------------------------------- q84
  /** QUALITY-WEIGHTED deterministic sampling — q65's content-hash draw
    * with a PER-DOCUMENT keep probability equal to the document's q33
    * quality score: keep iff the first two hex digits of the salted
    * content digest fall below floor(quality * 256). High-quality
    * documents survive at ~their score, low-quality ones are mostly
    * dropped — the importance-sampling step between scoring and training,
    * with every property of the content-hash family intact (re-run-,
    * re-shard- and engine-stable; selection is map-side, only the audit
    * rollup shuffles). Keep rates quantize to /256 like q65; the report
    * shows realized rate and the kept quality mass (decimal sums) next to
    * the totals. Same >= 256 clamp as [[stratifiedKeep]]: a perfect score
    * keeps with certainty rather than hashing against a 3-char literal. */
  def q84WeightedSample(s: SparkSession, d: String): DataFrame = {
    val dec4 = org.apache.spark.sql.types.DecimalType(18, 4)
    val q = qualityScore(col("text"), col("n_chars"))
    val cut = floor(q * 256).cast("int")
    // the NULL-quality guard comes FIRST: Spark's format_string renders a
    // NULL argument as the literal string "null" (printf semantics), so
    // `hash < format_string(.., NULL)` would be TRUE for most hashes and
    // silently KEEP every unscoreable doc — DuckDB's printf yields NULL
    // there and drops them; an explicit false keeps both engines aligned
    val keep = when(cut.isNull, lit(false))
      .when(cut >= 256, lit(true))
      .otherwise(contentSampleHash("graft-wsample-42") < format_string("%02x", cut))
    t(s, d, "documents")
      .select(col("lang"), q.as("q"), keep.as("keep"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_total"),
        count(when(col("keep"), 1)).as("n_kept"),
        sum(col("q").cast(dec4)).cast("double").as("sum_q_all"),
        sum(when(col("keep"), col("q")).cast(dec4)).cast("double").as("sum_q_kept"))
      .select(col("lang"), col("n_total"), col("n_kept"),
        (col("n_kept").cast("double") / col("n_total")).as("rate"),
        col("sum_q_all"), col("sum_q_kept"))
      .orderBy("lang")
  }

  // ------------------------------------------------------------------------
  // ---------------------------------------------------------------- q89
  /** INVERTED INDEX build — term → document-frequency + the head of the
    * sorted postings list, the retrieval-side structure of a corpus store.
    * The heavy part is shaped for scale: distinct (term, doc_id) pairs are
    * ranked per term by a window row_number (sort-based, STREAMS each
    * term's postings — it never materializes a popular term's full list in
    * memory the way sort_array(collect_list(...)) would for a stopword at
    * 100 TB), and the follow-up aggregate collects only the rn ≤ 20 head
    * (collect_list skips the nulls the `when` leaves for the tail). Both
    * run on the same term-hash partitioning, so the pairs shuffle once.
    * The top-50-by-df report cut is TakeOrderedAndProject, not a global
    * sort. */
  def q89InvertedIndex(s: SparkSession, d: String, headN: Int = 20,
                       topTerms: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = t(s, d, "documents")
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .distinct()
    val w = Window.partitionBy("term").orderBy("doc_id")
    pairs
      .withColumn("rn", row_number().over(w))
      .groupBy("term")
      .agg(count(lit(1)).as("df"),
        array_join(
          transform(sort_array(collect_list(when(col("rn") <= headN, col("doc_id")))),
            _.cast("string")), ",").as("postings_head"))
      .orderBy(col("df").desc, col("term"))
      .limit(topTerms)
  }

  // ---------------------------------------------------------------- q90
  /** Token CO-OCCURRENCE PMI over the top-V vocabulary — the collocation
    * scorer of a corpus-analysis pipeline: for vocabulary terms a < b,
    * pmi(a,b) = ln(N·c_ab / (c_a·c_b)) over document frequencies. The
    * vocabulary cut (top 50 terms by df, deterministic (df desc, term)
    * tiebreak) is what makes the pair stage scale-honest: the per-document
    * self-join runs AFTER a broadcast semi-join against the 50-term
    * vocabulary, so a document contributes at most V²/2 pairs no matter
    * how long it is, and the vocabulary itself is a TakeOrdered top-k,
    * never a global sort. Counts are exact longs; the one double divide
    * runs on exactly-representable integers and ln parity follows the
    * measured q72 rule (StrictMath.log == DuckDB ln after 6-dp rounding,
    * pinned to DECIMAL). */
  def q90TokenPmi(s: SparkSession, d: String, vocabN: Int = 50,
                  topPairs: Int = 30): DataFrame = {
    val docs = t(s, d, "documents")
    // each consumer re-runs the tokenize+distinct — DELIBERATE: cutting
    // this token-scale table measured slower at sf1 than the map-side
    // recompute (the r11 scan-audit's rejected case; see q72's note)
    val pairs = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("term"))
      .distinct()
    val vocab = pairs.groupBy("term").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("term")).limit(vocabN)
    val tv = pairs.join(broadcast(vocab), "term")
      .select(col("doc_id"), col("term"), col("c"))
    val co = tv.as("x").join(tv.as("y"),
        col("x.doc_id") === col("y.doc_id") && col("x.term") < col("y.term"))
      .groupBy(col("x.term").as("term_a"), col("y.term").as("term_b"),
        col("x.c").as("c_a"), col("y.c").as("c_b"))
      .agg(count(lit(1)).as("c_ab"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    co.crossJoin(broadcast(nDocs))
      .withColumn("pmi_d",
        round(log((col("c_ab") * col("n_docs")).cast("double") /
          (col("c_a") * col("c_b")).cast("double")), 6)
          .cast(org.apache.spark.sql.types.DecimalType(18, 6)))
      .orderBy(col("pmi_d").desc, col("term_a"), col("term_b"))
      .limit(topPairs)
      .select(col("term_a"), col("term_b"), col("c_a"), col("c_b"),
        col("c_ab"), col("pmi_d").cast("double").as("pmi"))
  }

  // ---------------------------------------------------------------- q237
  /** PREFERENCE-PAIR CONSTRUCTION — the DPO/RLHF data-prep step: per
    * language, pair the i-th BEST document (by the shared q33 composite
    * quality score) with the i-th WORST as (chosen, rejected), for the
    * top `k` pair ranks — margin-ordered contrastive pairs with the
    * largest quality gaps first. Both rankings run through the native
    * TopKPerGroup operator (bounded per-group heaps, map-side partial —
    * never a full per-language sort), the bottom ranking is the exact
    * reverse order ((q asc, id desc) ≡ n+1−rank of (q desc, id asc)), and
    * i ≤ n/2 keeps chosen/rejected disjoint in small groups. Scores are
    * the 4-dp-rounded composite, so ranks, pairs, and margins are
    * engine-exact. */
  def q237PreferencePairs(s: SparkSession, d: String, k: Int = 10): DataFrame = {
    // unscoreable docs (NULL quality) can't be preferred OR rejected —
    // and the two engines rank NULLs on opposite ends (Spark nulls-first
    // asc, DuckDB nulls-last), so they are excluded explicitly, both sides.
    // The narrow scored frame is CUT once for its three consumers (n, top,
    // bot — the q147/q110 multi-consumer discipline): uncut, each consumer
    // re-scans documents AND Catalyst inlines the quality expression into
    // both the isNotNull Filter and the Project per scan — ~6 regexp+lambda
    // evaluations per doc (measured 3.05 → 5.28 s at sf1 when the r11
    // filter landed without the cut; cut, the expression runs once per doc)
    val scored = graft.Transients.track(t(s, d, "documents")
      .select(col("doc_id"), col("lang"),
        qualityScore(col("text"), col("n_chars")).as("q"))
      .filter(col("q").isNotNull)
      .transform(graft.Transients.cut))
    val n = scored.groupBy("lang").agg(count(lit(1)).as("n"))
    val top = graft.plans.TopK.perGroup(scored, Seq("lang"),
      Seq(("q", false), ("doc_id", true)), k = k, rankName = "i")
    val bot = graft.plans.TopK.perGroup(scored, Seq("lang"),
      Seq(("q", true), ("doc_id", false)), k = k, rankName = "i")
    top.select(col("lang"), col("i"), col("doc_id").as("chosen_id"),
        col("q").as("q_chosen"))
      .join(bot.select(col("lang"), col("i"),
        col("doc_id").as("rejected_id"), col("q").as("q_rejected")),
        Seq("lang", "i"))
      .join(broadcast(n), Seq("lang"))
      .filter(expr("i <= n div 2"))
      .select(col("lang"), col("i").as("pair_rank"), col("chosen_id"),
        col("rejected_id"), col("q_chosen"), col("q_rejected"),
        round(col("q_chosen") - col("q_rejected"), 4).as("margin"))
      .orderBy("lang", "pair_rank")
  }

  // ---------------------------------------------------------------- q238
  /** PADDING-WASTE AUDIT — length-bucketed batching efficiency: every
    * document pads up to the next power-of-two token length (the bucket
    * a static-shape trainer/server would pick), and per bucket the audit
    * reports how many tokens the padding burns. The bucket is pure
    * integer bit math (2^bitlength(n−1), the q136 bin() idiom — no
    * floating log2 anywhere), waste lands in integer basis points, and
    * the whole audit is one map-side projection + one bucket-grained
    * aggregate. The decision it feeds at scale: buckets with waste above
    * a threshold get their own finer bucket — re-run the audit, compare
    * total waste. */
  def q238PaddingWaste(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
      // a NULL body packs as 0 tokens (coalesce BOTH sides): leaving it
      // NULL would put the doc in a NULL bucket that Spark's asc sort
      // emits FIRST and DuckDB's LAST — a row-order mismatch by ordering
      // rules alone
      .select(coalesce(
        size(filter(tokens(col("text")), t => t =!= "")).cast("long"),
        lit(0L)).as("n_tok"))
      .withColumn("bucket_len",
        when(col("n_tok") <= 1L, 1L)
          .otherwise(expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(length(bin(n_tok - 1)) AS INT))")))
      .groupBy("bucket_len")
      .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("real_tokens"))
      .select(col("bucket_len"), col("n_docs"), col("real_tokens"),
        (col("bucket_len") * col("n_docs")).as("padded_tokens"),
        expr("(bucket_len * n_docs - real_tokens) * 10000 div (bucket_len * n_docs)")
          .as("waste_bp"))
      .orderBy("bucket_len")

  // ---------------------------------------------------------------- q224
  /** SKIP-GRAM CO-OCCURRENCE — the positional counting pass that feeds
    * word2vec/GloVe-style embedding training: for every ordered vocab
    * pair within a ±3-token window, the co-occurrence count and the
    * distance-decayed weight Σ 1/d. The weight stays EXACT by scaling to
    * the integer grid 6/d (6, 3, 2 for d = 1, 2, 3 — LCM-scaled harmonic
    * weights, zero floats). Complements q90 (document-level PMI — blind
    * to position) and q101 (adjacent bigrams — blind to d > 1).
    *
    * Shape: the window join is NOT a band self-join — each vocab token
    * explodes into `maxDist` (doc_id, pos+d) probes and equi-joins the
    * position table, so Catalyst plans a pure hash join keyed on
    * (doc_id, rpos) with fan-out bounded by maxDist, never an
    * O(len·window) nested-loop band probe. Vocab filtering broadcasts
    * the top-30 list before the explode, so probes carry only vocab
    * tokens. */
  def q224SkipgramCooc(s: SparkSession, d: String, vocabN: Int = 30,
                       maxDist: Int = 3, topPairs: Int = 50): DataFrame = {
    // positioned token table cut once for its three consumers (vocab +
    // tv's two join sides) — uncut, each re-tokenized the corpus
    // (ScanAudit: documents=4)
    val toks = graft.Transients.track(t(s, d, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
      .filter(col("term") =!= "")
      .transform(graft.Transients.cut))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("tf"))
      .orderBy(col("tf").desc, col("term")).limit(vocabN)
    val tv = toks.join(broadcast(vocab.select("term")), Seq("term"))
      .select(col("doc_id"), col("pos"), col("term"))
    val probes = tv
      .withColumn("dist", explode(array((1 to maxDist).map(lit): _*)))
      .select(col("doc_id"), (col("pos") + col("dist")).as("rpos"),
        col("term").as("left_term"), col("dist"))
    probes
      .join(tv.select(col("doc_id"), col("pos").as("rpos"),
        col("term").as("right_term")), Seq("doc_id", "rpos"))
      .groupBy("left_term", "right_term")
      .agg(count(lit(1)).as("n_cooc"),
        sum(expr("6 div dist")).as("w6"))
      .orderBy(col("w6").desc, col("left_term"), col("right_term"))
      .limit(topPairs)
  }

  // ---------------------------------------------------------------- q96
  /** Deterministic K-PER-GROUP sampling — the fixed-size sibling of the
    * rate-based q65/q84 samplers: exactly min(k, |group|) documents per
    * language, chosen as the k smallest salted content digests (a hash
    * defines a uniform random-but-reproducible total order, so this is a
    * seeded uniform sample that never moves under re-sharding or re-runs,
    * and adding documents only ever displaces the hash-largest picks).
    * Runs through the engine's own TopKPerGroup physical operator —
    * bounded per-group heaps with a map-side partial pass — instead of a
    * row_number window, so the 100 TB shape holds: no per-partition full
    * sort, only k candidates per group per partition cross the exchange.
    * The oracle states the same semantics as a window rank. */
  def q96GroupSample(s: SparkSession, d: String, k: Int = 10): DataFrame =
    graft.plans.TopK.perGroup(
      t(s, d, "documents")
        .withColumn("h",
          HashFamily.normMd5Seeded("graft-ksample-42", col("text")))
        .select("lang", "h", "doc_id", "n_chars"),
      groupCols = Seq("lang"),
      orderBy = Seq(("h", true), ("doc_id", true)),
      k = k, rankName = "rk")
      .orderBy("lang", "rk")

  // ---------------------------------------------------------------- q100
  /** Tokenizer-vocabulary COVERAGE CURVE, per language — the "how big must
    * the vocab be" question answered as a table: tokens ranked by corpus
    * frequency within each language, with the cumulative share of all
    * token occurrences covered through each rank. Vocab building is the
    * first step of training a tokenizer; the coverage curve is what picks
    * its size.
    *
    * Scale: the explode fans out corpus-size rows, but they partially
    * aggregate into (lang, token) counts map-side — the shuffle carries
    * at most |vocab| rows per partition, and every window below runs over
    * the per-language VOCABULARY (bounded by the token domain, not the
    * corpus). cum_share is one integer→double division per row on exact
    * integer counts — deterministic cross-engine, no rounding. */
  def q100VocabCoverage(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cnt = t(s, d, "documents")
      .select(col("lang"), explode(tokens(col("text"))).as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n"))
    val wRank = Window.partitionBy("lang").orderBy(col("n").desc, col("token"))
    val wCum = wRank.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("lang")
    cnt
      .withColumn("rk", row_number().over(wRank))
      .withColumn("cum", sum(col("n")).over(wCum))
      .withColumn("total", sum(col("n")).over(wAll))
      .select(col("lang"), col("token"), col("n"), col("rk"),
        (col("cum").cast("double") / col("total").cast("double")).as("cum_share"))
      .orderBy("lang", "rk")
  }

  // ---------------------------------------------------------------- q101
  /** Bigram LANGUAGE-MODEL table — conditional next-token counts: for the
    * 20 most frequent head tokens, the top-3 continuations each with its
    * count and conditional probability P(w2 | w1) = c(w1 w2) / c(w1 ·).
    * The n-gram-LM / autocomplete primitive (and, corpus-side, the raw
    * material of contamination n-gram checks).
    *
    * Bigrams are built with `zip_with` over two slices of the SAME token
    * array — the lambda closes over nothing, so the split is evaluated
    * O(1) times per row (a transform() lambda referencing the outer token
    * expression would re-split the document once PER ELEMENT — the
    * measured Catalyst inlining trap from the shingle pipeline). Counts
    * partially aggregate map-side; the top-20 heads come from
    * orderBy+limit (TakeOrderedAndProject — per-partition heap + driver
    * merge, no single-partition sort of the vocabulary), and the
    * continuation window is keyed by head token. Probabilities are single
    * integer→double divisions — exact oracle. */
  def q101BigramLm(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bg = t(s, d, "documents")
      .select(tokens(col("text")).as("t"))
      .select(explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("x"))
      .select(col("x.w1").as("w1"), col("x.w2").as("w2"))
    val cnt = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n"))
    // top-20 heads via orderBy+limit => TakeOrderedAndProject (per-partition
    // heap + driver merge), not a single-partition total-sort window
    val heads = cnt.groupBy("w1").agg(sum(col("n")).as("head_n"))
      .orderBy(col("head_n").desc, col("w1"))
      .limit(20)
    cnt.join(heads, "w1")
      .withColumn("crk", row_number().over(
        Window.partitionBy("w1").orderBy(col("n").desc, col("w2"))))
      .filter(col("crk") <= 3)
      .select(col("w1"), col("w2"), col("n"), col("crk"),
        (col("n").cast("double") / col("head_n").cast("double")).as("cond_p"))
      .orderBy("w1", "crk")
  }

  // ---------------------------------------------------------------- q102
  /** Benchmark CONTAMINATION audit — exact n-gram containment of the eval
    * split in the train split: for every eval document, how many of its
    * distinct word 3-gram shingles occur verbatim anywhere in train. The
    * direct-overlap complement of the q68 near-dup leakage audit (q68
    * catches paraphrase-level leaks pair-wise; this catches verbatim
    * n-gram hits against the WHOLE train side, the standard
    * benchmark-decontamination check).
    *
    * Shape at scale: shingles explode corpus-wide, but the join carries
    * (gram, doc_id) against a `distinct` train-gram set — an equi-join on
    * the gram string, hash-partitioned both sides; no pair enumeration,
    * no per-source blowup. The split predicate is q64's content-hash
    * assignment ([[splitAssign]]), so the audit is re-shard stable, and
    * counts + one integer→double division keep the oracle exact. The
    * shingle basis is the fused [[graft.functions.NgramShingles]]
    * expression (shared with q38/q66). */
  def q102Contamination(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s) // shingles is a temp function
    // each consumer re-runs the shingle explode (3 pruned scans) —
    // DELIBERATE: cutting the exploded gram table materializes gram-scale
    // rows and measured 6× SLOWER at sf1 (8.1 → 48.2 s — the r11
    // scan-audit's starkest rejected case; the map-side explode pipelines
    // into each aggregate, the checkpoint cannot)
    val grams = t(s, d, "documents")
      .select(col("doc_id"), splitAssign(col("text")).as("split"),
        explode(array_distinct(DedupOps.shingles(col("text")))).as("gram"))
    val trainSet = grams.filter(col("split") === "train").select("gram").distinct()
    val ev = grams.filter(col("split") === "eval")
    val hits = ev.join(trainSet, Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    ev.groupBy("doc_id").agg(count(lit(1)).as("n_grams"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_grams"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        (coalesce(col("n_hit"), lit(0L)).cast("double")
          / col("n_grams").cast("double")).as("contaminated_share"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q109
  /** Per-document LANGUAGE-MODEL scoring — the perplexity-style quality
    * filter of a training pipeline: each document is scored by the total
    * negative log-likelihood of its bigrams under an add-one-smoothed
    * bigram LM trained on the corpus itself (the classic
    * train-on-corpus / score-each-doc loop; docs whose text the corpus LM
    * finds surprising are the pruning candidates that simple length/
    * stopword heuristics like q33 miss).
    *
    * nll(w1 w2) = ln((c(w1 ·) + V) / (c(w1 w2) + 1)) — add-one smoothing
    * over vocabulary size V. Exactness follows q72's discipline: the log's
    * argument is a double quotient of exact integers, the log is rounded
    * ONCE to 6 decimals and pinned to DECIMAL(18,6) (JVM log and DuckDB ln
    * agree to the rounded digit across the integer-ratio domain — the
    * q72-verified property), and everything after is exact decimal
    * arithmetic: per-doc sums multiply the pinned nll by integer bigram
    * multiplicities and sum as decimals, so partial-aggregation order can
    * never move a bit. The final avg is one decimal→double cast and one
    * IEEE division of deterministic operands.
    *
    * Scale: the LM table is vocab²-bounded and built with map-side partial
    * counts; per-doc bigrams pre-aggregate to (doc, w1, w2, multiplicity)
    * before the join, so the shuffle carries bigram TYPES per doc, not
    * token positions. The join key (w1, w2) is hash-partitioned on both
    * sides — at 100 TB the LM side is far too big to broadcast, and this
    * plan never needs to. V arrives via a broadcast one-row cross join. */
  /** Shared core of q109/q127: per-document totals of the add-one-smoothed
    * corpus-bigram NLL — (doc_id, n_bigrams, s) with `s` an EXACT decimal
    * sum of per-bigram-type pinned-log scores. Docs with zero bigrams do
    * not appear (callers left-join or drop by contract). Plan shape as
    * documented on [[q109LmDocScore]]. */
  private def lmPerDocNll(docs: DataFrame): DataFrame = {
    val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
    // spread: tokenize + bigram zip explode is the compute-heavy map
    // stage of every consumer (q109/q127/q151) — widen the scan first.
    // The TOKEN table is cut once for its two consumers (the bigram
    // explode and the vocabulary distinct): uncut, this core tokenized
    // the corpus up to FIVE times — bg's lineage re-executed under cnt's
    // two consumers and the per-doc aggregate, plus vocab's own scan (the
    // q237/q110 multi-consumer fanout; ScanAudit flagged documents=5).
    // bg itself stays UNCUT: re-running the zip/explode off materialized
    // token arrays is map-side and beats checkpointing the token-scale
    // exploded table (vocab still covers single-token docs — deriving it
    // from bigrams would drop tokens that never head a bigram).
    val tok = graft.Transients.track(graft.Tables.spread(docs, "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .transform(graft.Transients.cut))
    val bg = tok
      .select(col("doc_id"), explode(zip_with(
        slice(col("t"), lit(1), greatest(size(col("t")) - 1, lit(0))),
        slice(col("t"), lit(2), greatest(size(col("t")) - 1, lit(0))),
        (a, b) => struct(a.as("w1"), b.as("w2")))).as("x"))
      .select(col("doc_id"), col("x.w1").as("w1"), col("x.w2").as("w2"))
    // per-doc bigram-TYPE multiplicities — cut, because BOTH the corpus
    // LM counts and the per-doc score join consume it (optimization r13:
    // the corpus counts previously re-ran the bigram explode off the
    // token table a second time — cnt = Σ_docs m is the same number by
    // commutativity of the count, derived here from the already-grouped
    // type rows instead of a second token-scale explode+aggregate pass;
    // profiled −1 full explode pass ≈ −12 task-s per consumer at sf0.1)
    val bgt = graft.Transients.track(
      bg.groupBy("doc_id", "w1", "w2").agg(count(lit(1)).as("m"))
        .transform(graft.Transients.cut))
    // bigram-TYPE counts (Zipf-small): one map-side-partial aggregate
    // over the checkpointed type rows per consumer (heads, nll) — cheaper
    // than the old second cut, which existed to avoid re-tokenizing
    val cnt = bgt.groupBy("w1", "w2").agg(sum(col("m")).as("n"))
    val heads = cnt.groupBy("w1").agg(sum(col("n")).as("head_n"))
    val vocab = tok.select(explode(col("t")).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    val nll = cnt.join(heads, "w1")
      .crossJoin(broadcast(vocab))
      .select(col("w1"), col("w2"),
        round(log((col("head_n") + col("v")).cast("double")
          / (col("n") + lit(1L)).cast("double")), 6).cast(dec6).as("nll"))
    bgt
      .join(nll, Seq("w1", "w2"))
      .groupBy("doc_id")
      .agg(sum(col("m")).as("n_bigrams"), sum(col("m") * col("nll")).as("s"))
  }

  def q109LmDocScore(s: SparkSession, d: String): DataFrame = {
    val docs = t(s, d, "documents")
    val perDoc = lmPerDocNll(docs)
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("s").cast("double"), lit(0.0)).as("sum_nll"),
        when(col("n_bigrams") > 0,
          col("s").cast("double") / col("n_bigrams").cast("double"))
          .as("avg_nll"))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q127
  /** PERPLEXITY BUCKETING (CCNet-style) — the filtering layout CCNet made
    * standard: score every document with a language model (q109's per-doc
    * bigram NLL) and cut each language into equal-count head/middle/tail
    * buckets by average NLL, so downstream mixing can oversample the
    * fluent head and drop or down-weight the noisy tail. Reuses
    * [[lmPerDocNll]] verbatim — the scoring plan is computed once and the
    * bucketing adds one |docs|-sized window per language plus a
    * |langs×buckets|-row rollup.
    *
    * Determinism: avg_nll is one IEEE division of an exact decimal by an
    * exact long (same value in any engine), ntile orders by (avg_nll,
    * doc_id) so ties cannot reorder, and the bucket report's mass columns
    * are exact sums with a single final division. Docs with zero bigrams
    * have no perplexity and are excluded by contract (q109 reports them
    * as NULL for the same reason). Exact DuckDB oracle. */
  def q127PplBuckets(s: SparkSession, d: String, nBuckets: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = t(s, d, "documents")
    val per = lmPerDocNll(docs)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
      .withColumn("avg_nll", col("s").cast("double") / col("n_bigrams").cast("double"))
    per
      .withColumn("bucket",
        ntile(nBuckets).over(Window.partitionBy("lang").orderBy("avg_nll", "doc_id")))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_bigrams")).as("n_bigrams"),
        (sum(col("s")).cast("double") / sum(col("n_bigrams")).cast("double"))
          .as("bucket_nll"),
        min(col("avg_nll")).as("min_nll"),
        max(col("avg_nll")).as("max_nll"))
      .orderBy("lang", "bucket")
  }

  // ---------------------------------------------------------------- q111
  /** TEMPERATURE-SCALED corpus MIXTURE sampling — the data-mixing step of
    * LLM training: sources are re-weighted by count^τ with τ = 1/2 (big
    * sources are downsampled toward parity, small ones kept near-whole —
    * raw-proportional mixing lets one crawl dominate, uniform mixing
    * over-amplifies tiny sources), and documents are drawn with the
    * content-hash predicate so the sample is re-run-, re-shard- and
    * engine-stable (the q64/q65 family property).
    *
    * Everything is exact integer arithmetic end to end:
    *  - the weight is an exact integer sqrt — floor(sqrt(double)) plus a
    *    ±1 integer fixup, so the one float op can never shift the result
    *    off the true isqrt even at a perfect-square boundary;
    *  - the per-source keep threshold on the 16-bit hash grid is two
    *    integer floor-divisions — thr_s = ((B·65536 div W)·w_s) div c_s,
    *    B = target budget (¼ of the corpus), W = Σ w_s — staged so no
    *    intermediate outgrows a long even at 100 TB source sizes (the
    *    single-expression form B·w_s·65536 would); the staging quantizes
    *    the realized rate by ≤ W/65536 of a grid step, which the report
    *    makes visible (target_rate next to realized rate);
    *  - the draw compares 4 hex digits of the salted content md5 against
    *    the threshold rendered in hex — pure string compare.
    *
    * Sampled counts land ∝ c_s^τ: the τ=1 (proportional) and τ→0
    * (uniform) mixtures are the same operator with a different weight
    * column. Selection is map-side; the only shuffle is the per-source
    * rollup (|sources| rows). */
  def q111MixtureWeights(s: SparkSession, d: String, shareDenom: Int = 4): DataFrame = {
    val docs = t(s, d, "documents")
    // exact integer sqrt: one float sqrt + integer fixup (never trusts the
    // float at a boundary)
    def isqrt(c: Column): Column = {
      val w0 = floor(sqrt(c.cast("double"))).cast("long")
      when((w0 + 1) * (w0 + 1) <= c, w0 + 1)
        .when(w0 * w0 > c, w0 - 1)
        .otherwise(w0)
    }
    val bySource = docs.groupBy("source").agg(count(lit(1)).as("c_s"))
      .withColumn("w_s", isqrt(col("c_s")))
    val totals = bySource.agg(sum(col("c_s")).as("n_total"),
      sum(col("w_s")).as("w_total"))
    val withThr = bySource.crossJoin(broadcast(totals))
      .withColumn("thr", expr(
        s"(((n_total div $shareDenom) * 65536L div w_total) * w_s) div c_s"))
    val keep = col("thr") >= 65536L ||
      substring(HashFamily.normMd5Seeded("graft-mix-42", col("text")), 1, 4) <
        format_string("%04x", col("thr"))
    docs.join(broadcast(withThr.select("source", "c_s", "w_s", "thr")), "source")
      .groupBy("source")
      .agg(first(col("c_s")).as("n_docs"), first(col("w_s")).as("weight"),
        first(col("thr")).as("thr"),
        count(when(keep, 1)).as("n_sampled"))
      .select(col("source"), col("n_docs"), col("weight"), col("n_sampled"),
        (col("n_sampled").cast("double") / col("n_docs").cast("double"))
          .as("realized_rate"),
        (least(col("thr"), lit(65536L)).cast("double") / 65536.0)
          .as("target_rate"))
      .orderBy("source")
  }

  // ---------------------------------------------------------------- q118
  /** PARETO-SKYLINE document selection — the multi-objective version of
    * q70's single-score cut: keep exactly the documents no other document
    * dominates on (quality score, length). A doc is dominated when another
    * is >= on both axes and > on at least one; the frontier is what "high
    * quality AND long" means without inventing a weighting between the two.
    *
    * The naive skyline is the O(n²) NOT-EXISTS self-join (the oracle runs
    * exactly that — fine at oracle scale). The engine plan is the
    * sort-based skyline made distributable by a BOUNDED group axis: the
    * quality score is rounded to 4 decimals in [0, 1], so there are at
    * most 10001 distinct values at ANY corpus size. Per quality value one
    * aggregate takes max length (gmax); a window over that ≤10001-row
    * frame computes the running strict-prefix max M(q) (best length among
    * strictly higher qualities); a doc is on the frontier iff its length
    * equals its quality's gmax and strictly beats M(q) — ties on both
    * axes are mutually non-dominating and all survive. Two document scans
    * (one aggregate, one broadcast-joined filter), one window over a
    * provably bounded frame — no pair enumeration anywhere. */
  /** Frontier core over any (doc_id, quality, n_chars) frame — the
    * testable unit the q118 entry wraps (specs drive edge cases through
    * THIS function so tie/dominance handling can't silently drift from a
    * private test copy). */
  def skylineFrontier(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val perQ = docs.groupBy("quality").agg(max(col("n_chars")).as("gmax"))
    val w = Window.orderBy(col("quality").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val m = perQ.withColumn("m_strict", max(col("gmax")).over(w))
    docs.join(broadcast(m), "quality")
      .filter(col("n_chars") === col("gmax") &&
        (col("m_strict").isNull || col("n_chars") > col("m_strict")))
      .select(col("doc_id"), col("quality"), col("n_chars"))
      .orderBy(col("quality").desc, col("doc_id"))
  }

  def q118Skyline(s: SparkSession, d: String): DataFrame =
    // a NULL quality (zero-char/zero-token doc) has no place on a
    // quality×length frontier — and the two engines would disagree on it
    // structurally (the engine's equi-join drops NULL keys while the
    // oracle's NOT EXISTS three-valued logic keeps EVERY null row), so
    // both sides exclude it explicitly. The scored frame is cut once for
    // skylineFrontier's two consumers (the per-quality aggregate and the
    // frontier join) — uncut, each re-scans documents with the quality
    // expression inlined into both the Filter and the Project (the q237
    // fanout, one scan fewer)
    skylineFrontier(graft.Transients.track(t(s, d, "documents")
      .select(col("doc_id"),
        qualityScore(col("text"), col("n_chars")).as("quality"), col("n_chars"))
      .filter(col("quality").isNotNull)
      .transform(graft.Transients.cut)))

  // ---------------------------------------------------------------- q125
  /** BPE MERGE-STEP counting — the inner loop of training a byte-pair
    * encoder: over the corpus' pre-tokens (q67's GPT-2-style regex), count
    * every adjacent CHARACTER pair weighted by pre-token frequency and
    * rank the top merge candidates. This is exactly the statistic a BPE
    * trainer computes to pick its next merge rule; iterating it (apply the
    * merge, recount) is a driver loop over this same operator.
    *
    * Scale is the reason real BPE trainers survive web corpora, and this
    * plan mirrors them: the corpus aggregates to the DISTINCT pre-token
    * frequency table FIRST (Zipf: |distinct pre-tokens| ≪ corpus tokens,
    * with map-side partial counts), and character pairs explode only off
    * that small table — the pair fan-out never touches corpus-sized data.
    * Top-k lands on TakeOrderedAndProject. Both engines count substrings
    * in Unicode code points (the corpus is code-point-clean; q67 pins the
    * same property for length()). Exact DuckDB oracle. */
  def q125BpeMerges(s: SparkSession, d: String, topK: Int = 50): DataFrame = {
    val wf = t(s, d, "documents")
      .select(explode(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("tok"))
      .groupBy("tok").agg(count(lit(1)).as("freq"))
      .filter(length(col("tok")) >= 2)
    wf.select(col("freq"),
        explode(transform(sequence(lit(1), length(col("tok")) - 1),
          i => col("tok").substr(i, lit(2)))).as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("merge_count"))
      .orderBy(col("merge_count").desc, col("pair"))
      .limit(topK)
  }

  // ---------------------------------------------------------------- q126
  /** REPETITION filtering (Gopher-style) — the quality gate that catches
    * boilerplate and degenerate generation loops, which length/stopword
    * scores (q33) structurally miss: a page of "click here click here …"
    * scores fine on punctuation ratios but is pure repetition. Per
    * document: the duplicate fraction of word 2-grams and 3-grams
    * (1 − distinct/total) and the share of all 2-grams taken by the single
    * most frequent one; a document is flagged when either the top-2-gram
    * share or the duplicate-3-gram fraction crosses its threshold
    * (defaults near the published Gopher cuts).
    *
    * Scale: the whole filter is ONE MAP-SIDE PROJECTION — zero shuffle,
    * zero joins. The distinct/total fractions are codegen array math
    * (transform + array_distinct), and the top-2-gram multiplicity runs
    * through the native [[graft.functions.MaxRunLength]] expression over
    * the sorted gram array (the composed form exploded every 2-gram into a
    * corpus-size (doc_id, gram) shuffle and joined the per-doc max back —
    * 13 s vs ~1 s at sf0.1; the spec pins the two forms equal). Short
    * docs (< n tokens) yield NULL fractions, never 0/0. Exact DuckDB
    * oracle. */
  def q126RepetitionStats(s: SparkSession, d: String,
                          topGramMax: Double = 0.18,
                          dupTriMax: Double = 0.30): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    // spread: both gram arrays + the fused max-run expression are one
    // compute-bound projection per row (sf1: 10.9 s single-task unspread)
    val base = graft.Tables.spread(t(s, d, "documents"), "doc_id")
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).as("n_tokens"),
        wordGrams(col("t"), 2).as("g2"), wordGrams(col("t"), 3).as("g3"))
    def frac(num: Column, den: Column): Column =
      when(den > 0, round(num.cast("double") / den.cast("double"), 4))
    base
      .select(col("doc_id"), col("n_tokens"),
        frac(size(col("g2")) - size(array_distinct(col("g2"))), size(col("g2")))
          .as("frac_dup_2gram"),
        frac(call_function("graft_max_run", array_sort(col("g2"))), size(col("g2")))
          .as("frac_top_2gram"),
        frac(size(col("g3")) - size(array_distinct(col("g3"))), size(col("g3")))
          .as("frac_dup_3gram"))
      .withColumn("flagged",
        coalesce(col("frac_top_2gram") > topGramMax, lit(false)) ||
          coalesce(col("frac_dup_3gram") > dupTriMax, lit(false)))
      .orderBy("doc_id")
  }

  /** Word n-gram array (space-joined) off a token array; empty below n
    * tokens. Shared by q126 and its equivalence spec. */
  def wordGrams(tc: Column, n: Int): Column =
    when(size(tc) >= n,
      transform(sequence(lit(1), size(tc) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(o => element_at(tc, i + o)): _*)))
      .otherwise(array().cast("array<string>"))

  // ---------------------------------------------------------------- q139
  /** K-FOLD cross-validation assignment — the q64 content-hash split
    * generalized from one train/eval cut to k rotating folds: fold =
    * first hex digit of the normalized-text md5, bucketed 4 digits per
    * fold (k = 4 divides the 16-digit grid exactly, so folds are
    * unbiased by construction and the mapping is a pure string range
    * compare — no hex-to-int parsing to get engine-wrong). Re-runs,
    * re-shards and re-ingests never migrate a document, so every fold's
    * model sees a stable universe — the property CV needs to be
    * comparable across experiments. Reports the fold × language grid
    * with each fold's held-out share and train-size complement; the
    * assignment itself is the map-side predicate, reusable as a column.
    * Scale: one scan, |folds × langs| aggregate. Exact oracle. */
  def foldAssign(text: Column): Column = {
    val h = substring(HashFamily.normMd5(text), 1, 1)
    when(h < "4", 0).when(h < "8", 1).when(h < "c", 2).otherwise(3)
  }

  def q139KfoldAssign(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byLang = Window.partitionBy("lang")
    t(s, d, "documents")
      .select(col("lang"), foldAssign(col("text")).as("fold"))
      .groupBy("fold", "lang").agg(count(lit(1)).as("n_docs"))
      .withColumn("lang_total", sum(col("n_docs")).over(byLang))
      .select(col("fold"), col("lang"), col("n_docs"),
        (col("lang_total") - col("n_docs")).as("n_train_held_out"),
        (col("n_docs").cast("double") / col("lang_total").cast("double"))
          .as("holdout_share"))
      .orderBy("fold", "lang")
  }

  // ---------------------------------------------------------------- q159
  /** ITERATIVE BPE TRAINER — q125 counted ONE merge step; this runs the
    * actual training loop: `rounds` times, count adjacent symbol pairs
    * over the distinct pre-token table (weighted by frequency), pick the
    * argmax merge (count DESC, pair ASC — the pinned tie-break), APPLY it
    * corpus-wide, and recount. Rounds 2+ see round 1's merged symbols, so
    * the apply step — the part q125 left to "a driver loop" — is the
    * graded machinery here.
    *
    * The apply is ONE string replace per round, exact-greedy by
    * construction: pre-tokens ride in a DOUBLE-SPACE symbol encoding
    * (" a  b  c " — two spaces between symbols, one at each edge) where a
    * pair occurrence " a  b " consumes only the FIRST space of the
    * trailing boundary, so back-to-back occurrences ("a a a a" under
    * merge (a,a)) match in the same left-to-right non-overlapping scan —
    * bit-equal to the textbook greedy merge (spec proves it against a
    * symbol-list reimplementation; single-space encodings are NOT greedy:
    * the shared boundary space dies with the first match and the second
    * occurrence is skipped). Pattern alignment is unique because symbols
    * contain no spaces: a match can only start at a boundary. Spark and
    * DuckDB both implement replace as the same left-to-right scan, and
    * the oracle unrolls the full loop — counts, argmax, replace — in
    * SQL CTEs, so the apply parity is oracle-checked end to end.
    *
    * Trainer corpus: letter/number/apostrophe pre-tokens (q67's regex
    * branches) with the GPT-2-style leading space rewritten to '_' (a
    * corpus '_' would collide with the marker — acceptable for a trainer
    * statistic and identical in both engines). Scale: the corpus
    * aggregates to the Zipf-small distinct pre-token table FIRST
    * (localCheckpointed once); each round is a domain-bounded pair count
    * plus a map-side replace, and only the single argmax row ever reaches
    * the driver — the same O(1)-per-round driver traffic as the IVF
    * centroid collect. */
  /** Trainer-corpus eligibility (letter/number/apostrophe pre-tokens of
    * length ≥ 2) and the '_'-marked double-space symbol encoding — shared
    * by the trainer (q159) and the encoder (q163). */
  private val bpeTokRe = "^ ?[\\p{L}\\p{N}']+$"
  private def bpeEligible(tok: Column): Column =
    tok.rlike(bpeTokRe) && length(tok) >= 2
  private def bpeSpaced(tok: Column): Column =
    regexp_replace(regexp_replace(tok, " ", "_"), "(.)", " $1 ")

  /** The training loop: returns (round, "a b", weighted count) per merge,
    * in application order. */
  def bpeTrain(s: SparkSession, d: String, rounds: Int): Seq[(Int, String, Long)] = {
    var wf = t(s, d, "documents")
      .select(explode(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("tok"))
      .filter(bpeEligible(col("tok")))
      .select(bpeSpaced(col("tok")).as("sp"))
      .groupBy("sp").agg(count(lit(1)).as("freq"))
      .transform(graft.Transients.cut)
    val learned = Seq.newBuilder[(Int, String, Long)]
    var dry = false
    for (r <- 1 to rounds if !dry) {
      val pairs = wf
        .select(col("freq"), split(trim(col("sp")), "  ").as("syms"))
        .filter(size(col("syms")) >= 2)
        .select(col("freq"),
          explode(transform(sequence(lit(1), size(col("syms")) - 1),
            i => concat(element_at(col("syms"), i), lit(" "),
              element_at(col("syms"), i + 1)))).as("pair"))
        .groupBy("pair").agg(sum(col("freq")).as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("pair")).limit(1).collect()
      if (top.isEmpty) {
        // the corpus ran dry (empty input, or every eligible token fully
        // merged): EARLY-STOP is BPE's standard saturation semantics —
        // emit the merges learned so far, never crash the trainer
        org.slf4j.LoggerFactory.getLogger(getClass)
          .info(s"bpeTrain: corpus dry at round $r/$rounds — stopping")
        dry = true
      } else {
        val (bestPair, cnt) = (top(0).getString(0), top(0).getLong(1))
        val Array(a, b) = bestPair.split(" ", 2)
        learned += ((r, bestPair, cnt))
        wf = wf.withColumn("sp",
          replace(col("sp"), lit(s" $a  $b "), lit(s" $a$b ")))
      }
    }
    learned.result()
  }

  def q159BpeTrainer(s: SparkSession, d: String, rounds: Int = 3): DataFrame = {
    import s.implicits._
    bpeTrain(s, d, rounds).toDF("round", "pair", "merge_count")
  }

  // ---------------------------------------------------------------- q163
  /** BPE ENCODE — the other half of the tokenizer lifecycle: q159 LEARNS
    * the merge table, this APPLIES it corpus-wide and reports what
    * training pipelines actually budget by — per-document token counts
    * under the learned vocabulary, beside chars-per-token compression.
    *
    * Shape: the merge chain applies to the DISTINCT eligible pre-token
    * table (Zipf-small), as a fold of the same double-space replaces the
    * trainer used — exact-greedy per merge, in learned order; per-token
    * symbol counts then attach back to per-document occurrences by one
    * equi-join, so the corpus-sized side only ever carries (doc_id, tok).
    * Pre-tokens outside the trainer corpus (punctuation runs, single
    * chars, whitespace) fall back to their code-point count — the
    * char-level encoding a byte-level BPE gives unmerged input. Docs with
    * no pre-tokens report zero counts and a NULL ratio. Integer counts
    * end to end; the one IEEE division per row is on exact operands. */
  def q163BpeEncode(s: SparkSession, d: String, rounds: Int = 3): DataFrame = {
    val merges = bpeTrain(s, d, rounds).map(_._2)
    // spread: the GPT-2-style pre-token regexp over every document is
    // the pipeline's map-heavy stage (sf1: 10.6 s single-task unspread).
    // Its two consumers each re-run the regexp — DELIBERATE: cutting the
    // exploded pre-token table measured 1.4× slower at sf1 (9.7 → 13.5 s;
    // the r11 scan-audit's rejected case — materialization beats recompute
    // only for narrow or multi-stage intermediates)
    val pre = graft.Tables.spread(t(s, d, "documents"), "doc_id")
      .select(col("doc_id"),
        explode(regexp_extract_all(col("text"), lit(bpePattern), lit(0))).as("tok"))
    var enc = pre.select("tok").distinct()
      .filter(bpeEligible(col("tok")))
      .withColumn("sp", bpeSpaced(col("tok")))
    merges.foreach { pair =>
      val Array(a, b) = pair.split(" ", 2)
      enc = enc.withColumn("sp",
        replace(col("sp"), lit(s" $a  $b "), lit(s" $a$b ")))
    }
    val nSyms = enc.select(col("tok"),
      size(split(trim(col("sp")), "  ")).as("n_syms"))
    val perDoc = pre.join(nSyms, Seq("tok"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_pretoks"),
        sum(coalesce(col("n_syms").cast("long"), length(col("tok")).cast("long")))
          .as("n_bpe_tokens"))
    t(s, d, "documents").select(col("doc_id"), col("n_chars"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chars"),
        coalesce(col("n_pretoks"), lit(0L)).as("n_pretoks"),
        coalesce(col("n_bpe_tokens"), lit(0L)).as("n_bpe_tokens"))
      .withColumn("chars_per_bpe",
        when(col("n_bpe_tokens") > 0,
          col("n_chars").cast("double") / col("n_bpe_tokens").cast("double")))
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- q173
  /** Per-language GINI COEFFICIENT of document token counts — the corpus-
    * concentration audit (is one language's token mass dominated by a few
    * giant documents?) that drives per-language sampling and chunking
    * policy. With per-language ascending ranks i over sizes x,
    *   gini = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)
    * — every term an integer, emitted as the numerator/denominator
    * certificate (q167 discipline) plus the truncated basis-point value.
    * Rank ties (equal sizes) contribute x·Σi regardless of how doc_id
    * breaks them, so the certificate is order-stable by construction.
    *
    * Scale: ranks come from [[LayoutOps.groupedBandedRank]] — bit-length
    * bands keep a skewed language spread across (lang, band) partitions
    * instead of one single-partition window per language; the offset
    * window touches only |langs|·64 rows. One groupBy(lang) rollup after
    * that. Sums ride DECIMAL(38,0): rank·tokens products are cast before
    * summing, so 100 TB row counts keep headroom. */
  def q173GiniTokens(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec38 = DecimalType(38, 0)
    val sizes = t(s, d, "documents").select(col("lang"), col("doc_id"),
      size(tokens(col("text"))).cast("long").as("n_tokens"))
    // NULL token counts (NULL text) band to MaxValue so they rank LAST —
    // DuckDB's asc puts NULLS LAST while Spark's band window would put a
    // NULL band first (the q151 discipline)
    LayoutOps.groupedBandedRank(sizes, Seq("lang"),
        when(col("n_tokens").isNull, lit(Long.MaxValue))
          .otherwise(LayoutOps.keyBand("n_tokens")),
        Seq(col("n_tokens"), col("doc_id")), "rk")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"),
        sum(col("n_tokens").cast(dec38)).as("sum_tokens"),
        sum((col("rk").cast(dec38) * col("n_tokens").cast(dec38))).as("wsum"))
      .select(col("lang"), col("n"), col("sum_tokens"), col("wsum"),
        (lit(2L).cast(dec38) * col("wsum")
          - (col("n") + lit(1L)).cast(dec38) * col("sum_tokens")).as("gini_num"),
        (col("n").cast(dec38) * col("sum_tokens")).as("gini_den"))
      .withColumn("gini_bp", expr("(gini_num * 10000) div gini_den"))
      .orderBy("lang")
      .transform(Tables.portable)
  }

  // ---------------------------------------------------------------- q206
  /** TEXTRANK KEYWORDS — graph-based keyword extraction (Mihalcea & Tarau
    * 2004): tokens become nodes, co-occurrence within a ±2-position window
    * becomes undirected edges, and PageRank centrality ranks the terms.
    * Where q72's TF-IDF scores terms by counting, TextRank scores them by
    * STRUCTURE — a term is a keyword when it co-occurs with other central
    * terms — which is why it survives on corpora too small for IDF to
    * separate anything.
    *
    * Scale discipline: the graph is built over the TOP-V VOCABULARY only
    * (TakeOrdered top-100 by corpus frequency, (cnt desc, term) tiebreak,
    * broadcast back), so the node count is a constant and the window
    * self-join cannot quadratic-blow on long documents. Position adjacency
    * is an EQUI-join — each occurrence joins (doc_id, pos+δ) for δ∈{1,2}
    * against (doc_id, pos) — never a per-document cross product; edges
    * aggregate to at most V²/2 (u, v, count) rows map-side. Ranks then run
    * through the exact WEIGHTED integer-grid PageRank core
    * ([[GraphOps.pageRankWeightedScaled]], ppm transition probs, 10⁻¹²
    * rank units, 3 synchronous iterations — weights matter here because a
    * Zipf corpus makes the top-V co-occurrence graph near-complete, where
    * unweighted PageRank degenerates to uniform): the oracle reuses the
    * SAME unrolled-iteration SQL fragment
    * ([[GraphOps.duckPageRankWeightedIters]]) — the two cannot drift. The
    * vocab-id window is over the 100-row TakeOrdered result — bounded,
    * documented, not a data-scale sort. */
  def q206TextrankKeywords(s: SparkSession, d: String, vocabN: Int = 100,
                           iters: Int = 3, topK: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = t(s, d, "documents")
      .select(col("doc_id"), posexplode(tokens(col("text"))).as(Seq("pos", "term")))
    val vocab = toks.groupBy("term").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term")).limit(vocabN)
      .withColumn("tid",
        row_number().over(Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
    val tv = toks.join(broadcast(vocab.select("term", "tid")), "term")
      .select(col("doc_id"), col("pos"), col("tid"))
    val right = tv.select(col("doc_id").as("r_doc"), col("pos").as("rpos"),
      col("tid").as("rtid"))
    val co = Seq(1, 2).map { dlt =>
      tv.withColumn("jpos", col("pos") + dlt)
        .join(right, col("doc_id") === col("r_doc") && col("jpos") === col("rpos"))
        .select(col("tid").as("x"), col("rtid").as("y"))
    }.reduce(_ unionAll _)
    val edges = co.filter(col("x") =!= col("y"))
      .groupBy(least(col("x"), col("y")).as("u"),
        greatest(col("x"), col("y")).as("v"))
      .agg(count(lit(1)).as("w"))
    GraphOps.pageRankWeightedScaled(edges, iters)
      .join(broadcast(vocab), col("node") === col("tid"))
      .select(col("term"), col("node").as("tid"), col("cnt").as("term_freq"),
        col("r").as("rank_scaled"),
        (col("r").cast("double") / 1000000000000L).as("rank"))
      .orderBy(col("rank_scaled").desc, col("term"))
      .limit(topK)
  }

  // ---------------------------------------------------------------- q209
  /** ENCODING / CHARACTER-CLASS INTEGRITY AUDIT — the corpus-intake gate
    * that catches mojibake and binary contamination BEFORE tokenization:
    * per language, how many documents are pure ASCII, how many carry
    * C0/DEL control characters (the classic double-decode and binary-spill
    * symptoms), how many carry U+FFFD replacement characters (a decoder
    * already gave up upstream), how many extra UTF-8 continuation bytes
    * the corpus carries, and the digit/upper/punctuation density in basis
    * points (integer `div` — exact) that feeds quality scoring.
    *
    * Scale: pure map-side column expressions (codegen'd regex counts) into
    * one |langs|-row groupBy — the per-row regex cost is the only cost at
    * 100 TB, identical in shape to q33/q35. Character classes are spelled
    * as explicit ASCII ranges shared verbatim with the oracle (the q181
    * lesson: never rely on an engine's own \s / \p class definitions). */
  def q209UnicodeAudit(s: SparkSession, d: String): DataFrame =
    unicodeAuditOn(t(s, d, "documents"))

  /** The audit core over ANY (lang, text) frame -- factored out so the spec
    * can feed planted mojibake/control/non-ASCII fixtures. */
  private[graft] def unicodeAuditOn(docs: DataFrame): DataFrame = {
    val txt = col("text")
    val nC = length(txt).cast("long")
    val isAscii = txt.rlike("^[\\x00-\\x7F]*$")
    val hasCtrl = txt.rlike("[\\x00-\\x08\\x0E-\\x1F\\x7F]")
    val hasRepl = txt.contains("\uFFFD")
    def nOf(cls: String) = (length(txt) - length(regexp_replace(txt, cls, ""))).cast("long")
    docs
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(nC).as("n_chars"),
        sum(when(isAscii, 1L).otherwise(0L)).as("n_ascii_docs"),
        sum(when(hasCtrl, 1L).otherwise(0L)).as("n_ctrl_docs"),
        sum(when(hasRepl, 1L).otherwise(0L)).as("n_repl_docs"),
        sum((octet_length(encode(txt, "UTF-8")) - length(txt)).cast("long"))
          .as("extra_utf8_bytes"),
        sum(nOf("[0-9]")).as("n_digit"),
        sum(nOf("[A-Z]")).as("n_upper"),
        sum(nOf("[!-/:-@\\[-`{-~]")).as("n_punct"),
        sum(nOf("[aeiou]")).as("n_vowel"),
        sum(nOf("[ ]")).as("n_space"))
      .select(col("lang"), col("n_docs"), col("n_chars"), col("n_ascii_docs"),
        col("n_ctrl_docs"), col("n_repl_docs"), col("extra_utf8_bytes"),
        expr("(10000 * n_digit) div n_chars").as("digit_bp"),
        expr("(10000 * n_upper) div n_chars").as("upper_bp"),
        expr("(10000 * n_punct) div n_chars").as("punct_bp"),
        expr("(10000 * n_vowel) div n_chars").as("vowel_bp"),
        expr("(10000 * n_space) div n_chars").as("space_bp"))
      .orderBy("lang")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q224_skipgram_cooc" -> ((s: SparkSession, d: String) => q224SkipgramCooc(s, d)),
    "q237_preference_pairs" -> ((s: SparkSession, d: String) => q237PreferencePairs(s, d)),
    "q238_padding_waste" -> (q238PaddingWaste _),
    "q206_textrank_keywords" -> ((s: SparkSession, d: String) => q206TextrankKeywords(s, d)),
    "q209_unicode_audit" -> (q209UnicodeAudit _),
    "q173_gini_tokens" -> (q173GiniTokens _),
    "q163_bpe_encode" -> ((s: SparkSession, d: String) => q163BpeEncode(s, d)),
    "q159_bpe_trainer" -> ((s: SparkSession, d: String) => q159BpeTrainer(s, d)),
    "q139_kfold_assign" -> (q139KfoldAssign _),
    "q125_bpe_merges" -> ((s: SparkSession, d: String) => q125BpeMerges(s, d)),
    "q126_repetition_stats" -> ((s: SparkSession, d: String) => q126RepetitionStats(s, d)),
    "q127_ppl_buckets" -> ((s: SparkSession, d: String) => q127PplBuckets(s, d)),
    "q118_skyline" -> (q118Skyline _),
    "q111_mixture_weights" -> ((s: SparkSession, d: String) => q111MixtureWeights(s, d)),
    "q109_lm_doc_score" -> (q109LmDocScore _),
    "q100_vocab_coverage" -> (q100VocabCoverage _),
    "q101_bigram_lm" -> (q101BigramLm _),
    "q102_contamination" -> (q102Contamination _),
    "q96_group_sample" -> ((s: SparkSession, d: String) => q96GroupSample(s, d)),
    "q89_inverted_index" -> ((s: SparkSession, d: String) => q89InvertedIndex(s, d)),
    "q90_token_pmi" -> ((s: SparkSession, d: String) => q90TokenPmi(s, d)),
    "q30_dedup_exact" -> (q30DedupExact _),
    "q31_distinct_rows" -> (q31DistinctRows _),
    "q32_text_tokens" -> (q32TextTokens _),
    "q33_text_quality" -> (q33TextQuality _),
    "q34_fingerprint" -> (q34Fingerprint _),
    "q35_lang_id" -> (q35LangId _),
    "q62_rolling_fingerprint" -> (q62RollingFingerprint _),
    "q64_hash_split" -> (q64HashSplit _),
    "q181_curation_funnel" -> ((s: SparkSession, d: String) => q181CurationFunnel(s, d)),
    "q188_weighted_quantiles" -> (q188WeightedQuantiles _),
    "q65_stratified_sample" -> (q65StratifiedSample _),
    "q67_bpe_tokens" -> (q67BpeTokens _),
    "q69_pack_sequences" -> ((s: SparkSession, d: String) => q69PackSequences(s, d)),
    "q70_quality_prune" -> ((s: SparkSession, d: String) => q70QualityPrune(s, d)),
    "q72_tfidf_terms" -> ((s: SparkSession, d: String) => q72TfidfTerms(s, d)),
    "q74_doc_chunks" -> ((s: SparkSession, d: String) => q74DocChunks(s, d)),
    "q144_dup_spans" -> ((s: SparkSession, d: String) => q144DupSpans(s, d)),
    "q149_bm25" -> ((s: SparkSession, d: String) => q149Bm25(s, d)),
    "q151_rank_fusion" -> ((s: SparkSession, d: String) => q151RankFusion(s, d)),
    "q78_pii_scrub" -> (q78PiiScrub _),
    "q84_weighted_sample" -> (q84WeightedSample _))

  private def duckToks = "regexp_split_to_array(trim(lower(text)), '[ \\t\\n\\x0B\\f\\r]+')"

  /** SQL twin of [[lmPerDocNll]] — the CTE chain shared by the q109 and
    * q127 oracles, ending in `per(doc_id, n_bigrams, s)`. */
  private def duckLmPerDoc: String =
    s"""toks AS (SELECT doc_id, $duckToks AS t FROM documents),
       |bg AS (
       | SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
       | FROM toks, unnest(range(1, len(t))) AS u(i)),
       |cnt AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
       |heads AS (SELECT w1, CAST(sum(n) AS BIGINT) AS head_n FROM cnt GROUP BY 1),
       |voc AS (SELECT count(DISTINCT tok) AS v
       |  FROM (SELECT unnest(t) AS tok FROM toks)),
       |nll AS (
       | SELECT c.w1, c.w2,
       |  CAST(round(ln(CAST(h.head_n + voc.v AS DOUBLE)
       |      / CAST(c.n + 1 AS DOUBLE)), 6) AS DECIMAL(18,6)) AS nll
       | FROM cnt c JOIN heads h USING (w1) CROSS JOIN voc),
       |dbg AS (SELECT doc_id, w1, w2, count(*) AS m FROM bg GROUP BY 1, 2, 3),
       |per AS (
       | SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_bigrams,
       |  sum(m * nll.nll) AS s
       | FROM dbg JOIN nll USING (w1, w2) GROUP BY doc_id)""".stripMargin

  /** SQL twin of [[qualityScore]] — one fragment shared by the q33 and q70
    * oracles, so the engine-side helper and both oracles move together. */
  private[ops] def duckQualityScore: String =
    s"""round(0.5 * (CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars)
       |   + 0.5 * (1.0 - CAST(len(list_filter($duckToks, x -> x = 'the' OR x = 'a' OR x = 'of')) AS DOUBLE)
       |       / len($duckToks)), 4)""".stripMargin

  /** Shared CTE chain for the q159/q163 oracles: pre-tokens, the marked
    * double-space trainer corpus w0, and 3 unrolled (count, argmax b$r,
    * replace → w$r) training rounds. */
  private lazy val duckBpeCtes: String = {
    val pat = bpePattern.replace("'", "''")
    val roundCtes = (1 to 3).map { r =>
      s"""p$r AS (
         | SELECT t.arr[i.i] || ' ' || t.arr[i.i + 1] AS pair,
         |  CAST(sum(freq) AS BIGINT) AS cnt
         | FROM (SELECT string_split(trim(sp), '  ') AS arr, freq
         |       FROM w${r - 1}) t,
         |      unnest(range(1, len(t.arr))) AS i(i)
         | GROUP BY 1),
         |b$r AS (
         | SELECT pair, cnt, string_split(pair, ' ')[1] AS a,
         |  string_split(pair, ' ')[2] AS b
         | FROM p$r ORDER BY cnt DESC, pair LIMIT 1),
         |w$r AS (
         | SELECT replace(sp, ' ' || b.a || '  ' || b.b || ' ',
         |   ' ' || b.a || b.b || ' ') AS sp, freq
         | FROM w${r - 1} CROSS JOIN b$r b)""".stripMargin
    }.mkString(",\n")
    s"""pt AS (
       | SELECT unnest(regexp_extract_all(text, '$pat')) AS tok FROM documents),
       |w0 AS (
       | SELECT regexp_replace(replace(tok, ' ', '_'), '(.)', ' \\1 ', 'g') AS sp,
       |  count(*) AS freq
       | FROM pt
       | WHERE regexp_matches(tok, '^ ?[\\p{L}\\p{N}'']+$$') AND length(tok) >= 2
       | GROUP BY 1),
       |$roundCtes""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    // TextRank: same top-100 vocab cut, same ±2-window equi-adjacency, and
    // LITERALLY the same unrolled weighted integer-grid PageRank fragment
    // (GraphOps.duckPageRankWeightedIters) as the engine core — shared
    // text, cannot drift
    "q206_textrank_keywords" ->
      s"""WITH toksr AS MATERIALIZED (
         | SELECT doc_id, CAST(u.i AS BIGINT) AS pos, t[u.i] AS term
         | FROM (SELECT doc_id, $duckToks AS t FROM documents) d,
         | LATERAL unnest(range(1, len(t) + 1)) u(i)),
         |v0 AS (SELECT term, count(*) AS cnt FROM toksr GROUP BY 1
         | ORDER BY cnt DESC, term LIMIT 100),
         |vocab AS MATERIALIZED (
         | SELECT term, CAST(cnt AS BIGINT) AS cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, term) AS BIGINT) AS tid
         | FROM v0),
         |tv AS MATERIALIZED (
         | SELECT t.doc_id, t.pos, v.tid FROM toksr t JOIN vocab v USING (term)),
         |pr AS (
         | SELECT l.tid AS x, r.tid AS y FROM tv l JOIN tv r
         |  ON l.doc_id = r.doc_id AND (r.pos = l.pos + 1 OR r.pos = l.pos + 2)),
         |capped AS MATERIALIZED (
         | SELECT least(x, y) AS u, greatest(x, y) AS v,
         |  CAST(count(*) AS BIGINT) AS w
         | FROM pr WHERE x <> y GROUP BY 1, 2),
         |adj AS MATERIALIZED (
         | SELECT u, v, w FROM capped UNION ALL SELECT v, u, w FROM capped),
         |wt AS (SELECT u, CAST(sum(w) AS BIGINT) AS wtot FROM adj GROUP BY u),
         |a AS MATERIALIZED (
         | SELECT adj.u, adj.v, (1000000 * adj.w) // wt.wtot AS p
         | FROM adj JOIN wt ON adj.u = wt.u),
         |nodes AS MATERIALIZED (SELECT u FROM wt),
         |nn AS (SELECT count(*) AS n FROM nodes),
         |r0 AS (SELECT u AS node, 1000000000000 // n AS r FROM nodes CROSS JOIN nn),
         |${GraphOps.duckPageRankWeightedIters}
         |SELECT v.term, r3.node AS tid, v.cnt AS term_freq,
         | CAST(r3.r AS BIGINT) AS rank_scaled,
         | CAST(r3.r AS DOUBLE) / 1000000000000 AS rank
         |FROM r3 JOIN vocab v ON v.tid = r3.node
         |ORDER BY rank_scaled DESC, term LIMIT 25""".stripMargin,
    // explicit ASCII ranges on both sides (never an engine's own \s or
    // \p class); DuckDB regexp_replace needs the 'g' flag, full-string
    // ascii check via regexp_full_match vs Spark's anchored rlike
    "q209_unicode_audit" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(length(text)) AS BIGINT) AS n_chars,
        | CAST(sum(CASE WHEN regexp_full_match(text, '[\x00-\x7f]*')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_ascii_docs,
        | CAST(sum(CASE WHEN regexp_matches(text, '[\x00-\x08\x0e-\x1f\x7f]')
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_ctrl_docs,
        | CAST(sum(CASE WHEN strpos(text, chr(65533)) > 0
        |   THEN 1 ELSE 0 END) AS BIGINT) AS n_repl_docs,
        | CAST(sum(octet_length(encode(text)) - length(text)) AS BIGINT)
        |   AS extra_utf8_bytes,
        | CAST((10000 * sum(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))))
        |   // sum(length(text)) AS BIGINT) AS digit_bp,
        | CAST((10000 * sum(length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))))
        |   // sum(length(text)) AS BIGINT) AS upper_bp,
        | CAST((10000 * sum(length(text) - length(regexp_replace(text, '[!-/:-@\[-`{-~]', '', 'g'))))
        |   // sum(length(text)) AS BIGINT) AS punct_bp,
        | CAST((10000 * sum(length(text) - length(regexp_replace(text, '[aeiou]', '', 'g'))))
        |   // sum(length(text)) AS BIGINT) AS vowel_bp,
        | CAST((10000 * sum(length(text) - length(regexp_replace(text, '[ ]', '', 'g'))))
        |   // sum(length(text)) AS BIGINT) AS space_bp
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    // the identical Rabin-Karp fold over the identical md5-derived 48-bit
    // token ints: list_reduce with a prepended 0 accumulator ≡ Spark's
    // aggregate(toks, 0L, ...); every intermediate < 2^36, exact int64
    "q62_rolling_fingerprint" ->
      """WITH tk AS (
        | SELECT doc_id, regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+') AS t
        | FROM documents),
        |h AS (
        | SELECT doc_id,
        |  list_transform(t, g -> CAST(('0x' || substr(md5(g), 1, 12)) AS BIGINT))
        |    AS hs
        | FROM tk)
        |SELECT doc_id,
        | CASE WHEN hs IS NOT NULL THEN list_reduce(
        |   list_prepend(CAST(0 AS BIGINT),
        |     list_transform(hs, x -> x % 2147483647)),
        |   (acc, x) -> (acc * 31 + x) % 2147483647) END AS fp_rolling,
        | list_min(hs) AS fp_min_token
        |FROM h ORDER BY doc_id""".stripMargin,
    // the oracle's per-lang single-window rank is semantically identical
    // to the engine's grouped banded rank (bit-length monotonicity);
    // HUGEINT certificate math, `//` ≡ `div` (both truncate)
    "q173_gini_tokens" ->
      """WITH tk AS (
        | SELECT lang, doc_id,
        |  CAST(len(regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+')) AS BIGINT)
        |    AS n_tokens
        | FROM documents),
        |r AS (
        | SELECT lang, n_tokens,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id)
        |    AS BIGINT) AS rk
        | FROM tk),
        |a AS (
        | SELECT lang, count(*) AS n,
        |  CAST(sum(CAST(n_tokens AS HUGEINT)) AS DECIMAL(38,0)) AS sum_tokens,
        |  CAST(sum(CAST(rk AS HUGEINT) * n_tokens) AS DECIMAL(38,0)) AS wsum
        | FROM r GROUP BY lang)
        |SELECT lang, n, CAST(sum_tokens AS VARCHAR) AS sum_tokens,
        | CAST(wsum AS VARCHAR) AS wsum,
        | CAST(2 * CAST(wsum AS HUGEINT)
        |   - (CAST(n AS HUGEINT) + 1) * CAST(sum_tokens AS HUGEINT)
        |   AS VARCHAR) AS gini_num,
        | CAST(CAST(n AS HUGEINT) * CAST(sum_tokens AS HUGEINT)
        |   AS VARCHAR) AS gini_den,
        | CAST((2 * CAST(wsum AS HUGEINT)
        |    - (CAST(n AS HUGEINT) + 1) * CAST(sum_tokens AS HUGEINT)) * 10000
        |   // (CAST(n AS HUGEINT) * CAST(sum_tokens AS HUGEINT)) AS BIGINT)
        |   AS gini_bp
        |FROM a ORDER BY lang""".stripMargin,
    "q159_bpe_trainer" ->
      s"""WITH $duckBpeCtes
         |SELECT CAST(1 AS INT) AS round, pair, cnt AS merge_count FROM b1
         |UNION ALL SELECT CAST(2 AS INT), pair, cnt FROM b2
         |UNION ALL SELECT CAST(3 AS INT), pair, cnt FROM b3
         |ORDER BY round""".stripMargin,
    "q163_bpe_encode" -> {
      val pat = bpePattern.replace("'", "''")
      s"""WITH $duckBpeCtes,
         |tk AS (
         | SELECT DISTINCT tok FROM pt
         | WHERE regexp_matches(tok, '^ ?[\\p{L}\\p{N}'']+$$') AND length(tok) >= 2),
         |e0 AS (
         | SELECT tok,
         |  regexp_replace(replace(tok, ' ', '_'), '(.)', ' \\1 ', 'g') AS sp
         | FROM tk),
         |e1 AS (SELECT tok, replace(sp, ' ' || b.a || '  ' || b.b || ' ',
         |  ' ' || b.a || b.b || ' ') AS sp FROM e0 CROSS JOIN b1 b),
         |e2 AS (SELECT tok, replace(sp, ' ' || b.a || '  ' || b.b || ' ',
         |  ' ' || b.a || b.b || ' ') AS sp FROM e1 CROSS JOIN b2 b),
         |e3 AS (SELECT tok, replace(sp, ' ' || b.a || '  ' || b.b || ' ',
         |  ' ' || b.a || b.b || ' ') AS sp FROM e2 CROSS JOIN b3 b),
         |enc AS (
         | SELECT tok, len(string_split(trim(sp), '  ')) AS n_syms FROM e3),
         |ptd AS (
         | SELECT doc_id, unnest(regexp_extract_all(text, '$pat')) AS tok
         | FROM documents),
         |pd AS (
         | SELECT ptd.doc_id, CAST(count(*) AS BIGINT) AS n_pretoks,
         |  CAST(sum(coalesce(enc.n_syms, length(ptd.tok))) AS BIGINT)
         |   AS n_bpe_tokens
         | FROM ptd LEFT JOIN enc ON ptd.tok = enc.tok GROUP BY 1)
         |SELECT d.doc_id, d.n_chars,
         | coalesce(pd.n_pretoks, 0) AS n_pretoks,
         | coalesce(pd.n_bpe_tokens, 0) AS n_bpe_tokens,
         | CASE WHEN coalesce(pd.n_bpe_tokens, 0) > 0
         |  THEN CAST(d.n_chars AS DOUBLE) / CAST(pd.n_bpe_tokens AS DOUBLE)
         | END AS chars_per_bpe
         |FROM documents d LEFT JOIN pd ON d.doc_id = pd.doc_id
         |ORDER BY d.doc_id""".stripMargin
    },
    "q125_bpe_merges" -> {
      val pat = bpePattern.replace("'", "''")
      s"""WITH pt AS (
         | SELECT unnest(regexp_extract_all(text, '$pat')) AS tok FROM documents),
         |wf AS (
         | SELECT tok, count(*) AS freq FROM pt GROUP BY 1 HAVING length(tok) >= 2),
         |pr AS (
         | SELECT substr(tok, i, 2) AS pair, freq
         | FROM wf, unnest(range(1, length(tok))) AS u(i))
         |SELECT pair, CAST(sum(freq) AS BIGINT) AS merge_count
         |FROM pr GROUP BY 1
         |ORDER BY merge_count DESC, pair LIMIT 50""".stripMargin
    },
    "q127_ppl_buckets" ->
      s"""WITH $duckLmPerDoc,
         |pp AS (
         | SELECT d.doc_id, d.lang, per.n_bigrams, per.s,
         |  CAST(per.s AS DOUBLE) / CAST(per.n_bigrams AS DOUBLE) AS avg_nll
         | FROM documents d JOIN per USING (doc_id)),
         |b AS (
         | SELECT lang, doc_id, n_bigrams, s, avg_nll,
         |  CAST(ntile(3) OVER (PARTITION BY lang ORDER BY avg_nll, doc_id)
         |    AS INT) AS bucket
         | FROM pp)
         |SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
         | CAST(sum(n_bigrams) AS BIGINT) AS n_bigrams,
         | CAST(sum(s) AS DOUBLE) / CAST(CAST(sum(n_bigrams) AS BIGINT) AS DOUBLE)
         |   AS bucket_nll,
         | min(avg_nll) AS min_nll, max(avg_nll) AS max_nll
         |FROM b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q126_repetition_stats" ->
      s"""WITH tk AS (SELECT doc_id, $duckToks AS t FROM documents),
         |g AS (
         | SELECT doc_id, CAST(len(t) AS INT) AS n_tokens,
         |  CASE WHEN len(t) >= 2 THEN list_transform(range(1, len(t)),
         |    i -> t[i] || ' ' || t[i + 1]) ELSE CAST([] AS VARCHAR[]) END AS g2,
         |  CASE WHEN len(t) >= 3 THEN list_transform(range(1, len(t) - 1),
         |    i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
         |   ELSE CAST([] AS VARCHAR[]) END AS g3
         | FROM tk),
         |t2 AS (
         | SELECT doc_id, max(c) AS top2 FROM (
         |  SELECT doc_id, count(*) AS c FROM (
         |   SELECT doc_id, unnest(g2) AS gram FROM g) GROUP BY doc_id, gram)
         | GROUP BY doc_id),
         |f AS (
         | SELECT g.doc_id, n_tokens,
         |  CASE WHEN len(g2) > 0 THEN round(
         |   CAST(len(g2) - len(list_distinct(g2)) AS DOUBLE) / len(g2), 4)
         |   END AS frac_dup_2gram,
         |  CASE WHEN len(g2) > 0 THEN round(
         |   CAST(t2.top2 AS DOUBLE) / len(g2), 4) END AS frac_top_2gram,
         |  CASE WHEN len(g3) > 0 THEN round(
         |   CAST(len(g3) - len(list_distinct(g3)) AS DOUBLE) / len(g3), 4)
         |   END AS frac_dup_3gram
         | FROM g LEFT JOIN t2 ON g.doc_id = t2.doc_id)
         |SELECT doc_id, n_tokens, frac_dup_2gram, frac_top_2gram, frac_dup_3gram,
         | coalesce(frac_top_2gram > 0.18, false)
         |  OR coalesce(frac_dup_3gram > 0.30, false) AS flagged
         |FROM f ORDER BY doc_id""".stripMargin,
    "q118_skyline" ->
      s"""WITH s0 AS (
        | SELECT doc_id, $duckQualityScore AS quality, n_chars
        | FROM documents),
        |s AS (SELECT * FROM s0 WHERE quality IS NOT NULL)
        |SELECT doc_id, quality, n_chars FROM s a
        |WHERE NOT EXISTS (
        | SELECT 1 FROM s b
        | WHERE b.quality >= a.quality AND b.n_chars >= a.n_chars
        |  AND (b.quality > a.quality OR b.n_chars > a.n_chars))
        |ORDER BY quality DESC, doc_id""".stripMargin,
    "q111_mixture_weights" ->
      """WITH bs AS (SELECT source, count(*) AS c_s FROM documents GROUP BY 1),
        |w AS (
        | SELECT source, c_s,
        |  CASE WHEN (w0 + 1) * (w0 + 1) <= c_s THEN w0 + 1
        |       WHEN w0 * w0 > c_s THEN w0 - 1 ELSE w0 END AS w_s
        | FROM (SELECT source, c_s,
        |    CAST(floor(sqrt(CAST(c_s AS DOUBLE))) AS BIGINT) AS w0 FROM bs)),
        |tot AS (SELECT CAST(sum(c_s) AS BIGINT) AS n_total,
        |  CAST(sum(w_s) AS BIGINT) AS w_total FROM w),
        |thr AS (
        | SELECT source, c_s, w_s,
        |  ((((n_total // 4) * 65536) // w_total) * w_s) // c_s AS thr
        | FROM w CROSS JOIN tot),
        |k AS (
        | SELECT d.source, thr.c_s, thr.w_s, thr.thr,
        |  CASE WHEN thr.thr >= 65536 OR substr(md5('graft-mix-42:'
        |     || regexp_replace(lower(d.text), '[ \t\n\x0B\f\r]+', ' ', 'g')), 1, 4)
        |     < printf('%04x', thr.thr) THEN 1 END AS kept
        | FROM documents d JOIN thr USING (source))
        |SELECT source, c_s AS n_docs, w_s AS weight,
        | count(kept) AS n_sampled,
        | CAST(count(kept) AS DOUBLE) / CAST(c_s AS DOUBLE) AS realized_rate,
        | CAST(least(thr, 65536) AS DOUBLE) / 65536.0 AS target_rate
        |FROM k GROUP BY source, c_s, w_s, thr
        |ORDER BY source""".stripMargin,
    "q109_lm_doc_score" ->
      s"""WITH $duckLmPerDoc
         |SELECT d.doc_id, coalesce(per.n_bigrams, 0) AS n_bigrams,
         | coalesce(CAST(per.s AS DOUBLE), 0.0) AS sum_nll,
         | CASE WHEN per.n_bigrams > 0
         |   THEN CAST(per.s AS DOUBLE) / CAST(per.n_bigrams AS DOUBLE) END
         |   AS avg_nll
         |FROM documents d LEFT JOIN per USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q100_vocab_coverage" ->
      s"""WITH tok AS (
         | SELECT lang, unnest($duckToks) AS token FROM documents),
         |cnt AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY 1, 2),
         |r AS (
         | SELECT lang, token, n,
         |  CAST(row_number() OVER w AS INT) AS rk,
         |  sum(n) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |  sum(n) OVER (PARTITION BY lang) AS total
         | FROM cnt
         | WINDOW w AS (PARTITION BY lang ORDER BY n DESC, token))
         |SELECT lang, token, n, rk,
         | CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) AS cum_share
         |FROM r ORDER BY lang, rk""".stripMargin,
    // top-vs-bottom pairing on the shared 4-dp quality score; bottom rank
    // is the exact reverse order, margins are differences of identical
    // rounded doubles
    "q237_preference_pairs" ->
      s"""WITH sc0 AS (
         | SELECT doc_id, lang, $duckQualityScore AS q FROM documents),
         |sc AS (SELECT * FROM sc0 WHERE q IS NOT NULL),
         |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n FROM sc
         |      GROUP BY 1),
         |top AS (
         | SELECT lang, doc_id, q,
         |  CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY q DESC, doc_id) AS INT) AS i
         | FROM sc),
         |bot AS (
         | SELECT lang, doc_id, q,
         |  CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY q ASC, doc_id DESC) AS INT) AS i
         | FROM sc)
         |SELECT t.lang, t.i AS pair_rank, t.doc_id AS chosen_id,
         | b.doc_id AS rejected_id, t.q AS q_chosen, b.q AS q_rejected,
         | round(t.q - b.q, 4) AS margin
         |FROM top t
         |JOIN bot b ON t.lang = b.lang AND t.i = b.i
         |JOIN n ON n.lang = t.lang
         |WHERE t.i <= 10 AND t.i <= n.n // 2
         |ORDER BY t.lang, pair_rank""".stripMargin,
    // same power-of-two bucket via bitlength (length(bin(n-1))) — integer
    // bit math in both engines, waste in integer basis points
    "q238_padding_waste" ->
      """WITH d AS (
        | SELECT CAST(coalesce(len(list_filter(
        |   regexp_split_to_array(trim(lower(text)), '[ \t\n\x0B\f\r]+'),
        |   t -> t <> '')), 0) AS BIGINT) AS n_tok
        | FROM documents),
        |b AS (
        | SELECT n_tok,
        |  CASE WHEN n_tok <= 1 THEN 1
        |   ELSE CAST(1 AS BIGINT) << length(bin(n_tok - 1)) END
        |   AS bucket_len
        | FROM d)
        |SELECT bucket_len, CAST(count(*) AS BIGINT) AS n_docs,
        | CAST(sum(n_tok) AS BIGINT) AS real_tokens,
        | bucket_len * CAST(count(*) AS BIGINT) AS padded_tokens,
        | (bucket_len * CAST(count(*) AS BIGINT) - CAST(sum(n_tok) AS BIGINT))
        |   * 10000 // (bucket_len * CAST(count(*) AS BIGINT)) AS waste_bp
        |FROM b GROUP BY bucket_len ORDER BY bucket_len""".stripMargin,
    // positions assigned before the vocab filter in both engines; the
    // distance weight 6/d stays on the integer grid (6, 3, 2)
    "q224_skipgram_cooc" ->
      s"""WITH toks AS (SELECT doc_id, $duckToks AS t FROM documents),
         |pos AS (
         | SELECT doc_id, unnest(t) AS term,
         |  unnest(range(1, len(t) + 1)) AS pos
         | FROM toks),
         |pf AS (SELECT * FROM pos WHERE term <> ''),
         |vocab AS (SELECT term FROM pf GROUP BY term
         |          ORDER BY count(*) DESC, term LIMIT 30),
         |tv AS (SELECT p.doc_id, p.pos, p.term
         |       FROM pf p JOIN vocab v USING (term)),
         |ds AS (SELECT unnest([1, 2, 3]) AS dist),
         |pr AS (
         | SELECT a.left_term, b.term AS right_term, a.dist
         | FROM (SELECT doc_id, pos + dist AS rpos, term AS left_term, dist
         |       FROM tv CROSS JOIN ds) a
         | JOIN tv b ON a.doc_id = b.doc_id AND a.rpos = b.pos)
         |SELECT left_term, right_term,
         | CAST(count(*) AS BIGINT) AS n_cooc,
         | CAST(sum(6 // dist) AS BIGINT) AS w6
         |FROM pr GROUP BY 1, 2
         |ORDER BY w6 DESC, left_term, right_term LIMIT 50""".stripMargin,
    "q101_bigram_lm" ->
      s"""WITH toks AS (SELECT $duckToks AS t FROM documents),
         |bg AS (
         | SELECT t[i] AS w1, t[i + 1] AS w2
         | FROM toks, unnest(range(1, len(t))) AS u(i)),
         |cnt AS (SELECT w1, w2, count(*) AS n FROM bg GROUP BY 1, 2),
         |heads AS (
         | SELECT w1, CAST(sum(n) AS BIGINT) AS head_n,
         |  row_number() OVER (ORDER BY sum(n) DESC, w1) AS hrk
         | FROM cnt GROUP BY 1),
         |top AS (
         | SELECT c.w1, c.w2, c.n, h.head_n,
         |  CAST(row_number() OVER (PARTITION BY c.w1
         |    ORDER BY c.n DESC, c.w2) AS INT) AS crk
         | FROM cnt c JOIN heads h ON c.w1 = h.w1 AND h.hrk <= 20)
         |SELECT w1, w2, n, crk,
         | CAST(n AS DOUBLE) / CAST(head_n AS DOUBLE) AS cond_p
         |FROM top WHERE crk <= 3 ORDER BY w1, crk""".stripMargin,
    "q96_group_sample" ->
      """WITH h AS (
        | SELECT lang, md5('graft-ksample-42:'
        |    || regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS h,
        |  doc_id, n_chars
        | FROM documents),
        |r AS (SELECT lang, h, doc_id, n_chars,
        |  CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rk
        | FROM h)
        |SELECT lang, h, doc_id, n_chars, rk FROM r WHERE rk <= 10
        |ORDER BY lang, rk""".stripMargin,
    "q89_inverted_index" ->
      s"""WITH pairs AS (SELECT DISTINCT doc_id, term FROM (
         |  SELECT doc_id, unnest($duckToks) AS term FROM documents)),
         |r AS (SELECT term, doc_id,
         |  row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn FROM pairs)
         |SELECT term, count(*) AS df,
         | string_agg(CASE WHEN rn <= 20 THEN CAST(doc_id AS VARCHAR) END,
         |   ',' ORDER BY doc_id) AS postings_head
         |FROM r GROUP BY term ORDER BY df DESC, term LIMIT 50""".stripMargin,
    "q90_token_pmi" ->
      s"""WITH pairs AS (SELECT DISTINCT doc_id, term FROM (
         |  SELECT doc_id, unnest($duckToks) AS term FROM documents)),
         |v AS (SELECT term, count(*) AS c FROM pairs GROUP BY term
         |  ORDER BY c DESC, term LIMIT 50),
         |tv AS (SELECT p.doc_id, p.term, v.c FROM pairs p JOIN v USING (term)),
         |co AS (SELECT x.term AS term_a, y.term AS term_b,
         |  x.c AS c_a, y.c AS c_b, count(*) AS c_ab
         |  FROM tv x JOIN tv y ON x.doc_id = y.doc_id AND x.term < y.term
         |  GROUP BY 1, 2, 3, 4),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (SELECT term_a, term_b, c_a, c_b, c_ab,
         |  CAST(round(ln(CAST(c_ab * n_docs AS DOUBLE)
         |    / CAST(c_a * c_b AS DOUBLE)), 6) AS DECIMAL(18,6)) AS pmi_d
         |  FROM co CROSS JOIN n)
         |SELECT term_a, term_b, c_a, c_b, c_ab, CAST(pmi_d AS DOUBLE) AS pmi
         |FROM sc ORDER BY pmi_d DESC, term_a, term_b LIMIT 30""".stripMargin,
    "q30_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
        | CAST(length(text) AS INT) AS text_len
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "q31_distinct_rows" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q32_text_tokens" ->
      s"""SELECT doc_id,
         | CAST(len($duckToks) AS INT) AS n_tokens,
         | CAST(len(list_distinct($duckToks)) AS INT) AS n_unique,
         | round(CAST(length(regexp_replace(text, '[ \\t\\n\\x0B\\f\\r]+', '', 'g')) AS DOUBLE)
         |   / len($duckToks), 4) AS avg_word_len
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q33_text_quality" ->
      s"""SELECT doc_id, n_chars,
         | CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS INT) AS n_alpha,
         | CAST(len(list_filter($duckToks, x -> x = 'the' OR x = 'a' OR x = 'of')) AS INT) AS n_stop,
         | round(CAST(length(regexp_replace(text, '[^a-z]', '', 'g')) AS DOUBLE) / n_chars, 4) AS alpha_ratio,
         | round(CAST(len(list_filter($duckToks, x -> x = 'the' OR x = 'a' OR x = 'of')) AS DOUBLE)
         |   / len($duckToks), 4) AS stop_ratio,
         | $duckQualityScore AS quality_score
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q34_fingerprint" ->
      """SELECT doc_id,
        | md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')) AS fp_md5,
        | sha256(text) AS fp_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q102_contamination" ->
      s"""WITH sh AS (
         | SELECT doc_id,
         |  CASE WHEN substr(md5(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), 1, 1) < 'c'
         |       THEN 'train' ELSE 'eval' END AS split,
         |  list_distinct(list_transform(
         |    range(0, greatest(len($duckToks) - 3, 0) + 1),
         |    i -> array_to_string($duckToks[i+1:i+3], ' '))) AS grams
         | FROM documents),
         |g AS (SELECT doc_id, split, unnest(grams) AS gram FROM sh),
         |tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
         |ev AS (SELECT doc_id, gram FROM g WHERE split = 'eval'),
         |h AS (
         | SELECT doc_id, count(*) AS n_hit FROM ev
         | WHERE gram IN (SELECT gram FROM tr) GROUP BY doc_id),
         |tot AS (SELECT doc_id, count(*) AS n_grams FROM ev GROUP BY doc_id)
         |SELECT t.doc_id, t.n_grams, coalesce(h.n_hit, 0) AS n_hit,
         | CAST(coalesce(h.n_hit, 0) AS DOUBLE) / CAST(t.n_grams AS DOUBLE)
         |   AS contaminated_share
         |FROM tot t LEFT JOIN h USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q139_kfold_assign" ->
      """WITH s AS (
        | SELECT lang,
        |  CASE WHEN h < '4' THEN 0 WHEN h < '8' THEN 1
        |       WHEN h < 'c' THEN 2 ELSE 3 END AS fold
        | FROM (SELECT lang,
        |   substr(md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), 1, 1) AS h
        |  FROM documents)),
        |g AS (SELECT fold, lang, count(*) AS n_docs FROM s GROUP BY 1, 2)
        |SELECT fold, lang, n_docs,
        | CAST(sum(n_docs) OVER (PARTITION BY lang) - n_docs AS BIGINT)
        |   AS n_train_held_out,
        | CAST(n_docs AS DOUBLE)
        |   / CAST(CAST(sum(n_docs) OVER (PARTITION BY lang) AS BIGINT) AS DOUBLE)
        |   AS holdout_share
        |FROM g ORDER BY fold, lang""".stripMargin,
    // same (lang, length) weight grid, per-language cumulative, ceiling
    // thresholds and conditional-min picks — all integer
    "q188_weighted_quantiles" -> {
      val qsSel = Seq(25, 50, 75, 90).map { p =>
        s"min(CASE WHEN cw >= ($p * tw + 99) // 100 THEN v END) AS q$p"
      }.mkString(",\n ")
      s"""WITH grid AS (
         | SELECT lang, CAST(len($duckToks) AS BIGINT) AS v,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CAST(len($duckToks) AS BIGINT)) AS BIGINT) AS w
         | FROM documents GROUP BY 1, 2),
         |cum AS (
         | SELECT lang, v, n_docs,
         |  CAST(sum(w) OVER (PARTITION BY lang ORDER BY v
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
         |  CAST(sum(w) OVER (PARTITION BY lang) AS BIGINT) AS tw
         | FROM grid)
         |SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_docs,
         | any_value(tw) AS total_tokens,
         | $qsSel
         |FROM cum GROUP BY lang ORDER BY lang""".stripMargin
    },
    // same one-pass stage folds, md5-keyed min-struct dedup and
    // hash-derived split; struct_pack min ≡ Spark min(struct) (q80/q150)
    "q181_curation_funnel" ->
      s"""WITH base AS (
         | SELECT doc_id,
         |  CAST(len($duckToks) AS BIGINT) AS n_tokens,
         |  $duckQualityScore AS q,
         |  md5(regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')) AS nm
         | FROM documents),
         |a AS (
         | SELECT CAST(count(*) AS BIGINT) AS n0,
         |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t0,
         |  CAST(count(CASE WHEN q >= 0.5 THEN 1 END) AS BIGINT) AS n1,
         |  CAST(coalesce(sum(CASE WHEN q >= 0.5 THEN n_tokens END), 0)
         |    AS BIGINT) AS t1
         | FROM base),
         |dd AS (
         | SELECT nm, min(struct_pack(d := doc_id, t := n_tokens)) AS m
         | FROM base WHERE q >= 0.5 GROUP BY nm),
         |dedup AS (
         | SELECT nm, m.t AS n_tokens,
         |  CASE WHEN substr(nm, 1, 1) < 'c' THEN 'train' ELSE 'eval' END AS split
         | FROM dd)
         |SELECT '0_raw' AS stage, n0 AS n_docs, t0 AS n_tokens FROM a
         |UNION ALL SELECT '1_quality', n1, t1 FROM a
         |UNION ALL SELECT '2_dedup', CAST(count(*) AS BIGINT),
         | CAST(coalesce(sum(n_tokens), 0) AS BIGINT) FROM dedup
         |UNION ALL SELECT '3_split_' || split, CAST(count(*) AS BIGINT),
         | CAST(sum(n_tokens) AS BIGINT) FROM dedup GROUP BY split
         |ORDER BY stage""".stripMargin,
    "q64_hash_split" ->
      """WITH s AS (
        | SELECT doc_id, lang, text,
        |  CASE WHEN substr(md5(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g')), 1, 1) < 'c'
        |       THEN 'train' ELSE 'eval' END AS split
        | FROM documents)
        |SELECT lang, split, count(*) AS n_docs,
        | round(avg(length(text)), 4) AS avg_len,
        | min(doc_id) AS min_doc_id
        |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin,
    "q67_bpe_tokens" -> {
      // DuckDB single-quoted strings take the regex verbatim; only the
      // embedded apostrophe needs SQL doubling
      val pat = bpePattern.replace("'", "''")
      s"""SELECT doc_id, lang,
         | CAST(len(regexp_extract_all(text, '$pat')) AS INT) AS n_bpe,
         | CAST(len($duckToks) AS INT) AS n_ws,
         | CASE WHEN len(regexp_extract_all(text, '$pat')) = 0 THEN NULL
         |  ELSE round(CAST(length(text) AS DOUBLE)
         |    / len(regexp_extract_all(text, '$pat')), 4) END AS chars_per_token
         |FROM documents ORDER BY doc_id""".stripMargin
    },
    "q69_pack_sequences" ->
      s"""WITH tk AS (
         | SELECT doc_id, doc_id % 4 AS shard,
         |  CAST(len($duckToks) AS BIGINT) AS n_tokens
         | FROM documents),
         |c AS (
         | SELECT doc_id, shard, n_tokens,
         |  coalesce(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tokens_before
         | FROM tk)
         |SELECT doc_id, shard, n_tokens,
         | CAST(floor(tokens_before / 512.0) AS BIGINT) AS pack_id
         |FROM c ORDER BY doc_id""".stripMargin,
    "q70_quality_prune" -> {
      s"""WITH sc AS (
         | SELECT doc_id, lang, $duckQualityScore AS q FROM documents),
         |r AS (
         | SELECT doc_id, lang, q,
         |  percent_rank() OVER (PARTITION BY lang ORDER BY q DESC, doc_id) AS pr
         | FROM sc)
         |SELECT lang, count(*) AS n_total,
         | count(CASE WHEN pr <= 0.5 THEN 1 END) AS n_kept,
         | CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) AS sum_q_all,
         | CAST(sum(CASE WHEN pr <= 0.5 THEN CAST(q AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_q_kept,
         | min(CASE WHEN pr <= 0.5 THEN doc_id END) AS min_kept_doc
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q65_stratified_sample" -> {
      // same cut points as stratifiedKeep, rendered from the same map —
      // including the cut >= 256 clamp (f = 1.0 keeps everything; a naive
      // h < '100' hex compare would keep ~17/256)
      val cuts = sampleFractions.toSeq.sortBy(_._1).map { case (k, f) =>
        val cut = math.min(math.floor(f * 256).toInt, 256)
        if (cut >= 256) s"WHEN '$k' THEN TRUE"
        else s"WHEN '$k' THEN h < '${f"$cut%02x"}'"
      }.mkString(" ")
      s"""WITH s AS (
         | SELECT lang,
         |  substr(md5('graft-sample-42:' || regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), 1, 2) AS h
         | FROM documents)
         |SELECT lang, count(*) AS n_total,
         | count(CASE WHEN (CASE lang $cuts ELSE TRUE END) THEN 1 END) AS n_sampled,
         | round(CAST(count(CASE WHEN (CASE lang $cuts ELSE TRUE END) THEN 1 END) AS DOUBLE)
         |   / count(*), 4) AS rate
         |FROM s GROUP BY lang ORDER BY lang""".stripMargin
    },
    "q72_tfidf_terms" ->
      s"""WITH tok AS (
         | SELECT doc_id, lang, unnest($duckToks) AS term FROM documents),
         |tf AS (SELECT lang, term, count(*) AS tf FROM tok GROUP BY lang, term),
         |df AS (SELECT term, count(*) AS df
         |  FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term),
         |n AS (SELECT count(*) AS n_docs FROM documents),
         |sc AS (
         | SELECT lang, tf.term, tf.tf, df.df,
         |  tf.tf * CAST(round(ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS DECIMAL(18,6)) AS score_d
         | FROM tf JOIN df ON tf.term = df.term CROSS JOIN n),
         |r AS (
         | SELECT lang, term, tf, df, score_d,
         |  row_number() OVER (PARTITION BY lang ORDER BY score_d DESC, term) AS rk
         | FROM sc)
         |SELECT lang, rk, term, tf, df, CAST(score_d AS DOUBLE) AS score
         |FROM r WHERE rk <= 10
         |ORDER BY lang, rk""".stripMargin,
    "q74_doc_chunks" ->
      s"""WITH tk AS (
         | SELECT doc_id, $duckToks AS toks,
         |  CAST(len($duckToks) AS BIGINT) AS n_tokens
         | FROM documents),
         |c AS (
         | SELECT doc_id, n_tokens,
         |  unnest(range(0, ((greatest(n_tokens - 64, 0) + 47) // 48) + 1)) AS chunk_id,
         |  toks
         | FROM tk)
         |SELECT doc_id, chunk_id,
         | CAST(len(toks[chunk_id*48+1 : chunk_id*48+64]) AS INT) AS n_chunk_tokens,
         | md5(array_to_string(toks[chunk_id*48+1 : chunk_id*48+64], ' ')) AS chunk_md5
         |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // RRF of the quality and LM-fluency rankings, fused on the micro grid
    "q151_rank_fusion" ->
      s"""WITH $duckLmPerDoc,
         |qx AS (SELECT doc_id, $duckQualityScore AS q FROM documents),
         |nl AS (
         | SELECT d.doc_id,
         |  CASE WHEN per.n_bigrams > 0
         |       THEN CAST(per.s AS DOUBLE) / per.n_bigrams
         |       ELSE CAST('infinity' AS DOUBLE) END AS nll
         | FROM documents d LEFT JOIN per ON per.doc_id = d.doc_id),
         |rq AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY q DESC, doc_id) AS BIGINT)
         |    AS r_quality
         | FROM qx),
         |rl AS (SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY nll ASC, doc_id) AS BIGINT)
         |    AS r_lm
         | FROM nl)
         |SELECT rq.doc_id, rq.r_quality, rl.r_lm,
         | 1000000 // (60 + r_quality) + 1000000 // (60 + r_lm) AS rrf_micro
         |FROM rq JOIN rl ON rl.doc_id = rq.doc_id
         |ORDER BY rrf_micro DESC, rq.doc_id LIMIT 50""".stripMargin,
    // BM25 on the integer grid: k1=6/5, b=3/4 multiplied through into
    // integer numerator/denominator; idf via the pinned-ln discipline
    "q149_bm25" ->
      s"""WITH tk AS (
         | SELECT doc_id, $duckToks AS toks FROM documents),
         |d2 AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl, toks FROM tk),
         |post AS (SELECT term, doc_id, dl, CAST(count(*) AS BIGINT) AS tf
         | FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d2)
         | GROUP BY 1, 2, 3),
         |st AS (SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS t_tokens
         | FROM d2),
         |dft AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM post
         | GROUP BY 1),
         |qt AS (SELECT term, df FROM dft, st WHERE df * 20 >= n_docs
         | ORDER BY df ASC, term LIMIT 10),
         |sc AS (
         | SELECT p.term, p.doc_id, p.tf, p.dl, st.n_docs, st.t_tokens,
         |  CAST(CAST(round(ln(CAST(2*st.n_docs - 2*q.df + 1 AS DOUBLE)
         |    / CAST(2*q.df + 1 AS DOUBLE)), 6) AS DECIMAL(18,6))
         |    * 1000000 AS BIGINT) AS i6
         | FROM post p JOIN qt q USING (term) CROSS JOIN st),
         |sc2 AS (
         | SELECT term, doc_id, tf, dl,
         |  CAST(CAST(i6 AS HUGEINT) * 44 * tf * t_tokens //
         |   (CAST(20 AS HUGEINT) * tf * t_tokens + 6 * t_tokens
         |    + 18 * dl * n_docs) AS BIGINT) AS score_micro
         | FROM sc),
         |r AS (SELECT term, doc_id, tf, dl, score_micro,
         |  CAST(row_number() OVER (PARTITION BY term
         |    ORDER BY score_micro DESC, doc_id) AS INT) AS rk
         | FROM sc2)
         |SELECT term, doc_id, tf, dl, score_micro, rk FROM r WHERE rk <= 10
         |ORDER BY term, rk""".stripMargin,
    // duplicated 16-token spans: gram fingerprints with corpus count > 1,
    // merged to disjoint islands per doc; all-integer coverage
    "q144_dup_spans" ->
      s"""WITH tk AS (
         | SELECT doc_id, $duckToks AS toks,
         |  CAST(len($duckToks) AS BIGINT) AS n_tokens
         | FROM documents),
         |occ AS (
         | SELECT doc_id, n_tokens,
         |  unnest(range(1, n_tokens - 14)) AS pos, toks
         | FROM tk WHERE n_tokens >= 16),
         |og AS (
         | SELECT doc_id, n_tokens, pos,
         |  md5(array_to_string(toks[pos : pos + 15], ' ')) AS g
         | FROM occ),
         |dup AS (SELECT g FROM og GROUP BY g HAVING count(*) > 1),
         |sp AS (SELECT og.doc_id, og.pos AS s, og.pos + 15 AS e
         |       FROM og JOIN dup USING (g)),
         |m AS (SELECT doc_id, s, e,
         |  max(e) OVER (PARTITION BY doc_id ORDER BY s
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pe
         | FROM sp),
         |isl AS (SELECT doc_id, s, e,
         |  sum(CASE WHEN pe IS NULL OR s > pe THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY doc_id ORDER BY s
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iid
         | FROM m),
         |cov AS (
         | SELECT doc_id, CAST(sum(ilen) AS BIGINT) AS dup_tokens
         | FROM (SELECT doc_id, iid, max(e) - min(s) + 1 AS ilen
         |       FROM isl GROUP BY doc_id, iid)
         | GROUP BY doc_id)
         |SELECT tk.doc_id, tk.n_tokens,
         | COALESCE(cov.dup_tokens, 0) AS dup_tokens,
         | (COALESCE(cov.dup_tokens, 0) * 10000) // tk.n_tokens AS cov_bp
         |FROM tk LEFT JOIN cov USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "q78_pii_scrub" ->
      s"""SELECT doc_id,
         | CAST(len(regexp_extract_all(text, '$emailPattern')) AS INT) AS n_emails,
         | CAST(len(regexp_extract_all(text, '$urlPattern')) AS INT) AS n_urls,
         | CAST(len(regexp_extract_all(text, '$phonePattern')) AS INT) AS n_phones,
         | md5(regexp_replace(regexp_replace(regexp_replace(text,
         |   '$emailPattern', '<EMAIL>', 'g'),
         |   '$urlPattern', '<URL>', 'g'),
         |   '$phonePattern', '<PHONE>', 'g')) AS redacted_md5
         |FROM documents ORDER BY doc_id""".stripMargin,
    "q84_weighted_sample" ->
      s"""WITH s AS (
         | SELECT lang, $duckQualityScore AS q,
         |  substr(md5('graft-wsample-42:' || regexp_replace(lower(text), '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g')), 1, 2) AS h
         | FROM documents),
         |k AS (
         | SELECT lang, q,
         |  CASE WHEN CAST(floor(q * 256) AS INT) >= 256 THEN TRUE
         |       ELSE h < printf('%02x', CAST(floor(q * 256) AS INT)) END AS keep
         | FROM s)
         |SELECT lang, count(*) AS n_total,
         | count(CASE WHEN keep THEN 1 END) AS n_kept,
         | CAST(count(CASE WHEN keep THEN 1 END) AS DOUBLE) / count(*) AS rate,
         | CAST(sum(CAST(q AS DECIMAL(18,4))) AS DOUBLE) AS sum_q_all,
         | CAST(sum(CASE WHEN keep THEN CAST(q AS DECIMAL(18,4)) END) AS DOUBLE) AS sum_q_kept
         |FROM k GROUP BY lang ORDER BY lang""".stripMargin,
    "q35_lang_id" -> {
      def score(l: String): String = {
        val lst = stopwords(l).map(w => s"'$w'").mkString("[", ", ", "]")
        s"CAST(len(list_intersect(list_distinct($duckToks), $lst)) AS INT)"
      }
      val sCols = langOrder.map(l => s" ${score(l)} AS s_$l").mkString(",\n")
      val bestExpr = s"greatest(${langOrder.map(l => s"s_$l").mkString(", ")})"
      val caseExpr = langOrder.map(l => s"WHEN s_$l = $bestExpr AND $bestExpr > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""SELECT doc_id, lang_actual, ${langOrder.map(l => s"s_$l").mkString(", ")},
         | $caseExpr AS lang_pred
         |FROM (SELECT doc_id, lang AS lang_actual,
         |$sCols
         | FROM documents)
         |ORDER BY doc_id""".stripMargin
    })
}
