package graft.llm

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Text-analysis operators for training-data pipelines (SURVEY.md §2d +
 * driver mandate): per-language stats, word counts, quality scoring,
 * token counting, language-ID heuristic, and document fingerprinting —
 * all over the `documents` table, all pure codegen'd built-ins.
 *
 * Scale notes (100 TB): everything here is scan → per-row expressions →
 * (at most) one hash aggregate; shuffle volume is #groups (languages,
 * tokens), never #docs. Wordcount's token explode is the only row
 * expansion; at extreme scale cap it with a per-partition top-k
 * pre-aggregation (explode → partial count) which Spark's partial
 * HashAggregate already provides.
 */
object TextOps {

  /**
   * Gopher repetition rules (Rae et al. 2021, "Scaling Language Models:
   * Methods, Analysis & Insights from Training Gopher",
   * arXiv:2112.11446 Table A1 — public), token-based variant: the
   * filter that kills looping/boilerplate docs by (a) the OCCURRENCE-
   * MASS ratio of the most frequent 2-/3-gram — count × n / n_tokens,
   * which double-counts self-overlapping occurrences and can exceed
   * 10000 bp on degenerate loops ("spam spam …" ×20 scores 19000 bp;
   * true union-of-spans coverage is what [[Dedup.spanTrim]] computes)
   * — and (b) the fraction of distinct 5-grams that are duplicated.
   * The mass ratio is deliberately kept: it is HARSHER on exactly the
   * looping docs the rule exists to kill, and both engines compute the
   * identical integer. All ratios are exact integer basis points
   * (`div`); thresholds are the paper's (0.20 / 0.18 / 0.15) applied
   * to this statistic (ADVICE r9: doc reworded — the thresholds gate
   * occurrence mass, not span coverage).
   *
   * Scale shape: the n-gram counting is PER-ROW higher-order functions
   * over the token array (docs are model-input sized, so distinct×n ≈ a
   * few thousand comparisons per row) — zero shuffle, pure scan
   * projection; at 100 TB this fuses into the quality-gate scan like
   * text_quality, where the grouped-explode alternative would shuffle
   * ~n_grams rows per doc.
   */
  /** Positioned n-gram array over a `toks` column (SQL-expr spelling) —
    * shared by [[repetitionStats]] and [[qualityGate]] so the two rows
    * compute identical statistics by construction. */
  private def grams(ng: Int): String = {
    val parts = (0 until ng).map(o => s"element_at(toks, i + $o)")
      .mkString(", ")
    s"CASE WHEN size(toks) >= $ng THEN " +
      s"transform(sequence(1, size(toks) - ${ng - 1}), " +
      s"i -> concat_ws(' ', $parts)) " +
      "ELSE CAST(array() AS ARRAY<STRING>) END"
  }

  /** Count of the most frequent element of gram array `g` (shared, as
    * [[grams]]). */
  private def topCnt(g: String): String =
    s"CASE WHEN size($g) = 0 THEN 0L ELSE CAST(array_max(" +
      s"transform(array_distinct($g), g -> size(filter($g, x -> x = g))))" +
      " AS BIGINT) END"

  /** Marker-token evidence lists for language ID — single-sourced into
    * lang_id AND the composed gate (the same drift-proofing as
    * [[grams]]/[[topCnt]]: editing a marker updates every consumer). */
  private[llm] val LangMarkers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "and", "query"),
    "de" -> Seq("der", "und", "das"),
    "es" -> Seq("el", "la", "los"))

  /** Deterministic marker-evidence argmax (en ≥ de ≥ es priority on
    * ties, 'unknown' when nothing hits) over the DISTINCT token array. */
  private[llm] def predLang(dToks: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def score(markers: Seq[String]) =
      size(array_intersect(dToks, array(markers.map(lit): _*))).cast("long")
    val en = score(LangMarkers("en"))
    val de = score(LangMarkers("de"))
    val es = score(LangMarkers("es"))
    when(en >= de && en >= es && en > 0, "en")
      .when(de >= es && de > 0, "de")
      .when(es > 0, "es")
      .otherwise("unknown")
  }

  /** Stop-word list shared by text_quality, the composed gate, and
    * pipeline_curate's quality stage. */
  private[llm] val StopWords = Seq("the", "a", "of", "and")

  private[llm] def stopCnt(toks: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column =
    size(filter(toks, t => t.isin(StopWords.map(x => x: Any): _*))).cast("long")

  /** The integer-basis-point quality score over prepared (uniq_cnt,
    * n_tokens, stop_cnt) columns — ONE spelling for text_quality, the
    * composed gate, and pipeline_curate. */
  private[llm] val QualityBpSql =
    "(uniq_cnt * 7000 + (n_tokens - stop_cnt) * 3000) div n_tokens"

  def repetitionStats(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(col("toks")).cast("long"))
      .withColumn("g2", expr(grams(2)))
      .withColumn("g3", expr(grams(3)))
      .withColumn("g5", expr(grams(5)))
      .withColumn("top2_bp", expr(
        s"CASE WHEN n_tokens >= 2 THEN ${topCnt("g2")} * 2 * 10000 div n_tokens ELSE 0L END"))
      .withColumn("top3_bp", expr(
        s"CASE WHEN n_tokens >= 3 THEN ${topCnt("g3")} * 3 * 10000 div n_tokens ELSE 0L END"))
      .withColumn("dup5_bp", expr(
        "CASE WHEN size(g5) = 0 THEN 0L ELSE " +
          "CAST(size(filter(transform(array_distinct(g5), " +
          "g -> size(filter(g5, x -> x = g))), c -> c > 1)) AS BIGINT)" +
          " * 10000 div CAST(size(array_distinct(g5)) AS BIGINT) END"))
      .select(col("doc_id"), col("n_tokens"),
        col("top2_bp"), col("top3_bp"), col("dup5_bp"),
        (col("top2_bp") <= 2000 && col("top3_bp") <= 1800 &&
          col("dup5_bp") <= 1500).cast("int").as("keep"))
  }

  /**
   * The composed Gopher-style quality gate (round 10, VERDICT r9 #7):
   * every per-row curation signal the registry carries separately —
   * length, language ID, repetition, lexical quality — fused into ONE
   * keep/drop verdict with a reason code, as a single scan projection
   * over `documents`. Rules fire in Gopher's order (cheap structural
   * checks before content checks) and the FIRST failing rule names the
   * reason, so downstream observability can histogram drop causes:
   *
   *   1. `too_short`  — n_tokens < 8 (the ragPrep degeneracy gate);
   *   2. `lang`       — marker-token language ID says `unknown`
   *                     (lang_id's exact argmax spelling);
   *   3. `repetition` — a Gopher repetition bound breached by a gram
   *                     that actually repeats (count ≥ 2 — see the
   *                     inline comment; [[repetitionStats]]'
   *                     statistics via the SAME [[grams]]/[[topCnt]]
   *                     spellings);
   *   4. `quality`    — integer quality score below 5000 bp
   *                     (pipeline_curate's gate, text_quality's score);
   *   5. `ok`         — keep = 1.
   *
   * Scale shape: zero joins, zero shuffle (the orderBy is the verify
   * determinism sort) — at 100 TB this is the one-pass scan the
   * separate signal rows would otherwise each re-scan the corpus for;
   * the plan is pinned single-scan/no-join in PlanShapeSpec.
   */
  def qualityGate(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val toks = col("toks")
    docs
      .withColumn("toks", split(col("text"), " "))
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("stop_cnt", stopCnt(toks))
      .withColumn("uniq_cnt", size(array_distinct(toks)).cast("long"))
      .withColumn("quality_bp", expr(QualityBpSql))
      .withColumn("pred_lang", predLang(array_distinct(toks)))
      .withColumn("g2", expr(grams(2)))
      .withColumn("g3", expr(grams(3)))
      .withColumn("g5", expr(grams(5)))
      .withColumn("top2_cnt", expr(topCnt("g2")))
      .withColumn("top3_cnt", expr(topCnt("g3")))
      .withColumn("top2_bp", expr(
        "CASE WHEN n_tokens >= 2 THEN top2_cnt * 2 * 10000 div n_tokens ELSE 0L END"))
      .withColumn("top3_bp", expr(
        "CASE WHEN n_tokens >= 3 THEN top3_cnt * 3 * 10000 div n_tokens ELSE 0L END"))
      .withColumn("dup5_bp", expr(
        "CASE WHEN size(g5) = 0 THEN 0L ELSE " +
          "CAST(size(filter(transform(array_distinct(g5), " +
          "g -> size(filter(g5, x -> x = g))), c -> c > 1)) AS BIGINT)" +
          " * 10000 div CAST(size(array_distinct(g5)) AS BIGINT) END"))
      // The top-gram rules additionally require the gram to actually
      // REPEAT (count ≥ 2): a single occurrence scores 3·10⁴/n bp,
      // which breaches the 0.18 threshold for EVERY doc under 17
      // tokens — without the count gate, short-but-clean docs would be
      // systematically branded 'repetition' (the audit-statistic row
      // text_repetition deliberately keeps the raw thresholds; this is
      // the DECISION row, so its rule must mean what it says). dup5_bp
      // needs no gate — nonzero already implies a duplicated 5-gram.
      .withColumn("reason",
        when(col("n_tokens") < 8, "too_short")
          .when(col("pred_lang") === "unknown", "lang")
          .when((col("top2_cnt") >= 2 && col("top2_bp") > 2000) ||
            (col("top3_cnt") >= 2 && col("top3_bp") > 1800) ||
            col("dup5_bp") > 1500, "repetition")
          .when(col("quality_bp") < 5000, "quality")
          .otherwise("ok"))
      .select(col("doc_id"), col("n_tokens"), col("pred_lang"),
        col("quality_bp"), col("top2_bp"), col("top3_bp"), col("dup5_bp"),
        (col("reason") === "ok").cast("int").as("keep"), col("reason"))
  }

  /** 31-based rolling hash over per-token values, mod 2^31-1. Token value
    * = ascii(first char)*131 + length — chosen because both Spark and
    * DuckDB compute it identically (no engine-specific hash function).
    * Fold stays < 2^37, so no BIGINT overflow on either engine. */
  private val fpExpr =
    """aggregate(
      |  transform(split(text, ' '), t -> ascii(t) * 131L + length(t)),
      |  0L,
      |  (acc, v) -> pmod(acc * 31 + v, 2147483647L))""".stripMargin

  /** Verdict-CMS geometry (r17 — VERDICT r16 #2): d=4 hash rows ×
    * w=512 counters. Small by design — the verdict arm proves the
    * MECHANISM (d independent bucketings, min-over-rows estimate), not
    * the production error bound; text_cms_topk's Spark
    * `count_min_sketch` keeps the eps-sized production geometry and
    * its one-sided-error property gate. At w=512 the 61k-token sf0.1
    * stream loads ≈ 120 per counter, so the top-20 probes (counts
    * ≥ hundreds) still see real, non-saturated collision noise —
    * est > exact on some rows, never below (LlmSpec pins the
    * inequality; the oracle pins the exact counter values). */
  val VerdictCmsD = 4
  val VerdictCmsW = 512

  /** CMS row-hash: first 15 hex nibbles of md5("i:" ∥ token) decode
    * (ascii arithmetic — the one hex→int spelling both engines share,
    * the simhashVerdictSketch trick) into one non-negative BIGINT,
    * reduced mod [[VerdictCmsW]]. */
  private def cmsBucket(h: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    def dig(i: Int): org.apache.spark.sql.Column = {
      val a = ascii(substring(h, i + 1, 1))
      when(a >= 97, a - 87).otherwise(a - 48).cast("long")
    }
    (0 until 15).map(i => dig(i) * lit(1L << (4 * (14 - i)))).reduce(_ + _) %
      VerdictCmsW
  }

  /**
   * Oracle-checkable Count-Min-sketch twin of `text_cms_topk` (r17 —
   * VERDICT r16 #2, the md5-fixed-family verdict recipe applied to the
   * CMS mechanism): the sketch IS d×w integer counters under fixed
   * hashes, so with md5-derived row hashes the whole pipeline — counter
   * grid built as a groupBy per row, estimate = MIN over the d probed
   * counters — is integer-deterministic and spelled identically in
   * DuckDB. Probes are the top-`k` exact tokens (text_wordcount's own
   * bounded output); output (token, n_exact, n_est) matches the
   * production row's shape.
   *
   * Scale shape: one vocabulary-keyed hash agg (exact counts — shuffle
   * volume is #distinct tokens, the wordcount shape), d tiny
   * re-aggregations of that vocabulary frame into ≤ d·w counter rows,
   * and a broadcast probe join against the 2 048-row grid. The grid —
   * unlike the production sketch — is an ordinary DataFrame, so it
   * merges/unions/persists with plain relational ops at any scale.
   */
  def cmsTopkVerdict(docs: org.apache.spark.sql.DataFrame, k: Int)
      : org.apache.spark.sql.DataFrame = {
    val d = VerdictCmsD
    val counts = Q.ownPersist(docs
      .select(explode(split(col("text"), " ")).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
      .select(col("token") +: col("n_exact") +:
        (0 until d).map(i =>
          cmsBucket(md5(concat(lit(s"$i:"), col("token")))).as(s"b$i")): _*)).df
    val grid = (0 until d).map(i =>
      counts.groupBy(col(s"b$i").as("b"))
        .agg(sum(col("n_exact")).as("total"))
        .select(lit(i).as("i"), col("b"), col("total")))
      .reduce(_ union _)
    // grid ≤ d·w = 2 048 rows by construction → unconditional broadcast
    // (the bounded-frame class, like the hyperplane literals).
    counts.orderBy(col("n_exact").desc, col("token")).limit(k)
      .select(col("token"), col("n_exact"),
        posexplode(array((0 until d).map(i => col(s"b$i")): _*)))
      .withColumnRenamed("pos", "i").withColumnRenamed("col", "b")
      .join(broadcast(grid), Seq("i", "b"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("total")).as("n_est"))
      .orderBy(col("n_exact").desc, col("token"))
  }

  /** Per-document term counts computed IN-ROW (r18; guide §2.4 "remove
    * shuffles outright"): (doc_id, tok, tf, dl, nd) where tf is the
    * token's count within the doc, dl the doc length in tokens and nd
    * the doc's distinct-token count — run-length counting over the
    * row's sorted token array. The pre-r18 spelling exploded the corpus
    * and hash-aggregated (doc_id, tok), paying one full doc-term-stream
    * exchange for counts that never needed to leave their document —
    * a document is one row, so every (doc, tok) group is already
    * co-located by construction. Sorting L tokens in-row is
    * O(L log L) against the explode's O(L) hash-insert + exchange;
    * at 100 TB the exchange dominates by orders of magnitude, and the
    * per-doc dl/nd come for free instead of costing a second agg (dl)
    * and a doc-keyed window (nd). Counts are bit-identical to the
    * grouped form — the same multiset of tokens per document, counted
    * by equal-neighbor runs instead of hash groups (oracle-verified on
    * every consumer row). */
  private[llm] def docTermCounts(docs: DataFrame): DataFrame =
    docs
      .withColumn("sorted", array_sort(split(col("text"), " ")))
      .withColumn("starts", expr(
        "filter(sequence(0, size(sorted) - 1)," +
          " i -> i = 0 OR sorted[i] <> sorted[i - 1])"))
      .select(col("doc_id"),
        size(col("sorted")).cast("long").as("dl"),
        size(col("starts")).cast("long").as("nd"),
        explode(expr(
          "transform(starts, (st, j) -> struct(sorted[st] as tok," +
            " (if(j + 1 < size(starts), starts[j + 1], size(sorted)) - st)" +
            " as tf))")).as("p"))
      .select(col("doc_id"), col("p.tok").as("tok"),
        col("p.tf").cast("long").as("tf"), col("dl"), col("nd"))

  val queries: Map[String, QFn] = Map(
    "text_entropy" -> ((s, d) => {
      // Token-distribution entropy per doc (nats) + normalized form —
      // the Gopher/CCNet-style repetitiveness signal: low entropy for a
      // doc's length means a few tokens dominate (boilerplate, keyword
      // stuffing). Shape: one explode → (doc, tok) hash agg → one
      // doc-keyed window (no join) → one hash agg.
      // Determinism: double SUM is summation-order-dependent, and the
      // engines' partial-agg orders differ — so each token's
      // -p·ln(p) contribution is rounded to 10 dp and cast to
      // DECIMAL(18,12) first (the moneySum trick): the sum is then
      // EXACT and order-independent, and only the final value rounds to
      // 4 dp. norm_entropy derives from the already-rounded entropy so
      // both engines divide identical operands.
      // r18: tf/dl/nd come from the in-row [[docTermCounts]] — the
      // doc-term hash agg AND the doc-keyed window both disappear (the
      // per-doc totals never needed a shuffle; see the helper's note).
      // The values are the identical integers, so p/contrib and the
      // oracle hash are unchanged; the only remaining exchange is the
      // final per-doc rollup.
      docTermCounts(Tables.documents(s, d))
        .select(col("doc_id"), col("tok"), col("tf").as("c"),
          col("dl").as("n"), col("nd").as("n_distinct"))
        .withColumn("p", col("c").cast("double") / col("n"))
        .withColumn("contrib",
          round(-col("p") * log(col("p")), 10).cast("decimal(18,12)"))
        .groupBy(col("doc_id"))
        .agg(max(col("n")).cast("long").as("n_tokens"),
          max(col("n_distinct")).cast("long").as("n_distinct"),
          round(sum(col("contrib")).cast("double"), 4).as("entropy_nats"))
        .withColumn("norm_entropy",
          when(col("n_distinct") > 1,
            round(col("entropy_nats") / log(col("n_distinct").cast("double")), 4))
            .otherwise(lit(0.0)))
        .orderBy(col("doc_id"))
    }),

    "text_zipf" -> ((s, d) => {
      // Vocabulary rank-frequency table (the Zipf curve): top-50 tokens
      // by corpus frequency with rank and corpus share in basis points —
      // the tokenizer-sanity artifact every corpus build eyeballs (a
      // broken tokenizer shows up as a distorted head). One explode →
      // one hash agg → TakeOrderedAndProject(50): the LIMIT runs BEFORE
      // ranking, so the full vocabulary (10⁷–10⁸ distinct tokens on a
      // real corpus) never flows through a single-partition window sort.
      // Rank is then assigned over the 50 survivors WITHOUT a window:
      // collect into one array sorted by the (-n, tok) struct order —
      // the same (n desc, tok asc) total order the limit used — and
      // positional-explode. Share is integer bp of the broadcast 1-row
      // total. Rank ties break by token so both engines rank identically.
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("tok"))
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      // r18: the corpus token total is Σ per-doc length — one per-row
      // pass over docs instead of a SECOND full explode (same integer:
      // every exploded row is one token of one doc).
      val total = Tables.documents(s, d)
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(sum(col("dl")).as("n_total"))
      counts.orderBy(col("n").desc, col("tok")).limit(50)
        .crossJoin(broadcast(total))
        .withColumn("share_bp", expr("n * 10000 div n_total"))
        .agg(sort_array(collect_list(struct((-col("n")).as("neg_n"),
          col("tok").as("tok"), col("n").as("n"),
          col("share_bp").as("share_bp")))).as("arr"))
        .select(posexplode(col("arr")))
        .select((col("pos") + 1).cast("long").as("rank"),
          col("col.tok").as("tok"), col("col.n").as("n"),
          col("col.share_bp").as("share_bp"))
        .orderBy(col("rank"))
    }),

    "text_stats" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("lang"), col("n_chars"),
          size(split(col("text"), " ")).cast("long").as("n_tokens"))
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n_docs"),
          round(sum(col("n_chars")).cast("double") / count(lit(1)), 4).as("avg_chars"),
          round(sum(col("n_tokens")).cast("double") / count(lit(1)), 4).as("avg_tokens"))
        .orderBy(col("lang"))
    }),

    "text_wordcount" -> ((s, d) => {
      Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("token"))
        .limit(20)
    }),

    "text_boilerplate" -> ((s, d) => {
      // Per-source template detection (round 8): the top-3 most frequent
      // 8-token document PREFIXES per source — the crawl-cleaning signal
      // for boilerplate headers/templates shared across a domain's pages
      // (the per-host companion to dedup_ngram_cover's within-doc
      // repetition). Shape: one per-row prefix projection, a hash agg on
      // (source, prefix), then the bounded top-k window per source —
      // shuffle volume is #distinct (source, prefix) pairs, never corpus
      // size, and the window partitions by source (thousands of hosts at
      // 100 TB → well-spread).
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_docs").desc, col("prefix"))
      Tables.documents(s, d)
        .select(col("source"),
          array_join(slice(split(col("text"), " "), 1, 8), " ").as("prefix"))
        .groupBy(col("source"), col("prefix"))
        .agg(count(lit(1)).as("n_docs"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("source"), col("rn"), col("prefix"), col("n_docs"))
        .orderBy(col("source"), col("rn"))
    }),

    // Count-Min-sketch token frequencies (sketch row — rows-only gate,
    // like simhash; the CMS one-sided error bound is property-tested in
    // LlmSpec): the mergeable-state frequency sketch for when the exact
    // groupBy's shuffle key space (the full vocabulary) is wider than a
    // report needs. ONE pass builds the sketch via Spark's built-in
    // count_min_sketch aggregate — per-partition sketches merge
    // associatively, so at 100 TB the shuffle carries eps-sized sketch
    // state (here w=2719×d=5 counters ≈ 109 KB), not 10⁸ token groups.
    // The top-20 exact tokens (the wordcount query's own bounded
    // output) are then probed against the sketch — est ≥ true always,
    // est ≤ true + eps·N with prob ≥ 0.99 per probe.
    //
    // r6 (VERDICT r5 wrong-item 2): the probe is PLAN-SIDE — the 1-row
    // sketch frame joins the bounded top-20 frame (BNLJ with a 1-row
    // broadcast build, the text_tfidf corpus-count shape) and a UDF
    // deserializes + probes per row. The registry fn is a pure plan
    // again: no `.head`/`.collect()` runs at construction time, so
    // Bench times the sketch build inside the measured window and
    // Verify never executes jobs while building the frame. 20 rows ×
    // one 109 KB deserialization each is driver-noise-sized executor
    // work; a reusable-handle design is pointless at this row count.
    "text_cms_topk" -> ((s, d) => {
      val toks = Tables.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
      val sketch = toks
        .agg(expr("count_min_sketch(token, cast(0.001 as double), " +
          "cast(0.99 as double), 42)").as("sk"))
      val probe = udf((sk: Array[Byte], t: String) =>
        org.apache.spark.util.sketch.CountMinSketch.readFrom(
          new java.io.ByteArrayInputStream(sk)).estimateCount(t))
      toks.groupBy(col("token")).agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("token")).limit(20)
        .crossJoin(broadcast(sketch))
        .select(col("token"), col("n_exact"),
          probe(col("sk"), col("token")).as("n_est"))
        .orderBy(col("n_exact").desc, col("token"))
    }),

    // r17 (VERDICT r16 #2): the md5-fixed-family verdict arm — the CMS
    // grid + min-over-rows estimate hash-matched against DuckDB; the
    // `count_min_sketch` production arm above keeps its rows-only gate
    // and LlmSpec's one-sided-error property.
    "text_cms_topk_verdict" -> ((s, d) =>
      cmsTopkVerdict(Tables.documents(s, d), 20)),

    "text_quality" -> ((s, d) => {
      // Length / stopword / uniqueness signals; each ratio is one double
      // division with identical integer operands on both engines. The
      // composite score is exact integer basis points via `div` — a
      // rounded weighted double hits half-up tie divergence between
      // engines (measured: 0.86875 → 0.8688 Spark vs 0.8687 DuckDB).
      val toks = col("toks")
      Tables.documents(s, d)
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tokens", size(toks).cast("long"))
        .withColumn("stop_cnt", stopCnt(toks))
        .withColumn("uniq_cnt", size(array_distinct(toks)).cast("long"))
        .withColumn("sum_len", aggregate(transform(toks, t => length(t).cast("long")),
          lit(0L), (acc, x) => acc + x))
        .select(
          col("doc_id"), col("n_chars"), col("n_tokens"),
          round(col("sum_len").cast("double") / col("n_tokens"), 4).as("avg_token_len"),
          round(col("stop_cnt").cast("double") / col("n_tokens"), 4).as("stop_ratio"),
          round(col("uniq_cnt").cast("double") / col("n_tokens"), 4).as("uniq_ratio"),
          expr(QualityBpSql).as("quality_bp"))
        .orderBy(col("doc_id"))
    }),

    "text_repetition" -> ((s, d) =>
      repetitionStats(Tables.documents(s, d)).orderBy(col("doc_id"))),

    "text_quality_gate" -> ((s, d) =>
      qualityGate(Tables.documents(s, d)).orderBy(col("doc_id"))),

    "text_tokens" -> ((s, d) => {
      // Whitespace tokens vs a BPE-ish regex segmentation (letter runs /
      // digit runs / single other chars) — the standard pre-tokenizer
      // shape, kept POSIX-simple so both regex engines agree.
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("ws_tokens"),
          regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]")).cast("long")
            .as("bpe_tokens"),
          round(col("n_chars").cast("double")
            / size(split(col("text"), " ")), 4).as("chars_per_token"))
        .orderBy(col("doc_id"))
    }),

    "lang_id" -> ((s, d) => {
      // Marker-token heuristic (n-gram language ID degenerates to marker
      // counting on the synthetic single-vocabulary corpus — the shape of
      // the operator is what matters: per-language evidence scores +
      // deterministic argmax with alphabetic tiebreak). The marker lists
      // and argmax chain live in [[LangMarkers]]/[[predLang]], shared
      // with the composed gate.
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          predLang(array_distinct(split(col("text"), " "))).as("pred_lang"))
        .withColumn("is_match", (col("pred_lang") === col("lang")).cast("int"))
        .orderBy(col("doc_id"))
    }),

    "doc_fingerprint" -> ((s, d) => {
      Tables.documents(s, d)
        .select(col("doc_id"), expr(fpExpr).as("fingerprint"))
        .orderBy(col("doc_id"))
    }),

    "text_normalize" -> ((s, d) => {
      // Boilerplate cleanup: collapse runs of consecutive repeated tokens
      // ("batch batch batch" → "batch") + trim. Done with an INDEXED array
      // lambda, not a regex backreference — RE2 (DuckDB) has no
      // backreferences, and the array form is codegen-friendly and
      // O(tokens) per row either way. Scale: pure per-row expressions, no
      // shuffle at all (the final orderBy is the verify determinism sort).
      val dedupRuns = "filter(toks, (x, i) -> i = 0 OR x <> toks[i - 1])"
      Tables.documents(s, d)
        .withColumn("toks", split(trim(col("text")), " "))
        .select(col("doc_id"),
          array_join(expr(dedupRuns), " ").as("norm_text"),
          size(col("toks")).cast("long").as("n_tokens"),
          size(expr(dedupRuns)).cast("long").as("n_norm_tokens"))
        .orderBy(col("doc_id"))
    }),

    "text_chunks" -> ((s, d) => {
      // Overlapping token-window chunking (size 32, stride 24 → 8-token
      // overlap) with provenance offsets — the RAG/pretraining prep step
      // that turns documents into model-sized pieces without losing
      // cross-boundary context. Chunk count uses INTEGER ceil math
      // ((n−C+S−1) div S) so both engines agree exactly. Row expansion is
      // bounded by n_toks/stride; pure per-row expressions, no shuffle.
      val (c, st) = (32, 24)
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .select(col("doc_id"), size(col("toks")).cast("long").as("n_toks"),
          col("toks"))
        .select(col("doc_id"), col("n_toks"), posexplode(expr(
          s"""transform(
             |  sequence(0, if(n_toks <= $c, 0,
             |    (n_toks - $c + ${st - 1}) div $st)),
             |  i -> array_join(slice(toks, i * $st + 1, $c), ' '))""".stripMargin)))
        .select(col("doc_id"), col("n_toks"), col("pos").cast("long").as("chunk_idx"),
          (col("pos").cast("long") * st + 1).as("tok_start"),
          col("col").as("chunk_text"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    "text_lm_score" -> ((s, d) => {
      // Unigram language-model score per document: mean ln P(token)
      // under the corpus's own unigram distribution — the shape of the
      // CCNet/KenLM perplexity quality filter (a real pipeline swaps the
      // broadcast unigram table for an n-gram LM; the plumbing — corpus
      // stats pass → broadcast dictionary → per-doc average — is
      // identical). Low scores = rare-token-heavy docs (quality-filter
      // candidates). Two hash aggs + a dictionary join; shuffle volume
      // is #tokens(vocab) + #docs, never corpus size.
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("tok"))
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      val total = counts.agg(sum(col("n")).as("n_total"))
      val logp = counts.crossJoin(broadcast(total))
        .select(col("tok"),
          log(col("n").cast("double") / col("n_total")).as("lp"))
      toks.join(Q.maybeBroadcast(logp), "tok")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_toks"),
          round(avg(col("lp")), 4).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    "text_ngram_lm" -> ((s, d) => {
      // Bigram LM score per document — the n-gram upgrade of
      // text_lm_score's unigram plumbing: mean ln P(w2|w1) under the
      // corpus's own add-one-smoothed bigram model (the KenLM/CCNet
      // perplexity-filter shape one order up; a production pass swaps
      // the broadcast table for a trained 5-gram LM, plumbing unchanged).
      // Shape: one explode feeds bigram counts, head counts, AND the
      // scoring join (persisted — corpus exploded exactly once); the
      // model table is |vocab|² bounded → conf-gated broadcast; shuffle
      // never exceeds #bigram-types + #docs.
      val docs = Tables.documents(s, d)
      val bi = docs
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(toks) - 2), i -> struct(toks[i] AS w1, toks[i + 1] AS w2))"))
          .as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      // Handle intentionally discarded: released by the runner's
      // per-query clearCache once the result is materialized (ADVICE r10).
      graft.Q.ownPersist(bi)
      val c2 = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
      val c1 = bi.groupBy(col("w1")).agg(count(lit(1)).as("c1"))
      val vocab = docs.select(explode(split(col("text"), " ")).as("t"))
        .agg(countDistinct(col("t")).as("v"))
      val lp = c2.join(c1, "w1").crossJoin(broadcast(vocab))
        .select(col("w1"), col("w2"),
          log((col("c2") + 1).cast("double") / (col("c1") + col("v"))).as("lp"))
      bi.join(Q.maybeBroadcast(lp), Seq("w1", "w2"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_bigrams"),
          round(avg(col("lp")), 4).as("avg_logprob"))
        .orderBy(col("doc_id"))
    }),

    "text_tfidf" -> ((s, d) => {
      // Top-3 characteristic terms per document by smoothed TF-IDF —
      // the classic keyword/feature extraction pass of a corpus pipeline.
      // Shape: two hash aggs (tf per doc-term, df per term) + a window
      // top-k per doc; the term dictionary joins via the conf-gated
      // broadcast and the corpus count is a broadcast 1-row frame, so
      // nothing driver-side and no all-pairs anywhere. Determinism: rank
      // by the ROUNDED score (both engines), ties by token.
      val docs = Tables.documents(s, d)
      // tf is computed IN-ROW (r18 — [[docTermCounts]]: the doc-term
      // exchange never needed to exist) and persisted because it feeds
      // both the scoring join and the df roll-up (cache lifecycle
      // belongs to the runner — Verify/Bench clearCache() per query).
      val tf = graft.Q.ownPersist(docTermCounts(docs)
        .select(col("doc_id"), col("tok"), col("tf"))).df
      // df derives from tf (one row per doc-term pair already) instead
      // of a second corpus explode + distinct.
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("tok"))
      tf.join(Q.maybeBroadcast(dfreq), "tok")
        .crossJoin(broadcast(n))
        .withColumn("tfidf", round(col("tf") *
          log((col("n_docs") + 1).cast("double") / (col("df") + 1)), 4))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("tok"), col("tfidf"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    "text_bm25" -> ((s, d) => {
      // Okapi BM25 top-3 characteristic terms per document —
      // text_tfidf's retrieval-grade sibling (Robertson–Walker
      // probabilistic idf, tf saturation, length normalization at the
      // standard k1 = 1.2 / b = 0.75): the scoring a sparse-retrieval
      // curation pass runs (rank corpus docs against probe terms,
      // build BM25 features for retrieval-based data selection).
      // Shape: the same two hash aggs as tfidf (tf per doc-term, df
      // per term), per-doc length dl derived from tf (no second corpus
      // scan), corpus stats (n_docs, avgdl) as ONE broadcast 1-row
      // frame, window top-3 per doc — map-side partials everywhere,
      // nothing driver-side. Determinism: both engines evaluate the
      // TEXTUALLY IDENTICAL expression tree over identical integer
      // operands (tf/df/dl/n_docs are longs; avgdl is one double
      // division of exact longs; 1.2/0.75/2.2 parse to the same
      // doubles) — IEEE ops on identical operands are bit-stable — and
      // the top-3 ranks by the ROUNDED score with token tiebreak, the
      // tfidf discipline.
      val docs = Tables.documents(s, d)
      // r18: tf AND dl come from the in-row [[docTermCounts]] — the
      // doc-term exchange, the dl aggregation pass and the dl
      // broadcast-join all disappear (dl rides each tf row). Corpus
      // stats come from one per-row pass over docs: identical values
      // (every doc has ≥ 1 token, so n_docs matches; Σdl is the same
      // token total), one 1-row broadcast as before.
      val tf = graft.Q.ownPersist(docTermCounts(docs)
        .select(col("doc_id"), col("tok"), col("tf"), col("dl"))).df
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("bm25").desc, col("tok"))
      tf.join(Q.maybeBroadcast(dfreq), "tok")
        .crossJoin(broadcast(stats))
        .withColumn("bm25", expr(
          "round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)" +
            " / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select(col("doc_id"), col("rn"), col("tok"), col("bm25"))
        .orderBy(col("doc_id"), col("rn"))
    }),

    "text_search_bm25" -> ((s, d) => {
      // Query-driven sparse retrieval (r14 — VERDICT r13 #1): the
      // sparse twin of sim_topk, and the shape retrieval-based data
      // selection / decontamination-by-retrieval actually runs: probe
      // TERMS in, top-k DOCUMENTS out, ranked by summed Okapi BM25.
      // Probe derivation mirrors sim_topk's vec_id < 10 rule: each of
      // docs 0..9 contributes its own top-3 BM25 characteristic terms
      // (text_bm25's exact ranking) as one probe term-set — a pure
      // function of the corpus, no sampling. Retrieval: probe terms
      // (30 rows, broadcast) equi-join the per-doc-term score frame,
      // self-hit excluded, summed per (probe, doc), top-5 docs per
      // probe. Shape at 100 TB: the same two hash aggs as text_bm25
      // build tf/df/dl once (map-side partials, shuffle = #doc-term
      // pairs), the probe join is a broadcast against the score frame,
      // and the final window partitions by probe — nothing driver-side,
      // no corpus re-scan. Determinism: per-term bm25 is the textually
      // identical expression tree over exact-long operands rounded to
      // 4 dp (text_bm25's discipline); the per-doc SUM of those
      // rounded terms goes through DECIMAL(18,12) (the text_entropy
      // moneySum trick — exact, order-independent), and both rankings
      // break ties by token / doc_id.
      val docs = Tables.documents(s, d)
      // r18: in-row tf/dl (see text_bm25 — same restructure: no
      // doc-term exchange, no dl agg/join, stats from one per-row
      // docs pass; identical operands into the identical bm25 tree).
      val tf = graft.Q.ownPersist(docTermCounts(docs)
        .select(col("doc_id"), col("tok"), col("tf"), col("dl"))).df
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val stats = docs
        .select(size(split(col("text"), " ")).cast("long").as("dl"))
        .agg(count(lit(1)).as("n_docs"),
          (sum(col("dl")).cast("double") / count(lit(1))).as("avgdl"))
      // Persisted: both the probe derivation and the retrieval join
      // read the scored frame (handle leaked to the runner's per-query
      // clearCache, the documented convention).
      val scored = graft.Q.ownPersist(
        tf.join(Q.maybeBroadcast(dfreq), "tok")
          .crossJoin(broadcast(stats))
          .withColumn("bm25", expr(
            "round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)" +
              " / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4)"))
          .select(col("doc_id"), col("tok"), col("bm25"))).df
      val wProbe = Window.partitionBy(col("doc_id"))
        .orderBy(col("bm25").desc, col("tok"))
      val probes = scored.filter(col("doc_id") < 10)
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= 3)
        .select(col("doc_id").as("probe_id"), col("tok"))
      val wTop = Window.partitionBy(col("probe_id"))
        .orderBy(col("score").desc, col("doc_id"))
      scored.join(broadcast(probes), "tok")
        .filter(col("doc_id") =!= col("probe_id"))
        .groupBy(col("probe_id"), col("doc_id"))
        .agg(count(lit(1)).as("n_terms"),
          round(sum(col("bm25").cast("decimal(18,12)")).cast("double"), 4)
            .as("score"))
        .withColumn("rn", row_number().over(wTop).cast("long"))
        .filter(col("rn") <= 5)
        .select(col("probe_id"), col("rn"), col("doc_id"), col("score"),
          col("n_terms"))
        .orderBy(col("probe_id"), col("rn"))
    }),

    "pii_scrub" -> ((s, d) => {
      // PII redaction: emails → <EMAIL>, then long digit runs (≥7) →
      // <PHONE>, with per-row redaction counts for audit. The corpus has
      // no natural PII, so each customer row first gets a DETERMINISTIC
      // synthetic contact line (email + phone derived from c_custkey) —
      // the redaction expressions are the operator under test and run
      // identically in the oracle. Digit-run redaction is deliberately
      // aggressive (also hits the digits inside Customer#0000...) — at
      // scale you tune patterns, not the plumbing. Scan + per-row regex,
      // no shuffle.
      val emailRe = "[a-z0-9.]+@[a-z0-9.]+"
      val raw = concat(col("c_name"), lit(" email: c"),
        col("c_custkey").cast("string"), lit("@example.com phone: "),
        (lit(1000000000L) + col("c_custkey") * lit(7919L)).cast("string"))
      val afterEmail = regexp_replace(raw, emailRe, "<EMAIL>")
      Tables.customer(s, d)
        .select(col("c_custkey"),
          regexp_replace(afterEmail, "[0-9]{7,}", "<PHONE>").as("scrubbed"),
          // group idx 0 = whole match (Spark defaults to group 1)
          size(regexp_extract_all(raw, lit(emailRe), lit(0))).cast("long")
            .as("n_emails"),
          size(regexp_extract_all(afterEmail, lit("[0-9]{7,}"), lit(0)))
            .cast("long").as("n_digit_runs"))
        .orderBy(col("c_custkey"))
    }))

  /** Generated DuckDB oracle for [[cmsTopkVerdict]] — every constant
    * interpolated from [[VerdictCmsD]]/[[VerdictCmsW]] (the ADVICE r9
    * single-sourcing rule); the 15-nibble md5 decode is the exact
    * [[cmsBucket]] spelling. */
  private def cmsVerdictOracle(k: Int): String = {
    val d = VerdictCmsD; val w = VerdictCmsW
    def dig(col: String, i: Int): String =
      s"(CASE WHEN ASCII(SUBSTR($col,${i + 1},1)) >= 97 " +
        s"THEN ASCII(SUBSTR($col,${i + 1},1)) - 87 " +
        s"ELSE ASCII(SUBSTR($col,${i + 1},1)) - 48 END)"
    def bucket(col: String): String =
      "(" + (0 until 15)
        .map(i => s"CAST(${dig(col, i)} AS BIGINT) * ${1L << (4 * (14 - i))}")
        .mkString(" + ") + s") % $w"
    val hashCols = (0 until d)
      .map(i => s"MD5('$i:' || token) AS h$i").mkString(", ")
    val bucketCols = (0 until d)
      .map(i => s"${bucket(s"h$i")} AS b$i").mkString(", ")
    val gridUnion = (0 until d).map(i =>
      s"SELECT $i AS i, b$i AS b, CAST(SUM(n_exact) AS BIGINT) AS total " +
        s"FROM cb GROUP BY b$i").mkString(" UNION ALL ")
    val probeUnion = (0 until d).map(i =>
      s"SELECT token, n_exact, $i AS i, b$i AS b FROM probes")
      .mkString(" UNION ALL ")
    s"""WITH t AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token
       |           FROM documents),
       | c AS (SELECT token, COUNT(*) AS n_exact FROM t GROUP BY token),
       | ch AS (SELECT token, n_exact, $hashCols FROM c),
       | cb AS (SELECT token, n_exact, $bucketCols FROM ch),
       | grid AS ($gridUnion),
       | probes AS (SELECT * FROM cb ORDER BY n_exact DESC, token LIMIT $k),
       | pe AS ($probeUnion)
       |SELECT p.token, p.n_exact, MIN(g.total) AS n_est
       |FROM pe p JOIN grid g ON g.i = p.i AND g.b = p.b
       |GROUP BY p.token, p.n_exact
       |ORDER BY n_exact DESC, token""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "text_cms_topk_verdict" -> cmsVerdictOracle(20),

    "text_zipf" ->
      """WITH t AS (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        | c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY tok),
        | tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM t),
        | r AS (SELECT tok, n, n * 10000 // n_total AS share_bp,
        |    CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS BIGINT) AS rank
        |   FROM c CROSS JOIN tot)
        |SELECT rank, tok, n, share_bp FROM r
        |WHERE rank <= 50 ORDER BY rank""".stripMargin,

    // Per-token contributions round to 10 dp → DECIMAL(18,12) → exact,
    // order-independent sum (see the Spark-side comment).
    "text_entropy" ->
      """WITH t AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        | c AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
        | wn AS (SELECT doc_id, c,
        |    CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n,
        |    CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS n_distinct
        |   FROM c),
        | p AS (SELECT doc_id, n, n_distinct,
        |    CAST(ROUND(-(CAST(c AS DOUBLE) / n) * LN(CAST(c AS DOUBLE) / n), 10)
        |      AS DECIMAL(18,12)) AS contrib
        |   FROM wn),
        | h AS (SELECT doc_id, MAX(n) AS n_tokens, MAX(n_distinct) AS n_distinct,
        |    ROUND(CAST(SUM(contrib) AS DOUBLE), 4) AS entropy_nats
        |   FROM p GROUP BY doc_id)
        |SELECT doc_id, n_tokens, n_distinct, entropy_nats,
        | CASE WHEN n_distinct > 1
        |   THEN ROUND(entropy_nats / LN(CAST(n_distinct AS DOUBLE)), 4)
        |   ELSE 0.0 END AS norm_entropy
        |FROM h ORDER BY doc_id""".stripMargin,

    "text_chunks" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
        |  CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_toks
        | FROM documents),
        | e AS (SELECT doc_id, toks, n_toks,
        |  UNNEST(RANGE(0, CASE WHEN n_toks <= 32 THEN 1
        |    ELSE (n_toks - 32 + 23) // 24 + 1 END)) AS i
        | FROM t)
        |SELECT doc_id, n_toks, i AS chunk_idx, i * 24 + 1 AS tok_start,
        | ARRAY_TO_STRING(LIST_SLICE(toks, i * 24 + 1, i * 24 + 32), ' ')
        |   AS chunk_text
        |FROM e ORDER BY doc_id, chunk_idx""".stripMargin,

    // Grouped-unnest counting computes the same integers as the Spark
    // side's per-row HOFs; `//` matches `div` on non-negative operands.
    "text_repetition" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        | g2 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)),
        |     i -> toks[i] || ' ' || toks[i + 1])) AS gram
        |   FROM d WHERE LEN(toks) >= 2),
        | g3 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS gram
        |   FROM d WHERE LEN(toks) >= 3),
        | g5 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks) - 3),
        |     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' '
        |       || toks[i + 3] || ' ' || toks[i + 4])) AS gram
        |   FROM d WHERE LEN(toks) >= 5),
        | m2 AS (SELECT doc_id, MAX(cnt) AS top2 FROM
        |   (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
        |   GROUP BY doc_id),
        | m3 AS (SELECT doc_id, MAX(cnt) AS top3 FROM
        |   (SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2)
        |   GROUP BY doc_id),
        | m5 AS (SELECT doc_id,
        |     CAST(COUNT(*) FILTER (cnt > 1) AS BIGINT) AS dup5,
        |     CAST(COUNT(*) AS BIGINT) AS dist5 FROM
        |   (SELECT doc_id, gram, COUNT(*) AS cnt FROM g5 GROUP BY 1, 2)
        |   GROUP BY doc_id),
        | r AS (SELECT d.doc_id, d.n_tokens,
        |    CASE WHEN d.n_tokens >= 2
        |      THEN COALESCE(m2.top2, 0) * 2 * 10000 // d.n_tokens
        |      ELSE 0 END AS top2_bp,
        |    CASE WHEN d.n_tokens >= 3
        |      THEN COALESCE(m3.top3, 0) * 3 * 10000 // d.n_tokens
        |      ELSE 0 END AS top3_bp,
        |    CASE WHEN COALESCE(m5.dist5, 0) > 0
        |      THEN COALESCE(m5.dup5, 0) * 10000 // m5.dist5
        |      ELSE 0 END AS dup5_bp
        |   FROM d LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
        |     LEFT JOIN m5 USING (doc_id))
        |SELECT doc_id, n_tokens,
        |  CAST(top2_bp AS BIGINT) AS top2_bp,
        |  CAST(top3_bp AS BIGINT) AS top3_bp,
        |  CAST(dup5_bp AS BIGINT) AS dup5_bp,
        |  CAST(top2_bp <= 2000 AND top3_bp <= 1800 AND dup5_bp <= 1500
        |    AS INT) AS keep
        |FROM r ORDER BY doc_id""".stripMargin,

    // Same statistics as the text_repetition / text_quality / lang_id
    // oracles (grouped-unnest repetition counts, per-row quality and
    // lang), composed into the gate's first-failing-rule CASE chain.
    "text_quality_gate" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
        |    CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        | q AS (SELECT doc_id,
        |    (LEN(LIST_DISTINCT(toks)) * 7000
        |      + (LEN(toks) - LEN(LIST_FILTER(toks,
        |          x -> x IN ('the', 'a', 'of', 'and')))) * 3000)
        |      // LEN(toks) AS quality_bp,
        |    LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
        |      ['the', 'a', 'and', 'query'])) AS en,
        |    LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
        |      ['der', 'und', 'das'])) AS de,
        |    LEN(LIST_INTERSECT(LIST_DISTINCT(toks),
        |      ['el', 'la', 'los'])) AS es
        |  FROM d),
        | ql AS (SELECT doc_id, quality_bp,
        |    CASE WHEN en >= de AND en >= es AND en > 0 THEN 'en'
        |         WHEN de >= es AND de > 0 THEN 'de'
        |         WHEN es > 0 THEN 'es'
        |         ELSE 'unknown' END AS pred_lang
        |  FROM q),
        | g2 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)),
        |     i -> toks[i] || ' ' || toks[i + 1])) AS gram
        |   FROM d WHERE LEN(toks) >= 2),
        | g3 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
        |     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])) AS gram
        |   FROM d WHERE LEN(toks) >= 3),
        | g5 AS (SELECT doc_id, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks) - 3),
        |     i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' '
        |       || toks[i + 3] || ' ' || toks[i + 4])) AS gram
        |   FROM d WHERE LEN(toks) >= 5),
        | m2 AS (SELECT doc_id, MAX(cnt) AS top2 FROM
        |   (SELECT doc_id, gram, COUNT(*) AS cnt FROM g2 GROUP BY 1, 2)
        |   GROUP BY doc_id),
        | m3 AS (SELECT doc_id, MAX(cnt) AS top3 FROM
        |   (SELECT doc_id, gram, COUNT(*) AS cnt FROM g3 GROUP BY 1, 2)
        |   GROUP BY doc_id),
        | m5 AS (SELECT doc_id,
        |     CAST(COUNT(*) FILTER (cnt > 1) AS BIGINT) AS dup5,
        |     CAST(COUNT(*) AS BIGINT) AS dist5 FROM
        |   (SELECT doc_id, gram, COUNT(*) AS cnt FROM g5 GROUP BY 1, 2)
        |   GROUP BY doc_id),
        | r AS (SELECT d.doc_id, d.n_tokens, ql.pred_lang, ql.quality_bp,
        |    COALESCE(m2.top2, 0) AS top2_cnt,
        |    COALESCE(m3.top3, 0) AS top3_cnt,
        |    CAST(CASE WHEN d.n_tokens >= 2
        |      THEN COALESCE(m2.top2, 0) * 2 * 10000 // d.n_tokens
        |      ELSE 0 END AS BIGINT) AS top2_bp,
        |    CAST(CASE WHEN d.n_tokens >= 3
        |      THEN COALESCE(m3.top3, 0) * 3 * 10000 // d.n_tokens
        |      ELSE 0 END AS BIGINT) AS top3_bp,
        |    CAST(CASE WHEN COALESCE(m5.dist5, 0) > 0
        |      THEN COALESCE(m5.dup5, 0) * 10000 // m5.dist5
        |      ELSE 0 END AS BIGINT) AS dup5_bp
        |   FROM d JOIN ql USING (doc_id)
        |     LEFT JOIN m2 USING (doc_id) LEFT JOIN m3 USING (doc_id)
        |     LEFT JOIN m5 USING (doc_id)),
        | v AS (SELECT *,
        |    CASE WHEN n_tokens < 8 THEN 'too_short'
        |         WHEN pred_lang = 'unknown' THEN 'lang'
        |         WHEN (top2_cnt >= 2 AND top2_bp > 2000)
        |           OR (top3_cnt >= 2 AND top3_bp > 1800)
        |           OR dup5_bp > 1500
        |           THEN 'repetition'
        |         WHEN quality_bp < 5000 THEN 'quality'
        |         ELSE 'ok' END AS reason
        |   FROM r)
        |SELECT doc_id, n_tokens, pred_lang, quality_bp,
        |  top2_bp, top3_bp, dup5_bp,
        |  CAST(reason = 'ok' AS INT) AS keep, reason
        |FROM v ORDER BY doc_id""".stripMargin,

    "text_lm_score" ->
      """WITH t AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        | c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
        | tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM c),
        | lp AS (SELECT tok, LN(CAST(n AS DOUBLE) / n_total) AS lp
        |        FROM c CROSS JOIN tot)
        |SELECT doc_id, COUNT(*) AS n_toks, ROUND(AVG(lp), 4) AS avg_logprob
        |FROM t JOIN lp USING (tok)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    // Parallel UNNESTs in one SELECT zip positionally in DuckDB, so the
    // two LIST_TRANSFORMs over RANGE(1, LEN) emit aligned (w1, w2) rows.
    "text_ngram_lm" ->
      """WITH d AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents),
        | b AS (SELECT doc_id,
        |     UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)), i -> toks[i])) AS w1,
        |     UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)), i -> toks[i + 1])) AS w2
        |   FROM d WHERE LEN(toks) >= 2),
        | c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM b GROUP BY 1, 2),
        | c1 AS (SELECT w1, COUNT(*) AS c1 FROM b GROUP BY 1),
        | v AS (SELECT COUNT(DISTINCT tok) AS v FROM
        |   (SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) t),
        | lp AS (SELECT w1, w2, LN(CAST(c2 + 1 AS DOUBLE) / (c1 + v)) AS lp
        |        FROM c2 JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id, COUNT(*) AS n_bigrams, ROUND(AVG(lp), 4) AS avg_logprob
        |FROM b JOIN lp USING (w1, w2)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "text_tfidf" ->
      """WITH t AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        | tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        | df AS (SELECT tok, COUNT(DISTINCT doc_id) AS df FROM t GROUP BY 1),
        | n AS (SELECT COUNT(*) AS n_docs FROM documents),
        | scored AS (
        |   SELECT tf.doc_id, tf.tok,
        |     ROUND(tf * LN(CAST(n_docs + 1 AS DOUBLE) / (df + 1)), 4) AS tfidf
        |   FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n)
        |SELECT doc_id, rn, tok, tfidf FROM (
        |  SELECT doc_id, tok, tfidf,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok) AS rn
        |  FROM scored) x
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    "text_bm25" ->
      """WITH t AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        | tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        | df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        | dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
        | stats AS (SELECT COUNT(*) AS n_docs,
        |             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        | scored AS (
        |   SELECT tf.doc_id, tf.tok,
        |     ROUND(LN(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)
        |       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
        |   FROM tf JOIN df ON tf.tok = df.tok
        |     JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats)
        |SELECT doc_id, rn, tok, bm25 FROM (
        |  SELECT doc_id, tok, bm25,
        |    ROW_NUMBER() OVER (PARTITION BY doc_id
        |      ORDER BY bm25 DESC, tok) AS rn
        |  FROM scored) x
        |WHERE rn <= 3 ORDER BY doc_id, rn""".stripMargin,

    // Probe/retrieval twin of text_bm25's chain: identical scored CTE,
    // probes = top-3 terms of docs 0..9, summed through DECIMAL(18,12)
    // (the text_entropy exact-sum trick), top-5 docs per probe.
    "text_search_bm25" ->
      """WITH t AS (SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS tok
        |           FROM documents),
        | tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM t GROUP BY 1, 2),
        | df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
        | dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY 1),
        | stats AS (SELECT COUNT(*) AS n_docs,
        |             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
        | scored AS (
        |   SELECT tf.doc_id, tf.tok,
        |     ROUND(LN(1 + (n_docs - df + 0.5) / (df + 0.5)) * (tf * 2.2)
        |       / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)), 4) AS bm25
        |   FROM tf JOIN df ON tf.tok = df.tok
        |     JOIN dl ON tf.doc_id = dl.doc_id CROSS JOIN stats),
        | probes AS (
        |   SELECT doc_id AS probe_id, tok FROM (
        |     SELECT doc_id, tok,
        |       ROW_NUMBER() OVER (PARTITION BY doc_id
        |         ORDER BY bm25 DESC, tok) AS prn
        |     FROM scored WHERE doc_id < 10) x
        |   WHERE prn <= 3),
        | hits AS (
        |   SELECT p.probe_id, s.doc_id,
        |     CAST(COUNT(*) AS BIGINT) AS n_terms,
        |     ROUND(CAST(SUM(CAST(s.bm25 AS DECIMAL(18,12))) AS DOUBLE), 4)
        |       AS score
        |   FROM probes p JOIN scored s ON p.tok = s.tok
        |   WHERE s.doc_id <> p.probe_id
        |   GROUP BY 1, 2)
        |SELECT probe_id, rn, doc_id, score, n_terms FROM (
        |  SELECT probe_id, doc_id, score, n_terms,
        |    ROW_NUMBER() OVER (PARTITION BY probe_id
        |      ORDER BY score DESC, doc_id) AS rn
        |  FROM hits) x
        |WHERE rn <= 5 ORDER BY probe_id, rn""".stripMargin,

    "text_stats" ->
      """SELECT lang, COUNT(*) AS n_docs,
        | ROUND(CAST(CAST(SUM(n_chars) AS BIGINT) AS DOUBLE) / COUNT(*), 4) AS avg_chars,
        | ROUND(CAST(CAST(SUM(LEN(STRING_SPLIT(text, ' '))) AS BIGINT) AS DOUBLE)
        |   / COUNT(*), 4) AS avg_tokens
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "text_wordcount" ->
      """SELECT token, COUNT(*) AS n FROM (
        | SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents) t
        |GROUP BY token ORDER BY n DESC, token LIMIT 20""".stripMargin,

    "text_boilerplate" ->
      """WITH p AS (SELECT source,
        |    ARRAY_TO_STRING(LIST_SLICE(STRING_SPLIT(text, ' '), 1, 8), ' ')
        |      AS prefix
        |  FROM documents),
        | c AS (SELECT source, prefix, COUNT(*) AS n_docs
        |        FROM p GROUP BY 1, 2),
        | r AS (SELECT source, prefix, n_docs,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |      ORDER BY n_docs DESC, prefix) AS rn
        |  FROM c)
        |SELECT source, rn, prefix, n_docs FROM r
        |WHERE rn <= 3 ORDER BY source, rn""".stripMargin,

    "text_quality" ->
      """WITH t AS (SELECT doc_id, n_chars, STRING_SPLIT(text, ' ') AS toks
        |  FROM documents)
        |SELECT doc_id, n_chars,
        | LEN(toks) AS n_tokens,
        | ROUND(CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE)
        |   / LEN(toks), 4) AS avg_token_len,
        | ROUND(CAST(LEN(LIST_FILTER(toks,
        |   x -> x IN ('the', 'a', 'of', 'and'))) AS DOUBLE) / LEN(toks), 4)
        |   AS stop_ratio,
        | ROUND(CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks), 4)
        |   AS uniq_ratio,
        | (LEN(LIST_DISTINCT(toks)) * 7000
        |   + (LEN(toks) - LEN(LIST_FILTER(toks,
        |       x -> x IN ('the', 'a', 'of', 'and')))) * 3000) // LEN(toks)
        |   AS quality_bp
        |FROM t ORDER BY doc_id""".stripMargin,

    "text_tokens" ->
      """SELECT doc_id,
        | LEN(STRING_SPLIT(text, ' ')) AS ws_tokens,
        | LEN(REGEXP_EXTRACT_ALL(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS bpe_tokens,
        | ROUND(CAST(n_chars AS DOUBLE) / LEN(STRING_SPLIT(text, ' ')), 4)
        |   AS chars_per_token
        |FROM documents ORDER BY doc_id""".stripMargin,

    "lang_id" ->
      """WITH t AS (SELECT doc_id, lang,
        |  LIST_DISTINCT(STRING_SPLIT(text, ' ')) AS toks FROM documents),
        |sc AS (SELECT doc_id, lang,
        |  LEN(LIST_INTERSECT(toks, ['the', 'a', 'and', 'query'])) AS en,
        |  LEN(LIST_INTERSECT(toks, ['der', 'und', 'das'])) AS de,
        |  LEN(LIST_INTERSECT(toks, ['el', 'la', 'los'])) AS es
        | FROM t)
        |SELECT doc_id, lang,
        | CASE WHEN en >= de AND en >= es AND en > 0 THEN 'en'
        |      WHEN de >= es AND de > 0 THEN 'de'
        |      WHEN es > 0 THEN 'es'
        |      ELSE 'unknown' END AS pred_lang,
        | CAST(CASE WHEN (CASE WHEN en >= de AND en >= es AND en > 0 THEN 'en'
        |      WHEN de >= es AND de > 0 THEN 'de'
        |      WHEN es > 0 THEN 'es'
        |      ELSE 'unknown' END) = lang THEN 1 ELSE 0 END AS INTEGER) AS is_match
        |FROM sc ORDER BY doc_id""".stripMargin,

    "doc_fingerprint" ->
      """WITH t AS (SELECT doc_id,
        |  LIST_TRANSFORM(STRING_SPLIT(text, ' '),
        |    t -> CAST(ASCII(t) * 131 + LENGTH(t) AS BIGINT)) AS vals
        |  FROM documents)
        |SELECT doc_id,
        | LIST_REDUCE(LIST_CONCAT([CAST(0 AS BIGINT)], vals),
        |   (acc, v) -> (acc * 31 + v) % 2147483647) AS fingerprint
        |FROM t ORDER BY doc_id""".stripMargin,

    // DuckDB list lambdas index from 1 (Spark's from 0); same predicate.
    "text_normalize" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(TRIM(text), ' ') AS toks
        |  FROM documents)
        |SELECT doc_id,
        | ARRAY_TO_STRING(LIST_FILTER(toks,
        |   (x, i) -> i = 1 OR x <> toks[i - 1]), ' ') AS norm_text,
        | LEN(toks) AS n_tokens,
        | LEN(LIST_FILTER(toks, (x, i) -> i = 1 OR x <> toks[i - 1]))
        |   AS n_norm_tokens
        |FROM t ORDER BY doc_id""".stripMargin,

    // regexp_replace needs the 'g' flag in DuckDB (Spark replaces all by
    // default); REGEXP_EXTRACT_ALL stands in for the missing regexp_count.
    "pii_scrub" ->
      """WITH raw AS (SELECT c_custkey,
        |  c_name || ' email: c' || CAST(c_custkey AS VARCHAR)
        |    || '@example.com phone: '
        |    || CAST(1000000000 + c_custkey * 7919 AS VARCHAR) AS pii
        |  FROM customer),
        |e AS (SELECT c_custkey, pii,
        |  REGEXP_REPLACE(pii, '[a-z0-9.]+@[a-z0-9.]+', '<EMAIL>', 'g')
        |    AS after_email
        |  FROM raw)
        |SELECT c_custkey,
        | REGEXP_REPLACE(after_email, '[0-9]{7,}', '<PHONE>', 'g') AS scrubbed,
        | CAST(LEN(REGEXP_EXTRACT_ALL(pii, '[a-z0-9.]+@[a-z0-9.]+')) AS BIGINT)
        |   AS n_emails,
        | CAST(LEN(REGEXP_EXTRACT_ALL(after_email, '[0-9]{7,}')) AS BIGINT)
        |   AS n_digit_runs
        |FROM e ORDER BY c_custkey""".stripMargin)
}
