package graft.operators

import graft.Tables
import graft.Q.QFn
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Data-quality / pipeline-hygiene operators: deterministic sampling and
 * per-column profiling — the inspection stages of an ETL pipeline.
 *
 * Sampling is modulo-arithmetic on keys, NOT `df.sample()`: a random
 * sample isn't reproducible across engines or runs, and at 100 TB a
 * deterministic hash/mod sample is also what lets two pipeline stages
 * agree on the same sample without coordination.
 *
 * Profiling is one aggregate per column unioned — at scale this is a
 * single pass per column batch with partial aggregation; no driver-side
 * describe().
 */
object Profiling {

  val queries: Map[String, QFn] = Map(
    "sample_mod" -> ((s, d) => {
      Tables.lineitem(s, d)
        .filter(pmod(col("l_orderkey") * 31 + col("l_linenumber"), lit(10)) === 0)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        // total order over all outputs — (orderkey, linenumber) is not a
        // key in this corpus (see scan_project's note in Relational)
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    }),

    "profile_orders" -> ((s, d) => {
      val o = Tables.orders(s, d)
      def prof(cname: String) =
        o.agg(
          count(lit(1)).as("n_rows"),
          sum(when(col(cname).isNull, 1L).otherwise(0L)).as("n_nulls"),
          countDistinct(col(cname)).as("n_distinct"),
          min(col(cname)).cast("double").as("min_val"),
          max(col(cname)).cast("double").as("max_val"))
          .withColumn("col_name", lit(cname))
      prof("o_orderkey")
        .unionByName(prof("o_custkey"))
        .unionByName(prof("o_totalprice"))
        .orderBy(col("col_name"))
    }),

    "split_train_holdout" -> ((s, d) => {
      // Deterministic ~90/10 train/holdout assignment keyed on a
      // CONTENT-STABLE hash of the doc id (salted so other samplers on
      // the same key decorrelate): the same doc lands in the same split
      // on any engine, any partitioning, any run — the leakage-safe
      // alternative to df.sample() for corpus splits. md5 because both
      // engines produce identical lowercase hex; first-2-hex-chars <
      // "e6" ≈ 230/256 ≈ 89.8% train. Pure per-row expressions, no
      // shuffle beyond the verify sort.
      val h = substring(md5(concat(col("doc_id").cast("string"), lit(":split"))), 1, 2)
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"),
          when(h < "e6", "train").otherwise("holdout").as("split"))
        .orderBy(col("doc_id"))
    }),

    "sample_weighted" -> ((s, d) => {
      // Sequential Poisson sampling (Ohlsson 1998 — public; the
      // probability-proportional-to-size method survey statistics runs
      // at census scale): priority = u / w for a per-row uniform u and
      // weight w, keep the n smallest priorities. Weighting by document
      // length gives the curation move "sample tokens, not documents".
      // u is the first 8 hex digits of a salted md5 of the doc id,
      // read as a 32-bit integer (r10 — VERDICT r9 #4: the previous
      // pure-LCG step had tiny low-bit periods and strongly correlated
      // consecutive ids, and its 64-bit product overflowed past
      // doc_id ≈ 8.4e9; md5 is well-mixed at any corpus size and both
      // engines render identical lowercase hex). The priority stays an
      // INTEGER (u scaled by 1e6, integer-divided by w) — bit-identical
      // in both engines, and immune to the float-rank-boundary class
      // the DSIR op had to engineer around. Top-100 by (priority,
      // doc_id) is TakeOrderedAndProject — no global sort, no shuffle
      // beyond the bounded top-k; at 100 TB this is one scan + one
      // 100-row reduction.
      Tables.documents(s, d)
        .withColumn("u", expr(
          "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':sw')), 1, 8), 16, 10) AS BIGINT)"))
        // greatest(...,1): total on empty docs (corpus min is 48 chars)
        .withColumn("priority", expr("u * 1000000 div greatest(n_chars, 1)"))
        .select(col("doc_id"), col("n_chars"), col("u"), col("priority"))
        .orderBy(col("priority"), col("doc_id"))
        .limit(100)
    }),

    "sample_stratified" -> ((s, d) => {
      // Deterministic 10% PER-STRATUM sample (by language): first ⌈n·0.1⌉
      // docs of each stratum in doc_id order — every language keeps its
      // proportional share, unlike a global mod-sample that can starve
      // small strata. One shuffle by the stratum key; the per-stratum
      // count rides the same window partition (no second pass). At 100 TB
      // swap doc_id order for a hash order if insertion order is biased.
      val byLang = Window.partitionBy(col("lang"))
      Tables.documents(s, d)
        .select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(byLang.orderBy(col("doc_id")))
          .cast("long"))
        .withColumn("strata_n", count(lit(1)).over(byLang))
        .filter(col("rn") <= ceil(col("strata_n") * 0.1))
        .orderBy(col("lang"), col("doc_id"))
    }))

  val oracleSql: Map[String, String] = Map(
    "sample_mod" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE (l_orderkey * 31 + l_linenumber) % 10 = 0
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,

    "profile_orders" -> Seq("o_orderkey", "o_custkey", "o_totalprice").map { c =>
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
         | CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         | COUNT(DISTINCT $c) AS n_distinct,
         | CAST(MIN($c) AS DOUBLE) AS min_val,
         | CAST(MAX($c) AS DOUBLE) AS max_val
         |FROM orders""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),

    "split_train_holdout" ->
      """SELECT doc_id, lang,
        | CASE WHEN SUBSTR(MD5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6'
        |   THEN 'train' ELSE 'holdout' END AS split
        |FROM documents ORDER BY doc_id""".stripMargin,

    // DuckDB 1.0 has no hex→int cast, so u is assembled positionally
    // from the same 8 lowercase-hex md5 chars Spark's conv() reads —
    // identical integers by construction.
    "sample_weighted" ->
      """WITH h AS (
        | SELECT doc_id, n_chars,
        |  SUBSTR(MD5(CAST(doc_id AS VARCHAR) || ':sw'), 1, 8) AS hx
        | FROM documents),
        |uu AS (
        | SELECT doc_id, n_chars,
        |  (STRPOS('0123456789abcdef', SUBSTR(hx,1,1))-1)*268435456
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,2,1))-1)*16777216
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,3,1))-1)*1048576
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,4,1))-1)*65536
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,5,1))-1)*4096
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,6,1))-1)*256
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,7,1))-1)*16
        |  + (STRPOS('0123456789abcdef', SUBSTR(hx,8,1))-1) AS u
        | FROM h)
        |SELECT doc_id, n_chars, CAST(u AS BIGINT) AS u,
        | CAST(u AS BIGINT) * 1000000 // GREATEST(n_chars, 1) AS priority
        |FROM uu
        |ORDER BY priority, doc_id LIMIT 100""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, rn, strata_n FROM (
        | SELECT doc_id, lang,
        |  ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rn,
        |  COUNT(*) OVER (PARTITION BY lang) AS strata_n
        | FROM documents) t
        |WHERE rn <= CEIL(strata_n * 0.1)
        |ORDER BY lang, doc_id""".stripMargin)
}
