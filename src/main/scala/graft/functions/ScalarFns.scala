package graft.functions

import graft.{Q, Tables}
import graft.Q.QFn
import org.apache.spark.sql.functions._

/**
 * Scalar function surface (SURVEY.md §2b): string / date / math / array /
 * json / cast families, one query each, all codegen'd built-ins (no UDFs —
 * everything stays inside whole-stage codegen).
 *
 * Cross-engine parity notes:
 *  - int-returning Spark functions (length, year, ceil, rank…) are cast
 *    to LONG because DuckDB returns BIGINT;
 *  - per-row double arithmetic (products, sqrt) is IEEE-identical across
 *    engines and left unrounded; only libm-backed functions (ln) round 4dp;
 *  - float array elements are cast to double *inside* lambdas so both
 *    engines multiply in double (a float×float product would round
 *    differently);
 *  - double→int conversions go through FLOOR explicitly: Spark's cast
 *    truncates while DuckDB's rounds — never rely on the bare cast.
 */
object ScalarFns {

  val queries: Map[String, QFn] = Map(
    "fn_string" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("up_name"),
          substring(col("p_name"), 1, 8).as("sub_name"),
          concat(col("p_brand"), lit("-"), col("p_type")).as("brand_type"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          expr("replace(p_name, ' ', '_')").as("snake_name"),
          size(split(col("p_name"), " ")).cast("long").as("n_words"),
          rtrim(col("p_name"), "aeiou").as("rtrimmed"))
        .orderBy(col("p_partkey"))
    }),

    "fn_regex" -> ((s, d) => {
      // Regex scalar surface beyond fn_string's single extract: full-text
      // extract / global count / global replace / boolean match, all
      // RE2-safe patterns (no backreferences — portable across Spark's
      // java.util.regex and DuckDB's RE2). Pure per-row expressions, one
      // scan, codegen'd; no-match extract is '' on BOTH engines
      // (verified), so no null-vs-empty divergence.
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "sc[a-z]+", 0).as("first_sc"),
          size(expr("regexp_extract_all(text, 'scan', 0)")).cast("long").as("n_scan"),
          regexp_replace(substring(col("text"), 1, 60), "[aeiou]", "_").as("masked60"),
          expr("text rlike 'join [a-z]+ merge'").cast("long").as("join_then_merge"))
        .orderBy(col("doc_id"))
    }),

    "fn_url" -> ((s, d) => {
      // URL decomposition — the first parse of any web-scraped corpus
      // (host → domain capping, path → route analytics, query params →
      // tracking strip). The corpus has no URL column, so each order row
      // first gets a DETERMINISTIC synthetic URL (like pii_scrub's
      // synthetic contact line) — parse_url is the operator under test.
      // Spark's parse_url is a codegen'd built-in (java.net.URI-backed);
      // the oracle spells the same decomposition as RE2 regexes. Pure
      // per-row scan shape, no shuffle.
      val url = concat(lit("https://shop"),
        pmod(col("o_custkey"), lit(20)).cast("string"),
        lit(".example.com/cat/"),
        pmod(col("o_orderkey"), lit(7)).cast("string"),
        lit("/item?sku="), col("o_orderkey").cast("string"), lit("&ref=email"))
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          parse_url(url, lit("HOST")).as("host"),
          parse_url(url, lit("PATH")).as("path"),
          parse_url(url, lit("QUERY"), lit("sku")).cast("long").as("sku"),
          parse_url(url, lit("PROTOCOL")).as("proto"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_date" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("m"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).cast("timestamp_ntz").as("month_start"),
          datediff(col("o_orderdate"), lit("1995-01-01")).cast("long").as("days_since"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"),
          ((year(col("o_orderdate")) - 1995) * 12 + month(col("o_orderdate")) - 1)
            .cast("long").as("months_since"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_math" -> ((s, d) => {
      Tables.part(s, d)
        .select(
          col("p_partkey"),
          abs(col("p_size") - 25).as("abs_sz"),
          ceil(col("p_retailprice")).as("ceil_price"),
          floor(col("p_retailprice")).as("floor_price"),
          pow(col("p_size"), 2).as("sz_sq"),
          Q.r4(log(col("p_retailprice"))).as("ln_price"),
          sqrt(col("p_retailprice")).as("sqrt_price"),
          pmod(col("p_partkey"), lit(7L)).as("key_mod"),
          greatest(col("p_size"), lit(25)).cast("long").as("g_sz"),
          least(col("p_size"), lit(25)).cast("long").as("l_sz"))
        .orderBy(col("p_partkey"))
    }),

    "fn_bitwise" -> ((s, d) => {
      // Bit manipulation over BIGINT keys: and/or/xor masks, shifts, and
      // popcount — the hash/bucketing/bitmap-flag toolkit (the same ops
      // the LSH band keys and upsert bucketing use). Pure per-row
      // codegen'd expressions, no shuffle beyond the verify sort.
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          col("o_orderkey").bitwiseAND(lit(255L)).as("k_and"),
          col("o_orderkey").bitwiseOR(lit(4096L)).as("k_or"),
          col("o_orderkey").bitwiseXOR(shiftright(col("o_orderkey"), 3)).as("k_xor"),
          shiftleft(col("o_orderkey"), 2).as("k_shl"),
          bit_count(col("o_orderkey")).cast("long").as("k_bits"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_array" -> ((s, d) => {
      // Higher-order functions over the 64-dim float vectors; all lambda
      // arithmetic promoted to double before multiplying (see header).
      // The slice/transform result is projected to scalar columns: the
      // driver's comparator can't hash array cells (§7d).
      val first3 = transform(slice(col("embedding"), 1, 3), x => x.cast("double"))
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          size(col("embedding")).cast("long").as("n_dims"),
          element_at(first3, 1).as("e1"),
          element_at(first3, 2).as("e2"),
          element_at(first3, 3).as("e3"),
          Q.r4(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double") * x.cast("double"))).as("sum_sq"),
          size(filter(col("embedding"), x => x > 0f)).cast("long").as("n_pos"),
          array_max(col("embedding")).cast("double").as("max_val"))
        .orderBy(col("vec_id"))
    }),

    "fn_explode" -> ((s, d) => {
      // Positional generator (table-valued function surface): token +
      // 0-based position per document, lateral-view style.
      Tables.documents(s, d)
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("token"))
        .filter(col("pos") < 5)
        .orderBy(col("doc_id"), col("pos"))
    }),

    "fn_vector" -> ((s, d) => {
      // Vector arithmetic surface: norm, normalization, elementwise
      // combine, scaling — all double-promoted inside lambdas/kernels.
      val sq = graft.plans.VectorExprs.dotF32(col("embedding"), col("embedding"))
      Tables.embeddings(s, d)
        .select(
          col("vec_id"),
          round(sqrt(sq), 4).as("l2_norm"),
          round(element_at(col("embedding"), 1).cast("double") / sqrt(sq), 4)
            .as("unit_first"),
          round(aggregate(zip_with(col("embedding"), reverse(col("embedding")),
            (x, y) => x.cast("double") + y.cast("double")),
            lit(0.0), (acc, x) => acc + x), 4).as("sum_with_rev"),
          round(array_max(transform(col("embedding"), x => x.cast("double") * 2.0)), 4)
            .as("scaled_max"))
        .orderBy(col("vec_id"))
    }),

    "fn_json" -> ((s, d) => {
      Tables.events(s, d)
        .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
          col("value"))
        .groupBy(col("k"))
        .agg(count(lit(1)).as("n_events"), Q.moneySum(col("value")).as("sum_value"))
        .orderBy(col("k"))
    }),

    // Map construction + element access; oracled via DuckDB's MAP literal
    // (element access there returns a 1-list → indexed [1]).
    "fn_map" -> ((s, d) => {
      Tables.events(s, d)
        .select(col("event_id"),
          map(lit("type"), col("event_type"),
              lit("k"), get_json_object(col("props"), "$.k")).as("m"))
        .select(col("event_id"),
          element_at(col("m"), "type").as("m_type"),
          element_at(col("m"), "k").cast("long").as("m_k"),
          size(map_keys(col("m"))).cast("long").as("n_keys"))
        .orderBy(col("event_id"))
    }),

    "fn_cast" -> ((s, d) => {
      Tables.orders(s, d)
        .select(
          col("o_orderkey"),
          concat(lit("O"), col("o_orderkey").cast("string")).as("okey_str"),
          floor(col("o_totalprice")).cast("long").as("price_int"),
          col("o_orderdate").cast("timestamp_ntz").cast("string").as("date_str"),
          col("o_orderdate").cast("timestamp_ntz").cast("string")
            .cast("timestamp_ntz").as("back_ts"),
          col("o_custkey").cast("double").as("cust_dbl"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_struct" -> ((s, d) => {
      // Struct build + field access — the nested-record surface. The
      // verify OUTPUT stays flat (§7d rule 4: no structs out), so the
      // struct is built, navigated, and projected back to scalars.
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          struct(col("o_orderstatus").as("st"),
            col("o_totalprice").as("tp")).as("o"))
        .select(col("o_orderkey"),
          col("o.st").as("status"),
          (col("o.tp") > 300000).cast("int").as("is_big"))
        .orderBy(col("o_orderkey"))
    }))

  val oracleSql: Map[String, String] = Map(
    "fn_string" ->
      """SELECT p_partkey,
        | UPPER(p_name) AS up_name,
        | SUBSTRING(p_name, 1, 8) AS sub_name,
        | p_brand || '-' || p_type AS brand_type,
        | LENGTH(p_name) AS name_len,
        | REGEXP_EXTRACT(p_name, '([a-z]+)', 1) AS first_word,
        | REPLACE(p_name, ' ', '_') AS snake_name,
        | LEN(STRING_SPLIT(p_name, ' ')) AS n_words,
        | RTRIM(p_name, 'aeiou') AS rtrimmed
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_regex" ->
      """SELECT doc_id,
        | REGEXP_EXTRACT(text, 'sc[a-z]+') AS first_sc,
        | LEN(REGEXP_EXTRACT_ALL(text, 'scan')) AS n_scan,
        | REGEXP_REPLACE(SUBSTRING(text, 1, 60), '[aeiou]', '_', 'g') AS masked60,
        | CAST(REGEXP_MATCHES(text, 'join [a-z]+ merge') AS BIGINT) AS join_then_merge
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_url" ->
      """WITH u AS (SELECT o_orderkey,
        |    'https://shop' || CAST(o_custkey % 20 AS VARCHAR)
        |      || '.example.com/cat/' || CAST(o_orderkey % 7 AS VARCHAR)
        |      || '/item?sku=' || CAST(o_orderkey AS VARCHAR) || '&ref=email'
        |      AS url
        |  FROM orders)
        |SELECT o_orderkey,
        | REGEXP_EXTRACT(url, 'https?://([^/]+)', 1) AS host,
        | REGEXP_EXTRACT(url, 'https?://[^/]+([^?]*)', 1) AS path,
        | CAST(REGEXP_EXTRACT(url, 'sku=([0-9]+)', 1) AS BIGINT) AS sku,
        | REGEXP_EXTRACT(url, '^([a-z]+):', 1) AS proto
        |FROM u ORDER BY o_orderkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        | YEAR(o_orderdate) AS y,
        | MONTH(o_orderdate) AS m,
        | DAYOFMONTH(o_orderdate) AS dom,
        | CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS month_start,
        | DATE_DIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS days_since,
        | CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
        | (YEAR(o_orderdate) - 1995) * 12 + MONTH(o_orderdate) - 1 AS months_since
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT o_orderkey,
        | o_orderkey & 255 AS k_and,
        | o_orderkey | 4096 AS k_or,
        | XOR(o_orderkey, o_orderkey >> 3) AS k_xor,
        | o_orderkey << 2 AS k_shl,
        | CAST(BIT_COUNT(o_orderkey) AS BIGINT) AS k_bits
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      """SELECT p_partkey,
        | ABS(p_size - 25) AS abs_sz,
        | CAST(CEIL(p_retailprice) AS BIGINT) AS ceil_price,
        | CAST(FLOOR(p_retailprice) AS BIGINT) AS floor_price,
        | POW(p_size, 2) AS sz_sq,
        | ROUND(LN(p_retailprice), 4) AS ln_price,
        | SQRT(p_retailprice) AS sqrt_price,
        | p_partkey % 7 AS key_mod,
        | GREATEST(p_size, 25) AS g_sz,
        | LEAST(p_size, 25) AS l_sz
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_array" ->
      """SELECT vec_id,
        | LEN(embedding) AS n_dims,
        | (LIST_TRANSFORM(embedding[1:3], x -> CAST(x AS DOUBLE)))[1] AS e1,
        | (LIST_TRANSFORM(embedding[1:3], x -> CAST(x AS DOUBLE)))[2] AS e2,
        | (LIST_TRANSFORM(embedding[1:3], x -> CAST(x AS DOUBLE)))[3] AS e3,
        | ROUND(LIST_SUM(LIST_TRANSFORM(embedding,
        |   x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))), 4) AS sum_sq,
        | LEN(LIST_FILTER(embedding, x -> x > 0)) AS n_pos,
        | CAST(LIST_MAX(embedding) AS DOUBLE) AS max_val
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_explode" ->
      """WITH t AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, toks[i] AS token
        |FROM t, UNNEST(RANGE(1, LEN(toks) + 1)) AS r(i)
        |WHERE i <= 5
        |ORDER BY doc_id, pos""".stripMargin,

    "fn_vector" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
        |  FROM embeddings),
        |n AS (SELECT vec_id, emb,
        |  LIST_SUM(LIST_TRANSFORM(emb, x -> x * x)) AS sq FROM e)
        |SELECT vec_id,
        | ROUND(SQRT(sq), 4) AS l2_norm,
        | ROUND(emb[1] / SQRT(sq), 4) AS unit_first,
        | ROUND(LIST_SUM(LIST_TRANSFORM(RANGE(1, LEN(emb) + 1),
        |   i -> emb[i] + emb[LEN(emb) - i + 1])), 4) AS sum_with_rev,
        | ROUND(LIST_MAX(LIST_TRANSFORM(emb, x -> x * 2.0)), 4) AS scaled_max
        |FROM n ORDER BY vec_id""".stripMargin,

    "fn_json" ->
      """SELECT CAST(REGEXP_EXTRACT(props, '"k": *(-?\d+)', 1) AS BIGINT) AS k,
        | COUNT(*) AS n_events,
        | CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "fn_map" ->
      """WITH t AS (SELECT event_id,
        |  MAP {'type': event_type,
        |       'k': REGEXP_EXTRACT(props, '"k": *(-?\d+)', 1)} AS m
        |  FROM events)
        |SELECT event_id,
        | m['type'][1] AS m_type,
        | CAST(m['k'][1] AS BIGINT) AS m_k,
        | CAST(CARDINALITY(m) AS BIGINT) AS n_keys
        |FROM t ORDER BY event_id""".stripMargin,

    "fn_cast" ->
      """SELECT o_orderkey,
        | 'O' || CAST(o_orderkey AS VARCHAR) AS okey_str,
        | CAST(FLOOR(o_totalprice) AS BIGINT) AS price_int,
        | CAST(o_orderdate AS VARCHAR) AS date_str,
        | CAST(CAST(o_orderdate AS VARCHAR) AS TIMESTAMP) AS back_ts,
        | CAST(o_custkey AS DOUBLE) AS cust_dbl
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    "fn_struct" ->
      """WITH t AS (SELECT o_orderkey,
        |  STRUCT_PACK(st := o_orderstatus, tp := o_totalprice) AS o
        |  FROM orders)
        |SELECT o_orderkey, o.st AS status,
        | CAST(CASE WHEN o.tp > 300000 THEN 1 ELSE 0 END AS INTEGER) AS is_big
        |FROM t ORDER BY o_orderkey""".stripMargin)
}
