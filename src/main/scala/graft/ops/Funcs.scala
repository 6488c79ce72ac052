package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.H._

/** Scalar-function / semi-structured inventory (SURVEY.md §2B q_case_null,
  * q_str_*, q_date_*, q_ts_*, q_math_*, q_cast, q_array_*, q_json_get,
  * q_explode_pos, q_pivot, q_unpivot, q_window_*, q_approx_distinct).
  *
  * Cross-engine normalisation rules (SURVEY.md §7.3):
  *  - integer-valued function results → BIGINT on both sides
  *    (Spark length/year/ceil/rank return INT or LONG inconsistently);
  *  - transcendentals (ln/log10/pow/sqrt) rounded to 4dp — libm ulp
  *    differences are far below that;
  *  - never CAST double→int directly (DuckDB rounds, Spark truncates):
  *    FLOOR/CEIL first;
  *  - all functions here are codegen'd Catalyst built-ins — no UDFs.
  */
object Funcs {

  val qs: Seq[Q] = Seq(

    Q("q_case_null",
      Some("""SELECT o_orderkey,
                     CASE WHEN o_totalprice > 300000 THEN 'big'
                          WHEN o_totalprice > 150000 THEN 'mid'
                          ELSE 'small' END AS bucket,
                     COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS st,
                     CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS urgent
              FROM orders ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          when(col("o_totalprice") > 300000, "big")
            .when(col("o_totalprice") > 150000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("open")).as("st"),
          when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0).as("urgent"))
        .orderBy("o_orderkey")),

    Q("q_str_funcs",
      Some("""SELECT p_partkey,
                     UPPER(p_name) AS up, LOWER(p_brand) AS lo,
                     SUBSTR(p_name, 1, 8) AS sub,
                     TRIM(CONCAT('  ', p_name, ' ')) AS tr,
                     CAST(LENGTH(p_name) AS BIGINT) AS len,
                     CONCAT_WS('-', p_brand, p_type) AS cw,
                     REPLACE(p_name, 'a', 'X') AS rep,
                     LPAD(CAST(p_size AS VARCHAR), 5, '0') AS pad
              FROM part ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("up"),
          lower(col("p_brand")).as("lo"),
          substring(col("p_name"), 1, 8).as("sub"),
          trim(concat(lit("  "), col("p_name"), lit(" "))).as("tr"),
          length(col("p_name")).cast("long").as("len"),
          concat_ws("-", col("p_brand"), col("p_type")).as("cw"),
          expr("replace(p_name, 'a', 'X')").as("rep"),
          lpad(col("p_size").cast("string"), 5, "0").as("pad"))
        .orderBy("p_partkey")),

    Q("q_str_like_regex",
      Some("""SELECT p_partkey, p_name,
                     CAST(p_type LIKE 'PROMO%' AS BOOLEAN) AS is_promo,
                     CAST(p_name LIKE '%bolt%' AS BOOLEAN) AS has_bolt,
                     CAST(regexp_matches(p_name, 'w.dget$') AS BOOLEAN) AS is_widget,
                     regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
                     regexp_replace(p_name, '[aeiou]', '_', 'g') AS devowel,
                     array_to_string(string_split(p_name, ' '), '|') AS words
              FROM part ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"), col("p_name"),
          col("p_type").like("PROMO%").as("is_promo"),
          col("p_name").like("%bolt%").as("has_bolt"),
          col("p_name").rlike("w.dget$").as("is_widget"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          regexp_replace(col("p_name"), "[aeiou]", "_").as("devowel"),
          array_join(split(col("p_name"), " "), "|").as("words"))
        .orderBy("p_partkey")),

    // URL normalization — the crawl-curation pass that turns a page URL
    // into (host, registrable domain, path, query param) for per-domain
    // stats and blocklist joins. Spark goes through the REAL parse_url
    // on a URL constructed from relational columns; the oracle
    // recomputes the expected parts from the columns alone (the
    // round-trip technique of q_mm_video_meta). The registrable domain
    // is the last two host labels (public-suffix handling is a data
    // problem, out of scope for a fixed-suffix corpus).
    Q("q_str_url",
      Some("""SELECT doc_id,
                     source || '.example.com' AS host,
                     'example.com' AS domain,
                     '/docs/' || CAST(doc_id AS VARCHAR) AS path,
                     lang AS lang_param
              FROM documents
              WHERE source IS NOT NULL AND lang IS NOT NULL
              ORDER BY doc_id"""),
      (s, dir) => t(s, dir, "documents")
        // NULL source/lang would null the whole constructed URL on this
        // side while the oracle still emits its literal fields — filter
        // identically on both engines so a testdata regen with NULLs
        // cannot silently diverge the comparison
        .filter(col("source").isNotNull && col("lang").isNotNull)
        .withColumn("url",
          concat(lit("https://"), col("source"), lit(".example.com/docs/"),
            col("doc_id").cast("string"), lit("?lang="), col("lang"),
            lit("#frag")))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          array_join(slice(split(parse_url(col("url"), lit("HOST")),
            "\\."), -2, 2), ".").as("domain"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("lang")).as("lang_param"))
        .orderBy("doc_id")),

    Q("q_date_funcs",
      Some("""SELECT o_orderkey,
                     CAST(o_orderdate AS DATE) AS d,
                     CAST(YEAR(o_orderdate) AS BIGINT) AS y,
                     CAST(MONTH(o_orderdate) AS BIGINT) AS mo,
                     CAST(DAY(o_orderdate) AS BIGINT) AS dom,
                     date_trunc('month', o_orderdate) AS month_start,
                     CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS d_plus30,
                     CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS BIGINT) AS days_to_y2k,
                     last_day(CAST(o_orderdate AS DATE)) AS eom
              FROM orders ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderdate").cast("date").as("d"),
          year(col("o_orderdate")).cast("long").as("y"),
          month(col("o_orderdate")).cast("long").as("mo"),
          dayofmonth(col("o_orderdate")).cast("long").as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_add(col("o_orderdate").cast("date"), 30).as("d_plus30"),
          datediff(lit(java.sql.Date.valueOf("2000-01-01")),
            col("o_orderdate").cast("date")).cast("long").as("days_to_y2k"),
          last_day(col("o_orderdate").cast("date")).as("eom"))
        .orderBy("o_orderkey")),

    Q("q_ts_funcs",
      Some("""WITH e AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
              SELECT event_id,
                     CAST(HOUR(ts) AS BIGINT) AS h,
                     CAST(MINUTE(ts) AS BIGINT) AS m,
                     epoch_us(ts) AS us,
                     CAST(ts AS DATE) AS d,
                     date_trunc('hour', ts) AS hr
              FROM e ORDER BY event_id"""),
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          hour(col("ts")).cast("long").as("h"),
          minute(col("ts")).cast("long").as("m"),
          unix_micros(col("ts")).as("us"),
          col("ts").cast("date").as("d"),
          date_trunc("hour", col("ts")).as("hr"))
        .orderBy("event_id")),

    Q("q_math_funcs",
      Some("""SELECT l_orderkey, l_linenumber, l_extendedprice,
                     ROUND(l_extendedprice, 0) AS r0,
                     ABS(l_discount - 0.05) AS ad,
                     CAST(CEIL(l_quantity) AS BIGINT) AS ce,
                     CAST(FLOOR(l_quantity) AS BIGINT) AS fl,
                     ROUND(SQRT(l_quantity), 4) AS sq,
                     ROUND(LN(l_extendedprice), 4) AS lnp,
                     ROUND(LOG10(l_extendedprice), 4) AS lg,
                     ROUND(POWER(l_quantity, 2), 4) AS p2,
                     CAST(FLOOR(l_quantity) AS BIGINT) % 7 AS md,
                     CAST(SIGN(l_discount - 0.05) AS DOUBLE) AS sg
              FROM lineitem
              ORDER BY l_orderkey, l_linenumber, l_extendedprice"""),
      (s, dir) => t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"),
          round(col("l_extendedprice"), 0).as("r0"),
          abs(col("l_discount") - 0.05).as("ad"),
          ceil(col("l_quantity")).cast("long").as("ce"),
          floor(col("l_quantity")).cast("long").as("fl"),
          round(sqrt(col("l_quantity")), 4).as("sq"),
          round(log(col("l_extendedprice")), 4).as("lnp"),
          round(log10(col("l_extendedprice")), 4).as("lg"),
          round(pow(col("l_quantity"), 2), 4).as("p2"),
          (floor(col("l_quantity")).cast("long") % 7).as("md"),
          signum(col("l_discount") - 0.05).cast("double").as("sg"))
        .orderBy("l_orderkey", "l_linenumber", "l_extendedprice")),

    Q("q_cast",
      Some("""SELECT o_orderkey,
                     CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS rt_int,
                     CAST(FLOOR(o_totalprice) AS BIGINT) AS floor_int,
                     CAST(o_orderkey AS DOUBLE) AS as_dbl,
                     CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS d_str,
                     CAST('2020-01-02 03:04:05' AS TIMESTAMP) AS ts_lit,
                     CAST('42' AS BIGINT) AS int_lit
              FROM orders ORDER BY o_orderkey"""),
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"),
          col("o_orderkey").cast("string").cast("long").as("rt_int"),
          floor(col("o_totalprice")).cast("long").as("floor_int"),
          col("o_orderkey").cast("double").as("as_dbl"),
          col("o_orderdate").cast("date").cast("string").as("d_str"),
          lit("2020-01-02 03:04:05").cast("timestamp").as("ts_lit"),
          lit("42").cast("long").as("int_lit"))
        .orderBy("o_orderkey")),

    Q("q_array_ops",
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents)
              SELECT doc_id,
                     CAST(len(w) AS BIGINT) AS n_toks,
                     w[1] AS first_tok,
                     array_to_string(w[1:5], '_') AS head5,
                     CAST(list_contains(w, 'spark') AS BOOLEAN) AS has_spark
              FROM d ORDER BY doc_id"""),
      (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"), split(col("text"), " ").as("w"))
        d.select(col("doc_id"),
            size(col("w")).cast("long").as("n_toks"),
            element_at(col("w"), 1).as("first_tok"),
            array_join(slice(col("w"), 1, 5), "_").as("head5"),
            array_contains(col("w"), "spark").as("has_spark"))
          .orderBy("doc_id")
      }),

    Q("q_array_hof",
      Some("""SELECT vec_id,
                     ROUND(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE)),
                                       (a, b) -> a + b), 4) AS ssum,
                     CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
                     ROUND(list_max(list_transform(embedding, x -> CAST(x AS DOUBLE))), 4) AS mx
              FROM embeddings ORDER BY vec_id"""),
      (s, dir) => t(s, dir, "embeddings")
        .select(col("vec_id"),
          // Sequential left fold: same fp evaluation order as DuckDB's
          // list_reduce, so no rounding drift.
          round(aggregate(transform(col("embedding"), x => x.cast("double")),
            lit(0.0), (acc, x) => acc + x), 4).as("ssum"),
          size(filter(col("embedding"), x => x > 0)).cast("long").as("n_pos"),
          round(array_max(transform(col("embedding"), x => x.cast("double"))), 4).as("mx"))
        .orderBy("vec_id")),

    Q("q_json_get",
      Some("""SELECT event_id,
                     json_extract_string(props, '$.k') AS k_str,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
              FROM events ORDER BY event_id"""),
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
        .orderBy("event_id")),

    // Error-safe casts: TRY_CAST yields NULL where ANSI CAST throws —
    // the ingestion-time safety valve for dirty columns (ANSI stays ON
    // for arithmetic; TRY_CAST scopes the leniency to the cast).
    Q("q_try_cast",
      Some("""SELECT p_partkey,
                     TRY_CAST(p_brand AS BIGINT) AS brand_num,
                     TRY_CAST(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT) AS brand_digits,
                     TRY_CAST(p_name AS DOUBLE) AS name_num,
                     CAST(TRY_CAST(p_size AS VARCHAR) AS BIGINT) AS size_rt
              FROM part ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          expr("try_cast(p_brand AS BIGINT)").as("brand_num"),
          expr("try_cast(regexp_extract(p_brand, '([0-9]+)', 1) AS BIGINT)")
            .as("brand_digits"),
          expr("try_cast(p_name AS DOUBLE)").as("name_num"),
          col("p_size").cast("string").cast("long").as("size_rt"))
        .orderBy("p_partkey")),

    // Equal-width histogram via arithmetic bucketing (shared formula on
    // both engines; count per bucket) — the group-by is on a computed
    // int key, so it map-side combines like any hash agg.
    Q("q_histogram",
      Some("""WITH b AS (SELECT (SELECT min(l_extendedprice) FROM lineitem) AS lo,
                                (SELECT max(l_extendedprice) FROM lineitem) AS hi),
                   h AS (SELECT LEAST(CAST(FLOOR((l_extendedprice - lo) / ((hi - lo) / 10)) AS BIGINT), 9) AS bucket
                         FROM lineitem, b)
              SELECT bucket, count(*) AS n FROM h GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        val bounds = li.agg(min("l_extendedprice").as("lo"),
          max("l_extendedprice").as("hi"))
        li.crossJoin(broadcast(bounds)) // bounded: 1-row min/max aggregate
          .select(least(floor((col("l_extendedprice") - col("lo"))
              / ((col("hi") - col("lo")) / 10)).cast("long"), lit(9L))
            .as("bucket"))
          .groupBy("bucket").agg(count(lit(1)).as("n"))
          .orderBy("bucket")
      }),

    // MapType construction/access (DuckDB map_extract returns a LIST →
    // [1] unwraps; values serialized to scalars for the hash compare).
    Q("q_map_ops",
      Some("""WITH m AS (SELECT p_partkey,
                               MAP {'brand': p_brand, 'type': p_type, 'name': p_name} AS props
                        FROM part)
              SELECT p_partkey,
                     map_extract(props, 'brand')[1] AS brand_v,
                     array_to_string(list_sort(map_keys(props)), ',') AS keys_csv,
                     CAST(cardinality(props) AS BIGINT) AS n_keys
              FROM m ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          map(lit("brand"), col("p_brand"), lit("type"), col("p_type"),
            lit("name"), col("p_name")).as("props"))
        .select(col("p_partkey"),
          element_at(col("props"), "brand").as("brand_v"),
          array_join(array_sort(map_keys(col("props"))), ",").as("keys_csv"),
          size(col("props")).cast("long").as("n_keys"))
        .orderBy("p_partkey")),

    Q("q_explode_pos",
      Some("""WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
                   n AS (SELECT CAST(i AS INT) AS i FROM range(1, 101) t(i))
              SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos, w[i] AS word
              FROM d JOIN n ON n.i <= len(d.w)
              ORDER BY doc_id, pos"""),
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"), col("col").as("word"))
        .orderBy("doc_id", "pos")),

    Q("q_pivot",
      Some("""SELECT user_id,
                     count(*) FILTER (WHERE event_type = 'click')    AS click,
                     count(*) FILTER (WHERE event_type = 'error')    AS error,
                     count(*) FILTER (WHERE event_type = 'purchase') AS purchase,
                     count(*) FILTER (WHERE event_type = 'signup')   AS signup,
                     count(*) FILTER (WHERE event_type = 'view')     AS view
              FROM events GROUP BY user_id ORDER BY user_id"""),
      (s, dir) => {
        val types = Seq("click", "error", "purchase", "signup", "view")
        // Explicit pivot values → single-pass partial aggregation, no
        // extra distinct-values job at scale.
        val p = t(s, dir, "events")
          .groupBy("user_id")
          .pivot("event_type", types)
          .agg(count(lit(1)))
        p.select(col("user_id") +: types.map(c =>
            coalesce(col(c), lit(0L)).as(c)): _*)
          .orderBy("user_id")
      }),

    Q("q_unpivot",
      Some("""SELECT p_partkey, 'brand' AS attr, p_brand AS val FROM part
              UNION ALL
              SELECT p_partkey, 'size' AS attr, CAST(p_size AS VARCHAR) AS val FROM part
              UNION ALL
              SELECT p_partkey, 'type' AS attr, p_type AS val FROM part
              ORDER BY p_partkey, attr"""),
      (s, dir) => t(s, dir, "part")
        .selectExpr("p_partkey",
          "stack(3, 'brand', p_brand, 'size', CAST(p_size AS STRING), 'type', p_type) AS (attr, val)")
        .orderBy("p_partkey", "attr")),

    Q("q_window_tumble",
      Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events)
               SELECT time_bucket(INTERVAL '10 minutes', ts) AS ws,
                      time_bucket(INTERVAL '10 minutes', ts) + INTERVAL '10 minutes' AS we,
                      count(*) AS n, ${oSum("value")} AS sum_value
               FROM e GROUP BY 1, 2 ORDER BY 1"""),
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("n"), col("sum_value"))
        .orderBy("ws")),

    Q("q_window_slide",
      Some(s"""WITH e AS (SELECT CAST(ts AS TIMESTAMP) AS ts, value FROM events),
                    w AS (SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, value FROM e
                          UNION ALL
                          SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', value FROM e)
               SELECT ws, ws + INTERVAL '10 minutes' AS we,
                      count(*) AS n, ${oSum("value")} AS sum_value
               FROM w GROUP BY 1 ORDER BY 1"""),
      (s, dir) => t(s, dir, "events")
        .groupBy(window(col("ts"), "10 minutes", "5 minutes"))
        .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("n"), col("sum_value"))
        .orderBy("ws")),

    // HLL sketch — the raw ESTIMATE is engine-internal (register
    // layouts and hash functions differ per engine), so the
    // cross-engine contract is the exact cardinality PLUS a tolerance
    // predicate: each engine asserts that ITS OWN HLL estimate lands
    // within 5% of the exact count. Both engines sit well inside that
    // bound (Spark runs at rsd=0.01; DuckDB's default HLL measured
    // ≤1.1% on this data), so rows+schema+hash all match — a full
    // driver-checkable oracle for the approximate-distinct capability,
    // with q_sketch_lc as the hash-exact sketch twin.
    Q("q_approx_distinct",
      Some("""SELECT event_type,
                     CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
                     abs(CAST(approx_count_distinct(user_id) AS DOUBLE)
                         - count(DISTINCT user_id))
                       / count(DISTINCT user_id) <= 0.05 AS est_ok
              FROM events GROUP BY event_type ORDER BY event_type"""),
      (s, dir) => t(s, dir, "events")
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          (abs(approx_count_distinct(col("user_id"), 0.01).cast("double") -
            countDistinct(col("user_id"))) /
            countDistinct(col("user_id")) <= lit(0.05)).as("est_ok"))
        .orderBy("event_type"))
  )
}
