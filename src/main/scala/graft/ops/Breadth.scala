package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.H._

/** Second breadth batch: range frames, edit distance, null-safe
  * comparison, explicit salted two-phase aggregation (skew pattern),
  * grouping_id.
  */
object Breadth {

  val qs: Seq[Q] = Seq(

    // Schema-evolution-tolerant union: columns matched by NAME (missing
    // ones null-filled) — how heterogenous snapshot generations combine
    // without positional breakage.
    Q("q_set_byname",
      Some("""SELECT k, src, extra FROM (
                SELECT c_custkey AS k, 'c' AS src, NULL AS extra FROM customer
                UNION ALL BY NAME
                SELECT 's' AS src, s_suppkey AS k, CAST(s_nationkey AS BIGINT) AS extra
                FROM supplier)
              ORDER BY src, k"""),
      (s, dir) => t(s, dir, "customer")
        .select(col("c_custkey").as("k"), lit("c").as("src"),
          lit(null).cast("long").as("extra"))
        .unionByName(
          t(s, dir, "supplier")
            .select(lit("s").as("src"), col("s_suppkey").as("k"),
              col("s_nationkey").cast("long").as("extra")),
          allowMissingColumns = true)
        .orderBy("src", "k")),

    // nth_value over a full frame (with the explicit frame both engines
    // need for a deterministic answer).
    Q("q_win_nth",
      Some("""SELECT o_custkey, o_orderkey,
                     nth_value(o_totalprice, 2) OVER (
                       PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_price
              FROM orders ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice"), col("o_orderkey"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            nth_value(col("o_totalprice"), 2).over(w).as("second_price"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    // Typed Dataset aggregation: case-class rows, groupByKey, and a
    // custom exact-decimal Aggregator as a TypedColumn — compile-time
    // type safety with the same partitioning-independent results as the
    // untyped dsum path (the oracle is identical SQL).
    Q("q_typed_agg",
      Some(s"""SELECT l_returnflag, ${oSum("l_quantity")} AS sum_qty,
                      count(*) AS n
               FROM lineitem GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        import s.implicits._
        val ds = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("flag"), col("l_quantity").as("qty"))
          .as[(String, Double)]
        val sumQty = new graft.functions.TypedAggs.ExactSum[(String, Double)](_._2)
          .toColumn.name("sum_qty")
        ds.groupByKey(_._1)
          .agg(sumQty, org.apache.spark.sql.functions.count("*").as[Long])
          .toDF("l_returnflag", "sum_qty", "n")
          .select(col("l_returnflag"),
            round(col("sum_qty"), 4).as("sum_qty"), col("n"))
          .orderBy("l_returnflag")
      }),

    // Bitwise aggregates (flag-mask folds): associative + exact, so
    // they map-side combine like sum/count.
    Q("q_agg_bitwise",
      Some("""SELECT l_returnflag,
                     CAST(bit_and(l_linenumber) AS BIGINT) AS b_and,
                     CAST(bit_or(l_linenumber)  AS BIGINT) AS b_or,
                     CAST(bit_xor(l_linenumber) AS BIGINT) AS b_xor
              FROM lineitem GROUP BY 1 ORDER BY 1"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(expr("bit_and(l_linenumber)").cast("long").as("b_and"),
          expr("bit_or(l_linenumber)").cast("long").as("b_or"),
          expr("bit_xor(l_linenumber)").cast("long").as("b_xor"))
        .orderBy("l_returnflag")),

    // Correlation / covariance: both engines use streaming co-moment
    // updates; 4dp (corr) / 2dp (covar) rounding absorbs the summation-
    // order ulps (validated at sf0.001/0.01/0.1).
    Q("q_agg_corr",
      Some("""SELECT l_returnflag,
                     ROUND(corr(l_quantity, l_extendedprice), 4) AS r,
                     ROUND(covar_samp(l_quantity, l_extendedprice), 2) AS cv,
                     ROUND(covar_pop(l_quantity, l_extendedprice), 2) AS cvp
              FROM lineitem GROUP BY 1 ORDER BY 1"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("r"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cv"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("cvp"))
        .orderBy("l_returnflag")),

    // Deterministic hash-based sampling: Knuth multiplicative hash on
    // the key, keep ~10%. Unlike `TABLESAMPLE`/`df.sample` (RNG- and
    // partitioning-dependent), this is reproducible on ANY engine and
    // cluster size, composes with incremental rebuilds, and pushes down
    // to the scan as a plain predicate. The sampling rate is exact in
    // expectation and the SAME ROWS are chosen everywhere.
    Q("q_sample_det",
      Some(s"""SELECT l_returnflag, count(*) AS n, ${oSum("l_quantity")} AS qty
               FROM lineitem
               WHERE ${graft.api.Mixing.knuthHashSql("l_orderkey")} < 429496730
               GROUP BY 1 ORDER BY 1"""),
      (s, dir) => t(s, dir, "lineitem")
        // split-multiply form: identical selection for keys < 2^32, and
        // no ANSI-mode Long overflow once orderkeys pass ~3.5e9 (sf>=500)
        .filter(graft.api.Mixing.knuthHash(col("l_orderkey"))
          < lit(429496730L))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("qty"))
        .orderBy("l_returnflag")),

    // RANGE frame over a numeric day key (value-based window, vs the
    // ROWS frame of q_win_frame): days with no orders do NOT count
    // toward the 7-day trailing revenue.
    Q("q_win_rangeframe",
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                                    SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev
                             FROM orders GROUP BY 1)
              SELECT d, CAST(ROUND(SUM(rev) OVER (
                       ORDER BY date_diff('day', DATE '1970-01-01', d)
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                     AS DOUBLE) AS mov7d
              FROM daily ORDER BY d"""),
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(sum(col("o_totalprice").cast(D)).as("rev"))
          .withColumn("day_num", datediff(col("d"), lit("1970-01-01").cast("date")))
        val w = Window.orderBy("day_num").rangeBetween(-6, Window.currentRow)
        daily.select(col("d"),
            round(sum(col("rev")).over(w), 4).cast("double").as("mov7d"))
          .orderBy("d")
      }),

    Q("q_str_edit",
      Some("""SELECT p_partkey,
                     CAST(levenshtein(p_name, 'small widget') AS BIGINT) AS dist
              FROM part ORDER BY p_partkey"""),
      (s, dir) => t(s, dir, "part")
        .select(col("p_partkey"),
          levenshtein(col("p_name"), lit("small widget")).cast("long").as("dist"))
        .orderBy("p_partkey")),

    Q("q_nullsafe_eq",
      Some("""SELECT event_id,
                     NULLIF(event_type, 'error') IS NOT DISTINCT FROM NULL AS is_err,
                     NULLIF(event_type, 'error') IS DISTINCT FROM 'click' AS not_click
              FROM events ORDER BY event_id"""),
      (s, dir) => t(s, dir, "events")
        .select(col("event_id"),
          nullif(col("event_type"), lit("error")) <=> lit(null).as("is_err"),
          !(nullif(col("event_type"), lit("error")) <=> lit("click")).as("not_click"))
        .toDF("event_id", "is_err", "not_click")
        .orderBy("event_id")),

    // Explicit salt + two-phase aggregation: the manual skew pattern for
    // hot keys (events has very few distinct user_ids — a real hot-key
    // shape). Phase 1 spreads each user over 8 salts; phase 2 merges.
    // Decimal partials keep the result exactly equal to a direct group-by.
    Q("q_agg_salted",
      Some(s"""SELECT user_id, count(*) AS n, ${oSum("value")} AS sum_value
               FROM events GROUP BY 1 ORDER BY 1"""),
      (s, dir) => t(s, dir, "events")
        .withColumn("salt", pmod(xxhash64(col("event_id")), lit(8)))
        .groupBy("user_id", "salt")
        .agg(count(lit(1)).as("pn"), sum(col("value").cast(D)).as("psum"))
        .groupBy("user_id")
        .agg(sum(col("pn")).as("n"),
          round(sum(col("psum")).cast("double"), 4).as("sum_value"))
        .orderBy("user_id")),

    // As-of join by composition (brief §custom-operators, preference (a)):
    // "for each error event, the most recent click by the same user at or
    // before it". Union-tag + last_value(IGNORE NULLS) over a running
    // frame — one shuffle on user_id, no per-row backward scan, and no
    // custom SparkPlan needed.
    Q("q_join_asof",
      Some("""WITH e AS (SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
                         FROM events),
                   m AS (SELECT *, CASE WHEN event_type = 'click' THEN ts END AS click_ts
                         FROM e),
                   f AS (SELECT user_id, event_id, ts, event_type,
                                last_value(click_ts IGNORE NULLS) OVER (
                                  PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS asof_click
                         FROM m)
              SELECT user_id, event_id, ts, asof_click
              FROM f WHERE event_type = 'error'
              ORDER BY user_id, ts, event_id"""),
      (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = t(s, dir, "events")
          .select("user_id", "event_id", "event_type", "ts")
          .withColumn("click_ts",
            when(col("event_type") === "click", col("ts")))
        e.withColumn("asof_click", last(col("click_ts"), ignoreNulls = true).over(w))
          .filter(col("event_type") === "error")
          .select("user_id", "event_id", "ts", "asof_click")
          .orderBy("user_id", "ts", "event_id")
      }),

    // Correlated scalar subquery — Catalyst decorrelates it into an
    // aggregate + join (RewriteCorrelatedScalarSubquery), so the fact
    // side is scanned once, not per outer row.
    Q("q_subq_corr",
      Some("""SELECT c_custkey, c_name FROM customer
              WHERE (SELECT MAX(o_totalprice) FROM orders
                     WHERE o_custkey = c_custkey) > 400000
              ORDER BY c_custkey"""),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "orders").createOrReplaceTempView("orders")
        s.sql("""SELECT c_custkey, c_name FROM customer
                 WHERE (SELECT MAX(o_totalprice) FROM orders
                        WHERE o_custkey = c_custkey) > 400000
                 ORDER BY c_custkey""")
      }),

    Q("q_grouping_id",
      Some("""SELECT n_name, c_mktsegment,
                     CAST(GROUPING_ID(n_name, c_mktsegment) AS BIGINT) AS gid,
                     count(*) AS n
              FROM customer JOIN nation ON n_nationkey = c_nationkey
              GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
              ORDER BY gid, n_name NULLS FIRST, c_mktsegment NULLS FIRST"""),
      (s, dir) => {
        t(s, dir, "customer").createOrReplaceTempView("customer")
        t(s, dir, "nation").createOrReplaceTempView("nation")
        s.sql("""SELECT n_name, c_mktsegment,
                        CAST(grouping_id(n_name, c_mktsegment) AS BIGINT) AS gid,
                        count(*) AS n
                 FROM customer JOIN nation ON n_nationkey = c_nationkey
                 GROUP BY GROUPING SETS ((n_name, c_mktsegment), (n_name), ())
                 ORDER BY gid, n_name ASC NULLS FIRST, c_mktsegment ASC NULLS FIRST""")
      }),

    // Z-order (Morton) values over (custkey, order-date-day): the
    // two-dimensional layout key behind api.Layout.zorderWrite — file
    // min/max stats stay narrow on BOTH columns, so either predicate
    // prunes. The bit-interleave is pure integer shifts, identical on
    // any engine; the locality property itself is pinned in ApiSpec.
    Q("q_layout_zorder", {
      val terms = (0 until 16).flatMap { b =>
        Seq(s"((((o_custkey & 65535) >> $b) & 1) << ${2 * b})",
          s"((((datediff('day', DATE '1992-01-01', o_orderdate) & 65535) >> $b) & 1) << ${2 * b + 1})")
      }
      Some(s"""SELECT o_orderkey, CAST(${terms.mkString(" + ")} AS BIGINT) AS zv
               FROM orders ORDER BY zv, o_orderkey LIMIT 100""")
    },
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          datediff(col("o_orderdate"), lit("1992-01-01")).as("dkey"))
        .select(col("o_orderkey"),
          graft.api.Layout.zValue("o_custkey", "dkey", bits = 16).as("zv"))
        .orderBy(col("zv"), col("o_orderkey")).limit(100))
  )
}
