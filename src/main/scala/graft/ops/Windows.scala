package graft.ops

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.H._

/** Window-function inventory (SURVEY.md §2B q_win_*, q_session_gap).
  *
  * Ranking/analytic outputs that Spark types as INT are normalised to
  * BIGINT to match DuckDB. Window sums run over exact decimals so frame
  * evaluation order can't produce fp drift between engines (or between
  * cluster partitionings — running sums over doubles are not reproducible
  * at 1000 executors; over decimals they are).
  */
object Windows {

  val qs: Seq[Q] = Seq(

    Q("q_win_rank",
      Some("""SELECT o_custkey, o_orderkey, o_totalprice,
                     rank() OVER w AS rnk, dense_rank() OVER w AS drnk,
                     row_number() OVER w AS rn
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
              ORDER BY o_custkey, rn"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey")
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
            rank().over(w).cast("long").as("rnk"),
            dense_rank().over(w).cast("long").as("drnk"),
            row_number().over(w).cast("long").as("rn"))
          .orderBy("o_custkey", "rn")
      }),

    Q("q_win_lag",
      Some("""SELECT o_custkey, o_orderkey,
                     lag(o_totalprice) OVER w AS prev_price,
                     lead(o_totalprice) OVER w AS next_price
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
              ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            lag("o_totalprice", 1).over(w).as("prev_price"),
            lead("o_totalprice", 1).over(w).as("next_price"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    Q("q_win_frame",
      Some("""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                                    SUM(CAST(o_totalprice AS DECIMAL(38,4))) AS rev
                             FROM orders GROUP BY 1)
              SELECT d, CAST(ROUND(SUM(rev) OVER (
                       ORDER BY d ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4)
                     AS DOUBLE) AS mov7
              FROM daily ORDER BY d"""),
      (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(col("o_orderdate").cast("date").as("d"))
          .agg(sum(col("o_totalprice").cast(D)).as("rev"))
        val w = Window.orderBy("d").rowsBetween(-6, Window.currentRow)
        daily.select(col("d"),
            round(sum(col("rev")).over(w), 4).cast("double").as("mov7"))
          .orderBy("d")
      }),

    Q("q_win_running",
      Some("""SELECT o_custkey, o_orderkey,
                     CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(38,4))) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS UNBOUNDED PRECEDING), 4) AS DOUBLE) AS running
              FROM orders ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            round(sum(col("o_totalprice").cast(D)).over(w), 4)
              .cast("double").as("running"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    Q("q_win_ntile_pct",
      Some("""SELECT c_custkey, CAST(ntile(4) OVER w AS BIGINT) AS quartile,
                     ROUND(percent_rank() OVER w, 4) AS pr,
                     ROUND(cume_dist() OVER w, 4) AS cd
              FROM customer WINDOW w AS (ORDER BY c_acctbal, c_custkey)
              ORDER BY c_custkey"""),
      (s, dir) => {
        // Single global window — fine for percentile-style analytics where
        // the result set is small; at 100 TB you'd pre-aggregate first.
        val w = Window.orderBy("c_acctbal", "c_custkey")
        t(s, dir, "customer")
          .select(col("c_custkey"),
            ntile(4).over(w).cast("long").as("quartile"),
            round(percent_rank().over(w), 4).as("pr"),
            round(cume_dist().over(w), 4).as("cd"))
          .orderBy("c_custkey")
      }),

    Q("q_win_firstlast",
      Some("""SELECT o_custkey, o_orderkey,
                     first_value(o_totalprice) OVER w AS first_price,
                     last_value(o_totalprice) OVER w AS last_price
              FROM orders
              WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              ORDER BY o_custkey, o_orderkey"""),
      (s, dir) => {
        val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"),
            first("o_totalprice").over(w).as("first_price"),
            last("o_totalprice").over(w).as("last_price"))
          .orderBy("o_custkey", "o_orderkey")
      }),

    Q("q_session_gap",
      Some("""WITH e AS (SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
                   g AS (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                                          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                                        THEN 1 ELSE 0 END AS is_new
                         FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
                   s AS (SELECT *, SUM(is_new) OVER (
                           PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sid FROM g)
              SELECT user_id, CAST(sid AS BIGINT) AS session_id, count(*) AS n_events,
                     min(ts) AS session_start, max(ts) AS session_end
              FROM s GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => {
        // Batch sessionization: lag + gap flag + running sum = session id.
        // The streaming twin (session_window + watermark) lives in
        // graft.streaming; this formulation is its oracle-checkable batch
        // equivalent and scales as one shuffle on user_id.
        val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val e = t(s, dir, "events").select("user_id", "event_id", "ts")
        e.withColumn("prev_ts", lag("ts", 1).over(w))
          .withColumn("is_new",
            when(col("prev_ts").isNull ||
              unix_micros(col("ts")) - unix_micros(col("prev_ts")) > 1800000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum("is_new").over(wRun).cast("long"))
          .groupBy("user_id", "session_id")
          .agg(count(lit(1)).as("n_events"),
            min("ts").as("session_start"), max("ts").as("session_end"))
          .orderBy("user_id", "session_id")
      }),

    // Ordered funnel (view -> click -> purchase within 1 h of the first
    // step): per-user stage depth + counts, via graft.api.Funnels' exact
    // integer-encoded fold (event = ts_us*8 + step, state = stage*2^59
    // + t0) — both engines replay identical BIGINT arithmetic.
    Q("q_evt_funnel",
      Some("""WITH e AS (SELECT user_id,
                                epoch_us(CAST(ts AS TIMESTAMP)) * 8 +
                                  CASE event_type WHEN 'view' THEN 0
                                                  WHEN 'click' THEN 1
                                                  WHEN 'purchase' THEN 2 END AS enc
                         FROM events
                         WHERE event_type IN ('view', 'click', 'purchase')),
                   g AS (SELECT user_id, list_sort(list(enc)) AS evs
                         FROM e GROUP BY 1),
                   f AS (SELECT user_id,
                                list_reduce(list_prepend(CAST(0 AS BIGINT), evs),
                                  (s, x) -> CASE WHEN s // 576460752303423488 < 3
                                                  AND x % 8 = s // 576460752303423488
                                                  AND (s // 576460752303423488 = 0
                                                       OR x // 8 - s % 576460752303423488 <= 3600000000)
                                            THEN (s // 576460752303423488 + 1) * 576460752303423488
                                                   + CASE WHEN s // 576460752303423488 = 0
                                                          THEN x // 8
                                                          ELSE s % 576460752303423488 END
                                            ELSE s END) AS st
                         FROM g)
              SELECT CAST(st // 576460752303423488 AS BIGINT) AS stage,
                     count(*) AS n_users
              FROM f GROUP BY 1 ORDER BY 1"""),
      (s, dir) => graft.api.Funnels.funnelCounts(t(s, dir, "events"),
        "user_id", "ts", "event_type",
        steps = Seq("view", "click", "purchase"),
        windowMicros = 3600000000L)),

    // Cohort retention: first-active epoch week x week offset — the
    // companion product-analytics staple. Epoch-week integer division
    // (not date_trunc) keeps the bucketing calendar-convention-free.
    Q("q_evt_retention",
      Some("""WITH uw AS (SELECT DISTINCT user_id,
                                 epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS week
                          FROM events),
                   c AS (SELECT user_id, min(week) AS cohort_week
                         FROM uw GROUP BY 1)
              SELECT cohort_week, week - cohort_week AS week_offset,
                     count(*) AS n_users
              FROM uw JOIN c USING (user_id)
              GROUP BY 1, 2 ORDER BY 1, 2"""),
      (s, dir) => graft.api.Funnels.retentionCohorts(
        t(s, dir, "events"), "user_id", "ts")),

    // EWMA at alpha = 1/2 over per-user time order: halving is an exact
    // exponent decrement, so the fold's only rounding (the add) is
    // IEEE-identical on both engines — the determinism-safe smoothing.
    Q("q_evt_ewma",
      Some("""WITH e AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS t, value AS v
                         FROM events),
                   g AS (SELECT user_id, list_sort(list(struct_pack(t := t, v := v))) AS evs
                         FROM e GROUP BY 1)
              SELECT user_id, CAST(len(evs) AS BIGINT) AS n_events,
                     ROUND(list_reduce(list_transform(evs, x -> x.v),
                                       (s, x) -> (x + s) / 2.0), 6) AS ewma
              FROM g ORDER BY user_id"""),
      (s, dir) => graft.api.Funnels.ewmaHalf(t(s, dir, "events"),
        "user_id", "ts", "value").orderBy("user_id"))
  )
}
