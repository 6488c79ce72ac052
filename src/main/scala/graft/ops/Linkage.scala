package graft.ops

import org.apache.spark.sql.functions._
import graft.ops.H._

/** Linkage inventory: link-graph centrality, record-linkage fuzzy join,
  * and CDC reconstruction (SURVEY.md §2B-status round 12 continuation —
  * q_graph_*, q_join_fuzzy, q_scd2, q_evt_anomaly).
  *
  * Every query here is integer-exact end to end (fixed-point micro-rank
  * units, integer cents, epoch-microsecond validity bounds) — zero
  * floating-point arithmetic in any decision or output, so the DuckDB
  * oracle replays bit-for-bit and the result is reproducible on any
  * partitioning. See graft.api.{Graphs, FuzzyJoin, Cdc} for the
  * operator semantics and 100-TB shapes.
  */
object Linkage {

  /** Shared oracle CTE: the deduplicated customer→supplier link graph
    * with parity-disjoint vertex ids (custkey·2 / suppkey·2+1), exactly
    * the frame Sources.ensureGraph materializes for the Spark side.
    */
  private val edgesCte =
    """edges AS (
         SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
         FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       outd AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
       nodes AS (SELECT src AS id FROM edges UNION SELECT dst FROM edges)"""

  /** One fixed-point damped-update round: contributions are BIGINT floor
    * divisions, the update is pure integer arithmetic — `//` in DuckDB,
    * `div` in Spark, identical on the positive values ranks live in.
    */
  private def rankRound(prev: String, n: Int): String =
    s"""c$n AS (SELECT e.dst AS id, CAST(SUM(r.r // o.deg) AS BIGINT) AS contrib
                FROM edges e JOIN $prev r ON e.src = r.id
                JOIN outd o ON e.src = o.src GROUP BY 1),
        r$n AS (SELECT n.id,
                       CAST(150000 + (85 * COALESCE(c.contrib, 0)) // 100 AS BIGINT) AS r
                FROM nodes n LEFT JOIN c$n c ON n.id = c.id)"""

  val qs: Seq[Q] = Seq(

    // Link-graph PageRank, 3 damped iterations, entirely in fixed-point
    // BIGINT micro-rank units (see api/Graphs.scala scaladoc): the
    // oracle replays the identical integer recurrence from the source
    // tables, so a wrong degree, a lost dangling semantic, or ANY fp
    // drift breaks the hash — not just "close" ranks.
    Q("q_graph_pagerank",
      Some(s"""WITH $edgesCte,
                    r0 AS (SELECT id, CAST(1000000 AS BIGINT) AS r FROM nodes),
                    ${rankRound("r0", 1)},
                    ${rankRound("r1", 2)},
                    ${rankRound("r2", 3)}
               SELECT id, r AS rank_micro FROM r3 ORDER BY id"""),
      (s, dir) => {
        val base = Sources.ensureGraph(s, dir)
        graft.api.Graphs.pageRankFixedPoint(
          H.readMemo(s, s"$base/edges"), H.readMemo(s, s"$base/nodes"),
          iterations = 3)
          .orderBy("id")
      }),

    // Degree profile of the same graph: out- and in-degree histograms —
    // the one-scan health check of a crawl/link graph.
    Q("q_graph_degree",
      Some(s"""WITH $edgesCte,
                    ind AS (SELECT dst, count(*) AS deg FROM edges GROUP BY 1)
               SELECT 'out' AS side, deg, CAST(count(*) AS BIGINT) AS n_nodes
               FROM outd GROUP BY 2
               UNION ALL
               SELECT 'in' AS side, deg, CAST(count(*) AS BIGINT) AS n_nodes
               FROM ind GROUP BY 2
               ORDER BY side, deg"""),
      (s, dir) => {
        val base = Sources.ensureGraph(s, dir)
        // ensureGraph materializes edgesWithOutDegree — already
        // (src, dst)-distinct — so the profile skips its dedup exchange
        graft.api.Graphs.degreeProfile(
          H.readMemo(s, s"$base/edges"), "src", "dst",
          assumeDistinct = true)
          .orderBy("side", "deg")
      }),

    // Connected components over a chain-structured customer graph
    // (consecutive custkeys linked, every 10th link broken): the Spark
    // side runs the scalable fixpoint (min-label + star rounds,
    // api/Graphs.scala), the oracle replays the SEMANTICS as a
    // recursive-CTE label closure — affordable at test scale precisely
    // because the chain components are small, which is why the demo
    // graph is chains and not the (single-giant-component) link graph.
    // Output: component-size histogram with min/max component labels —
    // a wrong fixpoint, split component, or non-min label all break it.
    Q("q_graph_cc",
      Some("""WITH RECURSIVE
                e AS (SELECT c_custkey AS u, c_custkey + 1 AS v
                      FROM customer WHERE c_custkey % 10 <> 9),
                ue AS (SELECT u, v FROM e UNION SELECT v, u FROM e),
                n AS (SELECT u AS id FROM ue UNION SELECT v FROM ue),
                lbl(node, l) AS (
                  SELECT id, id FROM n
                  UNION
                  SELECT ue.v, lbl.l FROM lbl JOIN ue ON ue.u = lbl.node),
                comp AS (SELECT node, MIN(l) AS component FROM lbl GROUP BY 1),
                sizes AS (SELECT component, count(*) AS csize
                          FROM comp GROUP BY 1)
              SELECT csize, CAST(count(*) AS BIGINT) AS n_comps,
                     MIN(component) AS min_comp, MAX(component) AS max_comp
              FROM sizes GROUP BY 1 ORDER BY 1"""),
      (s, dir) => graft.api.Graphs.connectedComponents(
          t(s, dir, "customer").filter(col("c_custkey") % 10 =!= 9)
            .select(col("c_custkey").as("u"),
              (col("c_custkey") + 1).as("v")), "u", "v")
        .groupBy("component").agg(count(lit(1)).as("csize"))
        .groupBy("csize").agg(count(lit(1)).as("n_comps"),
          min(col("component")).as("min_comp"),
          max(col("component")).as("max_comp"))
        .orderBy("csize")),

    // Edit-distance self-join on customer names (distance ≤ 1) via
    // deletion-neighborhood blocking + exact levenshtein verify
    // (api/FuzzyJoin.scala). The oracle IS the naive quadratic join —
    // affordable at test scale on the %4 key slice — so the blocked
    // plan must reproduce the nested-loop semantics exactly: a lossy
    // signature (missed pair) or a skipped verify (ab↔ba style
    // distance-2 survivor) both break the hash.
    Q("q_join_fuzzy",
      Some("""WITH names AS (SELECT c_name FROM customer WHERE c_custkey % 4 = 0)
              SELECT a.c_name AS left_key, b.c_name AS right_key
              FROM names a JOIN names b ON a.c_name < b.c_name
              WHERE levenshtein(a.c_name, b.c_name) <= 1
              ORDER BY 1, 2"""),
      (s, dir) => graft.api.FuzzyJoin.edSelfJoin(
          t(s, dir, "customer").filter(col("c_custkey") % 4 === 0), "c_name")
        .orderBy("left_key", "right_key")),

    // Edit-distance ≤ 2 self-join — PassJoin segment blocking (Li/Deng/
    // Feng ICDE'11: k+1 disjoint segments, ±k probe windows, exact
    // levenshtein verify — api/FuzzyJoin.scala). A tighter %16 key slice
    // keeps the ORACLE's genuinely quadratic nested loop affordable; the
    // Spark side must reproduce it exactly, so a dropped probe window,
    // a mis-derived segment boundary, or a skipped verify all break the
    // hash. Distance-2 pairs among "Customer#%09d" names are digit pairs
    // differing in ≤ 2 positions — plentiful, structured, adversarial
    // for the shared-prefix segment.
    Q("q_join_fuzzy2",
      Some("""WITH names AS (SELECT c_name FROM customer WHERE c_custkey % 16 = 0)
              SELECT a.c_name AS left_key, b.c_name AS right_key
              FROM names a JOIN names b ON a.c_name < b.c_name
              WHERE levenshtein(a.c_name, b.c_name) <= 2
              ORDER BY 1, 2"""),
      (s, dir) => graft.api.FuzzyJoin.edSelfJoin(
          t(s, dir, "customer").filter(col("c_custkey") % 16 === 0), "c_name",
          maxDist = 2)
        .orderBy("left_key", "right_key")),

    // SCD Type-2 reconstruction of the per-user purchase-value dimension
    // (api/Cdc.scala): change-compressed versions with epoch-micro
    // validity bounds. Bit-equality only — no fp arithmetic — and a
    // (ts, event_id) total order, so the history is reproducible.
    Q("q_scd2",
      Some("""WITH p AS (SELECT user_id, event_id, value,
                                CAST(ts AS TIMESTAMP) AS ts
                         FROM events WHERE event_type = 'purchase'),
                   d AS (SELECT *,
                                lag(value) OVER w AS pv,
                                row_number() OVER w AS rn
                         FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
                   ch AS (SELECT user_id, event_id, value, ts FROM d
                          WHERE rn = 1 OR pv IS DISTINCT FROM value)
              SELECT user_id, event_id, value,
                     epoch_us(ts) AS valid_from_us,
                     lead(epoch_us(ts)) OVER w AS valid_to_us,
                     (lead(epoch_us(ts)) OVER w IS NULL) AS is_current
              FROM ch WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
              ORDER BY user_id, valid_from_us, event_id"""),
      (s, dir) => graft.api.Cdc.scd2(
          t(s, dir, "events").filter(col("event_type") === "purchase"),
          "user_id", "ts", "event_id", "value")
        .orderBy("user_id", "valid_from_us", "event_id")),

    // Rolling z-score outlier flags over each user's purchase stream,
    // evaluated entirely in BIGINT ((n·c − Σc)² > z²(n·Σc² − (Σc)²) on
    // integer cents — api/Cdc.scala): the flag is bit-identical on any
    // engine/partitioning, so it oracle-checks as a hash, not a rate.
    Q("q_evt_anomaly",
      Some("""WITH p AS (SELECT user_id, event_id,
                                CAST(round(value * 100) AS BIGINT) AS c,
                                CAST(ts AS TIMESTAMP) AS ts
                         FROM events WHERE event_type = 'purchase'),
                   wdw AS (SELECT user_id, event_id, c,
                                  count(c) OVER w AS n_prior,
                                  CAST(SUM(c) OVER w AS BIGINT) AS s,
                                  CAST(SUM(c * c) OVER w AS BIGINT) AS sq
                           FROM p WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                                               ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING))
              SELECT user_id, event_id, c AS cents, n_prior,
                     (n_prior >= 4 AND
                      (n_prior * c - s) * (n_prior * c - s) >
                        4 * (n_prior * sq - s * s)) AS is_outlier
              FROM wdw ORDER BY user_id, event_id"""),
      (s, dir) => graft.api.Cdc.rollingAnomalies(
          t(s, dir, "events").filter(col("event_type") === "purchase"),
          "user_id", "ts", "event_id", "value")
        .orderBy("user_id", "event_id")),

    // Triangle count over the parts-bought-together graph (parts
    // co-occurring in one order are linked; a 10% order slice keeps the
    // oracle's cubic join affordable at any test SF). The Spark side
    // runs the degree-ordered compact-forward algorithm — wedges from
    // the oriented DAG, Σ outdeg² minimized, never a hub's full
    // neighborhood in one task — while the oracle counts the same
    // triangles with the naive canonical a<b<c three-way join; the
    // id-mass invariant breaks the hash on any misidentified triangle,
    // not just a lucky-equal count.
    Q("q_graph_triangles",
      Some("""WITH pe AS (
                SELECT DISTINCT least(l1.l_partkey, l2.l_partkey) AS a,
                                greatest(l1.l_partkey, l2.l_partkey) AS b
                FROM lineitem l1 JOIN lineitem l2
                  ON l1.l_orderkey = l2.l_orderkey
                 AND l1.l_partkey <> l2.l_partkey
                WHERE l1.l_orderkey % 10 = 0)
              SELECT CAST(count(*) AS BIGINT) AS n_triangles,
                     CAST(COALESCE(SUM(e1.a + e1.b + e2.b), 0) AS BIGINT)
                       AS tri_mass
              FROM pe e1
              JOIN pe e2 ON e2.a = e1.b
              JOIN pe e3 ON e3.a = e1.a AND e3.b = e2.b"""),
      (s, dir) => {
        val l = t(s, dir, "lineitem").filter(col("l_orderkey") % 10 === 0)
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
        val pairs = l.join(l.select(col("ok"), col("pa").as("pb")), "ok")
          .where(col("pa") =!= col("pb"))
        graft.api.Graphs.triangleCount(pairs, "pa", "pb")
      }),

    // Bounded BFS from the custkey%100=0 seed set over the undirected
    // view of the link graph: minimum hop distance per reached node,
    // aggregated per level. The Spark side expands only the NEW
    // frontier each round (join + distinct + anti-join vs settled); the
    // oracle replays the closure as a recursive CTE and takes MIN(lvl).
    Q("q_graph_bfs",
      Some(s"""WITH RECURSIVE $edgesCte,
                    und AS (SELECT src AS x, dst AS y FROM edges
                            UNION SELECT dst, src FROM edges),
                    bfs(id, lvl) AS (
                      SELECT id, 0 FROM nodes WHERE id % 200 = 0
                      UNION
                      SELECT u.y, bfs.lvl + 1 FROM bfs
                      JOIN und u ON u.x = bfs.id WHERE bfs.lvl < 3),
                    m AS (SELECT id, MIN(lvl) AS lvl FROM bfs GROUP BY 1)
               SELECT CAST(lvl AS BIGINT) AS lvl,
                      CAST(count(*) AS BIGINT) AS n_nodes,
                      CAST(SUM(id) AS BIGINT) AS id_mass
               FROM m GROUP BY 1 ORDER BY 1"""),
      (s, dir) => {
        val base = Sources.ensureGraph(s, dir)
        val edges = H.readMemo(s, s"$base/edges")
        val sources = H.readMemo(s, s"$base/nodes")
          .filter(col("id") % 200 === 0)
        graft.api.Graphs.bfsLevels(edges, "src", "dst", sources, maxDepth = 3)
          .groupBy("lvl")
          .agg(count(lit(1)).as("n_nodes"), sum(col("id")).as("id_mass"))
          .orderBy("lvl")
      })
  )
}
