package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.api.{Cdc, FuzzyJoin, Graphs}

/** Contracts of the linkage operators (api/{Graphs, FuzzyJoin, Cdc}):
  * brute-force equivalence for the blocked fuzzy join, hand-computed
  * fixed-point ranks, and the SCD2 validity-chain invariants.
  */
class LinkageSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  // ---- Graphs ----

  test("pageRankFixedPoint reproduces a hand-computed 4-node graph") {
    // 1→2, 1→3, 2→3 ; node 4 isolated source-side? (no: nodes = edge
    // endpoints only). outdeg(1)=2, outdeg(2)=1; 3 is a sink.
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst")
    val edges = Graphs.edgesWithOutDegree(raw, "src", "dst")
    val nodes = Graphs.nodes(raw, "src", "dst")
    val r1 = Graphs.pageRankFixedPoint(edges, nodes, iterations = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // unit=1e6, base=150000. contrib into 2: 1e6 div 2 = 500000 →
    // r(2) = 150000 + 85*500000 div 100 = 575000. contrib into 3:
    // 500000 (from 1) + 1000000 (from 2) = 1500000 → r(3) = 150000 +
    // 1275000 = 1425000. r(1) = 150000 (no in-edges).
    assert(r1 === Map(1L -> 150000L, 2L -> 575000L, 3L -> 1425000L))
    // second iteration: contrib(2) = 150000 div 2 = 75000 →
    // r(2) = 150000 + 63750 = 213750; contrib(3) = 75000 + 575000 →
    // r(3) = 150000 + 85*650000 div 100 = 702500.
    val r2 = Graphs.pageRankFixedPoint(edges, nodes, iterations = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r2 === Map(1L -> 150000L, 2L -> 213750L, 3L -> 702500L))
  }

  test("pageRank deduplicates multi-edges and rejects bad iteration counts") {
    val raw = Seq((1L, 2L), (1L, 2L), (1L, 2L)).toDF("src", "dst")
    val edges = Graphs.edgesWithOutDegree(raw, "src", "dst")
    // dedup → outdeg(1) = 1, so 2 receives the full unit, not a third
    assert(edges.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .toSeq === Seq((1L, 2L, 1L)))
    val nodes = Graphs.nodes(raw, "src", "dst")
    val r = Graphs.pageRankFixedPoint(edges, nodes, 1)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(2L) === 150000L + 85L * 1000000L / 100L)
    intercept[IllegalArgumentException] {
      Graphs.pageRankFixedPoint(edges, nodes, 0)
    }
    intercept[IllegalArgumentException] {
      Graphs.pageRankFixedPoint(edges, nodes, 5, checkpointEvery = 0)
    }
  }

  test("deep pagerank: 100 checkpoint-bounded rounds, bit-exact on a cycle") {
    // A directed cycle is a fixed point of the integer update: every
    // node has out-degree 1 and exactly one in-contribution of
    // r div 1 = unitMicro, so r' = 150000 + 85*1000000 div 100 =
    // 1000000 at EVERY iteration — any fp drift, lineage corruption,
    // or a checkpoint that resumed from wrong blocks breaks equality.
    // 100 rounds only analyze because lineage is cut every
    // checkpointEvery rounds; pre-round-13 the call was capped at 50.
    val n = 20L
    val cyc = (0L until n).map(i => (i, (i + 1) % n)).toDF("s", "d")
    val ed = Graphs.edgesWithOutDegree(cyc, "s", "d")
    val nodes = Graphs.nodes(cyc, "s", "d")
    val ranks = Graphs.pageRankFixedPoint(ed, nodes, iterations = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ranks.size === n)
    assert(ranks.values.forall(_ == 1000000L), ranks.toString)
  }

  test("pagerank checkpoint cadence never changes the ranks") {
    val raw = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 1L))
      .toDF("src", "dst")
    val ed = Graphs.edgesWithOutDegree(raw, "src", "dst")
    val nodes = Graphs.nodes(raw, "src", "dst")
    def run(every: Int) =
      Graphs.pageRankFixedPoint(ed, nodes, iterations = 12,
          checkpointEvery = every)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val frequent = run(3)    // 3 cuts inside the run
    val never = run(1000)    // cadence past the bound: zero cuts
    assert(frequent === never)
  }

  test("deep bfs: exact levels on a long chain, early exit past exhaustion") {
    // chain 0-1-...-25: level(i) = i. maxDepth 200 >> graph depth —
    // the traversal must stop at the first checkpoint after the
    // frontier empties (rounds 26..200 would be ~175 no-op plan
    // nestings otherwise), and the result must be the exact level map.
    val chain = (0L until 25L).map(i => (i, i + 1)).toDF("s", "d")
    val src = Seq(0L).toDF("id")
    val got = Graphs.bfsLevels(chain, "s", "d", src, maxDepth = 200,
        checkpointEvery = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === (0L to 25L).map(i => i -> i).toMap)
  }

  test("degreeProfile histograms match direct degree counts") {
    val raw = Seq((1L, 10L), (1L, 11L), (2L, 10L), (3L, 10L)).toDF("s", "d")
    val prof = Graphs.degreeProfile(raw, "s", "d")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    // out: node1 deg2, nodes 2,3 deg1 → {(1,2 nodes),(2,1 node)}
    // in: node10 deg3, node11 deg1 → {(3,1),(1,1)}
    assert(prof === Set(("out", 2L, 1L), ("out", 1L, 2L),
      ("in", 3L, 1L), ("in", 1L, 1L)))
  }

  test("triangleCount matches naive enumeration on mixed shapes") {
    // K5 on {1..5} (C(5,3)=10 triangles), a diagonal square {10,11,12,13}
    // (2 triangles), a chain {20,21,22,23} (0), a self-loop, duplicate
    // and reversed edges (must dedup), an isolated edge
    val k5 = for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)
    val square = Seq((10L, 11L), (11L, 12L), (12L, 13L), (13L, 10L), (10L, 12L))
    val noise = Seq((20L, 21L), (21L, 22L), (22L, 23L), // chain
      (7L, 7L),                 // self-loop: dropped
      (2L, 1L), (1L, 2L),       // reversed + duplicate of a K5 edge
      (30L, 31L))               // isolated edge
    val edges = (k5 ++ square ++ noise).toDF("s", "d")
    val got = Graphs.triangleCount(edges, "s", "d").collect().head
    // naive expectation: enumerate triples of the canonical edge set
    val es = (k5 ++ square ++ noise).map { case (a, b) =>
      (math.min(a, b), math.max(a, b)) }.filter(e => e._1 != e._2).toSet
    val vs = es.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      a <- vs; b <- vs if a < b && es((a, b))
      c <- vs if b < c && es((b, c)) && es((a, c))
    } yield (a, b, c)
    assert(got.getLong(0) === tris.size.toLong)
    assert(got.getLong(1) === tris.map(t => t._1 + t._2 + t._3).sum)
    assert(tris.size === 12, "sanity: K5 + diagonal square = 10 + 2")
    // empty graph: one row, zero count, zero mass
    val empty = Graphs.triangleCount(Seq((1L, 1L)).toDF("s", "d"), "s", "d")
      .collect().head
    assert((empty.getLong(0), empty.getLong(1)) === (0L, 0L))
  }

  test("bfsLevels: minimum hop levels, bounded depth, unreached absent") {
    // path 1-2-3-4-5-6, a shortcut cycle 1-7-3 (3 stays level 2 via
    // either route, 7 is level 1), and a disconnected edge 40-41
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L),
      (1L, 7L), (7L, 3L), (40L, 41L)).toDF("s", "d")
    val src = Seq(1L).toDF("id")
    val got = Graphs.bfsLevels(edges, "s", "d", src, maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 0L, 2L -> 1L, 7L -> 1L, 3L -> 2L, 4L -> 3L),
      "5 and 6 are beyond the bound; 40/41 disconnected; 3 is min-level 2")
    // depth 0 = just the sources; multiple seeds settle at 0
    val two = Graphs.bfsLevels(edges, "s", "d",
      Seq(1L, 40L).toDF("id"), maxDepth = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(two === Map(1L -> 0L, 40L -> 0L, 2L -> 1L, 7L -> 1L, 41L -> 1L))
  }

  test("registered pagerank plan is join+agg per round, never a nested loop") {
    val plan = graft.ops.Registry.byName("q_graph_pagerank")
      .fn(spark, SparkTestSession.sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
  }

  test("connectedComponents matches union-find on mixed shapes") {
    // a long chain (forces star rounds past the 3 min-label rounds),
    // a clique, a star, two isolated edges — and direction ignored
    val edges = (
      (0L until 19L).map(i => (i, i + 1)) ++          // chain 0..19
        Seq((100L, 101L), (101L, 102L), (100L, 102L)) ++ // triangle
        Seq((200L, 201L), (200L, 202L), (200L, 203L)) ++ // star
        Seq((301L, 300L), (400L, 401L))                  // reversed + pair
      ).toDF("s", "d")
    val got = graft.api.Graphs.connectedComponents(edges, "s", "d")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute-force union-find
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val pairs = edges.collect().map(r => (r.getLong(0), r.getLong(1)))
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    // canonicalize union-find roots to component minima
    val byRoot = nodes.groupBy(find)
    val want = byRoot.values.flatMap(ns => ns.map(_ -> ns.min)).toMap
    assert(got === want)
    assert(got(19L) === 0L, "the 20-node chain collapses to its minimum")
  }

  // ---- FuzzyJoin ----

  test("edSelfJoin equals the naive quadratic join on adversarial cases") {
    // covers: substitution, insert/delete, equality-after-distinct,
    // repeated chars, the ab↔ba distance-2 trap, and a disjoint word
    val words = Seq("cat", "cut", "cart", "ca", "aa", "a", "ab", "ba", "zebra")
    val df = words.toDF("w")
    val got = FuzzyJoin.edSelfJoin(df, "w")
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got === want)
    assert(!got.contains(("ab", "ba"))) // the distance-2 neighborhood collision
    intercept[IllegalArgumentException] { FuzzyJoin.edSelfJoin(df, "w", maxDist = 4) }
    intercept[IllegalArgumentException] { FuzzyJoin.edSelfJoin(df, "w", maxDist = 0) }
  }

  test("edSelfJoin k=2 (PassJoin) equals the naive quadratic join") {
    // adversarial mix: transposition (= 2 substitutions worth of edit),
    // double insert/delete, strings shorter than k+1 segments (zero-
    // length segments), repeated characters, shared prefixes, and a
    // distance-3 pair that the verify must reject even if blocked in
    val words = Seq("cat", "cut", "cab", "ct", "c", "", "ab", "ba", "abcd",
      "abdc", "dcba", "kitten", "sitten", "sittin", "sitting", "mitten",
      "aaaa", "aaab", "aabb", "zebra", "zebrazz")
    val df = words.toDF("w")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    for (k <- Seq(2, 3)) {
      val got = FuzzyJoin.edSelfJoin(df, "w", maxDist = k)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val want = (for {
        a <- words; b <- words if a < b && lev(a, b) <= k
      } yield (a, b)).toSet
      assert(got === want, s"k=$k mismatch: extra=${got.diff(want)} missing=${want.diff(got)}")
    }
    // spot the transposition semantics: ab↔ba is IN at k=2 (two subs)
    val got2 = FuzzyJoin.edSelfJoin(df, "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(got2.contains(("ab", "ba")))
    assert(!got2.contains(("kitten", "sitting"))) // distance 3
  }

  test("edSelfJoin k=2 equals brute force on a random corpus") {
    // 400 short random-ish strings over a 4-letter alphabet: dense
    // enough that every PassJoin branch (length deltas 0/1/2, all
    // segment slots, clamped probe windows) fires many times.
    val rnd = new scala.util.Random(42)
    val words = (0 until 400).map { _ =>
      val len = 1 + rnd.nextInt(8)
      (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    }.distinct
    val df = words.toDF("w")
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val got = FuzzyJoin.edSelfJoin(df, "w", maxDist = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val want = (for {
      a <- words; b <- words if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    assert(got === want,
      s"extra=${got.diff(want).take(5)} missing=${want.diff(got).take(5)}")
    assert(want.nonEmpty, "test corpus must produce pairs")
  }

  test("PassJoin SQL fragments equal the pure closed forms over a full grid") {
    // the production plan evaluates the SQL strings; PassJoinProps pins
    // the PURE functions — this sweep binds the two representations, so
    // an off-by-one edit to either fails a test instead of only the
    // end-to-end brute force
    import graft.api.FuzzyJoin
    for (k <- Seq(2, 3)) {
      val grid = spark.range(0, 61).selectExpr("CAST(id AS INT) AS l")
        .crossJoin(spark.range(0, k + 1).selectExpr("CAST(id AS INT) AS i"))
        .crossJoin(spark.range(0, k + 1).selectExpr("CAST(id AS INT) AS d"))
      val rows = grid.selectExpr("l", "i", "d",
          s"CAST(${FuzzyJoin.segLenSql(k)("l", "i")} AS INT) AS sl",
          s"CAST(${FuzzyJoin.segStartSql(k)("l", "i")} AS INT) AS sp",
          s"CAST(${FuzzyJoin.winLoSql(k)("i", "d")} AS INT) AS wl",
          s"CAST(${FuzzyJoin.winHiSql(k)("i", "d")} AS INT) AS wh")
        .collect()
      assert(rows.length === 61 * (k + 1) * (k + 1))
      rows.foreach { r =>
        val (l, i, d) = (r.getInt(0), r.getInt(1), r.getInt(2))
        val (wl, wh) = FuzzyJoin.windowF(i, d, k)
        assert(r.getInt(3) === FuzzyJoin.segLenF(l, i, k), s"segLen l=$l i=$i k=$k")
        assert(r.getInt(4) === FuzzyJoin.segStartF(l, i, k), s"segStart l=$l i=$i k=$k")
        assert(r.getInt(5) === wl, s"winLo i=$i d=$d k=$k")
        assert(r.getInt(6) === wh, s"winHi i=$i d=$d k=$k")
      }
    }
  }

  test("char-frequency signature SQL equals the pure twin; filter drops no true pair") {
    // The signature is built by SQL (charSigSql) in the production plan
    // and by charSigF in the property pins — bind them over a corpus
    // that exercises empty strings, saturation (> 15 repeats), all 16
    // buckets, and non-ASCII codepoints.
    import graft.api.FuzzyJoin
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val words = Seq("", "a", "aa", "a" * 40, "Customer#000000001",
      "abcdefghijklmnopqrstuvwxyz0123456789", "çafé—ünïcødé", "  spa  ces ",
      "0123456789", "9876543210", "zzzzyyyyxxxx")
    val got = words.toDF("w")
      .selectExpr("w", s"${FuzzyJoin.charSigSql("w")} AS sig")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    words.foreach { w =>
      assert(got(w) === FuzzyJoin.charSigF(w), s"charSig('$w')")
    }
    // sigL1 (the unrolled Column) against the pure twin over all pairs
    val pairs = for (a <- words; b <- words) yield (a, b)
    val l1 = pairs.toDF("a", "b")
      .select(col("a"), col("b"),
        FuzzyJoin.sigL1(
          expr(FuzzyJoin.charSigSql("a")), expr(FuzzyJoin.charSigSql("b"))).as("l1"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    pairs.foreach { case (a, b) =>
      assert(l1((a, b)) ===
        FuzzyJoin.sigL1F(FuzzyJoin.charSigF(a), FuzzyJoin.charSigF(b)),
        s"sigL1('$a','$b')")
    }
    // and the end-to-end losslessness: filtered candidates ⊇ true pairs
    // on a corpus designed so the filter has real work to do
    val corpus = (0 until 40).map(i => f"row#$i%04d tail") ++
      (0 until 10).map(d => s"row#$d$d$d$d tail") ++ // pairwise L1 = 8 > 2k,
      // yet blocked together by the shared "row"/"tail" segments — the
      // guaranteed strict cut at k = 3 (plain 4-digit ids differ in ≤ 2
      // chars, L1 ≤ 4, invisible to the k = 3 filter)
      Seq("row#0001 tail!", "row#0001 tai", "completely different")
    for (k <- Seq(2, 3)) {
      val gotPairs = FuzzyJoin.edSelfJoin(corpus.toDF("w"), "w", maxDist = k)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val wantPairs = (for {
        a <- corpus.distinct; b <- corpus.distinct if a < b && lev(a, b) <= k
      } yield (a, b)).toSet
      assert(gotPairs === wantPairs, s"k=$k filtered blocking lost/added pairs")
      assert(wantPairs.nonEmpty)
      val raw = FuzzyJoin.passJoinCandidates(
        FuzzyJoin.distinctKeys(corpus.toDF("w"), "w"), k, sigFilter = false).count()
      val filt = FuzzyJoin.passJoinCandidates(
        FuzzyJoin.distinctKeys(corpus.toDF("w"), "w"), k, sigFilter = true).count()
      assert(filt <= raw, s"k=$k filter must not add candidates")
      assert(filt < raw, s"k=$k filter should cut candidates on this corpus " +
        s"(raw=$raw filtered=$filt)")
    }
  }

  test("edSelfJoin plan is blocked, never a cartesian/nested-loop join") {
    val df = (0 until 100).map(i => f"name$i%04d").toDF("w")
    for (k <- Seq(1, 2)) {
      val plan = FuzzyJoin.edSelfJoin(df, "w", maxDist = k)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"k=$k")
      assert(!plan.contains("BroadcastNestedLoopJoin"), s"k=$k")
    }
  }

  // ---- Cdc ----

  test("scd2 compresses runs and chains validity bounds exactly") {
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val ev = Seq(
      (1L, 1L, ts(0), 10.0), (1L, 2L, ts(1), 10.0), // run compressed
      (1L, 3L, ts(2), 20.0), (1L, 4L, ts(3), 10.0), // back to 10 = new version
      (2L, 5L, ts(0), 5.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Cdc.scd2(ev, "user_id", "ts", "event_id", "value")
      .orderBy("user_id", "valid_from_us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), if (r.isNullAt(4)) -1L else r.getLong(4), r.getBoolean(5)))
    val base = 1700000000000000L
    assert(out.toSeq === Seq(
      (1L, 1L, 10.0, base, base + 2000000L, false),
      (1L, 3L, 20.0, base + 2000000L, base + 3000000L, false),
      (1L, 4L, 10.0, base + 3000000L, -1L, true),
      (2L, 5L, 5.0, base, -1L, true)))
  }

  test("scd2 treats NULL transitions as changes (null-safe equality)") {
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val ev = Seq(
      (1L, 1L, ts(0), Some(1.0)), (1L, 2L, ts(1), None),
      (1L, 3L, ts(2), None), (1L, 4L, ts(3), Some(1.0))
    ).toDF("user_id", "event_id", "ts", "value")
    val out = Cdc.scd2(ev, "user_id", "ts", "event_id", "value")
    // versions: 1.0, NULL (the two NULLs compress), 1.0
    assert(out.count() === 3)
    assert(out.filter(col("is_current")).count() === 1)
  }

  test("rollingAnomalies flags a planted spike and excludes self from the window") {
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    // stable 10.00 stream with one 99.00 spike at position 5
    val ev = (0 until 10).map(i =>
      (1L, i.toLong, ts(i), if (i == 5) 99.0 else 10.0))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Cdc.rollingAnomalies(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    assert(out(5L)) // the spike is flagged against its flat history
    // events 0-3 have < minPrior history → never flagged
    assert(!out(0L) && !out(1L) && !out(2L) && !out(3L))
    // event 4 sits on a zero-variance window of equal values → not an outlier
    assert(!out(4L))
    // post-spike events: window variance explodes (contains the spike),
    // so the 10.0 values stay unflagged — self-exclusion keeps the spike
    // itself flaggable but its neighbors' windows absorb it
    assert(!out(6L))
  }

  test("rollingAnomalies zero-variance window flags any deviation") {
    val ts = (i: Int) => new java.sql.Timestamp(1700000000000L + i * 1000L)
    val ev = ((0 until 6).map(i => (1L, i.toLong, ts(i), 10.0)) :+
      (1L, 6L, ts(6), 10.01))
      .toDF("user_id", "event_id", "ts", "value")
    val out = Cdc.rollingAnomalies(ev, "user_id", "ts", "event_id", "value")
      .collect().map(r => r.getLong(1) -> r.getBoolean(4)).toMap
    // (n·c − Σc)² = (6·1001 − 6·1000)² = 36 > 4·0 — one cent off a
    // perfectly flat history is, correctly, infinite z
    assert(out(6L))
    intercept[IllegalArgumentException] {
      Cdc.rollingAnomalies(ev, "user_id", "ts", "event_id", "value",
        lookback = 2, minPrior = 4)
    }
  }

  test("ensureGraph's materialized edges are (src, dst)-unique " +
      "(the degreeProfile assumeDistinct invariant)") {
    // q_graph_degree calls degreeProfile(assumeDistinct = true) against
    // this table: degrees are silently WRONG if the build ever stops
    // materializing edgesWithOutDegree's distinct output. Pin the
    // invariant where the table is BUILT instead of trusting the
    // call-site comment (VERDICT r21 item 7).
    val base = graft.ops.Sources.ensureGraph(spark, SparkTestSession.sfDir)
    val e = spark.read.parquet(s"$base/edges")
    val dupes = e.groupBy("src", "dst").count()
      .filter(col("count") > 1).count()
    assert(dupes === 0L,
      s"$base/edges carries $dupes duplicated (src, dst) pairs — " +
        "degreeProfile(assumeDistinct = true) callers would double-count")
  }
}
