package graft.operators

import graft.SparkTestBase
import java.math.{BigDecimal => JBD, RoundingMode}

/** Link-analysis invariants: both algorithms replayed scalar-exactly
  * on a hand graph (independent arithmetic — plain doubles + BigDecimal
  * sums, no DataFrames), plus partitioning-invariance (the decimal-sum
  * discipline must make results identical under any input layout). */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private val edges =
    Seq(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"))

  private def t12(x: Double): Double = math.floor(x * 1e12) / 1e12

  /** Exact DECIMAL(18,15)-term sum, mirroring the engine/oracle. */
  private def xsum(xs: Seq[Double]): Double =
    xs.map(x => JBD.valueOf(x).setScale(15, RoundingMode.HALF_UP))
      .foldLeft(JBD.ZERO)(_.add(_)).doubleValue()

  test("pageRank matches a scalar replay on a hand graph") {
    val out = Graph.pageRank(edges.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val outEdges = edges.groupBy(_._1)
    val deg = outEdges.map { case (s, es) => s -> es.length }
    var pr = Map("a" -> t12(1.0 / 3), "b" -> t12(1.0 / 3),
      "c" -> t12(1.0 / 3))
    for (_ <- 1 to 5) {
      pr = Seq("a", "b", "c").map { v =>
        val m = xsum(edges.filter(_._2 == v)
          .map { case (s, _) => pr(s) / deg(s) })
        v -> t12(0.15 / 3 + 0.85 * m)
      }.toMap
    }
    assert(out === pr)
    // a receives ALL of c's mass (c's only out-edge) — highest;
    // b receives only half of a's — lowest
    assert(pr("a") > pr("c") && pr("c") > pr("b"))
  }

  test("hits matches a scalar replay on a hand graph") {
    val out = Graph.hits(edges.toDF("src", "dst")).collect()
      .map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2)))
      .toMap
    val nodes = Seq("a", "b", "c")
    var hub = nodes.map(_ -> 1.0).toMap
    var auth = Map.empty[String, Double]
    for (_ <- 1 to 5) {
      val araw = nodes.map(v =>
        v -> xsum(edges.filter(_._2 == v).map(e => hub(e._1)))).toMap
      val am = araw.values.max
      auth = nodes.map(v => v -> t12(araw(v) / am)).toMap
      val hraw = nodes.map(v =>
        v -> xsum(edges.filter(_._1 == v).map(e => auth(e._2)))).toMap
      val hm = hraw.values.max
      hub = nodes.map(v => v -> t12(hraw(v) / hm)).toMap
    }
    assert(out.keySet === nodes.toSet)
    nodes.foreach { v =>
      assert(out(v)._1 === auth(v), s"auth($v)")
      assert(out(v)._2 === hub(v), s"hub($v)")
    }
    // c is the best authority (in-edges from a and b)
    assert(auth("c") === 1.0)
  }

  test("personalized pageRank: teleport mass stays near the seeds " +
      "(scalar replay)") {
    val out = Graph.pageRankPersonalized(edges.toDF("src", "dst"),
        Seq("a").toDF("node"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val deg = edges.groupBy(_._1).map { case (s, es) => s -> es.length }
    val tele = Map("a" -> t12(1.0), "b" -> 0.0, "c" -> 0.0)
    var pr = tele
    for (_ <- 1 to 5) {
      pr = Seq("a", "b", "c").map { v =>
        val m = xsum(edges.filter(_._2 == v)
          .map { case (s, _) => pr(s) / deg(s) })
        v -> t12(0.15 * tele(v) + 0.85 * m)
      }.toMap
    }
    assert(out === pr)
    // the walk restarts at a — a dominates; its direct targets carry
    // more mass than under the uniform prior
    assert(pr("a") > pr("b") && pr("a") > pr("c"))
  }

  test("connectedComponents reaches the exact fixpoint on a " +
      "two-component graph with a long chain") {
    // chain z1-z2-z3-z4-z5 (diameter forces several rounds) and a
    // separate pair (x, y)
    val e = Seq(("z1", "z2"), ("z2", "z3"), ("z3", "z4"),
      ("z4", "z5"), ("x", "y"))
    val out = Graph.connectedComponents(e.toDF("src", "dst"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("z1" -> "z1", "z2" -> "z1", "z3" -> "z1",
      "z4" -> "z1", "z5" -> "z1", "x" -> "x", "y" -> "x"))
  }

  test("pageRank fixpoint short-circuit is value-identical: a " +
      "bipartite graph converges in 2 rounds, so any higher iters " +
      "returns the exact same table") {
    // c->s bipartite (the endorsement-graph shape): sinks latch
    // after round 2 and the t12 grid makes the fixpoint EXACT
    val bip = Seq(("c1", "s1"), ("c1", "s2"), ("c2", "s1"),
      ("c3", "s2"), ("c3", "s3"))
    val at5 = Graph.pageRank(bip.toDF("src", "dst"), iters = 5)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    val at12 = Graph.pageRank(bip.toDF("src", "dst"), iters = 12)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(at5 === at12)
    val w5 = Graph.pageRankWeighted(bip.toDF("src", "dst")
        .withColumn("w", org.apache.spark.sql.functions.lit(2L)),
      "w", iters = 5).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val w12 = Graph.pageRankWeighted(bip.toDF("src", "dst")
        .withColumn("w", org.apache.spark.sql.functions.lit(2L)),
      "w", iters = 12).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(w5 === w12)
  }

  test("pageRank is invariant to input partitioning") {
    val df = (1 to 40).map(i =>
      (s"n${i % 7}", s"n${(i * 3) % 7}")).toDF("src", "dst")
    val a = Graph.pageRank(df.repartition(1)).collect().toSeq
    val b = Graph.pageRank(df.repartition(13)).collect().toSeq
    assert(a === b)
  }

  test("triangleStats matches a brute-force count on a hand graph " +
      "and ignores duplicates / orientation / self-loops") {
    // K4 on a,b,c,d (every vertex in 3 triangles) plus a pendant e-a
    // and noise: reversed duplicates and a self-loop
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"),
      ("b", "d"), ("c", "d"))
    val noisy = k4 ++ k4.map(_.swap) ++ Seq(("e", "a"), ("c", "c"))
    val out = Graph.triangleStats(noisy.toDF("src", "dst"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2),
        r.getDouble(3)))).toMap
    // a: deg 4 (K4 + pendant), 3 triangles, lcc = 2*3/(4*3) = 0.5
    assert(out("a") === ((4L, 3L, 0.5)))
    assert(out("b") === ((3L, 3L, 1.0)))
    assert(out("c") === ((3L, 3L, 1.0)))
    assert(out("d") === ((3L, 3L, 1.0)))
    assert(out("e") === ((1L, 0L, 0.0)))
  }

  test("triangleStats finds zero triangles on a bipartite graph") {
    val bip = for { l <- Seq("l1", "l2", "l3"); r <- Seq("r1", "r2") }
      yield (l, r)
    val out = Graph.triangleStats(bip.toDF("src", "dst")).collect()
    assert(out.length === 5)
    assert(out.forall(r => r.getLong(2) === 0L && r.getDouble(3) === 0.0))
  }

  test("triangleStats is invariant to input partitioning") {
    val df = (1 to 60).map(i =>
      (s"n${i % 9}", s"n${(i * 5 + 2) % 9}")).toDF("src", "dst")
    val a = Graph.triangleStats(df.repartition(1))
      .orderBy($"node").collect().toSeq
    val b = Graph.triangleStats(df.repartition(13))
      .orderBy($"node").collect().toSeq
    assert(a === b)
  }

  test("assortativity: a star graph is perfectly disassortative " +
      "(r = -1)") {
    // K1,3: every edge joins the hub (deg 3) to a leaf (deg 1);
    // num = 3 - 4 = -1, den = 5 - 4 = 1 → r = -1 exactly
    val star = Seq(("h", "l1"), ("h", "l2"), ("h", "l3"))
    val r = Graph.assortativity(star.toDF("src", "dst")).head()
    assert(r.getAs[Long]("m") === 3L)
    assert(r.getAs[Long]("s1") === 12L) // 3 × (3 + 1)
    assert(r.getAs[Long]("s2") === 30L) // 3 × (9 + 1)
    assert(r.getAs[Long]("sp") === 9L)  // 3 × (3 · 1)
    assert(r.getAs[Double]("assortativity") === -1.0)
  }

  test("sharedNeighborSimilarity: 4-cycle opposite corners have " +
      "jaccard 1.0; hot middles above maxDegree are pruned") {
    // square a-b-c-d: N(a) = {b,d} = N(c), N(b) = {a,c} = N(d)
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val out = Graph.sharedNeighborSimilarity(cyc.toDF("src", "dst"),
        minShared = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    assert(out === Map(("a", "c") -> ((2L, 1.0)),
      ("b", "d") -> ((2L, 1.0))))
    // add a hub touching everything: unpruned, (a,c) share middles
    // {b, d, hub} = 3; with maxDegree below the hub's degree its
    // wedges vanish and (a,c) drop back to 2 shared — while the hub
    // still appears as an ENDPOINT via cycle-node middles
    val hub = cyc ++ Seq("a", "b", "c", "d").map(("hub", _))
    val full = Graph.sharedNeighborSimilarity(
        hub.toDF("src", "dst"), minShared = 2)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(full(("a", "c")) === 3L)
    val pruned = Graph.sharedNeighborSimilarity(
        hub.toDF("src", "dst"), minShared = 2, maxDegree = 3)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(pruned(("a", "c")) === 2L)
    assert(pruned(("a", "hub")) === 2L) // middles b, d — still found
  }

  test("sharedNeighborSimilarity packed pair-long fast path equals " +
      "the two-column aggregate: same graph, ids in vs out of the " +
      "32-bit packing range") {
    // K4 plus a pendant — every unordered pair shares 1-2 middles
    val base = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L),
      (2L, 4L), (3L, 4L), (4L, 5L))
    def run(off: Long) = Graph.sharedNeighborSimilarity(
        base.map { case (u, v) => (u + off, v + off) }
          .toDF("src", "dst"), minShared = 1, k = 50)
      .collect()
      .map(r => (r.getLong(0) - off, r.getLong(1) - off) ->
        ((r.getLong(2), r.getDouble(5)))).toMap
    val packed = run(0L)          // ids < 2^32: single-long agg key
    val fallback = run(1L << 33)  // ids ≥ 2^32: two-column agg key
    assert(packed === fallback)
    assert(packed((1L, 2L))._1 === 2L) // middles {3, 4}
    assert(packed((1L, 5L))._1 === 1L) // middle {4}
  }

  test("kCore: pendant chain peels over cascading rounds, the " +
      "triangle core survives with within-core degrees") {
    // triangle x-y-z plus a tail z-p1-p2-p3: the 2-core is exactly
    // the triangle, and the tail needs THREE peel rounds (p3 first,
    // then p2, then p1) — the cascade the fixpoint loop must follow
    val g = Seq(("x", "y"), ("y", "z"), ("z", "x"),
      ("z", "p1"), ("p1", "p2"), ("p2", "p3"))
    val core = Graph.kCore(g.toDF("src", "dst"), k = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(core === Map("x" -> 2L, "y" -> 2L, "z" -> 2L))
    // a pure path has no 2-core at all
    val path = Seq(("a", "b"), ("b", "c"), ("c", "d"))
    assert(Graph.kCore(path.toDF("src", "dst"), k = 2).isEmpty)
    // k=1 keeps everything with at least one edge
    val all = Graph.kCore(g.toDF("src", "dst"), k = 1)
    assert(all.count() === 6L)
  }

  test("randomWalks: every transition follows a real edge, one walk " +
      "per start node, deterministic under repartition") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"),
      ("b", "d"))
    val sym = (g ++ g.map(_.swap)).toSet
    val walks = Graph.randomWalks(g.toDF("src", "dst"), steps = 4)
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2)))
    // one position per (start, step): 4 starts x 5 steps
    assert(walks.length === 20)
    assert(walks.filter(_._2 == 0L).map(w => w._1 -> w._3).toMap ===
      Map("a" -> "a", "b" -> "b", "c" -> "c", "d" -> "d"))
    val byWalk = walks.groupBy(_._1).view.mapValues(
      _.sortBy(_._2).map(_._3).toSeq)
    byWalk.foreach { case (start, path) =>
      path.sliding(2).foreach { p =>
        assert(sym.contains((p(0), p(1))),
          s"walk $start took a non-edge ${p(0)}->${p(1)}")
      }
    }
    val rep = Graph.randomWalks(g.toDF("src", "dst").repartition(5),
        steps = 4).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rep.sortBy(w => (w._1, w._2)).toSeq ===
      walks.sortBy(w => (w._1, w._2)).toSeq)
  }

  test("coOccurrence: shared-group counting, size guard excludes " +
      "mega-groups, weight floor") {
    val inc = Seq(
      ("g1", "a"), ("g1", "b"), ("g1", "c"),
      ("g2", "a"), ("g2", "b"),
      ("g2", "a"), // duplicate incidence collapses
      ("g3", "a"), ("g3", "b"), ("g3", "c"), ("g3", "d"), ("g3", "e"))
      .toDF("g", "it")
    val all = Graph.coOccurrence(inc, "g", "it").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(all(("a", "b")) === 3L) // g1, g2, g3
    assert(all(("a", "c")) === 2L) // g1, g3
    // dropping g3 via the size guard removes its pairs entirely
    val guarded = Graph.coOccurrence(inc, "g", "it",
        maxGroupSize = 3).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    assert(guarded(("a", "b")) === 2L)
    assert(!guarded.contains(("d", "e")))
    // weight floor keeps only repeated pairs
    val floored = Graph.coOccurrence(inc, "g", "it", minWeight = 2)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(floored === Set(("a", "b"), ("a", "c"), ("b", "c")))
  }

  test("hopDistance: chain distances, hop cap, directed mode, " +
      "unreachable nodes absent") {
    val chain = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"),
      ("x", "y")) // x-y disconnected from the seed
    val seeds = Seq("a").toDF("node")
    val full = Graph.hopDistance(chain.toDF("src", "dst"), seeds,
        maxHops = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(full === Map("a" -> 0L, "b" -> 1L, "c" -> 2L, "d" -> 3L,
      "e" -> 4L))
    val capped = Graph.hopDistance(chain.toDF("src", "dst"), seeds,
        maxHops = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(capped === Map("a" -> 0L, "b" -> 1L, "c" -> 2L))
    // directed: edges only flow forward, so seeding at c reaches d, e
    // but never b; undirected from c reaches everything
    val dir = Graph.hopDistance(chain.toDF("src", "dst"),
        Seq("c").toDF("node"), maxHops = 10, directed = true)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(dir === Map("c" -> 0L, "d" -> 1L, "e" -> 2L))
    // a seed absent from the graph still reports itself at dist 0
    val lone = Graph.hopDistance(chain.toDF("src", "dst"),
      Seq("q").toDF("node"), maxHops = 3).collect()
    assert(lone.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("q", 0L)))
  }

  test("labelPropagation: bridged triangles settle into two " +
      "communities (scalar replay), partitioning-invariant") {
    val g = Seq(("a", "b"), ("b", "c"), ("c", "a"),
      ("d", "e"), ("e", "f"), ("f", "d"), ("c", "d"))
    // hand replay of 4 synchronous mode-relabel rounds with the
    // (count DESC, label ASC) tie order (see python derivation in
    // history): {a,b,c} -> a, {d,e,f} -> c
    val out = Graph.labelPropagation(g.toDF("src", "dst"), iters = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out === Map("a" -> "a", "b" -> "a", "c" -> "a",
      "d" -> "c", "e" -> "c", "f" -> "c"))
    val rep = Graph.labelPropagation(
        g.toDF("src", "dst").repartition(7), iters = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(rep === out)
  }

  test("assortativity is null on a degree-regular graph (zero " +
      "degree variance), and noise edges collapse first") {
    // 4-cycle, with reversed duplicates and a self-loop mixed in
    val cyc = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
    val noisy = cyc ++ cyc.map(_.swap) ++ Seq(("b", "b"))
    val r = Graph.assortativity(noisy.toDF("src", "dst")).head()
    assert(r.getAs[Long]("m") === 4L)
    assert(r.isNullAt(r.fieldIndex("assortativity")))
  }
  test("pageRankWeighted: a heavy edge pulls rank toward its " +
      "target; uniform weights reduce to plain pageRank; " +
      "duplicate edges collapse by weight sum") {
    import spark.implicits._
    // star: s -> a (weight 9), s -> b (weight 1)
    val w = Seq(("s", "a", 9L), ("s", "b", 1L)).toDF("src", "dst", "w")
    val pr = Graph.pageRankWeighted(w, "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    // above-teleport mass splits 9:1 (pr("s") is the pure-teleport
    // baseline — no in-edges)
    val base = pr("s")
    val ratio = (pr("a") - base) / (pr("b") - base)
    assert(ratio > 8.5 && ratio < 9.5,
      s"weight split wrong: ratio $ratio in $pr")
    // all-equal weights == the uniform operator, value for value
    val edges = Seq(("x", "y"), ("y", "z"), ("z", "x"), ("x", "z"))
      .toDF("src", "dst")
    val uni = Graph.pageRank(edges, iters = 4)
      .collect().map(_.toSeq).toSeq
    val wuni = Graph.pageRankWeighted(
      edges.withColumn("w", org.apache.spark.sql.functions.lit(1L)),
      "w", iters = 4).collect().map(_.toSeq).toSeq
    assert(uni === wuni)
    // duplicates collapse: (s,a,4)+(s,a,5) == (s,a,9)
    val dup = Seq(("s", "a", 4L), ("s", "a", 5L), ("s", "b", 1L))
      .toDF("src", "dst", "w")
    val prDup = Graph.pageRankWeighted(dup, "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(prDup === pr)
  }

  test("resolveRedirects follows chains to terminals and flags " +
      "cycles unresolved") {
    import spark.implicits._
    // chain 5->4->3->2->1 (terminal), 2-cycle 10<->11, self-loop 12,
    // and a fork-shaped alias pair 20->1, 21->1
    val edges = Seq(
      (5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L),
      (10L, 11L), (11L, 10L), (12L, 12L),
      (20L, 1L), (21L, 1L)).toDF("src", "dst")
    val out = Graph.resolveRedirects(edges, "src", "dst", maxDepth = 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getBoolean(2)))).toMap
    assert(out(5L) === ((1L, true)))
    assert(out(4L) === ((1L, true)))
    assert(out(2L) === ((1L, true)))
    assert(out(1L) === ((1L, true)))   // terminal resolves to itself
    assert(out(20L) === ((1L, true)) && out(21L) === ((1L, true)))
    assert(!out(10L)._2 && !out(11L)._2) // cycle: unresolved
    assert(out(12L) === ((12L, false))) // self-loop: unresolved
    // multi-edge src collapses to min(dst) deterministically
    val multi = Seq((1L, 3L), (1L, 2L)).toDF("src", "dst")
    val m = Graph.resolveRedirects(multi, "src", "dst", maxDepth = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(1L) === 2L)
  }

  test("resolveRedirects follows EXACTLY maxDepth hops for " +
      "non-power-of-two depths (r10 advice: no round-up to 16)") {
    import spark.implicits._
    // chain 12->11->...->1->0 (terminal). At maxDepth=10: node 10
    // reaches 0 in exactly 10 hops (resolved); node 11 needs 11 and
    // node 12 needs 12 — the r10 power-of-two round-up (16 hops)
    // reported them resolved; the exact form must flag both.
    val edges = (1L to 12L).map(i => (i, i - 1)).toDF("src", "dst")
    val out = Graph.resolveRedirects(edges, "src", "dst",
        maxDepth = 10)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getBoolean(2)))).toMap
    assert(out(10L) === ((0L, true)))
    assert(out(11L) === ((1L, false)),
      "11-hop chain at maxDepth=10 must stop one short, unresolved")
    assert(out(12L) === ((2L, false)))
    // maxDepth=1 follows a single hop
    val one = Graph.resolveRedirects(edges, "src", "dst", maxDepth = 1)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1),
        r.getBoolean(2)))).toMap
    assert(one(2L) === ((1L, false)) && one(1L) === ((0L, true)))
  }

  test("hyperBall: ball estimates track exact reachability on a " +
      "chain, harmonic centrality orders by reach") {
    import spark.implicits._
    // directed chain a->b->c->d->e: out-ball at radius 4 is exactly
    // the suffix; HLL at m=1024 on <=5 elements is the linear-count
    // regime, within ~1% of exact.
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"))
      .toDF("src", "dst")
    val out = Graph.hyperBall(edges, rounds = 4)
      .collect().map(r => r.getString(0) ->
        ((r.getDouble(1), r.getDouble(2)))).toMap
    val exactBall = Map("a" -> 5.0, "b" -> 4.0, "c" -> 3.0,
      "d" -> 2.0, "e" -> 1.0)
    for ((n, (ball, _)) <- out)
      assert(math.abs(ball - exactBall(n)) < 0.05 * exactBall(n) + 0.01,
        s"node=$n ball=$ball")
    // exact harmonic (out-direction): a: 1+1/2+1/3+1/4, b: 1+1/2+1/3…
    val exactH = Map("a" -> (1.0 + 0.5 + 1.0 / 3 + 0.25),
      "b" -> (1.0 + 0.5 + 1.0 / 3), "c" -> 1.5, "d" -> 1.0,
      "e" -> 0.0)
    for ((n, (_, h)) <- out)
      assert(math.abs(h - exactH(n)) < 0.05 * exactH(n) + 0.02,
        s"node=$n harmonic=$h")
  }

  test("hyperBall: estimates are partition-invariant and monotone " +
      "with radius on a dense graph") {
    import spark.implicits._
    val edges = (for (i <- 0 until 30; j <- 0 until 30
      if (i + j) % 7 == 1) yield (s"n$i", s"n$j")).toDF("src", "dst")
    def run(df: org.apache.spark.sql.DataFrame) =
      Graph.hyperBall(df, rounds = 3).orderBy("node")
        .collect().map(_.toSeq).toSeq
    assert(run(edges) === run(edges.repartition(11)))
  }

  test("hyperBallProfile: neighborhood function grows to the node " +
      "count on a cycle, effective diameter interpolates") {
    import spark.implicits._
    // directed 6-cycle: |B_t(v)| = t + 1 for every v, so
    // N(t) ≈ 6(t+1) and N(4) ≈ 30; N(t)/N(4) hits 0.9 between t=3
    // (24/30 = 0.8) and t=4 (1.0) → eff_diameter ≈ 3.5.
    val edges = (0 until 6).map(i => (s"v$i", s"v${(i + 1) % 6}"))
      .toDF("src", "dst")
    val rows = Graph.hyperBallProfile(edges, rounds = 4)
      .orderBy("t").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    val totals = rows.map(_.getDouble(1))
    for (t <- 0 to 4)
      assert(math.abs(totals(t) - 6.0 * (t + 1)) < 0.05 * 6 * (t + 1),
        s"t=$t total=${totals(t)}")
    assert(totals.zip(totals.tail).forall { case (a, b) => a < b })
    val eff = rows.head.getDouble(3)
    assert(rows.forall(_.getDouble(3) === eff))
    assert(math.abs(eff - 3.5) < 0.1, s"eff=$eff")
    assert(math.abs(rows.last.getDouble(2) - 1.0) < 1e-9)
  }
}
