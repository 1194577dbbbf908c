package graft

import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank on a symmetric pair: ranks stay equal and conserve mass") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pagerank(e, iters = 3).as[(Long, Long)].collect().toMap
    // base = 5e8 each; every iteration hands the full rank across and
    // takes 15% hold + 85% inflow — symmetric, so ranks remain equal
    assert(r(1L) == r(2L), r.toString)
    // hold + 85% of a full rank ≈ base (floor losses only)
    assert(math.abs(r(1L) - 500000000L) < 100L, r.toString)
  }

  test("pagerank: a hub referenced by all spokes outranks them") {
    // star with back-edges (symmetric, no dangling): hub 0 ⇄ spokes 1..5
    val edges = (1L to 5L).flatMap(s => Seq((0L, s), (s, 0L))).toDF("src", "dst")
    val r = Graph.pagerank(edges, iters = 3).as[(Long, Long)].collect().toMap
    assert((1L to 5L).forall(s => r(0L) > r(s)), r.toString)
    assert((1L to 5L).map(r).toSet.size == 1, "spokes must tie exactly")
  }

  test("pagerank replays the exact integer recurrence (hand-computed, 1 iter)") {
    // triangle cycle 1→2→3→1: deg 1 everywhere, n=3
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val base = 1000000000L / 3       // 333333333
    val hold = 15L * base / 100      // 49999999
    val expect = hold + (base * 85L) / 100L // floor(333333333*85/100)=283333333
    val r = Graph.pagerank(e, iters = 1).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> expect, 2L -> expect, 3L -> expect), r.toString)
  }

  test("triangleCorners: K4 has 4 triangles, every node in 3") {
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b)).toDF("u", "v")
    val r = Graph.triangleCorners(k4).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), r.toString)
  }

  test("triangleCorners: a square has none; adding one diagonal makes two") {
    val square = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("u", "v")
    assert(Graph.triangleCorners(square).count() == 0)
    val withDiag = square.union(Seq((1L, 3L)).toDF("u", "v"))
    val r = Graph.triangleCorners(withDiag).as[(Long, Long)].collect().toMap
    // triangles (1,2,3) and (1,3,4): diagonal endpoints 1,3 in both
    assert(r == Map(1L -> 2L, 2L -> 1L, 3L -> 2L, 4L -> 1L), r.toString)
  }

  test("triangleCorners: duplicate and hub-heavy edges count each triangle once") {
    // star hub 0 to 1..6 plus rim edge (1,2): exactly one triangle even
    // with duplicated input rows; degree orientation points the rim pair
    // AT the hub
    val edges = ((1L to 6L).map(s => (0L, s)) ++ Seq((1L, 2L), (1L, 2L))).toDF("u", "v")
    val r = Graph.triangleCorners(edges).as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L, 1L -> 1L, 2L -> 1L), r.toString)
  }

  test("duplicate edges are deduped before out-degree counting") {
    val e = Seq((1L, 2L), (1L, 2L), (2L, 1L)).toDF("src", "dst")
    val r = Graph.pagerank(e, iters = 2).as[(Long, Long)].collect().toMap
    assert(r(1L) == r(2L), s"duplicate edge skewed the degree: $r")
  }

  test("bfsHops: min hop on a cyclic graph, undirected reach, maxHops cutoff") {
    // 1—2—3—4—5 chain plus shortcut 1—4 (so 4 is hop 1, 5 is hop 2,
    // 3 is min(2 via 2, 2 via 4) = 2); 9—10 unreachable; 6 reachable
    // only against edge direction (symmetrization must find it)
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (6L, 1L), (9L, 10L)).toDF("u", "v")
    val got = Graph.bfsHops(e, seed = 1L, maxHops = 2)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 6L -> 1L,
      3L -> 2L, 5L -> 2L), got.toString)
    // cutoff: with maxHops 1 the hop-2 shell disappears
    val got1 = Graph.bfsHops(e, seed = 1L, maxHops = 1)
      .as[(Long, Long)].collect().toMap
    assert(got1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 6L -> 1L), got1.toString)
  }

  test("ssspRounds: cheaper multi-hop beats direct edge, round-bounded, rejects negatives") {
    // 1→4 direct costs 10; 1→2→4 costs 2+3 = 5; 1→2→3→5 reaches 5 in 3
    // hops (cost 2+1+1 = 4); node 6 is disconnected
    val e = Seq((1L, 4L, 10L), (1L, 2L, 2L), (2L, 4L, 3L), (2L, 3L, 1L),
      (3L, 5L, 1L), (6L, 7L, 1L)).toDF("u", "v", "w")
    def run(r: Int): Map[Long, Long] =
      Graph.ssspRounds(e, seed = 1L, rounds = r)
        .as[(Long, Long)].collect().toMap
    // round 1: direct edges only — 4 still costs 10
    assert(run(1) == Map(1L -> 0L, 4L -> 10L, 2L -> 2L))
    // round 2: the 2-hop path relaxes 4 down to 5; 3 appears at 3
    assert(run(2) == Map(1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 5L))
    // round 3: 5 reached at 4; disconnected 6/7 never appear
    val r3 = run(3)
    assert(r3 == Map(1L -> 0L, 2L -> 2L, 3L -> 3L, 4L -> 5L, 5L -> 4L))
    // ample rounds: early exit at the fixpoint, same frame
    assert(run(10) == r3)
    intercept[IllegalArgumentException] {
      Graph.ssspRounds(Seq((1L, 2L, -1L)).toDF("u", "v", "w"), 1L, 2)
    }
  }

  test("kCorePeel: cascade peels a pendant chain, clique survives, fixed-round partial") {
    // K4 clique (1,2,3,4) + pendant chain 4-5-6-7: for k=2 the chain
    // peels one node per round from the tail (7 has degree 1 → peels;
    // 6 drops to 1 → peels next round; then 5) — a genuine multi-round
    // cascade the synchronized semantics must replay exactly.
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val chain = Seq((4L, 5L), (5L, 6L), (6L, 7L))
    val edges = (k4 ++ chain).toDF("u", "v")
    // full fixpoint (rounds ample): chain gone, K4 survives at degree 3
    val core = Graph.kCorePeel(edges, k = 2, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(core == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), core.toString)
    // fixed-round partial state: after exactly 1 synchronized round only
    // node 7 (the sole degree-<2 node) is gone; 6 survives this round at
    // its OLD degree — the synchronized (not sequential) contract
    val r1 = Graph.kCorePeel(edges, k = 2, rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.keySet == Set(1L, 2L, 3L, 4L, 5L, 6L) && r1(6L) == 1L, r1.toString)
    // after 2 rounds node 6 is gone too, 5 dangling at degree 1
    val r2 = Graph.kCorePeel(edges, k = 2, rounds = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2.keySet == Set(1L, 2L, 3L, 4L, 5L) && r2(5L) == 1L, r2.toString)
    // k above the max degree empties the graph
    assert(Graph.kCorePeel(edges, k = 4, rounds = 10).isEmpty)
    // k = 1 with ample rounds keeps everything (no degree-0 nodes exist
    // in an edge list)
    val all = Graph.kCorePeel(edges, k = 1, rounds = 10)
      .as[(Long, Long)].collect().toMap
    assert(all.keySet == (1L to 7L).toSet)
  }

  test("hitsRounds replays the exact half-round-ahead recurrence") {
    // 1→10, 2→10, 2→11: after round 1, auth = in-degree (old hubs all
    // 1), hubs from the NEW auths (the classic in-round ordering)
    val e = Seq((1L, 10L), (2L, 10L), (2L, 11L), (2L, 11L)).toDF("src", "dst")
    val r1 = Graph.hitsRounds(e, rounds = 1)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(r1 == Map(1L -> ((2L, 0L)), 2L -> ((3L, 0L)),
      10L -> ((0L, 2L)), 11L -> ((0L, 1L))), r1.toString)
    val r2 = Graph.hitsRounds(e, rounds = 2)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // a2(10)=h1(1)+h1(2)=5, a2(11)=h1(2)=3, h2(1)=5, h2(2)=8
    assert(r2 == Map(1L -> ((5L, 0L)), 2L -> ((8L, 0L)),
      10L -> ((0L, 5L)), 11L -> ((0L, 3L))), r2.toString)
  }

  test("personalizedPagerank replays the exact seeded recurrence on a pair") {
    val e = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    // seed {1}: r0 = (1e9, 0); after 1 iter node 2 holds 85% of the
    // seed's full rank, node 1 only its teleport hold
    val r1 = Graph.personalizedPagerank(e, Seq(1L), iters = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 150000000L, 2L -> 850000000L), r1.toString)
    val r2 = Graph.personalizedPagerank(e, Seq(1L), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 872500000L, 2L -> 127500000L), r2.toString)
    // seeding BOTH nodes of the symmetric pair is stationary at scale/2
    val rb = Graph.personalizedPagerank(e, Seq(1L, 2L), iters = 3)
      .as[(Long, Long)].collect().toMap
    assert(rb == Map(1L -> 500000000L, 2L -> 500000000L), rb.toString)
  }

  test("personalizedPagerank: rank is nonzero exactly on the i-hop neighborhood") {
    // path 1-2-3-4 symmetrized, seed 1: after 2 iters mass reaches 3,
    // never 4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L)).flatMap { case (a, b) =>
      Seq((a, b), (b, a)) }.toDF("src", "dst")
    val r = Graph.personalizedPagerank(path, Seq(1L), iters = 2)
      .as[(Long, Long)].collect().toMap
    assert(r(3L) > 0L && r(4L) == 0L, r.toString)
    // total mass never exceeds scale (floor losses only shrink it)
    assert(r.values.sum <= 1000000000L && r.values.sum > 800000000L, r.toString)
  }

  test("labelPropagation: disjoint triangles converge to per-triangle min label") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L)).toDF("u", "v")
    // triangle {1,2,3}: r1 every node adopts the min of the OTHER two
    // (1→2, 2→1, 3→1); r2 (1→1, 2→1 tie{2,1}→1, 3→1); r3 fixpoint all-1
    val r = Graph.labelPropagation(tri, rounds = 3).as[(Long, Long)].collect().toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L), r.toString)
    // fixpoint early exit preserves the R-round semantics
    val r10 = Graph.labelPropagation(tri, rounds = 10).as[(Long, Long)].collect().toMap
    assert(r10 == r, r10.toString)
  }

  test("labelPropagation replays the exact synchronized recurrence on a path") {
    // path 1-2-3: synchronized LPA oscillates — the fixed-round contract
    // makes each round's state exact, hand-computed here
    val e = Seq((1L, 2L), (2L, 3L)).toDF("u", "v")
    val r1 = Graph.labelPropagation(e, rounds = 1).as[(Long, Long)].collect().toMap
    // node2's neighbors {1,3} tie at count 1 → min label 1
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L), r1.toString)
    val r2 = Graph.labelPropagation(e, rounds = 2).as[(Long, Long)].collect().toMap
    assert(r2 == Map(1L -> 1L, 2L -> 2L, 3L -> 1L), r2.toString)
  }

  test("labelPropagation: hub adopts min spoke label on an all-tie vote") {
    val star = (1L to 3L).map(s => (0L, s)).toDF("u", "v")
    val r = Graph.labelPropagation(star, rounds = 1).as[(Long, Long)].collect().toMap
    assert(r == Map(0L -> 1L, 1L -> 0L, 2L -> 0L, 3L -> 0L), r.toString)
    // duplicate input edges must not double a vote (deduped before
    // symmetrizing): still min spoke label, not a 2-vote winner
    val dup = (star.union(Seq((0L, 3L)).toDF("u", "v")))
    val rd = Graph.labelPropagation(dup, rounds = 1).as[(Long, Long)].collect().toMap
    assert(rd(0L) == 1L, rd.toString)
  }

  test("linkPredict: hand graph — diagonal wins, existing edge excluded") {
    // square 1-2-3-4 + chord 2-4 + pendant 5 on 1:
    // N1={2,4,5} N2={1,3,4} N3={2,4} N4={1,2,3} N5={1}
    val und = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 5L), (2L, 4L))
      .toDF("u", "v")
    val got = Graph.linkPredict(und, topK = 10)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 3L, 666666L),  // common {2,4}, union {2,4,5}
      (2L, 5L, 1L, 3L, 333333L),
      (4L, 5L, 1L, 3L, 333333L)), got.toString)
    // (2,4) shares {1,3} but IS an edge → absent
    assert(!got.exists(r => r._1 == 2L && r._2 == 4L))
  }

  test("linkPredict equals brute-force neighborhood jaccard on a random graph") {
    val rnd = new scala.util.Random(5)
    val edges = (0 until 60).map { _ =>
      val a = rnd.nextInt(14).toLong; val b = rnd.nextInt(14).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val got = Graph.linkPredict(edges.toDF("u", "v"), topK = 1000)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    val nbr = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val nodes = nbr.keys.toSeq.sorted
    val want = (for {
      a <- nodes; b <- nodes if a < b
      if !edges.contains((a, b))
      common = (nbr(a) & nbr(b)).size if common > 0
    } yield {
      val union = (nbr(a) | nbr(b)).size
      (a, b, common.toLong, union.toLong, common.toLong * 1000000L / union)
    }).sortBy(r => (-r._5, r._1, r._2))
    assert(got == want, s"got=${got.take(5)}... want=${want.take(5)}...")
  }

  test("clusteringCoeff: triangle = 1e6, star hub = 0, pendant = NULL") {
    // triangle {1,2,3} with a pendant 4 off node 1, plus star hub 10
    // with spokes 11..13 (no spoke-spoke edges)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (1L, 4L),
      (10L, 11L), (10L, 12L), (10L, 13L)).toDF("u", "v")
    val got = Graph.clusteringCoeff(edges)
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(2L) == ((2L, 1L, Some(1000000L))), got.toString) // closed pair
    assert(got(3L) == ((2L, 1L, Some(1000000L))), got.toString)
    assert(got(1L) == ((3L, 1L, Some(333333L))), got.toString)  // 2·1/(3·2)
    assert(got(4L) == ((1L, 0L, None)), got.toString)           // pendant: undefined
    assert(got(10L) == ((3L, 0L, Some(0L))), got.toString)      // open star
    assert(got(11L) == ((1L, 0L, None)), got.toString)
  }

  test("clusteringCoeff equals brute neighborhood closure on a random graph") {
    val rnd = new scala.util.Random(11)
    val edges = (0 until 80).map { _ =>
      val a = rnd.nextInt(16).toLong; val b = rnd.nextInt(16).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val got = Graph.clusteringCoeff(edges.toDF("u", "v"))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val nbr = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (k, vs) => k -> vs.map(_._2).toSet }
    val want = nbr.map { case (node, ns) =>
      val d = ns.size.toLong
      val tri = ns.toSeq.combinations(2).count { pair =>
        edges.contains((pair.min, pair.max))
      }.toLong
      node -> ((d, tri, if (d >= 2) Some(2L * tri * 1000000L / (d * (d - 1))) else None))
    }
    assert(got == want, s"diff=${(got.toSet diff want.toSet).take(5)}")
  }

  test("linkPredictRA discounts hub middles; scores are Σ floor(1e9/deg)") {
    // a—h—b with hub h also touching 4 noise spokes (deg 6), versus
    // c—m—d with exclusive middle m (deg 2): RA ranks (c,d) ≫ (a,b)
    // while raw common-neighbor count ties them at 1.
    val edges = Seq((1L, 100L), (2L, 100L), (100L, 51L), (100L, 52L),
      (100L, 53L), (100L, 54L), (3L, 200L), (4L, 200L)).toDF("u", "v")
    val got = Graph.linkPredictRA(edges, topK = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.head == ((3L, 4L, 1L, 500000000L)), got.toString) // 1e9/2
    assert(got.tail.head._4 == 166666666L, got.toString)         // 1e9/6
  }

  test("modularity: two disjoint triangles under perfect labels score 1/4 each") {
    // m = 6; each community: e_in = 3, d_tot = 6 ->
    // q_ppm = 1e6*(4*6*3 - 36)/(4*36) = 250000; Σ = 500000 (Q = 1/2)
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L)).toDF("u", "v")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    val got = Graph.modularity(edges, labels)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(10L) == ((3L, 3L, 6L, 250000L)), got.toString)
    assert(got(20L) == ((3L, 3L, 6L, 250000L)), got.toString)
    // everything in ONE community: Q = m/m - (2m/2m)^2 = 0 exactly
    val one = labels.select($"node",
      org.apache.spark.sql.functions.lit(1L).as("label"))
    val g1 = Graph.modularity(edges, one)
      .as[(Long, Long, Long, Long, Long)].collect().head
    assert(g1 == ((1L, 6L, 6L, 12L, 0L)), g1.toString)
    // splitting a triangle across labels goes NEGATIVE for the cut side:
    // label 10 = {1} alone: e_in 0, d_tot 2 -> (0 - 4)*1e6/144 = -27778
    // (truncating division: both engines round toward zero)
    val cut = Seq((1L, 10L), (2L, 20L), (3L, 20L), (4L, 20L), (5L, 20L), (6L, 20L))
      .toDF("node", "label")
    val g2 = Graph.modularity(edges, cut)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r._5).toMap
    assert(g2(10L) == -27777L, g2.toString)
  }

  test("assortativity: star is exactly −1 (r²=1e6), regular ring is NULL") {
    // star hub 0 — spokes 1..5: every directed pair is (5,1) or (1,5),
    // perfect anticorrelation -> num² = dx·dy exactly, r² = 1e6, sign −1
    val star = (1L to 5L).map(sp => (0L, sp)).toDF("u", "v")
    val g1 = Graph.assortativity(star)
      .as[(Long, Long, Option[Long])].collect().head
    assert(g1 == ((10L, -1L, Some(1000000L))), g1.toString)
    // 4-ring: every degree 2 -> zero degree variance -> NULL
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("u", "v")
    val g2 = Graph.assortativity(ring)
      .as[(Long, Long, Option[Long])].collect().head
    assert(g2 == ((8L, 0L, None)), g2.toString)
  }

  test("conductance: bridged triangles leak 1/7 each; whole graph is NULL") {
    // two triangles joined by one bridge edge (3-4): per community
    // e_in = 3, vol = 7 (bridge endpoint has degree 3), cut = 1,
    // 2m = 14 -> min(7, 7) = 7 -> phi = floor(1e6/7) = 142857
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L),
      (4L, 5L), (5L, 6L), (4L, 6L), (3L, 4L)).toDF("u", "v")
    val labels = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    val got = Graph.conductance(edges, labels)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got(10L) == ((3L, 3L, 1L, Some(142857L))), got.toString)
    assert(got(20L) == ((3L, 3L, 1L, Some(142857L))), got.toString)
    // one whole-graph community: cut = 0 and min(vol, 2m-vol) = 0 -> NULL
    val one = labels.select($"node",
      org.apache.spark.sql.functions.lit(1L).as("label"))
    val g1 = Graph.conductance(edges, one)
      .as[(Long, Long, Long, Long, Option[Long])].collect().head
    assert(g1._4 == 0L && g1._5.isEmpty, g1.toString)
    // a deliberately bad cut (node 3 swapped into the far community)
    // must read leakier than the natural one
    val bad = Seq((1L, 10L), (2L, 10L), (3L, 20L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("node", "label")
    val gb = Graph.conductance(edges, bad)
      .as[(Long, Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> r._5).toMap
    assert(gb(10L).exists(_ > 142857L), gb.toString)
  }

  test("edgeSupport: K4 edges carry support 2, hanging triangle 1, pendant none") {
    // K4 on 1-4, triangle {4,5,6}, pendant 6-7
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)).toDF("u", "v")
    val got = Graph.edgeSupport(edges)
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    k4.foreach(e => assert(got(e) == 2L, s"$e -> ${got.get(e)}"))
    Seq((4L, 5L), (4L, 6L), (5L, 6L)).foreach(e =>
      assert(got(e) == 1L, s"$e -> ${got.get(e)}"))
    assert(!got.contains((6L, 7L)), got.toString) // no triangle, no row
  }

  test("trussPeel: support-2 keeps K4 only; peel cascades to empty on the broken K4") {
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (4L, 6L), (5L, 6L), (6L, 7L)).toDF("u", "v")
    val got = Graph.trussPeel(edges, support = 2, rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L), got.toString)
    // K4 minus edge (1,4): only (2,3) has support 2, but once its
    // neighbors' edges are gone its own support collapses — the peel
    // must CASCADE to the empty graph, not stop after one round
    val broken = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("u", "v")
    val g2 = Graph.trussPeel(broken, support = 2, rounds = 4)
    assert(g2.count() == 0L, g2.collect().mkString(","))
  }

  test("multiBfsHops equals per-seed bfsHops; shared frontier, cutoff") {
    // chain 1—2—3—4—5 + shortcut 1—4, isolated pair 9—10
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (1L, 4L),
      (9L, 10L)).toDF("u", "v")
    val seeds = Seq(1L, 3L, 9L)
    val got = Graph.multiBfsHops(e, seeds, maxHops = 2)
      .as[(Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    seeds.foreach { s =>
      val single = Graph.bfsHops(e, s, maxHops = 2)
        .as[(Long, Long)].collect().toMap
      val mine = got.collect { case ((sd, n), h) if sd == s => n -> h }.toMap
      assert(mine == single, s"seed=$s multi=$mine single=$single")
    }
  }

  test("harmonicCentrality: hand star and chain values, isolated seed absent") {
    // star: hub 1 with spokes 2,3,4 → from 1: three at hop 1 = 3,000,000
    // from 2: hub at 1 + two spokes at 2 = 1,000,000 + 2*500,000
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("u", "v")
    val got = Graph.harmonicCentrality(star, Seq(1L, 2L, 7L), maxHops = 3)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == Map(1L -> ((3L, 3000000L)), 2L -> ((3L, 2000000L))),
      got.toString) // seed 7 isolated → no row
    // hop-3 term floors: chain 1—2—3—4 from seed 1 = 1e6 + 5e5 + 333333
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("u", "v")
    val g2 = Graph.harmonicCentrality(chain, Seq(1L), maxHops = 3)
      .as[(Long, Long, Long)].collect().head
    assert(g2 == ((1L, 3L, 1833333L)), g2.toString)
  }

  test("diameter2Sweep: path graph recovers the true diameter from a middle seed") {
    // path 1-2-3-4-5, seed 3 (middle): ecc(3)=2, farthest = node 1
    // (tie with 5 broken by id), second sweep from 1 reaches 5 at hop 4
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v")
    val got = Graph.diameter2Sweep(path, seed = 3L, maxHops = 6)
      .as[(Long, Long, Long, Long)].collect().head
    assert(got == ((2L, 1L, 4L, 5L)), got.toString)
    // horizon cap: maxHops = 1 from the middle bounds both sweeps
    val capped = Graph.diameter2Sweep(path, seed = 3L, maxHops = 1)
      .as[(Long, Long, Long, Long)].collect().head
    assert(capped == ((1L, 2L, 1L, 1L)), capped.toString)
  }

  test("bipartiteCheck: even cycle clean, odd cycle witnessed, horizon respected") {
    def run(edges: Seq[(Long, Long)], hops: Int) =
      Graph.bipartiteCheck(edges.toDF("u", "v"), seed = 1L, maxHops = hops)
        .as[(Long, Long, Long, Long)].collect().head
    // 4-cycle: bipartite — 4 reached, 4 edges, 0 conflicts
    val c4 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(run(c4, 4) == ((4L, 4L, 0L, 1L)))
    // 5-cycle: odd — hops from 1 are 0,1,2,2,1: exactly ONE same-parity
    // edge (the far edge between the two hop-2 nodes)
    val c5 = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    assert(run(c5, 4) == ((5L, 5L, 1L, 0L)))
    // horizon: with maxHops = 1 only nodes {1,2,5} are reached; the
    // conflict edge (3,4) is outside the induced subgraph → clean
    assert(run(c5, 1) == ((3L, 2L, 0L, 1L)))
    // disconnected odd triangle far from the seed never contaminates
    val tri = c4 ++ Seq((10L, 11L), (11L, 12L), (12L, 10L))
    assert(run(tri, 4) == ((4L, 4L, 0L, 1L)))
    // a reached SELF-LOOP is an odd cycle (length 1): its endpoints
    // trivially share a hop label, so it must count as a conflict —
    // the pre-r12 u < v edge filter silently dropped it
    val loop = c4 ++ Seq((2L, 2L))
    assert(run(loop, 4) == ((4L, 5L, 1L, 0L)))
  }
}
