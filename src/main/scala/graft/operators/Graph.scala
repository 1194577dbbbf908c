package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph computation on edge frames. Complements the
  * connected-components min-label propagation in [[Dedup]] with the other
  * canonical fixed-point workload: PageRank.
  *
  * Exact-integer formulation so a SQL oracle replays the identical
  * trail: ranks live in parts-per-billion of total mass (scale 10⁹),
  * every division is a floor over positive operands, and each update is
  *
  *   rank′(v) = floor(15·base/100) + floor(85·Σ_{u→v} floor(rank(u)/deg(u)) / 100)
  *
  * with base = floor(10⁹/N). IEEE doubles are exact below 2⁵³ and all
  * intermediates stay under ~10¹¹, so floor(double-div) on both engines
  * is the same integer — no FP drift across iterations.
  *
  * Scale shape: edges (+ out-degree) are staged once as a content-keyed
  * parquet frame; each iteration is one shuffle-on-dst aggregation of
  * (dst, contrib-long) — partial aggregation combines map-side, and the
  * rank frame (N rows, two longs) is re-staged per iteration so the plan
  * stays flat instead of growing a 3-deep join tree, and an executor
  * loss replays a file scan, not the whole iteration lineage. Dangling
  * nodes are avoided by construction here (callers pass symmetric or
  * closed edge sets); a general dangling-mass redistribution would add
  * one scalar aggregate per iteration.
  */
object Graph {

  /** PageRank over `edges` (cols: src, dst; duplicates tolerated —
    * deduped internally). Returns (node, rank) with rank in ppb. */
  def pagerank(edges: DataFrame, iters: Int, scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val e = graft.store.Staging.stage(
      edges.select(col("src"), col("dst")).distinct(), "pr_edges")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = graft.store.Staging.stage(e.join(deg, Seq("src")), "pr_edges_deg")
    val nodes = graft.store.Staging.stage(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct(),
      "pr_nodes")

    val n = nodes.count() // driver-side scalar, same class as AQE stats
    require(n > 0, "empty graph")
    val base = scale / n // positive ⇒ trunc == floor
    val hold = (15L * base) / 100L

    var ranks = nodes.select(col("node"), lit(base).as("rank"))
    for (i <- 0 until iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select(col("dst"),
          floor(col("rank").cast("double") / col("deg")).cast("long").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_in"))
      ranks = graft.store.Staging.stage(
        nodes.join(contrib, nodes("node") === contrib("dst"), "left_outer")
          .select(nodes("node"),
            (lit(hold) +
              floor(coalesce(col("_in"), lit(0L)) * 85 / lit(100.0)).cast("long"))
              .as("rank")),
        s"pr_ranks_i$i")
    }
    ranks
  }

  /** Per-node triangle participation over an undirected edge frame
    * (cols u, v with u < v, deduped by the caller or here).
    *
    * Degree orientation — THE scale trick for triangle enumeration:
    * re-orient every edge from its (degree, id)-smaller endpoint to the
    * larger, then join oriented⋈oriented on the middle vertex and close
    * against a third oriented edge. Each triangle is enumerated exactly
    * once, and the middle-vertex join's fan-out is Σ outdeg(v)² where
    * orientation bounds outdeg by O(√m) — the O(m^1.5) bound (Schank &
    * Wagner 2005) that survives skew (a celebrity node of degree 10⁶
    * gets outdegree ~√m, not 10⁶). All three join sides read ONE staged
    * parquet frame of (src, dst) longs. */
  def triangleCorners(edges: DataFrame): DataFrame =
    stagedTriangles(normalizedEdges(edges))
      .select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))

  /** Canonical staged undirected edge frame: (u, v) with u < v, deduped,
    * content-keyed under ONE shared label — so every triangle consumer
    * (triangle count, clustering coefficient, k-truss round 0) maps the
    * same input edges to the SAME staged path, which in turn makes their
    * downstream oriented/triangle stage keys collide and the expensive
    * enumeration build exactly once per corpus. No-op on already
    * normalized input (the co-purchase frames are u < v deduped). */
  def normalizedEdges(edges: DataFrame): DataFrame =
    graft.store.Staging.stage(
      edges.select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .filter(col("u") < col("v")).distinct(),
      "und_edges")

  /** The staged triangle list (a, b, c) of an undirected (u < v, deduped)
    * edge frame by degree-oriented enumeration — the O(m^1.5)
    * middle-vertex join is the expensive pass of the whole graph family,
    * so its RESULT is content-keyed ("tris"): q_triangle_count,
    * q_clustering_coeff and the truss peel's round-0 support all read one
    * build. Each triangle appears exactly once (a = lowest-degree
    * corner). */
  def stagedTriangles(und: DataFrame): DataFrame = {
    val deg = und.select(explode(array(col("u"), col("v"))).as("n"))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val oriented = graft.store.Staging.stage(
      und
        .join(deg.select(col("n").as("u"), col("d").as("du")), Seq("u"))
        .join(deg.select(col("n").as("v"), col("d").as("dv")), Seq("v"))
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("u"))
            .otherwise(col("v")).as("s"),
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")), col("v"))
            .otherwise(col("u")).as("t")),
      "tri_oriented")
    val e1 = oriented.select(col("s").as("a"), col("t").as("b"))
    val e2 = oriented.select(col("s").as("b"), col("t").as("c"))
    val e3 = oriented.select(col("s").as("a2"), col("t").as("c2"))
    graft.store.Staging.stage(
      e1.join(e2, Seq("b"))
        .join(e3, col("a") === col("a2") && col("c") === col("c2"))
        .select(col("a"), col("b"), col("c")),
      "tris")
  }

  /** Diameter lower bound by the classic 2-sweep heuristic, horizon-
    * bounded: BFS from the seed, restart from the farthest node found
    * (ties → smallest id), report that node's horizon eccentricity —
    * on real graphs the 2-sweep bound is usually tight, at exactly
    * double one BFS's cost (the q_bfs_hops frontier plan twice). Both
    * sweeps honor `maxHops`, so the numbers are horizon eccentricities
    * (the practical monitoring variant — an unbounded sweep on a
    * 100 TB graph is a policy decision, not a default). The only
    * driver materialization is the 1-row argmax between sweeps.
    * Output 1 row: (ecc_seed, far_node, diameter_lb, far_node2). */
  def diameter2Sweep(edges: DataFrame, seed: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    def far(hops: DataFrame): (Long, Long) = {
      val r = hops.orderBy(col("hop").desc, col("node")).limit(1)
        .as[(Long, Long)].head()
      (r._1, r._2)
    }
    val (u, ecc1) = far(bfsHops(edges, seed, maxHops))
    val (u2, ecc2) = far(bfsHops(edges, u, maxHops))
    Seq((ecc1, u, ecc2, u2))
      .toDF("ecc_seed", "far_node", "diameter_lb", "far_node2")
  }

  /** Bipartite check by BFS 2-coloring within a hop horizon — the
    * parity audit behind sides-of-market / interaction-graph modeling
    * (a user↔item graph that ISN'T bipartite has contaminated edges; an
    * odd cycle is the witness). Colors are [[bfsHops]] hop parities; a
    * CONFLICT is an edge joining two same-parity reached nodes. The
    * standard BFS argument gives exactness on the reached subgraph: a
    * same-parity edge closes an odd walk through the BFS tree (an odd
    * cycle exists), and with no such edge the parity IS a proper
    * 2-coloring — so `bipartite = (n_conflicts == 0)` characterizes
    * bipartiteness of the subgraph induced on the reached nodes, not a
    * heuristic. Cost: one BFS + one edges⋈labels⋈labels hash join.
    * Output 1 row: (n_reached, n_edges, n_conflicts, bipartite). */
  def bipartiteCheck(edges: DataFrame, seed: Long, maxHops: Int): DataFrame = {
    val hops = graft.store.Staging.stage(
      bfsHops(edges, seed, maxHops), "bip_hops")
    val und = edges.select(col("u"), col("v"))
      .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
      // Each undirected edge once; keep self-loops (u == v): a reached
      // self-loop is an odd cycle, and since its endpoints share a hop
      // label the parity test below counts it as a conflict.
      .distinct().filter(col("u") <= col("v"))
    val labeled = und
      .join(hops.select(col("node").as("u"), col("hop").as("_hu")), Seq("u"))
      .join(hops.select(col("node").as("v"), col("hop").as("_hv")), Seq("v"))
    labeled
      .agg(count(lit(1)).as("n_edges"),
        coalesce(sum(when(pmod(col("_hu") + col("_hv"), lit(2L)) === 0L, 1L)
          .otherwise(0L)), lit(0L)).as("n_conflicts"))
      .crossJoin(broadcast(hops.agg(count(lit(1)).as("n_reached"))))
      .select(col("n_reached"), col("n_edges"), col("n_conflicts"),
        when(col("n_conflicts") === 0L, 1L).otherwise(0L).as("bipartite"))
  }

  /** Single-source shortest hop counts by frontier expansion (unweighted
    * BFS — the reachability/radius primitive PageRank and triangles
    * don't cover). Undirected: edges are symmetrized. Each round joins
    * only the FRONTIER (last round's newly-discovered nodes) to the
    * staged edge frame and anti-joins the visited set, so per-round work
    * is |frontier-adjacent edges|, not |graph|; labels re-stage per
    * round (flat plans, durable — the [[pagerank]] contract). Stops
    * early when a frontier comes back empty. Output: (node, hop ≤
    * maxHops) for every reached node, seed at hop 0. */
  def bfsHops(edges: DataFrame, seed: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val spark = edges.sparkSession
    // label shared with multiBfsHops/labelPropagation/kCorePeel: the
    // symmetrized frame of the SAME input plan content-keys identically,
    // so one staged build serves every operator in a sweep (it used to
    // build once per label — bfs_edges/mbfs_edges/... with the same key)
    val e = graft.store.Staging.stage(
      edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        .distinct(), "sym_edges")
    import spark.implicits._
    var labels = graft.store.Staging.stage(
      Seq((seed, 0L)).toDF("node", "hop"), "bfs_seed")
    var frontier = labels
    var round = 1
    var done = false
    while (round <= maxHops && !done) {
      val next = graft.store.Staging.stage(
        frontier.select(col("node").as("u"))
          .join(e, Seq("u"))
          .select(col("v").as("node")).distinct()
          .join(labels.select(col("node")), Seq("node"), "left_anti")
          .withColumn("hop", lit(round.toLong)),
        s"bfs_f$round")
      if (next.isEmpty) done = true
      else {
        labels = graft.store.Staging.stage(
          labels.unionByName(next), s"bfs_l$round")
        frontier = next
      }
      round += 1
    }
    labels
  }

  /** MULTI-source shortest hop counts — [[bfsHops]] keyed by seed: ONE
    * frontier expansion carries every seed at once ((seed, node)
    * labels), so k seed-set sweeps cost one BFS, not k sequential ones
    * (at 100 TB the per-round join is the expensive part; amortizing it
    * across seeds is the whole point of batching). Per-round work is
    * |frontier-adjacent edges| summed over seeds; labels re-stage per
    * round (flat plans, the [[bfsHops]] contract); stops early on an
    * empty frontier. Output: (seed, node, hop ≤ maxHops), each seed at
    * hop 0 of itself. Input cols: (u, v) undirected. */
  def multiBfsHops(edges: DataFrame, seeds: Seq[Long], maxHops: Int): DataFrame = {
    require(seeds.nonEmpty, "seeds must be non-empty")
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val spark = edges.sparkSession
    val e = graft.store.Staging.stage(
      edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        .distinct(), "sym_edges")
    import spark.implicits._
    var labels = graft.store.Staging.stage(
      seeds.distinct.map(s => (s, s, 0L)).toDF("seed", "node", "hop"),
      "mbfs_seed")
    var frontier = labels
    var round = 1
    var done = false
    while (round <= maxHops && !done) {
      val next = graft.store.Staging.stage(
        frontier.select(col("seed"), col("node").as("u"))
          .join(e, Seq("u"))
          .select(col("seed"), col("v").as("node")).distinct()
          .join(labels.select(col("seed"), col("node")),
            Seq("seed", "node"), "left_anti")
          .withColumn("hop", lit(round.toLong)),
        s"mbfs_f$round")
      if (next.isEmpty) done = true
      else {
        labels = graft.store.Staging.stage(
          labels.unionByName(next), s"mbfs_l$round")
        frontier = next
      }
      round += 1
    }
    labels
  }

  /** Hop-capped HARMONIC centrality of a seed set: Σ 1/hop over nodes
    * reached within maxHops (the closeness variant that handles
    * disconnected graphs gracefully — unreachable nodes contribute 0
    * instead of breaking the mean). Terms floor to ppm BEFORE summing
    * (10⁶ DIV hop — engine-exact, both engines sum identical integers).
    * One [[multiBfsHops]] sweep + a per-seed map-side rollup. Output:
    * (seed, n_reached, harmonic_ppm); a seed with no neighbors within
    * the cap emits no row (nothing reached at hop ≥ 1). */
  def harmonicCentrality(edges: DataFrame, seeds: Seq[Long], maxHops: Int): DataFrame =
    multiBfsHops(edges, seeds, maxHops)
      .filter(col("hop") >= 1L)
      .groupBy(col("seed"))
      .agg(count(lit(1)).as("n_reached"),
        sum(expr("1000000 DIV hop")).as("harmonic_ppm"))

  /** Single-source WEIGHTED shortest paths by R Bellman–Ford relaxation
    * rounds — the weighted companion to [[bfsHops]] (travel-time instead
    * of hop-count routing). After round i, dist(v) is EXACTLY the
    * cheapest path using ≤ i edges — the fixed-round contract again
    * ([[kCorePeel]], [[pagerank]]): an oracle replays R rounds verbatim
    * and equality never depends on convergence; with R ≥ graph diameter
    * the result is the true shortest-path tree. Negative weights are
    * rejected (mobility costs are nonneg; keeps min-monotonicity so
    * early exit on an unchanged frame is sound).
    *
    * Scale shape per round: one hash join of the current distance frame
    * against the staged symmetrized edge frame (shuffles |dist|·degree
    * candidate rows, the frontier-bounded relaxation volume), one
    * map-side-combined min. Distance frames re-stage per round (flat
    * plans, durable). The changed-row count per round is a driver-side
    * scalar, the CC-convergence class. Output: (node, dist) for nodes
    * reachable within R edges. Input cols: (u, v, w) undirected. */
  def ssspRounds(edges: DataFrame, seed: Long, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val spark = edges.sparkSession
    val e = graft.store.Staging.stage(
      edges.select(col("u"), col("v"), col("w"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v"), col("w")))
        .distinct(), "sssp_edges")
    require(e.filter(col("w") < 0).isEmpty, "negative edge weights not supported")
    import spark.implicits._
    var dist = graft.store.Staging.stage(
      Seq((seed, 0L)).toDF("node", "dist"), "sssp_seed")
    var i = 0
    var stable = false
    while (i < rounds && !stable) {
      val relaxed = dist.select(col("node").as("u"), col("dist"))
        .join(e, Seq("u"))
        .select(col("v").as("node"), (col("dist") + col("w")).as("dist"))
        .unionByName(dist)
        .groupBy(col("node")).agg(min(col("dist")).as("dist"))
      val next = graft.store.Staging.stage(relaxed, s"sssp_d$i")
      // unchanged frame ⇒ every later round is a no-op (min-monotone)
      stable = next.join(dist, Seq("node", "dist"), "left_anti").isEmpty &&
        next.count() == dist.count()
      dist = next
      i += 1
    }
    dist
  }

  /** HITS hubs & authorities (Kleinberg 1999) by R UNNORMALIZED
    * synchronized rounds — pure integer sums, so the oracle replays the
    * recurrence verbatim with no division anywhere:
    *
    *   auth′(v) = Σ_{u→v} hub(u),   hub′(u) = Σ_{u→v} auth′(v)
    *
    * (the classic in-round update order: authorities from OLD hubs,
    * hubs from NEW authorities — one half-round ahead, Kleinberg's
    * original sweep). Normalization only rescales — the RANKING, which
    * is what a pipeline consumes, is unchanged — but unnormalized
    * scores grow like (largest-eigenvalue)^R: callers keep R small
    * (magnitude ≲ Σdeg^(2R), int64-safe for R ≤ 3 on 10⁶-edge graphs;
    * document the bound rather than pay a division that would make the
    * trail engine-inexact).
    *
    * Scale shape per round: two shuffle-on-key aggregations of the
    * staged edge frame joined with the (node, score) frame — the
    * [[pagerank]] shape, map-side combinable, scores re-staged per
    * round. Input: directed (src, dst). Output: (node, hub, auth) for
    * every node. */
  def hitsRounds(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    val e = graft.store.Staging.stage(
      edges.select(col("src"), col("dst")).distinct(), "hits_edges")
    val nodes = graft.store.Staging.stage(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct(),
      "hits_nodes")
    var hub = nodes.select(col("node"), lit(1L).as("hub"))
    var auth = nodes.select(col("node"), lit(1L).as("auth"))
    for (i <- 0 until rounds) {
      val a = nodes.join(
          e.join(hub.withColumnRenamed("node", "src"), Seq("src"))
            .groupBy(col("dst").as("node")).agg(sum(col("hub")).as("_a")),
          Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("_a"), lit(0L)).as("auth"))
      auth = graft.store.Staging.stage(a, s"hits_a$i")
      val h = nodes.join(
          e.join(auth.withColumnRenamed("node", "dst"), Seq("dst"))
            .groupBy(col("src").as("node")).agg(sum(col("auth")).as("_h")),
          Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("_h"), lit(0L)).as("hub"))
      hub = graft.store.Staging.stage(h, s"hits_h$i")
    }
    hub.join(auth, Seq("node"))
  }

  /** PERSONALIZED PageRank (random walk with restart): teleport mass
    * returns to a SEED SET instead of spreading uniformly, so ranks
    * measure proximity to the seeds — the recommendation / related-
    * items / local-community primitive (Jeh & Widom 2003) that global
    * [[pagerank]] cannot express. Same exact-integer contract: ranks in
    * parts of `scale`, every division a floor over non-negative
    * operands, so an oracle replays iterations verbatim:
    *
    *   rank′(v) = [v ∈ S]·floor(15·scale/(100·|S|))
    *            + floor(85·Σ floor(rank(u)/deg(u)) / 100)
    *
    * seeded with rank₀ = floor(scale/|S|) on seeds, 0 elsewhere. Mass
    * stays within `scale` (floor losses only shrink it), and after i
    * iterations rank(v) is nonzero exactly on the seeds' i-hop
    * out-neighborhood — the locality that makes PPR cheap: per
    * iteration only rank-positive rows join the edge frame.
    *
    * Scale shape: identical to [[pagerank]] — staged edge+degree frame,
    * one shuffle-on-dst aggregation per iteration, rank frame re-staged
    * (flat plans). The seed membership test is a literal IN over an
    * O(10) human-chosen seed list, codegen'd row-local. */
  def personalizedPagerank(
      edges: DataFrame,
      seeds: Seq[Long],
      iters: Int,
      scale: Long = 1000000000L): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(seeds.nonEmpty && seeds.distinct == seeds, s"seeds must be distinct, non-empty")
    val e = graft.store.Staging.stage(
      edges.select(col("src"), col("dst")).distinct(), "ppr_edges")
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val ed = graft.store.Staging.stage(e.join(deg, Seq("src")), "ppr_edges_deg")
    val nodes = graft.store.Staging.stage(
      e.select(col("src").as("node")).union(e.select(col("dst").as("node"))).distinct(),
      "ppr_nodes")
    val isSeed = col("node").isin(seeds: _*)
    val base = scale / seeds.length
    val hold = (15L * scale) / (100L * seeds.length)
    var ranks = nodes.select(col("node"),
      when(isSeed, lit(base)).otherwise(lit(0L)).as("rank"))
    for (i <- 0 until iters) {
      val contrib = ed.join(ranks.filter(col("rank") > 0), ed("src") === col("node"))
        .select(col("dst"),
          floor(col("rank").cast("double") / col("deg")).cast("long").as("_c"))
        .groupBy(col("dst")).agg(sum(col("_c")).as("_in"))
      ranks = graft.store.Staging.stage(
        nodes.join(contrib, nodes("node") === contrib("dst"), "left_outer")
          .select(nodes("node"),
            (when(isSeed, lit(hold)).otherwise(lit(0L)) +
              floor(coalesce(col("_in"), lit(0L)) * 85 / lit(100.0)).cast("long"))
              .as("rank")),
        s"ppr_ranks_i$i")
    }
    ranks
  }

  /** Community detection by SYNCHRONIZED label propagation (Raghavan et
    * al. 2007, LPA) — the missing member of the graph family next to
    * [[pagerank]]/[[kCorePeel]]: every node starts labeled with its own
    * id; each round every node simultaneously adopts the most frequent
    * label among its neighbors, ties broken by the SMALLEST label — a
    * fully deterministic update (classic LPA breaks ties randomly; the
    * min-tie-break variant is the reproducible form). The fixed-round
    * contract again: after R rounds the labels are exactly the R-step
    * recurrence, so an oracle replays R rounds verbatim and equality
    * never depends on convergence. (Synchronized LPA can oscillate on
    * bipartite structures — a documented property of the parallel
    * variant; the fixed-round semantics makes that a feature of the
    * recurrence, not a correctness hazard.) A round where no label
    * changes is a fixpoint of the deterministic update, so early exit
    * preserves the R-round semantics exactly.
    *
    * Scale shape per round: one hash join of the label frame against the
    * staged symmetrized edge frame (|E| vote rows), one map-side-combined
    * (node, label) count, one map-side max-of-struct per node — a
    * celebrity node of degree d contributes d vote rows, linear in |E|,
    * never d². Labels re-stage per round (flat plans, durable). Input
    * cols: (u, v) undirected; symmetrized + deduped here. Output:
    * (node, label). */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 0, s"rounds must be >= 0: $rounds")
    val e = graft.store.Staging.stage(
      edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        .distinct(), "sym_edges")
    var labels = graft.store.Staging.stage(
      e.select(col("u").as("node")).distinct().withColumn("label", col("node")),
      "lpa_init")
    var i = 0
    var stable = false
    while (i < rounds && !stable) {
      val votes = e.join(labels.select(col("node").as("v"), col("label")), Seq("v"))
        .groupBy(col("u"), col("label")).agg(count(lit(1)).as("cnt"))
      val next = graft.store.Staging.stage(
        votes.groupBy(col("u"))
          .agg(max(struct(col("cnt").as("c"), (-col("label")).as("nl"))).as("_m"))
          .select(col("u").as("node"), (-col("_m.nl")).as("label")),
        s"lpa_l$i")
      // node set is constant (every node has >= 1 neighbor), so an empty
      // anti-join on (node, label) means the frame is unchanged — and an
      // unchanged frame is a fixpoint of the deterministic update
      stable = next.join(labels, Seq("node", "label"), "left_anti").isEmpty
      labels = next
      i += 1
    }
    labels
  }

  /** k-core by SYNCHRONIZED peel rounds (Batagelj–Zaveršnik family,
    * distributed form): each round drops every node whose degree in the
    * CURRENT surviving subgraph is < k, then the edges touching dropped
    * nodes — repeated `rounds` times or until a round peels nothing
    * (further rounds are then no-ops, so early exit preserves the
    * R-round semantics exactly). The semantics is the fixed-round
    * contract, like [[pagerank]]'s iters: an oracle replays R rounds
    * verbatim whether or not the fixpoint arrived, so equality never
    * depends on convergence — and at fixpoint the survivors ARE the
    * k-core (every remaining node keeps ≥ k surviving neighbors).
    *
    * Scale shape: each round is one map-side-combined degree count +
    * two left-semi joins against the (tiny) survivor frame; per-round
    * work is O(|surviving edges|), monotonically shrinking; rounds are
    * O(peel depth) — small on clustered real-world graphs (the
    * degeneracy ordering's long tail peels in the first rounds). Each
    * round's edge frame re-stages through parquet (durable, flat plans
    * — the [[Dedup.connectedComponents]] contract). The survivor count
    * per round is a driver-side scalar, same class as the CC
    * convergence check. Output: (node, deg_in_core) over the surviving
    * subgraph. `edges` carries undirected (u, v); symmetrized and
    * deduped here. */
  def kCorePeel(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, s"need k >= 1 ($k), rounds >= 1 ($rounds)")
    // symmetrize-then-dedup (was dedup-then-union): identical rows for
    // any deduped undirected input, and the construction now matches
    // bfsHops/multiBfsHops/labelPropagation exactly — same plan, same
    // content key, same label, ONE staged build per sweep. (On an input
    // carrying both (a,b) and (b,a) the old form double-counted degrees;
    // the new form dedupes — strictly saner semantics, GraphSpec-pinned.)
    var ed = graft.store.Staging.stage(
      edges.select(col("u"), col("v"))
        .unionByName(edges.select(col("v").as("u"), col("u").as("v")))
        .distinct(),
      "sym_edges")
    var edgeCount = ed.count()
    var i = 0
    var stable = false
    while (i < rounds && !stable && edgeCount > 0) {
      val surv = ed.groupBy(col("u")).agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= k.toLong).select(col("u"))
      val next = graft.store.Staging.stage(
        ed.join(surv, Seq("u"), "left_semi")
          .join(surv.select(col("u").as("v")), Seq("v"), "left_semi"),
        s"kcore_e$i")
      val nextCount = next.count()
      stable = nextCount == edgeCount
      ed = next
      edgeCount = nextCount
      i += 1
    }
    ed.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg_in_core"))
  }

  /** Common-neighbor link prediction: rank NON-adjacent node pairs by
    * the Jaccard similarity of their neighborhoods — the classic
    * recommend-an-edge primitive (Liben-Nowell & Kleinberg), exact and
    * log-free so ranking is pure integer ppm.
    *
    * Candidate generation is wedge enumeration (two hops through a
    * shared neighbor), NEVER nodes² — only pairs with ≥ 1 common
    * neighbor can score > 0, and each wedge center w contributes
    * C(deg(w), 2) pairs: the [[triangleCorners]] cost class, bounded by
    * the degree distribution (skew valve = cap the top hub degrees
    * upstream if a real graph needs it). Existing edges drop by
    * anti-join; union size comes from degrees (|A∪B| = dA + dB − common)
    * so neighbor SETS never ship. Top-k is TakeOrderedAndProject.
    *
    * Input: undirected edges (u, v), u < v, deduplicated. Output:
    * (a, b, common_n, union_n, jacc_ppm), a < b, top `topK` by
    * (jacc_ppm desc, a, b). */
  def linkPredict(edges: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val und = edges.select(col("u"), col("v"))
    val e = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
    val common = e.as("x").join(e.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(count(lit(1)).as("common_n"))
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("_d"))
    common
      .join(und.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .join(deg.select(col("u").as("a"), col("_d").as("_da")), Seq("a"))
      .join(deg.select(col("u").as("b"), col("_d").as("_db")), Seq("b"))
      .select(col("a"), col("b"), col("common_n"),
        (col("_da") + col("_db") - col("common_n")).as("union_n"))
      .withColumn("jacc_ppm", expr("common_n * 1000000 DIV union_n"))
      .orderBy(col("jacc_ppm").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Per-node local clustering coefficient — the community-density
    * profile [[triangleCorners]]'s raw counts feed: cc(v) = 2·T(v) /
    * (d(v)·(d(v)−1)) for d ≥ 2, shipped exact as cc_ppm = 2·T·10⁶ DIV
    * (d·(d−1)). Nodes with d ≥ 2 and no triangles report 0; d < 2 →
    * NULL (coefficient undefined). Triangle counts come from the
    * degree-oriented O(m^1.5) middle-vertex join (per-node counts are
    * orientation-independent, so the oracle's O(Σd²) wedge form agrees);
    * degrees from one map-side-combined count. Output: (node, d, n_tri,
    * cc_ppm). */
  def clusteringCoeff(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).distinct()
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("d"))
    deg.join(triangleCorners(edges), Seq("node"), "left")
      .na.fill(0L, Seq("n_triangles"))
      .withColumnRenamed("n_triangles", "n_tri")
      // n_tri reaches d(d−1)/2 ≈ 4.5e12 for a d=3e6 hub, so ×2·10⁶ wraps
      // BIGINT — widen like modularity's products (round-10 self-audit)
      .withColumn("cc_ppm",
        when(col("d") >= 2, expr(
          "CAST(2 * CAST(n_tri AS DECIMAL(38,0)) * 1000000 DIV (CAST(d AS DECIMAL(38,0)) * (d - 1)) AS BIGINT)")))
  }

  /** Resource-allocation link prediction (Zhou-Lü-Zhang 2009) — the
    * common-neighbor scorer that works where [[linkPredict]]'s Jaccard
    * saturates: each common neighbor w contributes 1/d(w), so hub
    * middle vertices (which connect everything to everything) are
    * discounted and rare shared neighbors dominate. Integer-exact:
    * ra_ppb = Σ_w floor(10⁹/d(w)) — the per-middle weight floors ONCE,
    * then sums (no post-sum division to disagree on). Same wedge join
    * as [[linkPredict]] (per-middle C(d,2) pairs, never all-pairs),
    * existing edges anti-joined away, TakeOrdered top-k. Output:
    * (a, b, common_n, ra_ppb) ordered by score desc, (a, b). */
  def linkPredictRA(edges: DataFrame, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val und = edges.select(col("u"), col("v"))
    val e = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("_d"))
    val wedges = e.join(deg, Seq("u"))
      .withColumn("_w", expr("CAST(1000000000 DIV _d AS BIGINT)"))
    val scored = wedges.as("x").join(wedges.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .groupBy(col("x.v").as("a"), col("y.v").as("b"))
      .agg(count(lit(1)).as("common_n"), sum(col("x._w")).as("ra_ppb"))
    scored
      .join(e.select(col("u").as("a"), col("v").as("b")),
        Seq("a", "b"), "left_anti")
      .orderBy(col("ra_ppb").desc, col("a"), col("b"))
      .limit(topK)
  }

  /** Newman modularity per community — the quality score that closes the
    * community-detection loop ([[labelPropagation]] assigns labels; this
    * says whether the partition beats random): for community c with e_c
    * intra-edges and total degree d_c over m edges,
    *
    *   Q_c = e_c/m − (d_c/2m)²  =  (4·m·e_c − d_c²) / (4m²)
    *
    * shipped as q_ppm = 10⁶·(4·m·e_c − d_c²) DIV 4m² — one truncating
    * division per community (negative for worse-than-random groups,
    * identical truncation both engines), Σ q_ppm ≈ 10⁶·Q. Scale shape:
    * one edge→label tag join (two label lookups on the edge frame), one
    * intra-edge count, one degree rollup — all map-side combinable; the
    * m total rides a 1-row broadcast. Output: (label, n_nodes, e_in,
    * d_tot, q_ppm). `labels` is (node, label), e.g. [[labelPropagation]]
    * output. */
  def modularity(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).distinct()
    val tagged = und
      .join(labels.select(col("node").as("u"), col("label").as("_lu")), Seq("u"))
      .join(labels.select(col("node").as("v"), col("label").as("_lv")), Seq("v"))
    val eIn = tagged.filter(col("_lu") === col("_lv"))
      .groupBy(col("_lu").as("label")).agg(count(lit(1)).as("e_in"))
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("_d"))
    val dTot = deg.join(labels, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("_d")).as("d_tot"))
    val m = und.agg(count(lit(1)).as("_m"))
    dTot.join(eIn, Seq("label"), "left").na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(m))
      // 4·m·e_in widens to DECIMAL(38,0) BEFORE the subtraction promotes:
      // past ~1.5e9 undirected edges the BIGINT product wraps silently,
      // flipping q_ppm sign/magnitude — same treatment as the d_tot² term
      .withColumn("q_ppm", expr(
        """CAST(1000000 * (4 * CAST(_m AS DECIMAL(38,0)) * e_in
          |    - CAST(d_tot AS DECIMAL(38,0)) * d_tot)
          |  DIV (4 * CAST(_m AS DECIMAL(38,0)) * _m) AS BIGINT)""".stripMargin))
      .select(col("label"), col("n_nodes"), col("e_in"), col("d_tot"), col("q_ppm"))
  }

  /** Community conductance — [[modularity]]'s cut-quality companion:
    * modularity scores a partition against the random-graph null, while
    * conductance reports each community's BOUNDARY leakiness directly,
    *
    *   φ(C) = cut(C) / min(vol(C), 2m − vol(C)),
    *
    * with cut(C) = vol(C) − 2·e_in(C) (edges with exactly one endpoint
    * inside). Shipped as phi_ppm = 10⁶·cut DIV min(vol, 2m−vol), NULL
    * when the min is 0 (the whole-graph community has no outside to
    * leak to). A partition can score positive modularity yet carry one
    * community with φ ≈ 1 — the merge candidate this view surfaces.
    *
    * Scale shape: IDENTICAL frames to [[modularity]] — two label tag
    * joins on the edge list, one intra-edge count, one degree rollup,
    * m on a 1-row broadcast; the verdict is O(communities) rows.
    * Input: edges (u, v) undirected-deduped, labels (node, label). */
  def conductance(edges: DataFrame, labels: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).distinct()
    val tagged = und
      .join(labels.select(col("node").as("u"), col("label").as("_lu")), Seq("u"))
      .join(labels.select(col("node").as("v"), col("label").as("_lv")), Seq("v"))
    val eIn = tagged.filter(col("_lu") === col("_lv"))
      .groupBy(col("_lu").as("label")).agg(count(lit(1)).as("e_in"))
    val deg = und.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("_d"))
    val dTot = deg.join(labels, Seq("node"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("_d")).as("d_tot"))
    val m = und.agg(count(lit(1)).as("_m"))
    dTot.join(eIn, Seq("label"), "left").na.fill(0L, Seq("e_in"))
      .crossJoin(broadcast(m))
      .withColumn("cut", col("d_tot") - lit(2L) * col("e_in"))
      .withColumn("_den", least(col("d_tot"), lit(2L) * col("_m") - col("d_tot")))
      .withColumn("phi_ppm",
        when(col("_den") > 0, expr("cut * 1000000 DIV _den")))
      .select(col("label"), col("n_nodes"), col("e_in"), col("cut"),
        col("phi_ppm"))
  }

  /** Degree assortativity — does the graph wire hubs to hubs (social,
    * r > 0) or hubs to leaves (technological/biological, r < 0)?
    * Pearson correlation of endpoint degrees over the DIRECTED edge
    * list (each undirected edge contributes both orientations — the
    * standard symmetric estimator), shipped exact as r² in ppm via the
    * [[graft.operators.Stats.spearmanRho]] two-floored-division trick
    * (num² DIV denx, then ·10⁶ DIV deny) with direction as sign(num);
    * zero degree variance → NULL. Scale shape: one degree count + two
    * degree-lookup joins on the edge frame + one moment rollup.
    * Output: one row (n_pairs, dir_sign, r2_ppm). */
  def assortativity(edges: DataFrame): DataFrame = {
    val und = edges.select(col("u"), col("v")).distinct()
    val e = und.unionByName(und.select(col("v").as("u"), col("u").as("v")))
    val deg = e.groupBy(col("u")).agg(count(lit(1)).as("_d"))
    val pairs = e
      .join(deg.select(col("u"), col("_d").as("_du")), Seq("u"))
      .join(deg.select(col("u").as("v"), col("_d").as("_dv")), Seq("v"))
    val m = pairs.agg(
      count(lit(1)).cast("long").as("n_pairs"),
      sum(col("_du")).as("_sx"), sum(col("_dv")).as("_sy"),
      sum(expr("CAST(_du AS DECIMAL(38,0)) * _du")).as("_sxx"),
      sum(expr("CAST(_dv AS DECIMAL(38,0)) * _dv")).as("_syy"),
      sum(expr("CAST(_du AS DECIMAL(38,0)) * _dv")).as("_sxy"))
    m.withColumn("_num", expr("n_pairs * _sxy - CAST(_sx AS DECIMAL(38,0)) * _sy"))
      .withColumn("_dx", expr("n_pairs * _sxx - CAST(_sx AS DECIMAL(38,0)) * _sx"))
      .withColumn("_dy", expr("n_pairs * _syy - CAST(_sy AS DECIMAL(38,0)) * _sy"))
      .withColumn("r2_ppm",
        when(col("_dx") > 0 && col("_dy") > 0, expr(
          "CAST(CAST(_num * _num DIV _dx AS DECIMAL(38,0)) * 1000000 DIV _dy AS BIGINT)")))
      .select(col("n_pairs"),
        signum(col("_num")).cast("long").as("dir_sign"), col("r2_ppm"))
  }

  /** Per-edge triangle support of an undirected graph: the number of
    * common neighbors of each edge's endpoints — computed by the
    * degree-oriented enumeration ([[triangleCorners]]'s O(m^1.5) plan:
    * every triangle is found exactly once at its lowest-degree corner,
    * never via a hub-squared wedge join) and then folded back onto the
    * THREE undirected edges each triangle contains. Edges in no
    * triangle get no row. Input (u, v) deduped; output (u, v, sup)
    * with u < v. */
  def edgeSupport(und: DataFrame): DataFrame = {
    // triangles via the SHARED staged enumeration (same labels as
    // triangleCorners): when the input frame is the canonical staged
    // edge set — trussPeel seeds its round 0 through [[normalizedEdges]]
    // — the round-0 support pass reads the very "tris" build
    // q_triangle_count / q_clustering_coeff already paid for, instead of
    // re-running the O(m^1.5) middle-vertex join (the 17-19 s truss_e0
    // build of the r14/r15-baseline sweeps). Later peel rounds stage
    // their own shrunk frames, so their keys stay distinct.
    val tris = stagedTriangles(und)
    tris.select(explode(array(
        struct(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v")),
        struct(least(col("b"), col("c")).as("u"), greatest(col("b"), col("c")).as("v")),
        struct(least(col("a"), col("c")).as("u"), greatest(col("a"), col("c")).as("v"))))
        .as("_e"))
      .select(col("_e.u").as("u"), col("_e.v").as("v"))
      .groupBy(col("u"), col("v")).agg(count(lit(1)).as("sup"))
  }

  /** k-truss peel (Cohen 2008) — the cohesive-subgraph refinement of
    * [[kCorePeel]]: keep only edges lying on ≥ `support` triangles,
    * recompute support WITHIN the survivor subgraph, repeat. A k-core
    * keeps well-connected NODES; a truss keeps well-embedded EDGES —
    * the community-backbone extraction that shrugs off hub spokes.
    *
    * Bounded `rounds` with early stop: survivor sets only shrink, so an
    * unchanged edge COUNT means an unchanged set and every later round
    * is a no-op — stopping early cannot diverge from a fixed-round
    * oracle replay. Each round re-stages the survivor edges
    * (content-keyed parquet, the [[pagerank]]/[[kCorePeel]] trail) so
    * round r's plan is a flat file scan, never a 3^r join tree; per-round
    * cost is one degree-oriented support pass on the CURRENT subgraph,
    * which after the first peel is typically a small core.
    *
    * Output: (node, deg_in_truss) over the surviving subgraph. */
  def trussPeel(edges: DataFrame, support: Int, rounds: Int): DataFrame = {
    require(support >= 1 && rounds >= 1,
      s"need support >= 1 ($support), rounds >= 1 ($rounds)")
    // round 0 reads the canonical shared edge frame ("und_edges") so its
    // edgeSupport pass shares the staged triangle enumeration with the
    // other triangle consumers (see [[stagedTriangles]])
    var ed = normalizedEdges(edges)
    var edgeCount = ed.count()
    var i = 0
    var stable = false
    while (i < rounds && !stable && edgeCount > 0) {
      val keep = edgeSupport(ed).filter(col("sup") >= support.toLong)
        .select(col("u"), col("v"))
      val next = graft.store.Staging.stage(
        ed.join(keep, Seq("u", "v"), "left_semi"), s"truss_e$i")
      val nextCount = next.count()
      stable = nextCount == edgeCount
      ed = next
      edgeCount = nextCount
      i += 1
    }
    ed.select(explode(array(col("u"), col("v"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("deg_in_truss"))
  }
}
