package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Grid-binned spatial operators over integer (exact, cross-engine)
  * coordinates — the proximity-join / OD-flow / stay-point family every
  * mobility store ultimately serves (the reference keeps per-point
  * longitude/latitude through its trajectory pivots,
  * /root/reference/stores/mobility_db_batch.py:88,108; the test events
  * carry no raw coordinates, so queries derive deterministic integer
  * coords from event_id — same arithmetic in both engines, nothing
  * float to diverge).
  *
  * Scale shapes:
  *  - [[proximityJoin]] is the 2-D analog of the binned range join
  *    (q_range_join_binned): bin both sides into d×d cells, explode the
  *    PROBE side to its 3×3 neighborhood, hash equi-join on the cell
  *    key, then the exact residual predicate. Candidate volume is
  *    9·n·(cell occupancy), never n² — the same bound at 1000 executors.
  *  - [[odMatrix]] and [[stayPoints]] are per-entity ordered windows
  *    (one shuffle by user), then a map-side-combinable count / island
  *    aggregation. No global sort anywhere.
  */
object Spatial {

  /** Deterministic synthetic coords in [0, 1000): quadratic-residue
    * mixing so id-adjacent points scatter at all distances (a linear
    * congruence would put every point on a sparse lattice where close
    * pairs only arise at id deltas that are multiples of the modulus).
    * Exact int64 arithmetic both engines evaluate identically
    * (id² ≤ 1e12 at sf1 — far from overflow). */
  def xMil(id: Column): Column = ((id * id) % 1000003L * 37 + id * 101) % 1000
  def yMil(id: Column): Column = ((id * id) % 999983L * 73 + id * 211) % 1000

  /** Point-in-convex-polygon geofence predicate (half-plane test, exact
    * int64 cross products): a point lies inside a COUNTER-CLOCKWISE
    * convex fence (boundary inclusive) iff every directed edge's cross
    * product with the point is ≥ 0. The fence is a driver-side literal
    * (geofences are human-drawn, O(10) vertices), so the test compiles
    * to ONE codegen'd row-local conjunction — no join, no shuffle, and
    * the predicate pushes down the scan like any other filter; a
    * concave fence is a union of convex pieces (OR of these). CCW
    * convexity is validated at plan build (every consecutive edge pair
    * must turn left), so a mis-wound polygon fails loudly instead of
    * silently selecting the complement. */
  def inConvexFence(x: Column, y: Column, poly: Seq[(Long, Long)]): Column = {
    require(poly.length >= 3, s"fence needs >= 3 vertices: ${poly.length}")
    val edges = poly.zip(poly.tail :+ poly.head)
      .map { case ((x1, y1), (x2, y2)) => (x1, y1, x2 - x1, y2 - y1) }
    edges.zip(edges.tail :+ edges.head).foreach {
      case ((_, _, dx1, dy1), (_, _, dx2, dy2)) =>
        require(dx1 * dy2 - dy1 * dx2 > 0,
          s"fence must be convex and counter-clockwise (edge ($dx1,$dy1) -> ($dx2,$dy2))")
    }
    edges.map { case (x1, y1, dx, dy) =>
      (lit(dx) * (y - lit(y1)) - lit(dy) * (x - lit(x1))) >= 0
    }.reduce(_ && _)
  }

  /** Point-in-SIMPLE-polygon predicate (ray casting / crossing parity,
    * exact int64 arithmetic) — the general-fence companion to
    * [[inConvexFence]]: handles CONCAVE fences in one pass instead of a
    * convex decomposition. A point is inside iff a ray cast in +x
    * direction crosses an odd number of edges, with the standard
    * half-open rule (an edge (p1,p2) is crossed iff y1 ≤ py < y2 for an
    * upward edge — strictly-left test via the exact cross product — or
    * y2 ≤ py < y1 downward); horizontal edges never count, and shared
    * vertices count exactly once, so the parity is well-defined for any
    * simple polygon, any winding. Like the convex test this compiles to
    * ONE codegen'd row-local integer expression (a sum of per-edge
    * conditionals, |poly| terms): no join, no shuffle, rides the scan as
    * an ordinary filter at any cluster size. Boundary classification
    * follows the half-open rule (left/bottom edges in, right/top out) —
    * deterministic in both engines because every comparison is exact
    * int64. Degenerate (zero-length) edges are rejected at plan build. */
  def inPolygon(x: Column, y: Column, poly: Seq[(Long, Long)]): Column = {
    require(poly.length >= 3, s"polygon needs >= 3 vertices: ${poly.length}")
    val edges = poly.zip(poly.tail :+ poly.head)
    edges.foreach { case ((x1, y1), (x2, y2)) =>
      require(x1 != x2 || y1 != y2, s"degenerate zero-length edge at ($x1,$y1)")
    }
    val crossings = edges.map { case ((x1, y1), (x2, y2)) =>
      // Exact left-of-edge test: cross = (x2-x1)(py-y1) - (px-x1)(y2-y1).
      val cross = lit(x2 - x1) * (y - lit(y1)) - (x - lit(x1)) * lit(y2 - y1)
      when(lit(y1) <= y && y < lit(y2) && cross > 0, 1L)
        .when(lit(y2) <= y && y < lit(y1) && cross < 0, 1L)
        .otherwise(0L)
    }
    crossings.reduce(_ + _) % 2 === 1
  }

  /** DuckDB SQL fragment computing the identical ray-cast parity over
    * columns named `x`/`y` — generated from the SAME vertex list as
    * [[inPolygon]] so query and oracle can never drift apart. */
  def inPolygonSql(poly: Seq[(Long, Long)]): String = {
    val terms = poly.zip(poly.tail :+ poly.head).map { case ((x1, y1), (x2, y2)) =>
      s"(CASE WHEN (($y1 <= y AND y < $y2 AND (${x2 - x1})*(y-$y1) - (x-$x1)*(${y2 - y1}) > 0) OR " +
        s"($y2 <= y AND y < $y1 AND (${x2 - x1})*(y-$y1) - (x-$x1)*(${y2 - y1}) < 0)) THEN 1 ELSE 0 END)"
    }
    s"((${terms.mkString(" + ")}) % 2 = 1)"
  }

  /** All pairs (id_a < id_b) within L2 distance `d` (inclusive, on
    * dist² ≤ d²): cell-binned candidate generation + exact residual.
    * `pts` must carry (idCol, x, y). */
  def proximityJoin(pts: DataFrame, idCol: String, d: Int): DataFrame = {
    require(d > 0, s"radius must be positive: $d")
    val build = pts.select(
      col(idCol).as("id_b"), col("x").as("xb"), col("y").as("yb"),
      floor(col("x") / d).cast("long").as("cx"),
      floor(col("y") / d).cast("long").as("cy"))
    val probe = pts.select(
        col(idCol).as("id_a"), col("x").as("xa"), col("y").as("ya"),
        floor(col("x") / d).cast("long").as("_cx"),
        floor(col("y") / d).cast("long").as("_cy"))
      .select(col("id_a"), col("xa"), col("ya"),
        explode(expr("flatten(transform(sequence(-1, 1), " +
          "dx -> transform(sequence(-1, 1), dy -> struct(_cx + dx AS cx, _cy + dy AS cy))))"))
          .as("_c"))
      .select(col("id_a"), col("xa"), col("ya"),
        col("_c.cx").as("cx"), col("_c.cy").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("dist2"))
      .filter(col("dist2") <= lit(d.toLong * d))
  }

  /** Per-entity trajectory SIMPLIFICATION by radial distance: walk the
    * time-ordered points keeping one whenever it moves more than `tol`
    * (L2, exact integer dist²) from the LAST KEPT point — the streaming
    * cousin of Douglas–Peucker (whose recursive split is not an ordered
    * fold; radial-distance is the standard one-pass form a telemetry
    * compactor uses, and its sequential state — the last kept point —
    * makes it a recurrence no window frame can express). Same shape as
    * [[TimeSeries.ewmaAnomaly]]: one shuffle groups each entity,
    * `sort_array` orders row-locally, `aggregate` folds the recurrence
    * inside the executor; entities are independent, so 100 TB folds as
    * width. The first point is always kept.
    *
    * Output: (entityCol, n_points, n_kept, last_x, last_y) — the
    * compaction census plus the fold's end state (which pins the whole
    * trail for an oracle: a wrong keep decision anywhere shifts every
    * later distance). */
  def simplifyRadial(
      pts: DataFrame,
      entityCol: String,
      tsCol: Column,
      tieCol: Column,
      xCol: Column,
      yCol: Column,
      tol: Long): DataFrame = {
    require(tol > 0, s"tolerance must be positive: $tol")
    val rows = pts.select(col(entityCol),
      struct(tsCol.as("t"), tieCol.as("i"), xCol.as("x"), yCol.as("y")).as("_r"))
    rows.groupBy(col(entityCol))
      .agg(sort_array(collect_list(col("_r"))).as("_rs"))
      .select(col(entityCol), size(col("_rs")).cast("long").as("n_points"),
        aggregate(
          col("_rs"),
          // kx/ky seed 0 (never read before nk > 0 — the nk = 0 branch
          // keeps unconditionally) so the dist² arithmetic stays in
          // coordinate range under ANSI overflow checking
          struct(lit(0L).as("kx"), lit(0L).as("ky"), lit(0L).as("nk")),
          (acc: Column, r: Column) => {
            val dx = r.getField("x") - acc.getField("kx")
            val dy = r.getField("y") - acc.getField("ky")
            val keep = acc.getField("nk") === 0L ||
              dx * dx + dy * dy > lit(tol * tol)
            struct(
              when(keep, r.getField("x")).otherwise(acc.getField("kx")).as("kx"),
              when(keep, r.getField("y")).otherwise(acc.getField("ky")).as("ky"),
              (acc.getField("nk") + when(keep, 1L).otherwise(0L)).as("nk"))
          }).as("_f"))
      .select(col(entityCol), col("n_points"),
        col("_f").getField("nk").as("n_kept"),
        col("_f").getField("kx").as("last_x"),
        col("_f").getField("ky").as("last_y"))
  }

  /** For each probe point, the NEAREST site within L2 radius `d` — the
    * bounded-radius nearest-neighbor join (snap-to-POI / map-matching /
    * nearest-station enrichment). EXACT under the radius bound: with
    * cell size = d, any site at distance ≤ d sits in the probe's 3×3
    * cell neighborhood, so candidate generation loses nothing; the
    * unbounded-NN variant would need expanding ring searches (data-
    * dependent rounds) — the fixed radius is what makes one join pass
    * sufficient, and "no site within d" rows are dropped (callers
    * left-join the result back if they need misses). Winner per probe
    * by min(dist², site-id) — the deterministic tie rule.
    *
    * Scale shape: candidates are 9 · occupancy per probe (never
    * |probes|·|sites|); the per-probe min is a map-side-combinable
    * min-of-struct, so the shuffle carries one candidate-reduced row
    * per (partition, probe), and a small site table broadcasts under
    * AQE like any dimension. Inputs: probes (probeIdCol, x, y), sites
    * (siteIdCol, x, y), integer coords. Output: (probeIdCol, nn_id,
    * dist2). */
  def nearestSiteWithin(
      probes: DataFrame,
      sites: DataFrame,
      probeIdCol: String,
      siteIdCol: String,
      d: Int): DataFrame = {
    require(d > 0, s"radius must be positive: $d")
    val build = sites.select(
      col(siteIdCol).as("_sid"), col("x").as("_sx"), col("y").as("_sy"),
      floor(col("x") / d).cast("long").as("cx"),
      floor(col("y") / d).cast("long").as("cy"))
    val probe = probes.select(
        col(probeIdCol).as("_pid"), col("x").as("_px"), col("y").as("_py"),
        floor(col("x") / d).cast("long").as("_cx"),
        floor(col("y") / d).cast("long").as("_cy"))
      .select(col("_pid"), col("_px"), col("_py"),
        explode(expr("flatten(transform(sequence(-1, 1), " +
          "dx -> transform(sequence(-1, 1), dy -> struct(_cx + dx AS cx, _cy + dy AS cy))))"))
          .as("_c"))
      .select(col("_pid"), col("_px"), col("_py"),
        col("_c.cx").as("cx"), col("_c.cy").as("cy"))
    probe.join(build, Seq("cx", "cy"))
      .select(col("_pid"),
        ((col("_px") - col("_sx")) * (col("_px") - col("_sx")) +
          (col("_py") - col("_sy")) * (col("_py") - col("_sy"))).as("_d2"),
        col("_sid"))
      .filter(col("_d2") <= lit(d.toLong * d))
      .groupBy(col("_pid"))
      .agg(min(struct(col("_d2").as("d2"), col("_sid").as("sid"))).as("_m"))
      .select(col("_pid").as(probeIdCol),
        col("_m.sid").as("nn_id"), col("_m.d2").as("dist2"))
  }

  /** DBSCAN density clustering (Ester et al. 1996), exact and
    * deterministic: a point is CORE iff its eps-neighborhood (itself
    * included) holds ≥ minPts points; clusters are the connected
    * components of the core-core eps-graph; a non-core point with a core
    * neighbor is BORDER and joins its smallest core neighbor's cluster
    * (textbook DBSCAN leaves the border tie arbitrary — pinning min
    * keeps the result engine-reproducible); everything else is NOISE
    * (cluster −1).
    *
    * Scale: neighbor pairs come from the cell-binned [[proximityJoin]]
    * (9·n·occupancy candidates, never n²) and are staged once for their
    * three consumers (degrees, core edges, border assignment); labels
    * propagate via [[Dedup.connectedComponents]]'s pointer-jumping
    * min-label iteration — O(log diameter) rounds, which is what makes a
    * PERCOLATING eps-graph (diameter ~ area/eps on a dense corpus)
    * tractable. Output: (idCol, cluster, kind). */
  def dbscan(pts: DataFrame, idCol: String, eps: Int, minPts: Int): DataFrame = {
    require(minPts >= 2, s"minPts must be >= 2: $minPts")
    val p = graft.store.Staging.stage(
      pts.select(col(idCol).as("_id"), col("x"), col("y")), "dbscan_pts")
    val pairs = graft.store.Staging.stage(
      proximityJoin(p, "_id", eps).select(col("id_a"), col("id_b")), "dbscan_nb")
    val nbr = pairs
      .unionByName(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
    val deg = nbr.groupBy(col("id_a").as("_id")).agg(count(lit(1)).as("_deg"))
    val flags = graft.store.Staging.stage(
      p.select(col("_id")).join(deg, Seq("_id"), "left")
        .select(col("_id"),
          (coalesce(col("_deg"), lit(0L)) + 1L >= minPts).as("_core")),
      "dbscan_core")
    val coreEdges = pairs
      .join(flags.filter(col("_core")).select(col("_id").as("id_a")), Seq("id_a"))
      .join(flags.filter(col("_core")).select(col("_id").as("id_b")), Seq("id_b"))
    // cores with no core neighbor are singleton clusters labeled by id
    val coreLabels = flags.filter(col("_core"))
      .join(Dedup.connectedComponents(coreEdges)
        .select(col("id").as("_id"), col("comp")), Seq("_id"), "left")
      .select(col("_id"), coalesce(col("comp"), col("_id")).as("cluster"),
        lit("core").as("kind"))
    val borderLabels = nbr
      .join(flags.filter(!col("_core")).select(col("_id").as("id_a")), Seq("id_a"))
      .join(coreLabels.select(col("_id").as("id_b"), col("cluster")), Seq("id_b"))
      .groupBy(col("id_a").as("_id"))
      .agg(min(col("cluster")).as("cluster"))
      .withColumn("kind", lit("border"))
    p.select(col("_id"))
      .join(coreLabels.unionByName(borderLabels), Seq("_id"), "left")
      .select(col("_id").as(idCol),
        coalesce(col("cluster"), lit(-1L)).as("cluster"),
        coalesce(col("kind"), lit("noise")).as("kind"))
  }

  /** Trajectory-similarity join: all entity pairs whose point sets are
    * within symmetric discrete Hausdorff distance `h` (on dist², exact
    * ints), plus the distance itself. H(A,B) = max(h(A→B), h(B→A)),
    * h(A→B) = max over a∈A of min over b∈B of dist(a,b) — the standard
    * trajectory/shape similarity measure.
    *
    * Scale shape — the naive form is |A|·|B| per entity pair over ALL
    * pairs; this one never builds a per-pair cross product. One cell join
    * (size-h cells, 3×3 probe neighborhood — [[proximityJoin]]'s shape)
    * yields exactly the cross-entity point pairs within h; both directed
    * distances then reduce from that ONE candidate set: min per (pair,
    * a-point), then max + cover-count per pair. A pair qualifies iff
    * every a-point found a b-neighbor ≤ h (cover = |A|) and vice versa —
    * so H ≤ h holds exactly, and pairs sharing no h-cell never meet.
    * Candidate volume is cell-occupancy-bounded (linear per executor at
    * fixed density), not n²; the entity-pair cross product is never
    * materialized. */
  def hausdorffJoin(pts: DataFrame, entityCol: String, h: Int): DataFrame = {
    require(h > 0, s"threshold must be positive: $h")
    val p = pts.select(col(entityCol).as("_e"), col("x"), col("y")).distinct()
    val n = p.groupBy(col("_e")).agg(count(lit(1)).as("_n"))
    val build = p.select(col("_e").as("eb"), col("x").as("xb"), col("y").as("yb"),
      floor(col("x") / h).cast("long").as("cx"),
      floor(col("y") / h).cast("long").as("cy"))
    val probe = p.select(col("_e").as("ea"), col("x").as("xa"), col("y").as("ya"),
        floor(col("x") / h).cast("long").as("_cx"),
        floor(col("y") / h).cast("long").as("_cy"))
      .select(col("ea"), col("xa"), col("ya"),
        explode(expr("flatten(transform(sequence(-1, 1), " +
          "dx -> transform(sequence(-1, 1), dy -> struct(_cx + dx AS cx, _cy + dy AS cy))))"))
          .as("_c"))
      .select(col("ea"), col("xa"), col("ya"),
        col("_c.cx").as("cx"), col("_c.cy").as("cy"))
    val cands = probe.join(build, Seq("cx", "cy"))
      .filter(col("ea") < col("eb"))
      .select(col("ea"), col("eb"), col("xa"), col("ya"), col("xb"), col("yb"),
        ((col("xa") - col("xb")) * (col("xa") - col("xb")) +
          (col("ya") - col("yb")) * (col("ya") - col("yb"))).as("d2"))
      .filter(col("d2") <= lit(h.toLong * h))
    def directed(px: String, py: String, cnt: String): DataFrame = cands
      .groupBy(col("ea"), col("eb"), col(px), col(py))
      .agg(min(col("d2")).as("_min"))
      .groupBy(col("ea"), col("eb"))
      .agg(count(lit(1)).as(cnt), max(col("_min")).as(s"_dh$cnt"))
    directed("xa", "ya", "_ca")
      .join(directed("xb", "yb", "_cb"), Seq("ea", "eb"))
      .join(n.select(col("_e").as("ea"), col("_n").as("_na")), Seq("ea"))
      .join(n.select(col("_e").as("eb"), col("_n").as("_nb")), Seq("eb"))
      .filter(col("_ca") === col("_na") && col("_cb") === col("_nb"))
      .select(col("ea").as("entity_a"), col("eb").as("entity_b"),
        greatest(col("_dh_ca"), col("_dh_cb")).as("hausdorff2"))
  }

  /** Origin-destination flow counts between coarse cells: per entity in
    * (ts, id) order, each consecutive point pair is one trip from the
    * previous point's cell to the current one. */
  def odMatrix(pts: DataFrame, entityCol: String, tsCol: String, idCol: String,
      cellSize: Int): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    pts
      .select(col(entityCol), col(tsCol), col(idCol),
        floor(col("x") / cellSize).cast("long").as("tx"),
        floor(col("y") / cellSize).cast("long").as("ty"))
      .select(col("tx"), col("ty"),
        lag(col("tx"), 1).over(w).as("fx"),
        lag(col("ty"), 1).over(w).as("fy"))
      .filter(col("fx").isNotNull)
      .groupBy(col("fx"), col("fy"), col("tx"), col("ty"))
      .agg(count(lit(1)).as("n_trips"))
  }

  /** Stay-point detection: a stay-step is a consecutive point pair (per
    * entity, (ts, id) order) with step dist² ≤ d²; a stay-point is a
    * maximal run of ≥ `minSteps` consecutive stay-steps. Output one row
    * per stay-point: entity, start/end micros (first/last point of the
    * run), n_pts (= steps + 1), dwell_us. Gaps-and-islands: island id =
    * running count of NON-stay steps, so an island of stay-steps shares
    * one id. */
  def stayPoints(pts: DataFrame, entityCol: String, tsCol: String, idCol: String,
      d: Int, minSteps: Int): DataFrame = {
    val w = Window.partitionBy(col(entityCol)).orderBy(col(tsCol), col(idCol))
    val steps = pts
      .select(col(entityCol), col(tsCol), col(idCol), col("x"), col("y"))
      .withColumn("_pts", lag(col(tsCol), 1).over(w))
      .withColumn("_px", lag(col("x"), 1).over(w))
      .withColumn("_py", lag(col("y"), 1).over(w))
      .filter(col("_px").isNotNull)
      .withColumn("_stay",
        ((col("x") - col("_px")) * (col("x") - col("_px")) +
          (col("y") - col("_py")) * (col("y") - col("_py"))) <= lit(d.toLong * d))
      .withColumn("_island",
        sum(when(col("_stay"), 0).otherwise(1)).over(w))
    steps.filter(col("_stay"))
      .groupBy(col(entityCol), col("_island"))
      .agg(
        min(col("_pts")).as("start_us"),
        max(col(tsCol)).as("end_us"),
        (count(lit(1)) + 1).as("n_pts"))
      .filter(col("n_pts") >= minSteps + 1)
      .select(col(entityCol), col("start_us"), col("end_us"), col("n_pts"),
        (col("end_us") - col("start_us")).as("dwell_us"))
  }

  /** Getis-Ord-class hotspot census on a fixed grid — which cells' 3×3
    * NEIGHBORHOODS carry significantly more points than uniform spread
    * predicts? The spatial-autocorrelation screen behind demand heatmaps
    * and incident clustering: a lone dense cell and a plateau of
    * moderately dense cells rank differently once neighbors count.
    *
    * ENGINE-EXACT score (no mean/stddev floats): over the FULL domain
    * grid of G = (1000/cell)² cells, a cell whose in-bounds neighborhood
    * covers w cells (corner 4, edge 6, interior 9) expects w·T/G of the
    * T total points; the relative excess
    *
    *   excess_ppm = sign(nbr·G − w·T) · floor(10⁶·|nbr·G − w·T| / (w·T))
    *
    * is one integer sign-split floor-division (sign split because Spark
    * DIV truncates toward zero while DuckDB // floors). The Gi* z-score
    * is a monotone transform of nbr for fixed w, so per-w ranking is
    * preserved; consumers needing the full statistic apply it to these
    * exact (n, nbr, w) counts downstream.
    *
    * Shape: one map-side-combined (cx, cy) count aggregation (the only
    * data-sized pass), then a ×9 neighbor-offset explode + re-aggregation
    * ON THE CELL FRAME (O(occupied cells), input-size-independent), a
    * 1-row broadcast of T, and TakeOrdered top-k. Cells with an empty
    * 3×3 neighborhood never surface (excess −10⁶ by definition, not
    * hotspots). `cell` must divide 1000 so the mil-grid domain is exact.
    *
    * Output: (cx, cy, n, nbr, w, excess_ppm), top-k by excess then
    * (cx, cy). Input cols: (x, y) in mils 0..999. */
  def hotspotCells(pts: DataFrame, cell: Int, topK: Int): DataFrame = {
    require(cell >= 1 && 1000 % cell == 0, s"cell must divide 1000: $cell")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val g = (1000 / cell).toLong // cells per axis
    val cells = pts
      .select(floor(col("x") / cell).cast("long").as("cx"),
        floor(col("y") / cell).cast("long").as("cy"))
      .groupBy(col("cx"), col("cy")).agg(count(lit(1)).as("n"))
    val tot = cells.agg(coalesce(sum(col("n")), lit(0L)).as("_t"))
    val nbr = cells
      .select(explode(expr(
        "flatten(transform(sequence(-1, 1), dx -> transform(sequence(-1, 1), dy -> struct(dx, dy))))")).as("_o"),
        col("cx"), col("cy"), col("n"))
      .select((col("cx") + col("_o.dx")).as("cx"),
        (col("cy") + col("_o.dy")).as("cy"), col("n"))
      .filter(col("cx") >= 0 && col("cx") < g && col("cy") >= 0 && col("cy") < g)
      .groupBy(col("cx"), col("cy")).agg(sum(col("n")).as("nbr"))
    val scored = nbr
      .join(cells.withColumnRenamed("n", "_own"), Seq("cx", "cy"), "left")
      .na.fill(0L, Seq("_own"))
      .withColumn("w",
        (least(col("cx") + 1, lit(g - 1)) - greatest(col("cx") - 1, lit(0L)) + 1L) *
          (least(col("cy") + 1, lit(g - 1)) - greatest(col("cy") - 1, lit(0L)) + 1L))
      .crossJoin(broadcast(tot))
      .withColumn("_num", col("nbr") * lit(g * g) - col("w") * col("_t"))
      .withColumn("excess_ppm",
        when(col("_t") === 0, lit(0L)).otherwise(
          signum(col("_num")).cast("long") *
            expr("CAST(CAST(abs(_num) AS DECIMAL(38,0)) * 1000000 DIV (w * _t) AS BIGINT)")))
    scored
      .select(col("cx"), col("cy"), col("_own").as("n"), col("nbr"),
        col("w"), col("excess_ppm"))
      .orderBy(col("excess_ppm").desc, col("cx"), col("cy"))
      .limit(topK)
  }
}
