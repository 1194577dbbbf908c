package graft

import org.apache.spark.sql.functions.col

import graft.operators.Spatial

class SpatialSpec extends SparkSpec {
  import spark.implicits._

  test("proximityJoin finds cross-cell pairs and applies the exact residual") {
    // cell size 10: (9,9)↔(11,11) cross a cell boundary (dist²=8) — only
    // reachable through the neighbor explode; (9,9)↔(20,20) is a
    // neighbor-cell candidate the residual cuts (242 > 100)
    val pts = Seq(
      (1L, 9L, 9L), (2L, 11L, 11L), (3L, 9L, 18L), (4L, 20L, 20L), (5L, 50L, 50L))
      .toDF("id", "x", "y")
    val got = Spatial.proximityJoin(pts, "id", d = 10)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 8L), (1L, 3L, 81L), (2L, 3L, 53L)))
  }

  test("inConvexFence: boundary-inclusive half-plane test, rejects mis-wound fences") {
    import org.apache.spark.sql.functions.col
    val fence = Seq((200L, 100L), (800L, 150L), (900L, 600L), (500L, 900L), (120L, 550L))
    val pts = Seq(
      (1L, 500L, 500L), // interior
      (2L, 0L, 0L), // outside
      (3L, 200L, 100L), // vertex: boundary inclusive
      (4L, 500L, 125L), // midpoint of edge 1 ((200,100)->(800,150)): on boundary
      (5L, 999L, 999L), // outside, beyond edge 3
      (6L, 500L, 124L) // one unit outside edge 1
    ).toDF("id", "x", "y")
    val in = pts.withColumn("in", Spatial.inConvexFence(col("x"), col("y"), fence))
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r._4).toMap
    assert(in == Map(1L -> true, 2L -> false, 3L -> true, 4L -> true, 5L -> false, 6L -> false))
    // clockwise winding = every turn is right — must fail loudly
    intercept[IllegalArgumentException] {
      Spatial.inConvexFence(col("x"), col("y"), fence.reverse)
    }
    // concave chain must fail too
    intercept[IllegalArgumentException] {
      Spatial.inConvexFence(col("x"), col("y"),
        Seq((0L, 0L), (10L, 0L), (5L, 2L), (10L, 10L), (0L, 10L)))
    }
  }

  test("inPolygon: ray-cast parity on a concave star, differential vs winding number") {
    import org.apache.spark.sql.functions.col
    val star = Seq((500L, 950L), (394L, 646L), (72L, 639L), (329L, 444L),
      (235L, 136L), (500L, 320L), (765L, 136L), (671L, 444L),
      (928L, 639L), (606L, 646L))
    // hand-verified via an independent angle-sum winding check:
    // (678,745) and (235,140) are NOTCH points — inside the convex hull
    // but outside the star, exactly what a convex-only test gets wrong
    val pts = Seq(
      (1L, 500L, 500L, true), (2L, 500L, 940L, true), (3L, 678L, 745L, false),
      (4L, 10L, 10L, false), (5L, 500L, 990L, false), (6L, 300L, 600L, true),
      (7L, 500L, 130L, false), (8L, 235L, 140L, false))
      .toDF("id", "x", "y", "want")
    val got = pts.withColumn("in", Spatial.inPolygon(col("x"), col("y"), star))
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    got.foreach { case (id, _, _, want, in) =>
      assert(in == want, s"point $id misclassified: got $in want $want")
    }

    // randomized differential: exact ray-cast parity must agree with a
    // float angle-sum winding number everywhere off the boundary
    def winding(px: Double, py: Double, poly: Seq[(Long, Long)]): Boolean = {
      val s = poly.zip(poly.tail :+ poly.head).map { case ((x1, y1), (x2, y2)) =>
        val a1 = math.atan2(y1 - py, x1 - px)
        val a2 = math.atan2(y2 - py, x2 - px)
        val d = a2 - a1
        if (d > math.Pi) d - 2 * math.Pi else if (d < -math.Pi) d + 2 * math.Pi else d
      }.sum
      math.abs(s) > math.Pi
    }
    def edgeDist2(px: Long, py: Long, poly: Seq[(Long, Long)]): Double =
      poly.zip(poly.tail :+ poly.head).map { case ((x1, y1), (x2, y2)) =>
        val (dx, dy) = (x2 - x1, y2 - y1)
        val t = math.max(0.0, math.min(1.0,
          ((px - x1) * dx + (py - y1) * dy).toDouble / (dx * dx + dy * dy)))
        val (cx, cy) = (x1 + t * dx, y1 + t * dy)
        (px - cx) * (px - cx) + (py - cy) * (py - cy)
      }.min
    val rnd = new scala.util.Random(42)
    val sample = Seq.fill(400)((rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
      .filter { case (x, y) => edgeDist2(x, y, star) > 4.0 }
    val df = sample.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
      .toDF("id", "x", "y")
    val res = df.withColumn("in", Spatial.inPolygon(col("x"), col("y"), star))
      .as[(Long, Long, Long, Boolean)].collect()
    res.foreach { case (_, x, y, in) =>
      assert(in == winding(x.toDouble, y.toDouble, star),
        s"differential mismatch at ($x,$y)")
    }

    // degenerate zero-length edge must fail at plan build
    intercept[IllegalArgumentException] {
      Spatial.inPolygon(col("x"), col("y"),
        Seq((0L, 0L), (0L, 0L), (10L, 0L), (5L, 5L)))
    }
  }

  test("odMatrix counts per-entity consecutive cell transitions") {
    // user 1: cells (0,0) → (1,0) → (1,0); user 2: (3,3) → (0,0)
    val pts = Seq(
      (1L, 100L, 10L, 10L, 20L), (1L, 200L, 11L, 260L, 30L), (1L, 300L, 12L, 270L, 40L),
      (2L, 100L, 20L, 900L, 990L), (2L, 150L, 21L, 5L, 5L))
      .toDF("user_id", "ts_us", "event_id", "x", "y")
    val got = Spatial.odMatrix(pts, "user_id", "ts_us", "event_id", cellSize = 250)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 0L, 1L, 0L, 1L), (1L, 0L, 1L, 0L, 1L), (3L, 3L, 0L, 0L, 1L)))
  }

  test("stayPoints merges runs of close steps and drops short runs") {
    // user 1: four points in a tight cluster (3 stay-steps) then a jump
    // then two more close points (1 stay-step — below minSteps)
    val pts = Seq(
      (1L, 1000L, 1L, 100L, 100L),
      (1L, 2000L, 2L, 105L, 100L),
      (1L, 3000L, 3L, 98L, 103L),
      (1L, 4000L, 4L, 101L, 99L),
      (1L, 5000L, 5L, 900L, 900L), // jump breaks the run
      (1L, 6000L, 6L, 903L, 901L))
      .toDF("user_id", "ts_us", "event_id", "x", "y")
    val got = Spatial.stayPoints(pts, "user_id", "ts_us", "event_id", d = 10, minSteps = 2)
      .as[(Long, Long, Long, Long, Long)].collect().toSeq
    // one stay-point: points 1-4, start at the first point's ts (lagged),
    // n_pts = 4, dwell = 4000 - 1000
    assert(got == Seq((1L, 1000L, 4000L, 4L, 3000L)))
  }

  test("hausdorffJoin matches the brute-force definition on a planted set") {
    // entities 1/2 shadow each other within 5 everywhere (qualify at
    // h=10); entity 3 shares 1's first two points but strands (500,500)
    // — covered one way only, must NOT qualify; entity 4 is far away
    val pts = Seq(
      (1L, 10L, 10L), (1L, 40L, 40L), (1L, 80L, 10L),
      (2L, 13L, 14L), (2L, 36L, 43L), (2L, 85L, 10L),
      (3L, 10L, 10L), (3L, 40L, 40L), (3L, 500L, 500L),
      (4L, 900L, 900L))
      .toDF("user_id", "x", "y")
    val got = Spatial.hausdorffJoin(pts, "user_id", h = 10)
      .as[(Long, Long, Long)].collect().toSet
    // H(1,2): every mutual nearest pair sits at dist² = 25
    assert(got == Set((1L, 2L, 25L)))

    // brute-force differential at a loose threshold over all entities
    val all = pts.as[(Long, Long, Long)].collect().toSeq.groupBy(_._1)
      .view.mapValues(_.map(p => (p._2, p._3)).distinct).toMap
    def d2(a: (Long, Long), b: (Long, Long)) =
      (a._1 - b._1) * (a._1 - b._1) + (a._2 - b._2) * (a._2 - b._2)
    def dh(a: Seq[(Long, Long)], b: Seq[(Long, Long)]) =
      a.map(p => b.map(q => d2(p, q)).min).max
    val h = 800
    val expect = (for {
      ea <- all.keys; eb <- all.keys if ea < eb
      h2 = math.max(dh(all(ea), all(eb)), dh(all(eb), all(ea)))
      if h2 <= h.toLong * h
    } yield (ea, eb, h2)).toSet
    val gotLoose = Spatial.hausdorffJoin(pts, "user_id", h = h)
      .as[(Long, Long, Long)].collect().toSet
    assert(gotLoose == expect)
  }

  test("dbscan labels core/border/noise and bridges clusters through cores only") {
    // cluster A: chain 1-2-3-4 — middle points 2/3 are core (3 in their
    // eps-ball incl. self), endpoints 1/4 are border hangers-on; 5 is
    // noise; cluster B: tight core triangle 6-7-8
    val pts = Seq(
      (1L, 0L, 0L), (2L, 8L, 0L), (3L, 16L, 0L), (4L, 16L, 9L),
      (5L, 500L, 500L),
      (6L, 100L, 100L), (7L, 106L, 100L), (8L, 103L, 105L))
      .toDF("id", "x", "y")
    val got = Spatial.dbscan(pts, "id", eps = 10, minPts = 3)
      .as[(Long, Long, String)].collect().toSet
    assert(got == Set(
      (1L, 2L, "border"), (2L, 2L, "core"), (3L, 2L, "core"),
      (4L, 2L, "border"), (5L, -1L, "noise"),
      (6L, 6L, "core"), (7L, 6L, "core"), (8L, 6L, "core")))
  }

  test("simplifyRadial: hand-traced keep/drop trail, all-within-tol, first always kept") {
    // tol=5 (tol²=25): (0,0) keep, (1,1) drop (2), (5,5) keep (50),
    // (6,6) drop (2 from last kept), (20,20) keep
    val pts = Seq((1L, 0L, 1L, 0L, 0L), (1L, 1L, 2L, 1L, 1L), (1L, 2L, 3L, 5L, 5L),
      (1L, 3L, 4L, 6L, 6L), (1L, 4L, 5L, 20L, 20L),
      (2L, 0L, 1L, 7L, 7L), (2L, 1L, 2L, 8L, 8L))
      .toDF("u", "t", "i", "x", "y")
    val got = Spatial.simplifyRadial(pts, "u", col("t"), col("i"),
        col("x"), col("y"), tol = 5L)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 5L, 3L, 20L, 20L)), got.toString)
    // entity 2 never exceeds tol: only the (always-kept) first survives
    assert(got(2L) == ((2L, 2L, 1L, 7L, 7L)), got.toString)
  }

  test("simplifyRadial equals brute sequential fold on random walks") {
    val pts = for { u <- 1L to 8L; t <- 0L until 60L } yield {
      val x = (u * 7919L + t * 104729L) % 200L
      val y = (u * 104729L + t * 7919L) % 200L
      (u, t, t, x, y)
    }
    val got = Spatial.simplifyRadial(pts.toDF("u", "t", "i", "x", "y"),
        "u", col("t"), col("i"), col("x"), col("y"), tol = 60L)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    pts.groupBy(_._1).foreach { case (u, rows) =>
      var (kx, ky, nk) = (0L, 0L, 0L)
      rows.sortBy(_._2).foreach { case (_, _, _, x, y) =>
        val d2 = (x - kx) * (x - kx) + (y - ky) * (y - ky)
        if (nk == 0L || d2 > 3600L) { kx = x; ky = y; nk += 1 }
      }
      assert(got(u) == ((u, rows.size.toLong, nk, kx, ky)),
        s"u=$u got=${got(u)} want=${(u, rows.size, nk, kx, ky)}")
    }
  }

  test("nearestSiteWithin: radius bound, tie rule, and cross-cell neighbors") {
    val probes = Seq((1L, 0L, 0L), (2L, 100L, 100L)).toDF("id", "x", "y")
    // sites 10 (3,4) and 11 (5,0) both at dist2 25 from probe 1 (a tie);
    // site 12 sits at dist 6 > 5 from probe 2 (excluded); site 13 at
    // (-1,-1) lives in the below-left NEIGHBOR cell (negative coords)
    // and at dist2 2 must beat both ties — the cross-cell case
    val sites = Seq((10L, 3L, 4L), (11L, 5L, 0L), (12L, 106L, 100L),
      (13L, -1L, -1L)).toDF("id", "x", "y")
    // probe 1: site 13 wins at dist2 2; probe 2: no site in radius → absent
    val m = Spatial.nearestSiteWithin(probes, sites, "id", "id", d = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m == Map(1L -> ((13L, 2L))), m.toString)
    // without site 13 the tie at dist2 25 resolves to min site id 10
    val m2 = Spatial.nearestSiteWithin(probes, sites.filter($"id" =!= 13L),
        "id", "id", d = 5)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m2 == Map(1L -> ((10L, 25L))), m2.toString)
  }

  test("nearestSiteWithin equals brute-force NN on random scatter") {
    val probes = (1L to 200L).map(i =>
      (i, (i * 7919L) % 300L, (i * 104729L) % 300L)).toDF("id", "x", "y")
    val siteSeq = (1L to 30L).map(j =>
      (j, (j * 31L + 17L) % 300L, (j * 57L + 5L) % 300L))
    val got = Spatial.nearestSiteWithin(probes, siteSeq.toDF("id", "x", "y"),
        "id", "id", d = 40)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val brute = (1L to 200L).flatMap { i =>
      val (px, py) = ((i * 7919L) % 300L, (i * 104729L) % 300L)
      val cands = siteSeq.map { case (j, sx, sy) =>
        (j, (px - sx) * (px - sx) + (py - sy) * (py - sy))
      }.filter(_._2 <= 1600L)
      if (cands.isEmpty) None
      else Some(i -> cands.minBy(c => (c._2, c._1)))
    }.toMap.map { case (k, (j, d2)) => k -> ((j, d2)) }
    assert(got == brute, s"diff=${(got.toSet diff brute.toSet).take(5)}")
  }

  test("hotspotCells: hand-computed corner hotspot, w clamps at edges") {
    // 5 points in corner cell (0,0), 1 in interior cell (5,5); cell=100
    val pts = (Seq.fill(5)((10L, 10L)) :+ ((550L, 550L)))
      .toDF("x", "y")
    val got = Spatial.hotspotCells(pts, cell = 100, topK = 50)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val m = got.map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    // corner (0,0): own 5, nbr 5, w = 2x2 = 4; G=100, T=6
    // num = 5*100 - 4*6 = 476 -> floor(476e6/24) = 19833333
    assert(m((0L, 0L)) == ((5L, 5L, 4L, 19833333L)), m.toString)
    // interior (5,5): w = 9, num = 100 - 54 = 46 -> floor(46e6/54)
    assert(m((5L, 5L)) == ((1L, 1L, 9L, 851851L)), m.toString)
    // edge neighbor (1,0): own 0, nbr 5, w = 3x2 = 6
    assert(m((1L, 0L)) == ((0L, 5L, 6L, 12888888L)), m.toString)
    // hotspot ranks first
    assert(got.head._1 == 0L && got.head._2 == 0L)
  }

  test("hotspotCells equals brute-force over all reachable cells") {
    val rnd = new scala.util.Random(41)
    val ptSeq = (1 to 400).map(_ => (rnd.nextInt(1000).toLong, rnd.nextInt(1000).toLong))
    val got = Spatial.hotspotCells(ptSeq.toDF("x", "y"), cell = 50, topK = 10000)
      .as[(Long, Long, Long, Long, Long, Long)].collect().toVector
    val g = 20L
    val counts = ptSeq.groupBy(p => (p._1 / 50, p._2 / 50)).view.mapValues(_.size.toLong).toMap
    val t = ptSeq.size.toLong
    val brute = (for {
      cx <- 0L until g; cy <- 0L until g
      nbr = (for {
        dx <- -1L to 1L; dy <- -1L to 1L
        if cx + dx >= 0 && cx + dx < g && cy + dy >= 0 && cy + dy < g
      } yield counts.getOrElse((cx + dx, cy + dy), 0L)).sum
      if nbr > 0
    } yield {
      val w = (math.min(cx + 1, g - 1) - math.max(cx - 1, 0L) + 1L) *
        (math.min(cy + 1, g - 1) - math.max(cy - 1, 0L) + 1L)
      val num = BigInt(nbr) * g * g - BigInt(w) * t
      val ppm = num.signum * ((num.abs * 1000000) / (BigInt(w) * t)).toLong
      (cx, cy, counts.getOrElse((cx, cy), 0L), nbr, w, ppm)
    }).toVector.sortBy(r => (-r._6, r._1, r._2))
    assert(got == brute, s"got=${got.take(3)} brute=${brute.take(3)}")
  }
}
