package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Trajectory

class TrajectorySpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val flat = Seq(
    ("a", ts("2024-01-01 00:00:00"), 1.0),
    ("a", ts("2024-01-01 01:00:00"), 2.0),
    ("a", ts("2024-01-01 02:00:00"), 3.0),
    ("b", ts("2024-01-01 03:00:00"), 9.0)
  ).toDF("k", "ts", "v")

  test("pivot builds time-sorted trajectories; unpivot inverts it") {
    val traj = Trajectory.pivot(flat, "k", "ts", Seq("v"))
    val a = traj.filter($"k" === "a").select($"v_traj").as[Seq[(Timestamp, Double)]].head()
    assert(a == Seq((ts("2024-01-01 00:00:00"), 1.0), (ts("2024-01-01 01:00:00"), 2.0),
      (ts("2024-01-01 02:00:00"), 3.0)))
    val back = Trajectory.unpivot(traj, "k", "v_traj")
      .select($"k", $"t", $"v").as[(String, Timestamp, Double)].collect().toSet
    assert(back == flat.as[(String, Timestamp, Double)].collect().toSet)
  }

  test("asOfSlice returns last instant at-or-before t; null before start") {
    val traj = Trajectory.pivot(flat, "k", "ts", Seq("v"))
    val sliced = traj.select($"k",
      Trajectory.asOfSlice($"v_traj", lit("2024-01-01 01:30:00").cast("timestamp")).as("s"))
    val byK = sliced.collect().map(r => r.getString(0) -> Option(r.getStruct(1))).toMap
    assert(byK("a").get.getDouble(1) == 2.0)
    assert(byK("b").isEmpty) // b starts after t
  }

  test("atInstant matches only exact instants") {
    val traj = Trajectory.pivot(flat, "k", "ts", Seq("v")).filter($"k" === "a")
    val exact = traj.select(
      Trajectory.atInstant($"v_traj", lit("2024-01-01 01:00:00").cast("timestamp")).as("s"))
    assert(exact.head().getStruct(0).getDouble(1) == 2.0)
    val miss = traj.select(
      Trajectory.atInstant($"v_traj", lit("2024-01-01 01:00:01").cast("timestamp")).as("s"))
    assert(miss.head().isNullAt(0))
  }

  test("contains = validity span covers t") {
    val traj = Trajectory.pivot(flat, "k", "ts", Seq("v"))
    val c = traj.select($"k",
      Trajectory.contains($"v_traj", lit("2024-01-01 01:30:00").cast("timestamp")).as("c"))
      .as[(String, Boolean)].collect().toMap
    assert(c("a") && !c("b"))
  }

  test("validityRange aggregates per-key tsrange") {
    val r = Trajectory.validityRange(flat, "k", "ts")
      .select($"k", $"validity.lo", $"validity.hi").collect()
      .map(x => (x.getString(0), (x.getTimestamp(1), x.getTimestamp(2)))).toMap
    assert(r("a") == ((ts("2024-01-01 00:00:00"), ts("2024-01-01 02:00:00"))))
    assert(r("b") == ((ts("2024-01-01 03:00:00"), ts("2024-01-01 03:00:00"))))
  }

  test("typed TrajAggregator ≡ untyped pivot") {
    import graft.operators.{TrajAggregator, TypedObs}
    val ds = flat.as[(String, Timestamp, Double)]
      .map { case (k, t, v) => TypedObs(k, t, v) }
    val typed = ds.groupByKey(_.k).agg(TrajAggregator.column).collect()
      .map { case (k, traj) => k -> traj }.toMap
    val untyped = Trajectory.pivot(flat, "k", "ts", Seq("v"))
      .as[(String, Seq[(Timestamp, Double)])].collect().toMap
    assert(typed == untyped)
  }

  test("pivotSalted ≡ pivot (incl. duplicate timestamps) and plans two-phase") {
    val rnd = new scala.util.Random(7)
    // skewed fixture: one hot key with 500 rows incl. duplicate ts
    val rows = (1 to 500).map { i =>
      ("hot", ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), i.toDouble)
    } ++ Seq(("cold", ts("2024-01-02 00:00:00"), 1.0))
    val df = rows.toDF("k", "ts", "v")
    val salted = Trajectory.pivotSalted(df, "k", "ts", Seq("v"), saltBuckets = 8)
    val plain = Trajectory.pivot(df, "k", "ts", Seq("v"))
    assert(salted.columns.toSeq == plain.columns.toSeq)
    val s = salted.as[(String, Seq[(Timestamp, Double)])].collect().toMap
    val p = plain.as[(String, Seq[(Timestamp, Double)])].collect().toMap
    assert(s == p)
    // two-phase: the optimized plan must hold TWO aggregates (partial
    // per-salt arrays, then concat+sort), not one giant collect_list
    val nAggs = salted.queryExecution.optimizedPlan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }.size
    assert(nAggs == 2, s"expected two-phase aggregation, got $nAggs Aggregate nodes")
  }

  test("asOfJoin picks latest row per key with deterministic tie-break") {
    val dup = Seq(
      ("a", ts("2024-01-01 00:00:00"), 1L, 1.0),
      ("a", ts("2024-01-01 00:00:00"), 2L, 2.0), // same ts, higher id wins
      ("b", ts("2024-01-02 00:00:00"), 3L, 3.0)  // after t → excluded
    ).toDF("k", "ts", "id", "v")
    val r = Trajectory.asOfJoin(dup, "k", "ts",
        lit("2024-01-01 12:00:00").cast("timestamp"), tieCols = Seq("id"))
      .select($"k", $"v").as[(String, Double)].collect().toMap
    assert(r == Map("a" -> 2.0))
  }

  test("nearestTimeJoin: two-sided winner, equidistant tie, window bound, cross-bin") {
    val probes = Seq((1L, 100L, 10L), (1L, 200L, 11L), (1L, 1000L, 12L),
      (2L, 10L, 13L)).toDF("k", "t", "id")
    // probe 10: build 105 (|5|) beats 90 (|10|); probe 11: 195/205
    // equidistant → earlier wins; probe 12: nothing within 50; probe 13
    // (k=2): build at t=5 lives in the PREVIOUS bin (w=50) — cross-bin
    val build = Seq((1L, 90L, 20L), (1L, 105L, 21L), (1L, 195L, 22L),
      (1L, 205L, 23L), (2L, 5L, 24L)).toDF("k", "t", "id")
    val got = Trajectory.nearestTimeJoin(probes, build, "k", "t", "id", wUs = 50L)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._2 -> r).toMap
    assert(got(10L) == ((1L, 10L, 100L, 21L, 5L)), got.toString)
    assert(got(11L) == ((1L, 11L, 200L, 22L, -5L)), got.toString)
    assert(!got.contains(12L), got.toString)
    assert(got(13L) == ((2L, 13L, 10L, 24L, -5L)), got.toString)
  }

  test("nearestTimeJoin equals brute nearest within tolerance on random data") {
    val probes = (1L to 100L).map(i => (i % 5, (i * 7919L) % 2000L, i))
    val build = (1L to 80L).map(j => (j % 5, (j * 104729L) % 2000L, 1000L + j))
    val got = Trajectory.nearestTimeJoin(probes.toDF("k", "t", "id"),
        build.toDF("k", "t", "id"), "k", "t", "id", wUs = 100L)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._2 -> ((r._4, r._5))).toMap
    val want = probes.flatMap { case (k, pt, pid) =>
      val cands = build.filter(b => b._1 == k && math.abs(b._2 - pt) <= 100L)
      if (cands.isEmpty) None
      else {
        val w = cands.minBy(b => (math.abs(b._2 - pt), b._2, b._3))
        Some(pid -> ((w._3, w._2 - pt)))
      }
    }.toMap
    assert(got == want, s"diff=${(got.toSet diff want.toSet).take(5)}")
  }
}
