package graft

import org.apache.spark.sql.functions._

import graft.operators.TimeSeries

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, Long, Long, Double)], thresh: Long) =
    TimeSeries.ewmaAnomaly(
        rows.toDF("k", "t", "i", "v"), "k", col("t"), col("i"), col("v"),
        den = 4, threshMils = thresh)
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("ewma fold replays the exact floor recurrence") {
    // v mils: 1000, 2000, 10000;  e: 1000, floor((3*1000+2000)/4)=1250,
    // floor((3*1250+10000)/4)=3437; |2000-1000|=1000, |10000-1250|=8750
    val r = run(Seq((7L, 1L, 1L, 1.0), (7L, 2L, 2L, 2.0), (7L, 3L, 3L, 10.0)), 5000L)
    assert(r(7L) == ((3L, 3437L, 1L)), r.toString)
  }

  test("first row seeds; single-row key has zero anomalies") {
    val r = run(Seq((1L, 1L, 1L, 42.5)), 1L)
    assert(r(1L) == ((1L, 42500L, 0L)), r.toString)
  }

  test("rows fold in (t, tie) order, not input order") {
    val inOrder = run(Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 9.0)), 100000L)
    val shuffled = run(Seq((1L, 2L, 2L, 9.0), (1L, 1L, 1L, 1.0)), 100000L)
    assert(inOrder == shuffled)
    // equal timestamps: the tie column decides
    val tieA = run(Seq((1L, 5L, 1L, 1.0), (1L, 5L, 2L, 9.0)), 100000L)
    assert(tieA(1L)._2 == math.floor((3 * 1000L + 9000L) / 4.0).toLong)
  }

  test("keys fold independently") {
    val r = run(Seq((1L, 1L, 1L, 1.0), (2L, 1L, 1L, 100.0),
      (1L, 2L, 2L, 1.0), (2L, 2L, 2L, 100.0)), 1000L)
    assert(r(1L)._2 == 1000L && r(2L)._2 == 100000L, r.toString)
    assert(r.values.forall(_._3 == 0L))
  }

  test("anomaly judged against the pre-update ewma") {
    // v: 1000 then 1800 with thresh 700: |1800-1000| = 800 > 700 → anomaly,
    // even though |1800 - e_after(1200)| would be 600
    val r = run(Seq((1L, 1L, 1L, 1.0), (1L, 2L, 2L, 1.8)), 700L)
    assert(r(1L)._3 == 1L, r.toString)
  }

  test("theilSenSlopes: lower-median pair slope, outlier-robust, equal-x excluded") {
    def ts(rows: Seq[(Long, Long, Long, Long)]): Map[Long, (Long, Long)] =
      TimeSeries.theilSenSlopes(rows.toDF("g", "x", "y", "id"))
        .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    // perfect line y = 2x: every pair slope is exactly 2 → 2,000,000 ppm
    val line = (1L to 5L).map(x => (1L, x, 2 * x, x))
    assert(ts(line)(1L) == ((10L, 2000000L)))

    // same line plus one wild outlier (x=6, y=1000): 5 of the 15 pairs
    // are corrupted but the median rank stays on a clean pair → slope
    // still exactly 2; OLS on the same data is pulled far above 2
    val outlier = line :+ (1L, 6L, 1000L, 6L)
    assert(ts(outlier)(1L)._2 == 2000000L, ts(outlier).toString)
    val (n, sx, sy, sxy, sxx) = outlier.foldLeft((0L, 0L, 0L, 0L, 0L)) {
      case ((n0, a, b, c, d), (_, x, y, _)) => (n0 + 1, a + x, b + y, c + x * y, d + x * x)
    }
    val ols = (n * sxy - sx * sy).toDouble * 1000000.0 / (n * sxx - sx * sx)
    assert(ols > 100000000.0, s"outlier should wreck OLS: $ols")

    // hand-computed lower median on an even pair count: slopes of
    // (x,y) = (0,0),(1,10),(2,12),(3,15): pairs (0,1)=10,(0,2)=6,
    // (0,3)=5,(1,2)=2,(1,3)=2.5,(2,3)=3 → sorted 2,2.5,3,5,6,10;
    // lower median (rank (6+1)/2=3) = 3 → 3,000,000 ppm
    val even = Seq((2L, 0L, 0L, 1L), (2L, 1L, 10L, 2L), (2L, 2L, 12L, 3L),
      (2L, 3L, 15L, 4L))
    assert(ts(even)(2L) == ((6L, 3000000L)))

    // equal-x rows pair with others but never with each other: x = 1,1,2
    // gives exactly 2 pairs, and a vertical pair must not produce a row
    val eqx = Seq((3L, 1L, 0L, 1L), (3L, 1L, 100L, 2L), (3L, 2L, 50L, 3L))
    assert(ts(eqx)(3L)._1 == 2L)

    // single point → no pairs → no output row for that group
    assert(!ts(Seq((4L, 1L, 1L, 1L))).contains(4L))
  }

  private def acf(rows: Seq[(Long, Long, Long, Long)]) = // (k, t, tie, x)
    TimeSeries.acfPpm(rows.toDF("k", "t", "tie", "x"),
        col("k"), col("t"), col("tie"), col("x"), maxLag = 3)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("acfPpm: alternating series hand case (negative lag-1, positive lag-2)") {
    // x = +1000,-1000,+1000,-1000: S=0, dev=4x, den=64e6;
    // num1=-48e6, num2=+32e6, num3=-16e6 → -750000, 500000, -250000
    val rows = Seq(1000L, -1000L, 1000L, -1000L).zipWithIndex
      .map { case (x, i) => (1L, i.toLong, i.toLong, x) }
    assert(acf(rows)(1L) == ((4L, -750000L, 500000L, -250000L)), acf(rows).toString)
  }

  test("acfPpm: constant and too-short series report 0") {
    val const = (0L to 5L).map(i => (1L, i, i, 42L))
    assert(acf(const)(1L) == ((6L, 0L, 0L, 0L)))
    val short = Seq((2L, 0L, 0L, 10L), (2L, 1L, 1L, 30L))
    // n=2: lag-1 exists (one product), lags 2,3 empty → 0 via coalesce
    val (n, a1, a2, a3) = acf(short)(2L)
    assert(n == 2L && a2 == 0L && a3 == 0L && a1 < 0L, acf(short).toString)
  }

  private def bruteDtw(seq: Seq[Long], pat: Seq[Long]): (Long, Long) = {
    // reference DP: asymmetric step, open start/end; returns
    // (best_cost, best_end 1-based, ties to earliest end)
    val big = 1L << 40
    var dp = seq.map(v => math.abs(v - pat.head))
    pat.tail.foreach { p =>
      dp = seq.indices.map { j =>
        math.abs(seq(j) - p) +
          math.min(dp(j), if (j == 0) big else dp(j - 1))
      }
    }
    val best = dp.min
    (best, dp.indexOf(best) + 1L)
  }

  test("dtwMatch: perfect segment costs 0, vertical repeat, DP hand-checked") {
    // user 1 contains the pattern (2,5,3) verbatim mid-noise → cost 0,
    //   ends on the 3 (open start skips the 7000, open end skips the 8000)
    // user 2 is SHORTER than the pattern (2,5): the 5 absorbs both
    //   remaining steps via vertical repeats → cost |5-5|+|5-3| = 2
    // user 3 is flat 9s → best cost = |9-2|+|9-5|+|9-3| = 17, every end
    //   ties → earliest (j=1) wins
    val mk = (k: Long, vs: Seq[Double]) =>
      vs.zipWithIndex.map { case (v, i) => (k, i.toLong, i.toLong, v) }
    val rows = mk(1L, Seq(7.0, 0.002, 0.005, 0.003, 8.0)) ++
      mk(2L, Seq(0.002, 0.005)) ++
      mk(3L, Seq(0.009, 0.009, 0.009, 0.009))
    val got = TimeSeries.dtwMatch(rows.toDF("k", "t", "i", "v"), "k",
        col("t"), col("i"), col("v"), Seq(2L, 5L, 3L), maxLen = 48, topK = 10)
      .as[(Long, Long, Long, Long)].collect()
    val byK = got.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(byK(1L) == ((5L, 0L, 4L)), got.toSeq.toString)
    assert(byK(2L) == ((2L, 2L, 2L)), got.toSeq.toString)
    assert(byK(3L) == ((4L, 17L, 1L)), got.toSeq.toString)
    // output order: (cost asc, key asc) → 1 (0), 2 (2), 3 (17)
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L), got.toSeq.toString)
  }

  test("dtwMatch equals brute-force DP on random multi-key series, maxLen truncates") {
    val rows = for { k <- 1L to 8L; i <- 0L until (20L + k % 5) }
      yield (k, i, i, (((k * 7919L + i * 104729L) % 997L).toDouble / 1000.0))
    val pat = Seq(100L, 700L, 400L, 900L, 200L)
    val maxLen = 16 // shorter than every series → truncation is exercised
    val got = TimeSeries.dtwMatch(rows.toDF("k", "t", "i", "v"), "k",
        col("t"), col("i"), col("v"), pat, maxLen = maxLen, topK = 8)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val want = rows.groupBy(_._1).map { case (k, rs) =>
      val seq = rs.sortBy(_._2).take(maxLen)
        .map(r => math.floor(r._4 * 1000).toLong)
      val (c, e) = bruteDtw(seq, pat)
      k -> ((seq.size.toLong, c, e))
    }
    want.foreach { case (k, w) => assert(got(k) == w, s"k=$k got=${got(k)} want=$w") }
  }

  test("acfPpm equals BigInt brute force on random multi-key series") {
    val rows = for { k <- 1L to 6L; i <- 0L until (10L + k % 4) }
      yield (k, i, i, ((k * 7919L + i * 104729L) % 2001L) - 1000L)
    val got = acf(rows)
    rows.groupBy(_._1).foreach { case (k, rs) =>
      val xs = rs.sortBy(_._2).map(_._4).map(BigInt(_))
      val n = BigInt(xs.size); val s = xs.sum
      val dev = xs.map(n * _ - s)
      val den = dev.map(d => d * d).sum
      def ppm(lag: Int): Long = {
        val num = (lag until xs.size).map(t => dev(t) * dev(t - lag)).sum
        if (den <= 0) 0L
        else if (num < 0) -((-num) * 1000000 / den).toLong
        else (num * 1000000 / den).toLong
      }
      assert(got(k) == ((n.toLong, ppm(1), ppm(2), ppm(3))),
        s"k=$k got=${got(k)} want=${(n.toLong, ppm(1), ppm(2), ppm(3))}")
    }
  }

  private def xcorr(rows: Seq[(String, Long)], maxLag: Int) =
    graft.operators.TimeSeries.crossCorrPpm(
        rows.toDF("k", "b"), $"k", $"b", "x", "y", maxLag)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

  /** BigInt replay of the crossCorrPpm contract over dense 0-filled
    * count series on the [min, max] grid. */
  private def bruteXcorr(
      rows: Seq[(String, Long)], maxLag: Int): Map[Long, (Long, Long)] = {
    val cx = rows.filter(_._1 == "x").groupBy(_._2).map { case (b, g) => b -> g.size }
    val cy = rows.filter(_._1 == "y").groupBy(_._2).map { case (b, g) => b -> g.size }
    val lo = (cx.keys ++ cy.keys).min; val hi = (cx.keys ++ cy.keys).max
    val grid = (lo to hi).toIndexedSeq
    val xs = grid.map(b => BigInt(cx.getOrElse(b, 0)))
    val ys = grid.map(b => BigInt(cy.getOrElse(b, 0)))
    val n = BigInt(grid.size)
    val dx = xs.map(n * _ - xs.sum); val dy = ys.map(n * _ - ys.sum)
    val ddx = dx.map(d => d * d).sum; val ddy = dy.map(d => d * d).sum
    (0 to maxLag).map { k =>
      val num = (0 until grid.size - k).map(t => dx(t) * dy(t + k)).sum
      val ppm =
        if (ddx <= 0 || ddy <= 0) 0L
        else {
          val mag = (num * num * 1000000 / (ddx * ddy)).toLong
          if (num < 0) -mag else mag
        }
      k.toLong -> ((grid.size.toLong, ppm))
    }.toMap
  }

  test("crossCorrPpm: identical series reads 1e6 at lag 0; shift-by-2 peaks at lag 2") {
    val base = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L)
    val x = base.zipWithIndex.flatMap { case (c, b) =>
      Seq.fill(c.toInt)(("x", b.toLong)) }
    // identical twin: every bucket count equal
    val same = x ++ x.map { case (_, b) => ("y", b) }
    val gotSame = xcorr(same, 2)
    assert(gotSame(0L) == ((8L, 1000000L)), gotSame(0L).toString)
    // y = x shifted +2 buckets: lag 2 is the (strict) max of lags 0..3
    val shifted = x ++ x.map { case (_, b) => ("y", b + 2L) }
    val got = xcorr(shifted, 3)
    assert(got == bruteXcorr(shifted, 3), s"got=$got")
    assert((0 to 3).filter(_ != 2).forall(k => got(2L)._2 > got(k.toLong)._2),
      s"lag 2 not the peak: $got")
  }

  test("crossCorrPpm equals BigInt brute force on ragged random counts; constant series reads 0") {
    val rows = for {
      (k, seed) <- Seq(("x", 13L), ("y", 29L))
      b <- 0L to 19L
      c <- 0L until ((b * seed + 7L) % 5L)
    } yield (k, b)
    val got = xcorr(rows, 3)
    assert(got == bruteXcorr(rows, 3), s"got=$got want=${bruteXcorr(rows, 3)}")
    // constant x series (same count every bucket) -> ddx = 0 -> all 0
    val const = (0L to 9L).flatMap(b => Seq(("x", b), ("x", b))) ++
      (0L to 9L).flatMap(b => Seq.fill(((b % 3) + 1).toInt)(("y", b)))
    val gotC = xcorr(const, 2)
    assert(gotC.values.forall(_._2 == 0L), gotC.toString)
  }

  test("holtSmooth: hand-traced level/trend recurrence with floor rounding") {
    // v = 4.0, 8.0, 8.0 (mils 4000, 8000, 8000), den = 4:
    // t1: l=4000 b=0 sae=0
    // t2: pred=4000, l=floor((12000+8000)/4)=5000, b=floor(1000/4)=250, sae=4000
    // t3: pred=5250, l=floor((15750+8000)/4)=5937, b=floor((937+750)/4)=421,
    //     sae=4000+2750=6750
    val pts = Seq(("u", 1L, 1L, 4.0), ("u", 2L, 2L, 8.0), ("u", 3L, 3L, 8.0))
      .toDF("k", "ts", "id", "value")
    val got = TimeSeries.holtSmooth(pts, "k", col("ts"), col("id"),
        col("value"), den = 4)
      .as[(String, Long, Long, Long, Long)].collect().head
    assert(got == (("u", 3L, 5937L, 421L, 6750L)), got.toString)
  }

  test("holtSmooth tracks a linear ramp that a plain EWMA lags") {
    val ramp = (1 to 40).map(i => ("u", i.toLong, i.toLong, i * 10.0))
      .toDF("k", "ts", "id", "value")
    val holt = TimeSeries.holtSmooth(ramp, "k", col("ts"), col("id"),
        col("value"), den = 4)
      .as[(String, Long, Long, Long, Long)].collect().head
    // trend state converges to the true slope (10000 mils/step; small
    // transient overshoot is normal Holt dynamics)
    assert(holt._4 > 8000L && holt._4 <= 10500L, holt.toString)
    // level stays close to the latest value (400000 mils)
    assert(holt._3 > 380000L, holt.toString)
  }

  test("holtSmooth equals brute sequential fold (negative values included)") {
    val rnd = new scala.util.Random(83)
    val pts = (1 to 400).map { i =>
      ((i % 9).toString, rnd.nextInt(100).toLong, i.toLong, rnd.nextDouble() * 40 - 20)
    }
    val got = TimeSeries.holtSmooth(pts.toDF("k", "ts", "id", "value"),
        "k", col("ts"), col("id"), col("value"), den = 4)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    val brute = pts.groupBy(_._1).map { case (k, rows) =>
      val vs = rows.sortBy(r => (r._2, r._3)).map(r => math.floor(r._4 * 1000).toLong)
      var (l, b, sae) = (0L, 0L, 0L)
      vs.zipWithIndex.foreach { case (v, i) =>
        if (i == 0) { l = v; b = 0L }
        else {
          val pred = l + b
          val l1 = math.floor((3.0 * pred + v) / 4.0).toLong
          val b1 = math.floor(((l1 - l) + 3.0 * b) / 4.0).toLong
          sae += math.abs(v - pred); l = l1; b = b1
        }
      }
      k -> ((vs.size.toLong, l, b, sae))
    }
    assert(got == brute, s"diff=${(got.toSet diff brute.toSet).take(3)}")
  }

  test("rollingMedian: trailing frame, lower median on even n, simultaneous ties") {
    val pts = Seq(
      // user u: ts 0/10/20, window 15 -> frames [5], [5,1], [1,9]
      ("u", 0L, 1L, 5L), ("u", 10L, 2L, 1L), ("u", 20L, 3L, 9L),
      // user w: two rows at the SAME ts share one frame (RANGE peers)
      ("w", 5L, 4L, 7L), ("w", 5L, 5L, 3L))
      .toDF("e", "ts", "id", "v")
    val got = TimeSeries.rollingMedian(pts, col("e"), col("ts"), col("id"),
        col("v"), windowUs = 15L)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    assert(got == Map(
      1L -> ((1L, 5L)),
      2L -> ((2L, 1L)), // even n: LOWER median of {1, 5}
      3L -> ((2L, 1L)), // row at ts 0 left the 15-unit frame
      4L -> ((2L, 3L)), 5L -> ((2L, 3L))), got.toString)
  }

  test("rollingMedian equals brute-force trailing-window replay") {
    val rnd = new scala.util.Random(31)
    val pts = (1 to 500).map { i =>
      ((i % 7).toString, rnd.nextInt(100).toLong, i.toLong, (rnd.nextInt(41) - 20).toLong)
    }
    val got = TimeSeries.rollingMedian(pts.toDF("e", "ts", "id", "v"),
        col("e"), col("ts"), col("id"), col("v"), windowUs = 12L)
      .as[(Long, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._4, r._5))).toMap
    val brute = pts.map { case (e, ts, id, _) =>
      val win = pts.filter(p => p._1 == e && p._2 >= ts - 12 && p._2 <= ts)
        .map(_._4).sorted
      id -> ((win.size.toLong, win((win.size + 1) / 2 - 1)))
    }.toMap
    assert(got == brute, s"diff=${(got.toSet diff brute.toSet).take(5)}")
  }

  test("changepointSplit finds a planted level shift; n=1 reports NULLs") {
    // 6 zeros then 6 tens (values in units → mils ×1000): the split
    // score is maximized exactly at the boundary t = 6
    val rows = ((1 to 6).map(i => ("u", i.toLong, i.toLong, 0.0)) ++
      (7 to 12).map(i => ("u", i.toLong, i.toLong, 10.0)) :+
      (("solo", 1L, 1L, 5.0)))
      .toDF("k", "ts", "id", "v")
    val got = TimeSeries.changepointSplit(rows, "k", $"ts", $"id", $"v")
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got("u")._1 == 12L && got("u")._2 == Some(6L), got.toString)
    assert(got("solo") == ((1L, None, None)), got.toString)
    // constant series: every split scores 0, tie breaks to t = 1
    val const = (1 to 5).map(i => ("c", i.toLong, i.toLong, 3.0)).toDF("k", "ts", "id", "v")
    val gc = TimeSeries.changepointSplit(const, "k", $"ts", $"id", $"v")
      .as[(String, Long, Option[Long], Option[Long])].collect().head
    assert(gc == (("c", 5L, Some(1L), Some(0L))), gc.toString)
  }

  test("changepointSplit equals the brute per-split replay on random series") {
    val rnd = new scala.util.Random(41)
    val rows = (1 to 400).map { i =>
      ((i % 9).toString, rnd.nextInt(50).toLong, i.toLong, (rnd.nextInt(21) - 10).toDouble)
    }
    val got = TimeSeries.changepointSplit(rows.toDF("k", "ts", "id", "v"),
        "k", $"ts", $"id", $"v")
      .as[(String, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val brute = rows.groupBy(_._1).map { case (k, rs) =>
      val vs = rs.sortBy(r => (r._2, r._3)).map(r => (r._4 * 1000).toLong)
      val n = vs.size.toLong
      val tt = vs.sum
      val best = (1L until n).map { t =>
        val p = vs.take(t.toInt).sum
        val d = n * p - t * tt
        (t, d * d / (t * (n - t)))
      }.sortBy(x => (-x._2, x._1)).headOption
      k -> ((n, best.map(_._1), best.map(_._2)))
    }
    assert(got == brute, s"diff=${(got.toSet diff brute.toSet).take(3)}")
  }

  test("holtWinters equals the sequential integer recurrence replay") {
    val rnd = new scala.util.Random(53)
    val rows = for (k <- Seq("a", "b"); t <- 1 to 28) yield
      (k, t.toLong, (50 + 10 * (t % 7) + rnd.nextInt(9)).toLong)
    val got = TimeSeries.holtWinters(rows.toDF("k", "t", "y"), "k",
        col("t"), col("y"), period = 7, horizon = 7)
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._3) -> ((r._2, r._4))).toMap
    def fdiv(a: Long, b: Long): Long = Math.floorDiv(a, b)
    val want = rows.groupBy(_._1).flatMap { case (k, rs) =>
      val ys = rs.sortBy(_._2).map(_._3)
      var l = ys.head; var b = 0L; val s = Array.fill(7)(0L)
      ys.zipWithIndex.drop(1).foreach { case (y, idx) =>
        val j = idx % 7
        val ln = fdiv(y - s(j) + l + b, 2)
        b = fdiv(ln - l + 3 * b, 4)
        s(j) = fdiv(y - ln + 3 * s(j), 4)
        l = ln
      }
      val n = ys.size
      (1 to 7).map(h => (k, h.toLong) -> ((n.toLong, l + h * b + s((n - 1 + h) % 7))))
    }
    assert(got == want, s"diff=${(got.toSet diff want.toSet).take(5)}")
    // the seasonal state actually learned the planted period-7 shape:
    // forecasts one week apart repeat the (level-shifted) pattern
    val fa = (1 to 7).map(h => got(("a", h.toLong))._2)
    assert(fa.distinct.size > 1, fa.toString) // not flat — seasonality present
  }

  private def mk(rows: Seq[(Long, Long, Long)]): Map[Long, (Long, Long, Option[Long])] =
    TimeSeries.mannKendall(rows.toDF("g", "x", "y"))
      .as[(Long, Long, Long, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("mannKendall: hand-traced S, tie correction, z2 floor") {
    // strictly increasing n=5: S = C(5,2) = 10, no ties,
    // v18 = 5*4*15 = 300, z2 = (10-1)^2 * 18e6 / 300 = 4,860,000
    val up = (1L to 5L).map(x => (1L, x, x * 10))
    assert(mk(up)(1L) == ((5L, 10L, Some(4860000L))))
    // strictly decreasing: S = -10, same z2 (|S| symmetric)
    val down = (1L to 5L).map(x => (1L, x, -x))
    assert(mk(down)(1L) == ((5L, -10L, Some(4860000L))))
    // ties: y = 1,1,2 -> S = 0+1+1 = 2; tie group t=2 contributes
    // 2*1*9 = 18; v18 = 3*2*11 - 18 = 48; z2 = 1*18e6/48 = 375,000
    val tied = Seq((2L, 1L, 1L), (2L, 2L, 1L), (2L, 3L, 2L))
    assert(mk(tied)(2L) == ((3L, 2L, Some(375000L))))
    // all-tied series: S = 0 -> z2 = 0 (variance also 0; the S = 0
    // branch subsumes it)
    val flat = Seq((3L, 1L, 7L), (3L, 2L, 7L), (3L, 3L, 7L))
    assert(mk(flat)(3L) == ((3L, 0L, Some(0L))))
    // single-point key has no pairs and drops
    assert(!mk(Seq((4L, 1L, 1L))).contains(4L))
  }

  test("mannKendall matches a brute-force replay") {
    val rnd = new scala.util.Random(42)
    val rows = for (g <- 1L to 4L; x <- 1L to 20L)
      yield (g, x, rnd.nextInt(8).toLong)
    val got = mk(rows)
    rows.groupBy(_._1).foreach { case (g, pts) =>
      val ys = pts.sortBy(_._2).map(_._3)
      val n = ys.length.toLong
      val s = (for (i <- ys.indices; j <- i + 1 until ys.length)
        yield java.lang.Long.signum(ys(j) - ys(i)).toLong).sum
      val tie = ys.groupBy(identity).values.map(_.length.toLong)
        .map(t => t * (t - 1) * (2 * t + 5)).sum
      val v18 = n * (n - 1) * (2 * n + 5) - tie
      val z2 =
        if (s == 0) Some(0L)
        else if (v18 > 0)
          Some((math.abs(s) - 1) * (math.abs(s) - 1) * 18L * 1000000L / v18)
        else None
      assert(got(g) == ((n, s, z2)), s"g=$g got=${got(g)}")
    }
  }

  test("pacfPpm: BigInt Yule-Walker replay from acfPpm, pacf1 = acf1") {
    val rnd = new scala.util.Random(29)
    val rows = (0 until 40).map(i =>
      (1L, i.toLong, i.toLong, (rnd.nextInt(2000) - 1000).toLong)) ++
      (0 until 30).map(i => (2L, i.toLong, i.toLong, (i % 4) * 500L))
    val acfGot = acf(rows)
    val got = TimeSeries.pacfPpm(rows.toDF("k", "t", "tie", "x"),
        col("k"), col("t"), col("tie"), col("x"))
      .as[(Long, Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    for (k <- Seq(1L, 2L)) {
      val (n, a1, a2, a3) = acfGot(k)
      val (r0, r1, r2, r3) = (BigInt(1000000), BigInt(a1), BigInt(a2), BigInt(a3))
      def sdiv(num: BigInt, den: BigInt): Long =
        (if (num < 0) -(num.abs * 1000000 / den) else num * 1000000 / den).toLong
      val den2 = r0 * r0 - r1 * r1
      val p2 = if (den2 > 0) Some(sdiv(r2 * r0 - r1 * r1, den2)) else None
      val det3 = r0 * (r0 * r0 - r1 * r1) - r1 * (r1 * r0 - r1 * r2) +
        r2 * (r1 * r1 - r0 * r2)
      val det3s = r0 * (r0 * r3 - r2 * r1) - r1 * (r1 * r3 - r2 * r2) +
        r1 * (r1 * r1 - r0 * r2)
      val p3 = if (det3 > 0) Some(sdiv(det3s, det3)) else None
      assert(got(k) == ((n, a1, p2, p3)), s"k=$k got=${got(k)} want=($n,$a1,$p2,$p3)")
    }
    // the period-4 sawtooth (key 2) must show structure past lag 1
    assert(got(2L)._3.exists(_ != 0L), got(2L).toString)
  }

  test("ljungBox: BigInt replay; alternation rejects, short series NULL") {
    val rnd = new scala.util.Random(41)
    val rows = (0 until 50).map(i =>
      (1L, i.toLong, i.toLong, (rnd.nextInt(2000) - 1000).toLong)) ++
      (0 until 40).map(i => (2L, i.toLong, i.toLong, if (i % 2 == 0) 1000L else -1000L)) ++
      (0 until 3).map(i => (3L, i.toLong, i.toLong, i * 100L))
    val acfGot = acf(rows)
    val got = TimeSeries.ljungBox(rows.toDF("k", "t", "tie", "x"),
        col("k"), col("t"), col("tie"), col("x"))
      .as[(Long, Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    for (k <- Seq(1L, 2L)) {
      val (n, a1, a2, a3) = acfGot(k)
      val (r1, r2, r3) = (BigInt(a1), BigInt(a2), BigInt(a3))
      val num = r1 * r1 * (n - 2) * (n - 3) + r2 * r2 * (n - 1) * (n - 3) +
        r3 * r3 * (n - 1) * (n - 2)
      val q = BigInt(n) * (n + 2) * num * 1000 /
        (BigInt(n - 1) * (n - 2) * (n - 3) * BigInt("1000000000000"))
      assert(got(k) == ((n, Some(q.toLong), Some(if (q > 7815) 1L else 0L))),
        s"k=$k got=${got(k)} q=$q")
    }
    // the ±1000 alternation has |acf1| near 1e6 — must reject hard
    assert(got(2L)._3 == Some(1L), got(2L).toString)
    assert(got(3L) == ((3L, None, None)), got(3L).toString) // n <= 3
  }
}
