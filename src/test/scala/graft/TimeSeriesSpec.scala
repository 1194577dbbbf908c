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
}
