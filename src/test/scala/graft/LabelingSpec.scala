package graft

import graft.operators.Labeling

class LabelingSpec extends SparkSpec {
  import spark.implicits._

  private def run(votes: Seq[(Long, Long, String)]) =
    Labeling.goldenLabels(votes.toDF("item", "annot", "label"),
        "item", "annot", "label")
      .as[(Long, Long, String, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap

  test("weighted revote flips a bad-annotator majority; ties to smallest label") {
    // p1(1), p2(2) reliable; b(3), b2(4) anti-correlated. Items 1-3 tie
    // 2-2 -> majority "A" (smallest label). Item 9: majority B (2-1) but
    // reliabilities p1=750000, b=b2=250000 ppm flip it to A.
    val votes = (1L to 3L).flatMap(i => Seq(
      (i, 1L, "A"), (i, 2L, "A"), (i, 3L, "B"), (i, 4L, "B"))) ++
      Seq((9L, 1L, "A"), (9L, 3L, "B"), (9L, 4L, "B"))
    val got = run(votes)
    (1L to 3L).foreach { i =>
      assert(got(i) == ((4L, "A", "A", 0L)), s"item $i: ${got(i)}")
    }
    assert(got(9L) == ((3L, "B", "A", 1L)), got(9L).toString)
  }

  test("goldenLabels equals brute-force two-round model on random votes") {
    val votes = for {
      item <- 1L to 40L
      annot <- 1L to 7L
      if (item * 31 + annot * 17) % 3 != 0 // ragged annotation coverage
    } yield (item, annot, s"L${(item * annot * 2654435761L) % 4}")
    val got = run(votes)
    // reference model
    val byItem = votes.groupBy(_._1)
    def argmaxLabel[N](ws: Map[String, N])(implicit n: Numeric[N]): String =
      ws.toSeq.minBy { case (l, w) => (n.negate(w), l) }._1
    val maj = byItem.map { case (i, vs) =>
      i -> argmaxLabel(vs.groupBy(_._3).map { case (l, g) => l -> g.size })
    }
    val rel = votes.groupBy(_._2).map { case (a, vs) =>
      a -> vs.count(v => v._3 == maj(v._1)).toLong * 1000000L / vs.size
    }
    byItem.foreach { case (i, vs) =>
      val fin = argmaxLabel(vs.groupBy(_._3).map { case (l, g) =>
        l -> g.map(v => rel(v._2)).sum
      })
      val want = (vs.size.toLong, maj(i), fin, if (maj(i) != fin) 1L else 0L)
      assert(got(i) == want, s"item $i got=${got(i)} want=$want")
    }
  }
}
