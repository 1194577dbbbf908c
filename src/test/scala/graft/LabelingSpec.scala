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

  private def kappa(votes: Seq[(Long, Long, String)], minShared: Long = 1L) =
    Labeling.pairwiseKappa(votes.toDF("item", "annot", "label"),
        "item", "annot", "label", minShared)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap

  test("pairwiseKappa: perfect, inverse, and degenerate-constant pairs") {
    // annot 1 vs 2: identical balanced labels -> kappa = 1e6.
    // annot 1 vs 3: exactly inverted -> kappa = -1e6.
    // annot 4 vs 5: both constant "A" -> p_e = 1 degenerate -> kappa 0,
    //   agreement still 1e6.
    val votes =
      (1L to 4L).flatMap { i =>
        val l = if (i <= 2) "A" else "B"
        val inv = if (i <= 2) "B" else "A"
        Seq((i, 1L, l), (i, 2L, l), (i, 3L, inv))
      } ++ (10L to 12L).flatMap(i => Seq((i, 4L, "A"), (i, 5L, "A")))
    val got = kappa(votes)
    assert(got((1L, 2L)) == ((4L, 1000000L, 1000000L)), got((1L, 2L)).toString)
    assert(got((1L, 3L)) == ((4L, 0L, -1000000L)), got((1L, 3L)).toString)
    assert(got((4L, 5L)) == ((3L, 1000000L, 0L)), got((4L, 5L)).toString)
    assert(!got.contains((1L, 4L)), "pairs with no shared items must not appear")
  }

  test("pairwiseKappa: minShared filter, (item,annot) dedup to min label, brute replay") {
    // annotators 1 and 2 share only 2 items -> dropped at minShared=3;
    // duplicate (item, annot) votes collapse to the min label.
    val sparse = Seq((1L, 1L, "A"), (1L, 2L, "A"), (2L, 1L, "B"), (2L, 2L, "B"))
    assert(kappa(sparse, minShared = 3L).isEmpty)
    val votes = (for {
      i <- 1L to 30L; a <- 1L to 4L
      if (i * 13 + a * 7) % 5 != 0
    } yield (i, a, s"L${(i * a * 2654435761L) % 3}")) ++
      Seq((1L, 1L, "Zdup"), (1L, 1L, "Adup")) // dup votes: min label wins
    val got = kappa(votes)
    // BigInt reference replay
    val one = votes.groupBy(v => (v._1, v._2))
      .map { case ((i, a), vs) => (i, a) -> vs.map(_._3).min }
    val annots = one.keys.map(_._2).toSeq.distinct.sorted
    for (p <- annots; q <- annots; if p < q) {
      val shared = one.keys.filter(_._2 == p).map(_._1)
        .filter(i => one.contains((i, q))).toSeq
      if (shared.nonEmpty) {
        val la = shared.map(i => one((i, p))); val lb = shared.map(i => one((i, q)))
        val n = BigInt(shared.size)
        val a = BigInt(la.zip(lb).count { case (x, y) => x == y })
        val labels = (la ++ lb).distinct
        val pe = labels.map(l =>
          BigInt(la.count(_ == l)) * BigInt(lb.count(_ == l))).sum
        val num = a * n - pe; val den = n * n - pe
        val kp =
          if (den == 0) 0L
          else if (num < 0) -((-num) * 1000000 / den).toLong
          else (num * 1000000 / den).toLong
        val want = (n.toLong, (a * 1000000 / n).toLong, kp)
        assert(got((p, q)) == want, s"pair ($p,$q) got=${got((p, q))} want=$want")
      } else assert(!got.contains((p, q)))
    }
  }
}
