package graft

import org.apache.spark.sql.functions._

import graft.operators.SuffixArray

class SuffixArraySpec extends SparkSpec {
  import spark.implicits._

  test("prefixOffsets is the exclusive prefix sum in key order") {
    val lens = Seq((3L, 7L), (1L, 4L), (2L, 5L), (4L, 1L)).toDF("k", "v")
    val got = SuffixArray.prefixOffsets(lens, "k", "v")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 4L, 3L -> 9L, 4L -> 16L))
  }

  // brute-force token-level suffix ranks over the SAME corpus encoding
  // (per-doc unique U+0001+id separator appended)
  private def bruteRanks(docs: Seq[(Long, String)]): Map[Long, Long] = {
    val toks = docs.sortBy(_._1).flatMap { case (id, text) =>
      text.split(" ", -1).toSeq :+ ("" + id)
    }.toVector
    implicit val ord: Ordering[Seq[String]] = Ordering.Implicits.seqOrdering
    val sorted = toks.indices.map(i => toks.drop(i): Seq[String]).sorted
    toks.indices.map { i =>
      i.toLong -> (sorted.indexWhere(_ == (toks.drop(i): Seq[String])) + 1).toLong
    }.toMap
  }

  test("suffixRanks equals brute-force suffix sort (incl. repeated text)") {
    val docs = Seq(
      (0L, "a b a b a"),
      (1L, "b a b"),
      (2L, "a b a b a"), // exact repeat of doc 0 — maximal ties to resolve
      (3L, "c"))
    val got = SuffixArray.suffixRanks(docs.toDF("doc_id", "text"), "doc_id", "text")
      .select($"gpos", $"sa_rank").as[(Long, Long)].collect().toMap
    assert(got == bruteRanks(docs))
    // a permutation of 1..n
    assert(got.values.toSeq.sorted == (1L to got.size.toLong).toList)
  }

  test("substringDedup finds the planted shared passage as one maximal span") {
    val passage = (1 to 20).map(i => s"w$i").mkString(" ") // 20 shared tokens
    val docs = Seq(
      (0L, s"unique0 lead $passage tail0 x0"),
      (1L, s"other1 head1 pre1 $passage post1"),
      (2L, "nothing shared here at all beyond short words"))
      .toDF("doc_id", "text")
    val got = SuffixArray.substringDedup(docs, "doc_id", "text", l = 15)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 0: 24 tokens, one 20-token dup span, first occurrence → nothing removed
    assert(got(0L) == ((24L, 1L, 20L, 0L)))
    // doc 1: second occurrence → the same 20 tokens are removable
    assert(got(1L) == ((24L, 1L, 20L, 20L)))
    assert(got(2L) == ((8L, 0L, 0L, 0L)))
  }

  test("substringDedup counts self-repeats within one doc") {
    val block = (1 to 15).map(i => s"t$i").mkString(" ")
    val docs = Seq((7L, s"$block mid1 mid2 $block")).toDF("doc_id", "text")
    val row = SuffixArray.substringDedup(docs, "doc_id", "text", l = 15)
      .as[(Long, Long, Long, Long, Long)].head()
    // two disjoint 15-token spans; the later one is removable
    assert(row == ((7L, 32L, 2L, 30L, 15L)))
  }

  test("crossSubstringLeak: planted verbatim leak found, sub-L overlap not flagged") {
    val leak = (1 to 7).map(i => s"v$i").mkString(" ") // 7-token verbatim span
    val train = Seq(
      (0L, s"train zero alpha $leak omega"),
      (1L, "train one totally different words entirely"))
      .toDF("doc_id", "text")
    val eval_ = Seq(
      (10L, s"eval intro $leak closing remark"),      // planted 7-token leak
      (11L, "v1 v2 v3 v4 unrelated tail words here"), // only 4 shared: < L
      (12L, "clean evaluation document nothing shared"))
      .toDF("doc_id", "text")
    val got = SuffixArray.crossSubstringLeak(train, eval_, "doc_id", "text", l = 5)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    // doc 10: 11 tokens, the 3 overlapping 5-windows of the leak merge
    // into ONE maximal 7-token span → 636363 ppm
    assert(got(10L) == ((11L, 1L, 7L, 636363L)), got(10L).toString)
    // 4-token overlap is below the L=5 detection floor — NOT a leak
    assert(got(11L) == ((8L, 0L, 0L, 0L)), got(11L).toString)
    assert(got(12L) == ((5L, 0L, 0L, 0L)), got(12L).toString)
    // brute replay: every eval 5-window checked against every train
    // 5-window by string equality must reproduce the hit positions
    def wins(s: String) = s.split(" ").sliding(5).map(_.mkString(" ")).toSet
    val trainW = wins("train zero alpha " + leak + " omega") ++
      wins("train one totally different words entirely")
    val hitPos = ("eval intro " + leak + " closing remark").split(" ")
      .sliding(5).zipWithIndex
      .collect { case (w, i) if trainW.contains(w.mkString(" ")) => i }.toSeq
    assert(hitPos == Seq(2, 3, 4)) // exactly the three leak windows
  }
}
