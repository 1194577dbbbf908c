package graft

import org.apache.spark.sql.functions._

import graft.operators.{Chunking, Dedup}

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  // -- chunkTokens --------------------------------------------------------

  test("chunkTokens: starts at stride multiples, windows clamp at doc end") {
    val d = docs((1L, (1 to 10).map(i => s"w$i").mkString(" ")))
    val out = Chunking.chunkTokens(d, "text", size = 4, stride = 3)
      .orderBy("start_pos")
      .as[(Long, Long, Long, String)].collect()
    assert(out.map(_._2).toSeq == Seq(0L, 3L, 6L, 9L))
    assert(out.map(_._3).toSeq == Seq(4L, 4L, 4L, 1L)) // last window is short
    assert(out.head._4 == "w1 w2 w3 w4")
    assert(out.last._4 == "w10")
  }

  test("chunkTokens: consecutive full windows overlap by size - stride tokens") {
    val d = docs((1L, (1 to 20).map(i => s"t$i").mkString(" ")))
    val chunks = Chunking.chunkTokens(d, "text", size = 8, stride = 5)
      .orderBy("start_pos").as[(Long, Long, Long, String)].collect()
    chunks.sliding(2).foreach { case Array(a, b) =>
      if (b._3 == 8) { // full successor window
        val tailA = a._4.split(" ").drop(5)
        val headB = b._4.split(" ").take(3)
        assert(tailA.sameElements(headB), s"overlap broken between $a and $b")
      }
    }
  }

  test("chunkTokens: stride == size tiles the doc exactly (no overlap, no loss)") {
    val text = (1 to 13).map(i => s"x$i").mkString(" ")
    val rebuilt = Chunking.chunkTokens(docs((7L, text)), "text", size = 5, stride = 5)
      .orderBy("start_pos").as[(Long, Long, Long, String)].collect()
      .map(_._4).mkString(" ")
    assert(rebuilt == text)
  }

  // -- greedyPack ---------------------------------------------------------

  private def packInvariants(capacity: Int, rows: Seq[(Long, String)]): Unit = {
    val d = rows.toDF("doc_id", "text")
    val out = Chunking.greedyPack(d, "text", capacity)
      .as[(Int, Long, Long, Long, Long)].collect()
    assert(out.length == rows.length) // every doc packed exactly once
    out.groupBy(r => (r._1, r._2)).foreach { case ((shard, bin), members) =>
      val total = members.map(_._4).sum
      assert(total <= capacity || members.length == 1,
        s"bin ($shard, $bin) holds $total tokens across ${members.length} docs")
      // offsets are the running token sum in doc_id order
      val sorted = members.sortBy(_._3)
      val offs = sorted.scanLeft(0L)((acc, m) => acc + m._4).init
      assert(sorted.map(_._5).toSeq == offs.toSeq, s"offsets wrong in bin ($shard, $bin)")
    }
    // bins are contiguous from 0 within each shard
    out.groupBy(_._1).foreach { case (shard, members) =>
      val bins = members.map(_._2).distinct.sorted.toSeq
      assert(bins == (0L until bins.length).toSeq, s"shard $shard bins not contiguous: $bins")
    }
  }

  test("greedyPack: capacity respected, offsets contiguous, bins dense") {
    packInvariants(10, (1L to 40L).map(i => i -> ("w " * (i % 7 + 1).toInt).trim))
  }

  test("greedyPack: a doc longer than capacity gets a bin of its own") {
    // force everything into known shards by using few docs; the oversized
    // doc must never share its bin
    val rows = Seq(1L -> "a b c", 2L -> (1 to 50).map(_ => "z").mkString(" "), 3L -> "d e")
    val out = Chunking.greedyPack(rows.toDF("doc_id", "text"), "text", capacity = 10)
      .as[(Int, Long, Long, Long, Long)].collect()
    val big = out.find(_._3 == 2L).get
    assert(out.count(r => r._1 == big._1 && r._2 == big._2) == 1)
    assert(big._5 == 0L) // oversized doc starts its bin
  }

  // -- globalShuffleOrder -------------------------------------------------

  test("globalShuffleOrder: pos is a permutation matching the brute-force sort") {
    val d = docs((0L until 200L).map(i => i -> s"doc $i"): _*)
    val got = Chunking.globalShuffleOrder(d)
      .as[(Long, Long)].collect().sortBy(_._2)
    assert(got.map(_._2).toSeq == (0L until 200L).toSeq) // dense permutation
    val expected = (0L until 200L)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
    assert(got.map(_._1).toSeq == expected)
  }

  // -- spanDedup ----------------------------------------------------------

  test("spanDedup: all-unique corpus reconstructs every doc verbatim") {
    val d = docs(
      (1L, (1 to 23).map(i => s"a$i").mkString(" ")),
      (2L, (1 to 9).map(i => s"b$i").mkString(" ")))
    val out = Dedup.spanDedup(d, "text", span = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 5L, 5L, (1 to 23).map(i => s"a$i").mkString(" "))))
    assert(out(1) == ((2L, 2L, 2L, (1 to 9).map(i => s"b$i").mkString(" "))))
  }

  test("spanDedup: exact duplicate doc is fully stripped, first kept") {
    val text = (1 to 10).map(i => s"c$i").mkString(" ")
    val out = Dedup.spanDedup(docs((1L, text), (2L, text)), "text", span = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, text)))
    assert(out(1) == ((2L, 2L, 0L, "")))
  }

  test("spanDedup: shared boilerplate span drops from later docs only") {
    val boiler = (1 to 5).map(i => s"p$i").mkString(" ")
    val out = Dedup.spanDedup(
        docs((1L, s"$boiler u1 u2 u3 u4 u5"), (2L, s"$boiler v1 v2 v3 v4 v5")),
        "text", span = 5)
      .orderBy("doc_id").as[(Long, Long, Long, String)].collect()
    assert(out(0) == ((1L, 2L, 2L, s"$boiler u1 u2 u3 u4 u5")))
    assert(out(1) == ((2L, 2L, 1L, "v1 v2 v3 v4 v5")))
  }

  test("spanDedup: repeated span inside ONE doc keeps only the first occurrence") {
    val span5 = "r1 r2 r3 r4 r5"
    val out = Dedup.spanDedup(docs((1L, s"$span5 $span5")), "text", span = 5)
      .as[(Long, Long, Long, String)].collect()
    assert(out.head == ((1L, 2L, 1L, span5)))
  }

  test("chunkSentences: greedy boundary, oversized sentence, empty-piece filter") {
    val docs = Seq(
      // sentences: 2, 3, 4, 1 tokens; budget 5 -> chunks (2 sents, 5 tok) x2
      (1L, "x y. a b c. d d d d. e"),
      // oversized single sentence gets its own chunk (never dropped)
      (2L, "w w w w. z"),
      // leading delimiter produces an empty piece -> filtered
      (3L, ". p q"))
      .toDF("doc_id", "text")
    val got = Chunking.chunkSentences(docs, "doc_id", "text", maxTokens = 5)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    assert(got(1L) == Seq((2L, 5L), (2L, 5L)), got.toString)
    // doc 2 with budget 2: "w w w w" (4 tok) alone, then "z"
    val got2 = Chunking.chunkSentences(docs.filter($"doc_id" === 2L),
        "doc_id", "text", maxTokens = 2)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._2).map(r => (r._3, r._4)).toSeq
    assert(got2 == Seq((1L, 4L), (1L, 1L)), got2.toString)
    assert(got(3L) == Seq((1L, 2L)), got.toString) // "p q" only, empty filtered
  }

  test("chunkSentences equals brute greedy fold on random sentence lists") {
    val rnd = new scala.util.Random(67)
    val docs = (1 to 60).map { i =>
      val sents = (0 until 1 + rnd.nextInt(8)).map(_ =>
        (0 until 1 + rnd.nextInt(7)).map(_ => "t" + rnd.nextInt(5)).mkString(" "))
      (i.toLong, sents.mkString(". "))
    }
    val got = Chunking.chunkSentences(docs.toDF("doc_id", "text"),
        "doc_id", "text", maxTokens = 8)
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._3, r._4)).toSeq).toMap
    val brute = docs.map { case (id, text) =>
      val ts = text.split(java.util.regex.Pattern.quote(". ")).filter(_.nonEmpty)
        .map(_.split(" ").length.toLong)
      val chunks = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var (cn, ct) = (0L, 0L)
      ts.foreach { t =>
        if (cn == 0) { cn = 1; ct = t }
        else if (ct + t > 8) { chunks += ((cn, ct)); cn = 1; ct = t }
        else { cn += 1; ct += t }
      }
      if (cn > 0) chunks += ((cn, ct))
      id -> chunks.toSeq
    }.toMap
    assert(got == brute, s"diff sample=${(got.toSet diff brute.toSet).take(3)}")
  }
}
