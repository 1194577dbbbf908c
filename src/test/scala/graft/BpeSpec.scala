package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("wordTable: counts, char symbols + end marker, delimiter string") {
    val docs = Seq((0L, "aa ab aa")).toDF("doc_id", "text")
    val rows = Bpe.wordTable(docs, "text")
      .as[(String, Long, String)].collect().map { case (w, c, s) => w -> ((c, s)) }.toMap
    assert(rows("aa") == ((2L, "||a||a||_||")))
    assert(rows("ab") == ((1L, "||a||b||_||")))
  }

  test("learn follows the greedy argmax with (c desc, lhs, rhs) ties") {
    val docs = Seq((0L, "aa aa ab")).toDF("doc_id", "text")
    val (merges, finalWords) = Bpe.learn(docs, "text", 5)
    val m = merges.as[(Int, String, String, Long)].collect().toSeq
    // round 1: (a,a)=2 ties (a,_)=2+1? counts: aa gives (a,a),(a,_) ×2;
    // ab gives (a,b),(b,_) ×1 → (a,_)=2, (a,a)=2, tie → '_' < 'a' so
    // (a,_) wins on rhs
    assert(m == Seq(
      (1, "a", "_", 2L),
      (2, "a", "a_", 2L),
      (3, "a", "b", 1L),
      (4, "ab", "_", 1L)))
    val fw = finalWords.select($"word", $"s").as[(String, String)].collect().toMap
    assert(fw == Map("aa" -> "||aa_||", "ab" -> "||ab_||"))
  }

  test("merge replaces adjacent occurrences left-to-right non-overlapping") {
    val docs = Seq((0L, "aaaa")).toDF("doc_id", "text")
    val (_, w1) = Bpe.learn(docs, "text", 1)
    val s = w1.select($"s").as[String].head()
    // (a,a) wins round 1 with count 3 (overlap-counted); one replace pass
    // merges greedily: [a,a,a,a,_] → [aa,aa,_]
    assert(s == "||aa||aa||_||")
  }

  test("encode counts BPE tokens per doc with the final vocabulary") {
    val docs = Seq((0L, "aa aa ab"), (1L, "ab aa")).toDF("doc_id", "text")
    val (_, fw) = Bpe.learn(docs, "text", 8)
    val enc = Bpe.encode(docs, "doc_id", "text", fw)
      .as[(Long, Long, Long)].collect().map { case (d, w, t) => d -> ((w, t)) }.toMap
    // both words fully merged into single tokens by round 8
    assert(enc(0L) == ((3L, 3L)))
    assert(enc(1L) == ((2L, 2L)))
  }
}
