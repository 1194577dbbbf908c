package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.{Chunking, Dedup}

/** Property tests for the training-sample prep family: ∀ random corpora,
  * chunk tiling loses no tokens, packing respects its capacity/offset/
  * density invariants, the shuffle order is a dense permutation, and
  * span-dedup reconstructs an all-unique corpus verbatim. */
object ChunkingProps extends Properties("Chunking") {

  // Spark jobs per case → keep the case count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxSize(18)

  /** (doc_id, text) with distinct ids; token counts 1..40 over a tiny
    * vocabulary, so cross-doc span collisions DO occur. */
  private val genDocs: Gen[List[(Long, String)]] = Gen.choose(1, 25).flatMap { n =>
    Gen.listOfN(n, for {
      id <- Gen.choose(0L, 500L)
      k <- Gen.choose(1, 40)
      toks <- Gen.listOfN(k, Gen.oneOf("a", "b", "c", "d", "e"))
    } yield (id, toks.mkString(" ")))
      .map(_.groupBy(_._1).values.map(_.head).toList)
  }

  property("stride==size chunking tiles every doc exactly") =
    Prop.forAllNoShrink(genDocs, Gen.choose(2, 9)) { (rows, size) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val rebuilt = Chunking.chunkTokens(rows.toDF("doc_id", "text"), "text", size, size)
        .orderBy("doc_id", "start_pos")
        .as[(Long, Long, Long, String)].collect()
        .groupBy(_._1).map { case (id, cs) => id -> cs.sortBy(_._2).map(_._4).mkString(" ") }
      rows.forall { case (id, text) => rebuilt(id) == text }
    }

  property("greedyPack: every doc packed once, no bin over capacity unless alone, offsets contiguous") =
    Prop.forAllNoShrink(genDocs, Gen.choose(5, 60)) { (rows, cap) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val out = Chunking.greedyPack(rows.toDF("doc_id", "text"), "text", cap)
        .as[(Int, Long, Long, Long, Long)].collect()
      val once = out.length == rows.length
      val binsOk = out.groupBy(r => (r._1, r._2)).forall { case (_, ms) =>
        val sorted = ms.sortBy(_._3)
        val offs = sorted.scanLeft(0L)((acc, m) => acc + m._4).init
        (ms.map(_._4).sum <= cap || ms.length == 1) &&
          sorted.map(_._5).toSeq == offs.toSeq
      }
      val dense = out.groupBy(_._1).forall { case (_, ms) =>
        val bins = ms.map(_._2).distinct.sorted.toSeq
        bins == (0L until bins.length).toSeq
      }
      once && binsOk && dense
    }

  property("globalShuffleOrder emits a dense permutation ordered by (md5, id)") =
    Prop.forAllNoShrink(genDocs) { rows =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val got = Chunking.globalShuffleOrder(rows.toDF("doc_id", "text"))
        .as[(Long, Long)].collect().sortBy(_._2)
      val expected = rows.map(_._1).sorted
        .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
          .digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString, id))
      got.map(_._2).toSeq == (0L until rows.length).toSeq &&
        got.map(_._1).toSeq == expected
    }

  property("spanDedup reconstructs an all-unique corpus verbatim") =
    Prop.forAllNoShrink(genDocs, Gen.choose(3, 8)) { (rows, span) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      // position-unique tokens ⇒ every span is unique within AND across
      // docs, so nothing may be dropped
      val unique = rows.map { case (id, text) =>
        (id, text.split(" ").zipWithIndex.map { case (t, j) => s"${id}_${j}_$t" }.mkString(" "))
      }
      val out = Dedup.spanDedup(unique.toDF("doc_id", "text"), "text", span)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      unique.forall { case (id, text) =>
        val (_, nSpans, nKept, clean) = out(id)
        nSpans == nKept && clean == text
      }
    }

  property("spanDedup drops every span of an exact duplicate doc") =
    Prop.forAllNoShrink(genDocs.suchThat(_.nonEmpty), Gen.choose(3, 8)) { (rows, span) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val (_, text0) = rows.head
      val dupId = rows.map(_._1).max + 1
      val df = ((dupId, text0) :: rows).toDF("doc_id", "text")
      val dup = Dedup.spanDedup(df, "text", span)
        .filter(org.apache.spark.sql.functions.col("doc_id") === dupId)
        .as[(Long, Long, Long, String)].head()
      // the duplicate (highest id ⇒ never first occurrence) keeps nothing
      dup._3 == 0L && dup._4 == ""
    }
}
