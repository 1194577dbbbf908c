package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Property tests for the real-decode trio: ∀ ids and dims, the Spark
  * renderers (pgmBlob / wavBlob / y4mBlob) and decoders round-trip to
  * the closed-form pixel/sample arithmetic computed independently in
  * plain Scala — the cross-engine oracle argument, replayed here as a
  * JVM-side differential over random shapes the registry queries never
  * exercise (odd dims, 1-sample clips, single-frame videos). */
object MultimodalProps extends Properties("Multimodal") {

  // Spark jobs per case → keep the case count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(6).withMaxSize(16)

  private val genIds: Gen[List[Long]] = Gen.choose(1, 12)
    .flatMap(n => Gen.listOfN(n, Gen.choose(0L, 100000L)).map(_.distinct))

  property("pgm render→decode equals closed form for any even dims") =
    Prop.forAllNoShrink(genIds, Gen.choose(1, 5), Gen.choose(1, 4)) { (ids, w2, h2) =>
      val (w, h) = (w2 * 2, h2 * 2)
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = ids.toDF("id").select(col("id"), Multimodal.pgmBlob(col("id"), w, h).as("img"))
      val got = Multimodal.pgmFeatures(df, "id", "img")
        .as[(Long, Long, Long, Long, Boolean, Long, Long, Long)]
        .collect().map(r => r._1 -> r).toMap
      ids.forall { id =>
        val px = (0 until w * h).map(i => (id * 31 + i * 17) % 256)
        got(id) == ((id, w.toLong, h.toLong, (w * h).toLong, true,
          px.sum / (w * h), px.min.toLong, px.max.toLong))
      }
    }

  property("pgm 2x downsample equals the block-mean closed form") =
    Prop.forAllNoShrink(genIds, Gen.choose(1, 4), Gen.choose(1, 3)) { (ids, w2, h2) =>
      val (w, h) = (w2 * 2, h2 * 2)
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = ids.toDF("id").select(col("id"), Multimodal.pgmBlob(col("id"), w, h).as("img"))
      val got = Multimodal.pgmDownsample2x(df, "id", "img", w, h)
        .as[(Long, Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      ids.forall { id =>
        def p(r: Int, c: Int) = (id * 31 + (r * w + c) * 17) % 256
        val rs = for (o <- 0 until (w / 2) * (h / 2)) yield {
          val (r, c) = ((o / (w / 2)) * 2, (o % (w / 2)) * 2)
          (p(r, c) + p(r, c + 1) + p(r + 1, c) + p(r + 1, c + 1)) / 4
        }
        val md = java.security.MessageDigest.getInstance("MD5")
          .digest(rs.mkString(" ").getBytes("UTF-8"))
          .map(b => f"${b & 0xFF}%02x").mkString
        got(id) == ((id, (w / 2).toLong, (h / 2).toLong, rs.sum.toLong, md))
      }
    }

  property("wav render→decode equals closed form for any clip length") =
    Prop.forAllNoShrink(genIds, Gen.choose(1, 40)) { (ids, n) =>
      val spark = SparkSpec.spark
      import spark.implicits._
      val df = ids.toDF("id").select(col("id"), Multimodal.wavBlob(col("id"), n).as("wav"))
      val got = Multimodal.wavFeatures(df, "id", "wav")
        .as[(Long, Long, Long, Boolean, Long, Long, Long, Long)]
        .collect().map(r => r._1 -> r).toMap
      ids.forall { id =>
        val s = (0 until n).map(i => (id * 7 + i * 13) % 2000 - 1000)
        val zc = (1 until n).count(i => (s(i) < 0) != (s(i - 1) < 0))
        got(id) == ((id, n.toLong, 8000L, true,
          if (n == 0) 0L else s.map(math.abs).max.toLong,
          s.map(math.abs).sum.toLong, s.map(x => x * x).sum.toLong, zc.toLong))
      }
    }

  property("y4m render→decode equals closed form for any clip shape") =
    Prop.forAllNoShrink(genIds, Gen.choose(1, 5), Gen.choose(1, 4), Gen.choose(1, 6)) {
      (ids, w, h, nf) =>
        val spark = SparkSpec.spark
        import spark.implicits._
        val df = ids.toDF("id")
          .select(col("id"), Multimodal.y4mBlob(col("id"), w, h, nf).as("clip"))
        val got = Multimodal.y4mFeatures(df, "id", "clip", cutMeanDiff = 30)
          .as[(Long, Long, Long, Long, Boolean, Long, Long)]
          .collect().map(r => r._1 -> r).toMap
        ids.forall { id =>
          def p(f: Int, i: Int) = (id * 3 + ((f + id) / 2) * 97 + i * 7) % 256
          val frames = (0 until nf).map(f => (0 until w * h).map(i => p(f, i)))
          val cuts = (1 until nf).count { f =>
            (0 until w * h).map(i => math.abs(frames(f)(i) - frames(f - 1)(i))).sum >=
              30 * w * h
          }
          got(id) == ((id, w.toLong, h.toLong, nf.toLong, true,
            frames.flatten.sum / (nf * w * h), cuts.toLong))
        }
    }
}
