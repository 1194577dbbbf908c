package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.store.Staging

/** The staging layer's reuse contract: deterministic (content-keyed)
  * stage paths are reused across calls when every plan leaf is a stable
  * file path, or (r15) a SMALL LocalRelation — whose rows are hashed
  * into the key, so identical in-memory data reuses and different data
  * never collides. `_v`-suffixed stage dirs (whose content changes
  * across JVMs while the canonicalized plan does not) still break the
  * chain and fall back to fresh suffixes. */
class StagingSpec extends SparkSpec {

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }

  private def stageDirs(label: String): Seq[String] = {
    val f = new java.io.File(Staging.root)
    Option(f.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.startsWith(label)).toSeq.sorted
  }

  test("stable file-backed plans reuse one content-keyed stage dir") {
    val src = tmpDir("staging_stable") + "/src"
    spark.range(100).select(col("id"), (col("id") % 7).as("k"))
      .write.mode("overwrite").parquet(src)
    val mk = () => Staging.stage(
      spark.read.parquet(src).groupBy("k").agg(sum("id").as("s")),
      "t_stable")
    val before = stageDirs("t_stable").size
    mk().collect()
    val after1 = stageDirs("t_stable")
    mk().collect()
    val after2 = stageDirs("t_stable")
    assert(after1.size == before + 1, s"first stage should add one dir: $after1")
    assert(after2 == after1, s"second stage must reuse, not add: $after2")
    // keyed, not _v-suffixed
    assert(after1.exists(_.matches("""t_stable_[0-9a-f]{12}""")), after1.toString)
  }

  test("different stable inputs map to different stage dirs") {
    val a = tmpDir("staging_a") + "/src"
    val b = tmpDir("staging_b") + "/src"
    spark.range(10).write.mode("overwrite").parquet(a)
    spark.range(20).write.mode("overwrite").parquet(b)
    Staging.stage(spark.read.parquet(a).select(sum("id").as("s")), "t_in").collect()
    Staging.stage(spark.read.parquet(b).select(sum("id").as("s")), "t_in").collect()
    assert(stageDirs("t_in").size >= 2, stageDirs("t_in").toString)
  }

  test("in-memory leaves never collide: two stages of different data both materialize") {
    import spark.implicits._
    val r1 = Staging.stage(Seq((1L, "x")).toDF("id", "v"), "t_mem")
    val r2 = Staging.stage(Seq((2L, "y")).toDF("id", "v"), "t_mem")
    assert(r1.as[(Long, String)].collect().toSeq == Seq((1L, "x")))
    assert(r2.as[(Long, String)].collect().toSeq == Seq((2L, "y")))
  }

  test("small local relations are content-keyed: same data reuses one dir") {
    import spark.implicits._
    // the iterative-graph seed shape: a tiny Seq.toDF at the root of a
    // staged chain — identical data + plan must map to ONE keyed dir
    // (it used to force a fresh _v dir per call, rebuilding the whole
    // bfs chain every pass), while different data maps elsewhere.
    // Earlier suite runs leave this label's keyed dirs behind (staging
    // is durable by design) — clear them so the counts below see only
    // this run's writes.
    stageDirs("t_localkey").foreach { d =>
      val root = Paths.get(Staging.root, d)
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    val mk = () => Staging.stage(
      Seq((42L, 0L)).toDF("node", "hop").select(col("node"), col("hop")),
      "t_localkey")
    mk().collect()
    val after1 = stageDirs("t_localkey").filter(_.matches("""t_localkey_[0-9a-f]{12}"""))
    assert(after1.size == 1, s"expected one keyed dir: ${stageDirs("t_localkey")}")
    mk().collect()
    val after2 = stageDirs("t_localkey").filter(_.matches("""t_localkey_[0-9a-f]{12}"""))
    assert(after2 == after1, s"same local data must reuse, not add: $after2")
    Staging.stage(
      Seq((43L, 0L)).toDF("node", "hop").select(col("node"), col("hop")),
      "t_localkey").collect()
    val after3 = stageDirs("t_localkey").filter(_.matches("""t_localkey_[0-9a-f]{12}"""))
    assert(after3.size == 2, s"different local data must get its own dir: $after3")
  }

  test("a _v-suffixed leaf breaks content addressing (stale-bloom regression)") {
    import spark.implicits._
    // Simulates the cross-JVM collision seen in the full suite: a _v path
    // holds data A in one run and data B in the next (the AtomicLong
    // restarts), while the canonicalized derived plan is identical. The
    // derived stage must therefore NOT reuse a keyed dir.
    val vPath = s"${Staging.root}/t_chain_v999999"
    Seq(1L, 2L, 3L).toDF("h").write.mode("overwrite").parquet(vPath)
    val d1 = Staging.stage(spark.read.parquet(vPath).distinct(), "t_derived")
    assert(d1.as[Long].collect().toSet == Set(1L, 2L, 3L))
    // same path, different content — exactly what a new JVM produces
    Seq(7L, 8L).toDF("h").write.mode("overwrite").parquet(vPath)
    val d2 = Staging.stage(spark.read.parquet(vPath).distinct(), "t_derived")
    assert(d2.as[Long].collect().toSet == Set(7L, 8L),
      "derived stage resurrected stale data from a content-keyed dir over a _v leaf")
  }

  test("refresh flag forces a rebuild of a completed keyed stage") {
    // earlier suite runs leave t_refresh_<key> dirs with OTHER keys (the
    // tmp src path differs per run) — clear them so `.head` is the dir
    // this run writes, not a stale alphabetical predecessor
    stageDirs("t_refresh").foreach { d =>
      val root = Paths.get(Staging.root, d)
      Files.walk(root).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.deleteIfExists(p))
    }
    val src = tmpDir("staging_refresh") + "/src"
    spark.range(5).write.mode("overwrite").parquet(src)
    val frame = () => spark.read.parquet(src).select(sum("id").as("s"))
    Staging.stage(frame(), "t_refresh").collect()
    val dir = stageDirs("t_refresh").head
    val success = Paths.get(Staging.root, dir, "_SUCCESS")
    val t0 = Files.getLastModifiedTime(success)
    sys.props("graft.staging.refresh") = "true"
    try {
      Thread.sleep(1100) // FS mtime granularity
      Staging.stage(frame(), "t_refresh").collect()
      assert(Files.getLastModifiedTime(success).compareTo(t0) > 0,
        "refresh=true did not rewrite the stage")
    } finally sys.props.remove("graft.staging.refresh")
  }
}
