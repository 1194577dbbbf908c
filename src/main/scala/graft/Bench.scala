package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.store.SnapshotStore

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Measurement: every query is fully materialized through a noop-format
  * write — unlike `.count()`, this forces evaluation of every column and
  * keeps sorts/projections in the timed plan (Catalyst would delete them
  * under a count; VERDICT r1).
  *
  * Extra workload beyond the registry: `lookup_1000` mirrors the
  * reference's 1000 seeded random point lookups
  * (/root/reference/benchmark.py:73-80) the distributed way — a broadcast
  * semi-join of the hour-partitioned store against 1000 deterministic
  * probe keys, not 1000 driver round-trips.
  *
  * Two-pass measurement (VERDICT r4 What's-wrong #1): the sandbox FS puts
  * single-draw timings in a ~2× variance band, so every READ query runs
  * twice and the recorded number is the per-query min; both pass totals
  * are emitted alongside so the variance is visible, not hidden. Store
  * WRITES stay single-pass — they delete + rebuild, so a second pass
  * would measure a different (cache-warm FS) workload. STREAMING queries
  * get the same two draws as batch reads: each replay deletes its sink +
  * checkpoint on entry (Replay.appendReplayToFiles), so pass 2 re-executes
  * the full streaming job from a fresh checkpoint, and the recorded value
  * is a true min-of-two (VERDICT r9 Next #2). The detail file carries BOTH
  * per-pass per-query maps (`queries_pass1`/`queries_pass2`) so cross-round
  * drift analysis can separate draw variance from plan regressions.
  * The pinned high-variance workloads (BENCH_VARIANCE.json's
  * top_variance — the census top-10 risk members plus the full
  * streaming family and q_cc_incremental, regenerated each round from
  * that round's committed same-code draws) additionally get a THIRD
  * pass and record min-of-three — targeted where the variance evidence
  * says the gate band is tightest (VERDICT r11 Next #5, r12 Next #2).
  *
  * `SPARK_GRAFT_ONLY=q_a,q_b,...` runs just those workloads (store builds
  * happen lazily via the ensure* calls instead of being timed) — the
  * fresh-JVM attribution probe for flagged queries: a subset run isolates
  * a query from the 350-workload JVM aging (code cache, GC history,
  * listener backlog) of the full sweep.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // v2 commit: tasks move output directly instead of a second
      // job-commit rename pass — the hour-partitioned stores write 720
      // one-file directories, so the bench otherwise times 1440 renames
      // per store build. (Trade-off: failed jobs may leave partial
      // output; fine for a bench whose stores are rebuilt from scratch.)
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      try fn catch { case e: Throwable => System.err.println(s"[bench] ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }

    // Per-query shuffle volume (read+write bytes over all tasks): the
    // number that predicts 100 TB behavior better than wall seconds on a
    // 32-core sandbox — a query whose time is fine but whose shuffle is
    // O(input) is the one that breaks at 1000 executors. Attributed per
    // query by draining the (async) listener bus around each run.
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(
            t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = t.taskMetrics
          if (m != null) {
            shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            ()
          }
        }
      })
    def measureShuffle(fn: => Unit): Long = {
      org.apache.spark.graftbus.drain(spark.sparkContext)
      val before = shuffleBytes.get()
      fn
      org.apache.spark.graftbus.drain(spark.sparkContext)
      shuffleBytes.get() - before
    }
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm up codegen/executors so the first timed query isn't charged
    // for JVM startup
    materialize(spark.range(1000).toDF("i"))

    // Environment calibration probes (VERDICT r5 Next #1): two fixed
    // workloads whose plans never change across rounds, so any reader can
    // normalize cross-run query times against the environment's CPU and
    // FS speed of THAT run (r3/r4/r5 all recorded uniformly-inflated
    // draws a single-shot artifact can't distinguish from regressions).
    //  - calib_cpu_s: pure codegen hash-agg over an in-memory range — no
    //    FS involvement, scales with CPU contention only.
    //  - calib_fs_s: full scan-and-sum of a pinned-path parquet file
    //    written once (outside the store root, so it survives the store
    //    wipe below); min of two scans, so it tracks the FS+page-cache
    //    bandwidth the read workload actually sees.
    // hash sums are MASKED to 31 bits: a raw sum(xxhash64) random-walks
    // past Long range within a few million rows and ANSI mode (Spark 4
    // default) then aborts the probe mid-scan — the calibration would
    // time the failure, not the workload (rounds ≤6 did exactly that;
    // their calib values are time-to-abort draws, comparable only to
    // each other)
    val calibCpu = time(materialize(
      spark.range(256L * 1000 * 1000)
        .select(sum(xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL))))))
    val calibPath = "target/graft_calib/scan_probe"
    if (!new java.io.File(calibPath, "_SUCCESS").isFile)
      spark.range(32L * 1000 * 1000)
        .select(col("id"), xxhash64(col("id")).as("h"), pmod(col("id"), lit(997)).as("k"))
        .write.mode("overwrite").parquet(calibPath)
    def fsScan(): Double = time(materialize(
      spark.read.parquet(calibPath).select(sum(col("id")),
        sum(col("h").bitwiseAND(lit(0x7FFFFFFFL))), sum(col("k")))))
    val calibFs = math.min(fsScan(), fsScan())

    // Rolling mid-sweep environment attribution (VERDICT r12 Next #1):
    // the start-of-run calibration probes provably cannot see a
    // degradation that develops DURING the 400-workload sweep (the r12
    // driver draw ran q_stream_ingest_dedup at 40 s in BOTH passes while
    // a fresh JVM reads ~12 s). Before every q_stream_* workload and
    // every 25th workload, one sample records a micro CPU probe (32M-row
    // codegen hash-agg — 1/8 of calib_cpu's rows, so micro*8 ≈ calib_cpu
    // when the box is steady) plus the JVM counters the r10 episode
    // implicated: JIT code-cache and metaspace occupancy, cumulative GC
    // time, and heap. BENCH_DETAIL carries the sample array, so a slow
    // streaming row is attributable in-artifact: micro probe also slow →
    // box/JVM-wide mechanism; probe steady → the workload itself.
    case class EnvSample(at: String, pass: Int, microS: Double,
        codeCacheMb: Double, metaspaceMb: Double, gcMs: Long, heapMb: Double)
    val envSamples = scala.collection.mutable.ArrayBuffer[EnvSample]()
    def envSample(at: String, pass: Int): Unit = {
      val micro = time(materialize(
        spark.range(32L * 1000 * 1000)
          .select(sum(xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL))))))
      import scala.jdk.CollectionConverters._
      val pools = java.lang.management.ManagementFactory
        .getMemoryPoolMXBeans.asScala
      def poolMb(prefix: String): Double =
        pools.filter(_.getName.startsWith(prefix))
          .map(_.getUsage.getUsed).sum / 1e6
      val gc = java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
      val heap = java.lang.management.ManagementFactory
        .getMemoryMXBean.getHeapMemoryUsage.getUsed / 1e6
      envSamples += EnvSample(at, pass, micro,
        poolMb("CodeHeap"), poolMb("Metaspace"), gc, heap)
      ()
    }
    // Streaming hygiene between workloads (same VERDICT item): unload
    // cached state-store providers (RocksDB natives + HDFS-backed maps)
    // once a streaming workload finishes — in production each query owns
    // its executors; in a 400-workload bench JVM the providers of ~30
    // finished queries otherwise stay cached for the rest of the sweep.
    def streamHygiene(): Unit =
      try org.apache.spark.sql.graftbridge.unloadStateStores()
      catch { case e: Throwable => System.err.println(s"[bench] unload: ${e.getMessage}") }

    val results = scala.collection.mutable.LinkedHashMap[String, Double]()
    val only: Option[Set[String]] =
      sys.env.get("SPARK_GRAFT_ONLY")
        .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)

    if (only.isEmpty) {
      // the write path is its own metric (the reference times writes and
      // reads separately, benchmark.py:55-80); building it here also means
      // lookup queries below time *reads*, not a first-touch store build.
      // Delete any prior store so the write is actually measured.
      SnapshotStore.deleteRecursively(new java.io.File(SnapshotStore.root))
      results("store_write") = time(SnapshotStore.ensureEventsStore(spark, sfDir))
      results("json_store_write") = time(graft.store.JsonStore.ensureEventsJsonStore(spark, sfDir))
      results("json_concat_write") = time(graft.store.JsonStore.ensureConcatAllStore(spark, sfDir))
      // coarse day-bucketed replay source for the streaming queries —
      // built here so q_stream_* time STREAMING, not a first-touch write
      results("replay_store_write") = time(SnapshotStore.ensureReplayStore(spark, sfDir))
      results("geojson_store_write") =
        time(graft.queries.CoreQueries.ensureCanonicalGeoStore(spark, sfDir))
      // pre-touch the geo store like the events store below: q_geojson_*
      // queries should time re-nesting, not the first-touch FS cost of the
      // store written seconds ago (VERDICT r5 What's-wrong #3 — two rounds
      // of q_geojson_roundtrip outlier draws traced to cold first reads)
      materialize(spark.read.parquet(
        graft.queries.CoreQueries.ensureCanonicalGeoStore(spark, sfDir)))
    } else {
      // subset probe: ALL shared stores build untimed so the listed
      // queries time the same read/replay workload they see in the full
      // sweep — a subset member touching the JSON or geo stores must not
      // pay a first-touch build inside pass 1's timing (ADVICE r10)
      SnapshotStore.ensureEventsStore(spark, sfDir)
      SnapshotStore.ensureReplayStore(spark, sfDir)
      graft.store.JsonStore.ensureEventsJsonStore(spark, sfDir)
      graft.store.JsonStore.ensureConcatAllStore(spark, sfDir)
      materialize(spark.read.parquet(
        graft.queries.CoreQueries.ensureCanonicalGeoStore(spark, sfDir)))
    }

    // One store DataFrame shared by probe derivation AND the semi-join:
    // spark.read.parquet lists the 720 hour partitions eagerly at
    // DataFrame creation, so the workload times lookups, not two repeated
    // file listings (VERDICT r3 What's-wrong #4).
    val storePath = SnapshotStore.ensureEventsStore(spark, sfDir)
    val store = SnapshotStore.read(spark, storePath)

    // the read workload, run twice (per-query min recorded): the full
    // registry plus the reference's 1000 seeded random point lookups —
    // probe keys = the 1000 smallest xxhash64(ts) timestamps
    // (deterministic), answered in one broadcast-join pass.
    val shuffleMb = scala.collection.mutable.LinkedHashMap[String, Double]()
    def readPass(recordShuffle: Boolean): scala.collection.mutable.LinkedHashMap[String, Double] = {
      val passNo = if (recordShuffle) 2 else 1
      val pass = scala.collection.mutable.LinkedHashMap[String, Double]()
      def run(name: String)(fn: => Unit): Unit =
        if (recordShuffle) {
          var t = 0.0
          val sb = measureShuffle { t = time(fn) }
          pass(name) = t
          shuffleMb(name) = math.rint(sb / 1e5) / 10.0
        } else pass(name) = time(fn)
      var i = 0
      SparkEntry.queries.toSeq.sortBy(_._1)
        .filter { case (name, _) => only.forall(_.contains(name)) }
        .foreach { case (name, fn) =>
          val streaming = name.startsWith("q_stream")
          if (streaming || i % 25 == 0) envSample(name, passNo)
          run(name)(materialize(fn(spark, sfDir)))
          if (streaming) streamHygiene()
          i += 1
        }
      envSample("_pass_end", passNo)
      if (only.forall(_.contains("lookup_1000"))) run("lookup_1000") {
        val probes = store.select(col("ts"))
          .orderBy(xxhash64(col("ts")))
          .limit(1000)
        materialize(store.join(broadcast(probes), Seq("ts"), "left_semi"))
      }
      pass
    }
    // per-pass staging attribution (VERDICT r7 Next #7): the cold pass
    // pays content-keyed index CONSTRUCTION (Staging builds), the warm
    // pass reads them back — snapshotting the build clock around each
    // pass decomposes the cold/warm gap
    val stg0 = (graft.store.Staging.buildSeconds, graft.store.Staging.buildsSoFar)
    val pass1 = readPass(recordShuffle = false)
    val stg1 = (graft.store.Staging.buildSeconds, graft.store.Staging.buildsSoFar)
    // shuffle volumes recorded on the WARM pass: bytes are a property of
    // the plan, not the FS band, so one attribution suffices
    val pass2 = readPass(recordShuffle = true)
    val stg2 = (graft.store.Staging.buildSeconds, graft.store.Staging.buildsSoFar)
    val stagingBuild = Seq(stg1._1 - stg0._1, stg2._1 - stg1._1)
    val stagingCount = Seq(stg1._2 - stg0._2, stg2._2 - stg1._2)
    pass1.foreach { case (name, t1) => results(name) = math.min(t1, pass2(name)) }

    // Min-of-THREE for the highest-draw-variance workloads (VERDICT r11
    // Next #5): BENCH_VARIANCE.json (tools/variance_census.py over the
    // four committed same-code r11 draws) names the 10 workloads whose
    // historical draw envelope comes closest to the regression-gate band;
    // one extra draw for just those members shrinks exactly the variance
    // the census measured, at ~15 s total cost instead of a 460 s third
    // full pass. Registry queries only (lookup_1000 never ranked).
    // pinnedParseOk distinguishes "no census file" (fine) from "census
    // file present but the top_variance parse came back empty" (ADVICE
    // r12: a silent format drift would disable the third pass while the
    // artifact still claims min-of-3 coverage) — the failure is warned on
    // stderr AND recorded in the detail artifact.
    val varianceFile = new java.io.File("BENCH_VARIANCE.json")
    val pinned: Set[String] = {
      if (!varianceFile.isFile) Set.empty
      else {
        val txt = new String(
          java.nio.file.Files.readAllBytes(varianceFile.toPath),
          java.nio.charset.StandardCharsets.UTF_8)
        """"top_variance":\s*\[([^\]]*)\]""".r.findFirstMatchIn(txt)
          .map(_.group(1).split(",").iterator
            .map(_.trim.stripPrefix("\"").stripSuffix("\""))
            .filter(_.nonEmpty).toSet)
          .getOrElse(Set.empty)
      }
    }
    val pinnedParseOk = !varianceFile.isFile || pinned.nonEmpty
    if (!pinnedParseOk)
      System.err.println(
        "[bench] WARNING: BENCH_VARIANCE.json exists but top_variance " +
          "parsed empty — min-of-3 pass DISABLED this run (format drift?)")
    val pass3 = scala.collection.mutable.LinkedHashMap[String, Double]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) =>
        pinned.contains(name) && results.contains(name) &&
          only.forall(_.contains(name))
      }
      .foreach { case (name, fn) =>
        val streaming = name.startsWith("q_stream")
        if (streaming) envSample(name, 3)
        pass3(name) = time(materialize(fn(spark, sfDir)))
        if (streaming) streamHygiene()
      }
    pass3.foreach { case (name, t3) =>
      results(name) = math.min(results(name), t3)
    }

    // Staging prune (VERDICT r12 Next #6): a FULL sweep has touched every
    // frame any registered query references, so whatever remains under
    // _staging belongs to deregistered queries or dead sessions — delete
    // it and record what went. Subset probes never prune (they touch only
    // their members' frames).
    val (prunedN, prunedBytes) =
      if (only.isEmpty) graft.store.Staging.pruneUntouched() else (0, 0L)

    // Emit (round-7 brief): the r6 driver artifact came back
    // `parsed: null` — the single line had grown past what the driver's
    // parser keeps (131 queries × two maps ≈ 8 KB). The PRIMARY line is
    // now compact and fixed-size: total, pass totals, calibration
    // probes, the top-10 slowest queries, and a pointer to the detail
    // file that carries the full per-query seconds + shuffle-volume
    // maps. All numbers print as plain %.3f decimals (no scientific
    // notation, NaN/Inf mapped to -1) so any JSON parser takes the line.
    def j(v: Double): String =
      if (v.isNaN || v.isInfinite) "-1" else f"$v%.3f"
    val total = results.values.sum
    val writesTotal = total - pass1.keys.map(results).sum
    val p1 = writesTotal + pass1.values.sum
    val p2 = writesTotal + pass2.values.sum
    def jmap(m: Iterable[(String, Double)]): String =
      m.map { case (k, v) => "\"" + k + "\":" + j(v) }.mkString("{", ",", "}")
    // subset probes write their own detail file — BENCH_DETAIL.json is a
    // committed artifact the regression gate diffs against, and a probe
    // must not clobber it
    val detailPath = new java.io.File(
      if (only.isEmpty) "BENCH_DETAIL.json" else "BENCH_DETAIL_SUBSET.json"
    ).getAbsolutePath
    val detail =
      s"""{"metric":"total","value":${j(total)},"unit":"sec",""" +
        s""""queries":${jmap(results)},""" +
        s""""queries_pass1":${jmap(pass1)},""" +
        s""""queries_pass2":${jmap(pass2)},""" +
        s""""queries_pass3":${jmap(pass3)},""" +
        s""""variance_pinned":[${pass3.keys.map("\"" + _ + "\"").mkString(",")}],""" +
        s""""variance_parse_ok":$pinnedParseOk,""" +
        s""""shuffle_mb":${jmap(shuffleMb)},""" +
        s""""pass_totals":[${j(p1)},${j(p2)}],""" +
        s""""staging_build_s":[${stagingBuild.map(j).mkString(",")}],""" +
        s""""staging_builds_n":[${stagingCount.mkString(",")}],""" +
        s""""staging_frames":${
          graft.store.Staging.frameBuilds.sortBy(-_._2._2).map {
            case (k, (n, s, b)) =>
              "\"" + k + "\":{\"n\":" + n + ",\"s\":" + j(s) +
                ",\"mb\":" + j(b / 1e6) + "}"
          }.mkString("{", ",", "}")},""" +
        s""""staging_pruned_n":$prunedN,""" +
        s""""staging_pruned_mb":${j(prunedBytes / 1e6)},""" +
        s""""env_samples":${
          envSamples.map { e =>
            "{\"at\":\"" + e.at + "\",\"pass\":" + e.pass +
              ",\"micro_s\":" + j(e.microS) +
              ",\"code_cache_mb\":" + j(e.codeCacheMb) +
              ",\"metaspace_mb\":" + j(e.metaspaceMb) +
              ",\"gc_ms\":" + e.gcMs +
              ",\"heap_mb\":" + j(e.heapMb) + "}"
          }.mkString("[", ",", "]")},""" +
        s""""calib_cpu_s":${j(calibCpu)},"calib_fs_s":${j(calibFs)},""" +
        s""""n_queries":${results.size},"sf":"$sfDir"}"""
    java.nio.file.Files.write(
      java.nio.file.Paths.get(detailPath),
      (detail + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val top10 = results.toSeq.sortBy { case (k, v) => (-v, k) }.take(10)
    println(
      s"""{"metric":"total","value":${j(total)},"unit":"sec",""" +
        s""""queries":${jmap(top10)},""" +
        s""""pass_totals":[${j(p1)},${j(p2)}],""" +
        s""""staging_build_s":[${stagingBuild.map(j).mkString(",")}],""" +
        s""""calib_cpu_s":${j(calibCpu)},"calib_fs_s":${j(calibFs)},""" +
        s""""n_queries":${results.size},"detail_file":"$detailPath",""" +
        s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
