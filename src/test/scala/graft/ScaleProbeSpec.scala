package graft

import org.apache.spark.sql.functions._

/** Guards the expfit replica factories' fact axes (ADVICE r14): the
  * per-copy name bijection must be injective ACROSS all 25 copies, or
  * the q_fuzzy_join2 25x point self-joins cross-copy edit-distance-0
  * pairs and the fitted exponent reads superlinear. The r14 digit-only
  * scheme (shift 3·i mod 10) had period 10 — copies {0,10,20} drew
  * identical c_name sets. */
class ScaleProbeSpec extends SparkSpec {

  test("ensureUniqueFactTables: c_name sets are disjoint across 25 copies") {
    val base = "/root/testdata/sf0.001"
    val out = "target/graft_test/unique25"
    ScaleProbe.ensureUniqueFactTables(spark, base, out, copies = 25)

    val cust = spark.read.parquet(s"$out/customer.parquet")
      .select(col("c_custkey"), col("c_name"),
        (col("c_custkey") / 10000000L).cast("long").as("copy"))

    val baseNames = spark.read.parquet(s"$base/customer.parquet")
      .select(countDistinct(col("c_name"))).head.getLong(0)
    val perCopy = cust.groupBy(col("copy"))
      .agg(countDistinct(col("c_name")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perCopy.keySet == (0L until 25L).toSet)
    perCopy.values.foreach(n => assert(n == baseNames))

    // injectivity across copies: the union of 25 per-copy name sets has
    // full cardinality iff no two copies share a single name
    val totalDistinct =
      cust.select(countDistinct(col("c_name"))).head.getLong(0)
    assert(totalDistinct == 25 * baseNames,
      s"cross-copy c_name collision: $totalDistinct != ${25 * baseNames}")

    // the probe threshold is edit distance <= 2: sampled cross-copy
    // pairs from the previously-colliding copies {0,10,20} must all sit
    // strictly beyond it (the lowercase rotation rewrites all seven
    // letter positions, so ed >= 7 in theory; assert > 2)
    val sample = cust.filter(col("copy").isin(0L, 10L, 20L))
      .filter(pmod(col("c_custkey"), lit(10000000L)) < 30)
      .select(col("copy"), col("c_name"))
    val minEd = sample.as("a").join(sample.as("b"),
        col("a.copy") < col("b.copy"))
      .select(min(levenshtein(col("a.c_name"), col("b.c_name"))))
      .head.getInt(0)
    assert(minEd > 2, s"cross-copy names within ed-2: min ed = $minEd")
  }
}
