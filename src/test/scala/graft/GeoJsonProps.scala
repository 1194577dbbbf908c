package graft

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.operators.Flatten

/** SURVEY.md §5.1 property: ∀ generated flat observation sets,
  * flatten(nest(x)) == x — the document round-trip holds for arbitrary
  * keys, ids, property values and coordinates (not just the fixtures). */
object GeoJsonProps extends Properties("GeoJsonRoundTrip") {

  // Spark jobs per case → keep the case count bounded
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(8).withMaxSize(20)

  private val genRow: Gen[(Long, Long, String, String, Double, Double, Double)] = for {
    bucket <- Gen.choose(0L, 3L)
    fid <- Gen.choose(0L, 1000000L)
    uuid <- Gen.identifier.map(_.take(12))
    etype <- Gen.oneOf("click", "view", "gps")
    v <- Gen.choose(-1e6, 1e6)
    lon <- Gen.choose(-180.0, 180.0)
    lat <- Gen.choose(-90.0, 90.0)
  } yield (bucket, fid, uuid, etype, v, lon, lat)

  // distinct (bucket, fid): fid is the array sort key within a document
  private val genRows = Gen.listOfN(30, genRow)
    .map(_.groupBy(r => (r._1, r._2)).values.map(_.head).toList)
    .suchThat(_.nonEmpty)

  property("flatten(nest(x)) == x") = Prop.forAll(genRows) { rows =>
    val spark = SparkSpec.spark
    import spark.implicits._
    val flat = rows.toDF("bucket", "fid", "uuid", "etype", "v", "lon", "lat")
    val docs = Flatten.nest(flat, "bucket", "fid", Seq("uuid", "etype", "v"), "lon", "lat")
    val back = Flatten.flatten(docs, "bucket")
      .selectExpr("bucket", "CAST(feature_id AS BIGINT)", "uuid", "etype", "v",
        "coordinates_0", "coordinates_1")
      .as[(Long, Long, String, String, Double, Double, Double)]
      .collect().toSet
    back == rows.toSet
  }

  property("nestSalted round-trips identically") = Prop.forAll(genRows) { rows =>
    val spark = SparkSpec.spark
    import spark.implicits._
    val flat = rows.toDF("bucket", "fid", "uuid", "etype", "v", "lon", "lat")
    val docs = Flatten.nestSalted(flat, "bucket", "fid", Seq("uuid", "etype", "v"),
      "lon", "lat", saltBuckets = 3)
    val back = Flatten.flatten(docs, "bucket")
      .selectExpr("bucket", "CAST(feature_id AS BIGINT)", "uuid", "etype", "v",
        "coordinates_0", "coordinates_1")
      .as[(Long, Long, String, String, Double, Double, Double)]
      .collect().toSet
    back == rows.toSet
  }
}
