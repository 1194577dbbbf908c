package graft.model

import org.apache.spark.sql.types._

/** Canonical schemas for the time-keyed GeoJSON document stream.
  *
  * Mirrors the reference's record shape (see SURVEY.md §1.2; authoritative
  * flatten code: /root/reference/stores/apache_parquet.py:28-59) as explicit
  * Spark StructTypes — never inferred on the hot path (§1.6).
  */
object Schemas {

  /** geometry: {type: "Point", coordinates: [lon, lat]} */
  val geometry: StructType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("coordinates", ArrayType(DoubleType, containsNull = false))
  ))

  /** properties of one vehicle observation
    * (/root/reference/stores/apache_parquet.py:45-59). `direction` is kept in
    * decoded {1,2} form here; the bool encoding is an explicit operator
    * (graft.operators.Encodings). */
  val properties: StructType = StructType(Seq(
    StructField("uuid", StringType),
    StructField("id", IntegerType),
    StructField("color", StringType),
    StructField("direction", IntegerType),
    StructField("distance", FloatType),
    StructField("distanceFromPoint", IntegerType),
    StructField("lineId", StringType),
    StructField("pointId", IntegerType)
  ))

  val feature: StructType = StructType(Seq(
    StructField("type", StringType, nullable = false),
    StructField("id", StringType),
    StructField("properties", properties),
    StructField("geometry", geometry)
  ))

  /** One document = one FeatureCollection snapshot, keyed by `timestamp`
    * (ISO-8601 string key at the file layer, TimestampType inside the
    * engine; /root/reference/get_data.py:26). */
  val featureCollection: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("ts_str", StringType), // exact key round-trip (SURVEY.md §7)
    StructField("type", StringType, nullable = false),
    StructField("features", ArrayType(feature, containsNull = false))
  ))

  /** The STORED flat form as the reference's pyarrow schema pins it
    * (/root/reference/stores/apache_parquet.py:45-59), same field ORDER:
    * leading ISO-string `timestamp` key, int64 `id`, `direction` as bool
    * (encoded `direction - 1`, :35), float32 `distance` and coordinates,
    * and the `uuidx` duplicate of uuid kept last for fidelity (:41,57).
    * One deliberate divergence: the reference's uint16
    * `distanceFromPoint` (:53) becomes int32 — Spark/parquet-mr has no
    * unsigned types; the [0, 65535] domain is asserted in GeoJsonSpec.
    * q_geojson_canonical round-trips this schema through nest → flatten
    * → parquet → read-back; GeoJsonSpec asserts the written file carries
    * these exact physical types. */
  val flatStored: StructType = StructType(Seq(
    StructField("timestamp", StringType),
    StructField("uuid", StringType),
    StructField("id", LongType),
    StructField("color", StringType),
    StructField("direction", BooleanType),
    StructField("distance", FloatType),
    StructField("distanceFromPoint", IntegerType),
    StructField("lineId", StringType),
    StructField("coordinates_0", FloatType),
    StructField("coordinates_1", FloatType),
    StructField("uuidx", StringType)
  ))

  /** Snapshot-major flat row (SURVEY.md §1.2 superset). */
  val flatObs: StructType = StructType(Seq(
    StructField("timestamp", TimestampType),
    StructField("uuid", StringType),
    StructField("id", IntegerType),
    StructField("color", StringType),
    StructField("direction", IntegerType),
    StructField("distance", FloatType),
    StructField("distanceFromPoint", IntegerType),
    StructField("lineId", StringType),
    StructField("pointId", IntegerType),
    StructField("coordinates_0", DoubleType),
    StructField("coordinates_1", DoubleType)
  ))
}

/** Typed views for Dataset[T] paths. */
case class GeoPoint(`type`: String, coordinates: Seq[Double])
case class ObsProperties(
    uuid: String, id: Int, color: String, direction: Int,
    distance: Float, distanceFromPoint: Int, lineId: String, pointId: Int)
case class GeoFeature(
    `type`: String, id: String, properties: ObsProperties, geometry: GeoPoint)
case class FeatureCollection(
    timestamp: java.sql.Timestamp, ts_str: String, `type`: String,
    features: Seq[GeoFeature])

/** One instant of a temporal property: MobilityDB `v@t`
  * (/root/reference/stores/mobility_db_batch.py:104-120) modeled as a
  * struct; a trajectory is a time-sorted array of these. */
case class Instant[T](t: java.sql.Timestamp, v: T)
