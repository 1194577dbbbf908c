package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GeoJSON flatten / unflatten as declarative plans.
  *
  * flatten = explode + nested-field projection (the reference's per-feature
  * Python loop, /root/reference/stores/apache_parquet.py:28-44); nest = the
  * exact inverse (reconstruction, /root/reference/stores/apache_parquet.py:119-137,
  * /root/reference/stores/postgresql_json_agg_store.py:77-100) via
  * struct + sort_array(collect_list).
  *
  * Scale notes: flatten is shuffle-free (a generator inside whole-stage
  * codegen); nest shuffles once on the document key — exactly the grouping
  * any row→document reassembly needs. `collect_list` is non-deterministic in
  * arrival order, so we always `sort_array` by a caller-provided sort key
  * (SURVEY.md §7 risk note).
  */
object Flatten {

  /** documents(keyCol, features: Array[Feature]) → one row per feature with
    * properties.* and lon/lat columns. */
  def flatten(docs: DataFrame, keyCol: String = "timestamp"): DataFrame =
    docs
      .select(col(keyCol), explode(col("features")).as("f"))
      .select(
        col(keyCol),
        col("f.id").as("feature_id"),
        col("f.properties.*"),
        col("f.geometry.coordinates").getItem(0).as("coordinates_0"),
        col("f.geometry.coordinates").getItem(1).as("coordinates_1"))

  private def featureStruct(
      idCol: String, propCols: Seq[String], lonCol: String, latCol: String): Column = struct(
    lit("Feature").as("type"),
    col(idCol).cast("string").as("id"),
    struct(propCols.map(col): _*).as("properties"),
    struct(
      lit("Point").as("type"),
      array(col(lonCol), col(latCol)).as("coordinates")).as("geometry"))

  /** Inverse: flat rows → one FeatureCollection row per key.
    *
    * @param idCol    feature id; also the deterministic sort key inside the
    *                 features array
    * @param propCols columns folded into `properties`
    */
  def nest(
      flat: DataFrame,
      keyCol: String,
      idCol: String,
      propCols: Seq[String],
      lonCol: String,
      latCol: String): DataFrame =
    flat
      .groupBy(col(keyCol))
      // sort_array orders struct elements lexicographically field-by-field,
      // so a leading sort-key field gives a total, deterministic order.
      .agg(sort_array(collect_list(struct(col(idCol).as("_sk"),
        featureStruct(idCol, propCols, lonCol, latCol).as("f")))).as("_sf"))
      .select(
        col(keyCol),
        lit("FeatureCollection").as("type"),
        transform(col("_sf"), x => x.getField("f")).as("features"))

  /** Skew-safe two-phase nest: a hot key (one giant hour of observations)
    * would otherwise build its whole features array in ONE task. Phase 1
    * builds partial arrays per (key, salt) — bounding any single task's
    * array to ~1/saltBuckets of the key's rows and distributing the struct
    * construction; phase 2 concatenates the pre-built partials and sorts
    * once. Output ≡ nest (same deterministic order). */
  def nestSalted(
      flat: DataFrame,
      keyCol: String,
      idCol: String,
      propCols: Seq[String],
      lonCol: String,
      latCol: String,
      saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(idCol)), lit(saltBuckets))
    flat
      .groupBy(col(keyCol), salt.as("_salt"))
      .agg(collect_list(struct(col(idCol).as("_sk"),
        featureStruct(idCol, propCols, lonCol, latCol).as("f"))).as("_pf"))
      .groupBy(col(keyCol))
      .agg(sort_array(org.apache.spark.sql.functions.flatten(collect_list(col("_pf")))).as("_sf"))
      .select(
        col(keyCol),
        lit("FeatureCollection").as("type"),
        transform(col("_sf"), x => x.getField("f")).as("features"))
  }

  /** Render a nested FeatureCollection row to a GeoJSON string (the
    * document form the reference hands back,
    * /root/reference/stores/postgresql_json_agg_store.py:77-100). */
  def toGeoJson(nested: DataFrame): DataFrame =
    nested.withColumn("geojson", to_json(struct(col("type"), col("features"))))
}
