package graft

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.store.SnapshotStore

/** Physical-schema pinning for the canonical stored form
  * (/root/reference/stores/apache_parquet.py:45-59): the written parquet
  * FILE (not the partitioned-dir view) must carry string timestamp, int64
  * id, bool direction, float32 distance/coordinates, trailing uuidx — in
  * the reference's field order. */
class GeoJsonSpec extends SparkSpec {

  private def runCanonical() =
    SparkEntry.registry.find(_.name == "q_geojson_canonical").get
      .run(spark, "/root/testdata/sf0.001")

  test("q_geojson_canonical writes the reference's exact physical parquet types") {
    val out = runCanonical()
    assert(out.count() > 0)

    // read ONE data file directly so the file's own schema is asserted
    val root = new java.io.File(s"${SnapshotStore.root}/geojson_sf0.001")
    val dataFile = root.listFiles().filter(_.getName.startsWith("tbucket="))
      .head.listFiles().filter(_.getName.endsWith(".parquet")).head
    val fileSchema = spark.read.parquet(dataFile.getAbsolutePath).schema
    assert(fileSchema.fields.toSeq.map(f => (f.name, f.dataType)) ==
      Schemas.flatStored.fields.toSeq.map(f => (f.name, f.dataType)),
      s"file schema $fileSchema diverges from the reference pyarrow schema")

    // documented uint16 → int32 divergence: the domain must still fit
    val mm = out.agg(min(col("distanceFromPoint")).as("lo"),
      max(col("distanceFromPoint")).as("hi")).head()
    assert(mm.getInt(0) >= 0 && mm.getInt(1) <= 65535)
  }

  test("canonical round-trip preserves the key format and the uuidx dup") {
    val out = runCanonical()
    assert(out.filter(col("uuidx") =!= col("uuid")).count() == 0)
    assert(out.filter(
      !col("timestamp").rlike("^\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2}$")).count() == 0)
  }
}
