package graft.sources

import java.util.{Map => JMap}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{Table, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.execution.datasources.v2.parquet.ParquetTable
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** `spark.read.format("graftdelta")` — [[graft.store.DeltaLogStore]]'s
  * transaction-log reader as a first-class Catalyst DataSourceV2 source
  * (VERDICT r12 Next #5), matching the reference's API shape
  * (`delta_lake.py:35-40`: `spark.read.format("delta")` with
  * `versionAsOf`).
  *
  * Options: `path` (the table root — also the `.load(path)` argument),
  * `versionAsOf` (optional; default = latest version).
  *
  * Design: the LOG layer resolves the live file set (checkpoint-aware,
  * file-metadata-sized); the DATA plane is Spark's own V2
  * [[ParquetTable]] over exactly those files. That split is the whole
  * point — filter pushdown, column pruning, vectorized reading and
  * partition planning are the stock parquet scan's, untouched by the
  * log layer (the plan shows `PushedFilters` on a parquet scan, asserted
  * in StoreSpec), and this source adds zero per-row code. Real Delta
  * readers are built exactly this way: snapshot resolution in front of
  * the format's native scan. */
class GraftDeltaSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graftdelta"

  // schema comes from the resolved snapshot's parquet footers, never
  // from the user (a mismatching user schema would silently corrupt
  // column pruning against the checkpointed metaData)
  override def supportsExternalMetadata(): Boolean = false

  private def parquetTable(options: CaseInsensitiveStringMap): ParquetTable = {
    val tablePath = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graftdelta requires a table path: spark.read.format(\"graftdelta\").load(path)"))
    val spark = SparkSession.active
    val asOf = Option(options.get("versionAsOf")).map(_.toLong)
    // bounded driver-side collect: file METADATA (the same cardinality
    // every parquet scan's driver file listing carries)
    val files = graft.store.DeltaLogStore
      .snapshotFiles(spark, tablePath, asOf)
      .select("path").collect().map(r => s"$tablePath/${r.getString(0)}")
    require(files.nonEmpty,
      s"empty graftdelta snapshot for $tablePath at version $asOf")
    ParquetTable(
      s"graftdelta $tablePath${asOf.map(v => s"@v$v").getOrElse("")}",
      spark,
      options,
      files.toIndexedSeq,
      None,
      classOf[ParquetFileFormat])
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    parquetTable(options).schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    parquetTable(new CaseInsensitiveStringMap(properties))
}
