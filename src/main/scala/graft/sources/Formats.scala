package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Source/sink layer beyond the test harness's parquet: uniform write/read
 * over the columnar (parquet, orc), row-binary (avro — this Spark build
 * bundles the avro connector in spark-sql, probed in IoSpec), and text
 * (csv, json, xml — rowTag=row) formats, plus hive-style partitioned
 * writes.
 *
 * plankton pipelines load/extract through arbitrary task code (SURVEY.md
 * §1a); the engine equivalent is Spark's DataSource API, so this layer is
 * deliberately thin — option plumbing and schema round-trip rules, not a
 * custom connector:
 *  - text formats carry no schema → reads take an explicit StructType
 *    (inference is a second full scan and type-lossy);
 *  - timestamps round-trip via an explicit ISO micros pattern on both
 *    write and read so csv/json don't truncate precision;
 *  - partitioned writes produce hive-style dirs; readers get partition
 *    pruning from Catalyst (asserted in IoSpec), which at 100 TB is the
 *    difference between a full scan and touching one date directory.
 */
object Formats {

  val TsPattern = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  private def optionsFor(format: String): Map[String, String] = format match {
    case "csv" => Map("header" -> "true", "timestampFormat" -> TsPattern)
    case "json" => Map("timestampFormat" -> TsPattern)
    case "xml" => Map("rowTag" -> "row", "timestampFormat" -> TsPattern)
    case _ => Map.empty
  }

  /** This Spark build compiles the avro connector INTO spark-sql but
    * omits it from the DataSourceRegister service file, so the "avro"
    * shortname fails lookup ("external data source module since 2.4")
    * while the provider class itself is present and functional — resolve
    * by class name (probed by IoSpec's round-trip). */
  private def providerFor(format: String): String = format match {
    case "avro" => "org.apache.spark.sql.avro.AvroFileFormat"
    case other => other
  }

  def write(df: DataFrame, path: String, format: String,
            partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format(providerFor(format))
      .options(optionsFor(format))
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  def read(spark: SparkSession, path: String, format: String,
           schema: Option[StructType] = None): DataFrame = {
    val r = spark.read.format(providerFor(format)).options(optionsFor(format))
    schema.fold(r)(r.schema).load(path)
  }
}
