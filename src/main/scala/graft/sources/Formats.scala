package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink format surface beyond parquet (SURVEY §2.B scans/sinks):
  * json (the ingest wire format), csv (interchange), orc (the second
  * columnar format in this Spark build). All builtin DataSourceV1/V2
  * readers — the value here is one consistent entry point with the
  * options that matter set correctly (header/schema handling, snappy
  * columnar compression), plus the format round-trip contract in
  * FormatsSpec.
  */
object Formats {

  val supported: Seq[String] = Seq("parquet", "orc", "json", "csv")

  def read(spark: SparkSession, path: String, format: String,
      schema: Option[StructType] = None): DataFrame = {
    require(supported.contains(format), s"unsupported format $format")
    val r0 = spark.read.format(format)
    val r1 = schema.map(r0.schema).getOrElse(r0)
    format match {
      case "csv" => r1.option("header", true)
        .option("inferSchema", schema.isEmpty).load(path)
      case _ => r1.load(path)
    }
  }

  def write(df: DataFrame, path: String, format: String,
      mode: SaveMode = SaveMode.Overwrite): Unit = {
    require(supported.contains(format), s"unsupported format $format")
    val w = df.write.format(format).mode(mode)
    format match {
      case "csv" => w.option("header", true).save(path)
      case "parquet" | "orc" => w.option("compression", "snappy").save(path)
      case _ => w.save(path)
    }
  }
}
