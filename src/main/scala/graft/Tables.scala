package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated test tables (TESTDATA.md).
  *
  * Each table is a single parquet file under the scale-factor dir. At
  * 100 TB these would be multi-file partitioned datasets; everything
  * downstream reads via these helpers so the storage layout can change
  * in one place (e.g. to a partitioned/bucketed lake written by
  * [[graft.operators.IngestPipeline]]).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
      // Spark 4 rejects at the type level — read nanos as long, truncate
      // to micros) and plain TIMESTAMP(MICROS) (which Spark reads as
      // TIMESTAMP_NTZ). Normalize BOTH to a session-TZ TimestampType
      // micros column: the session TZ is UTC (Sessions.scala), so the
      // NTZ→LTZ cast is value-identity and downstream code sees one type
      // regardless of which generator wrote the file.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr}
      import org.apache.spark.sql.types.{LongType, TimestampType}
      val ts = raw.schema("ts").dataType match {
        case LongType => expr("timestamp_micros(ts div 1000)")
        case _        => col("ts").cast(TimestampType)
      }
      raw.withColumn("ts", ts)
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    } else {
      spark.read.parquet(s"$sfDir/$name.parquet")
    }

  /** Width of the `embeddings.parquet` vector column (64 at every driver
    * scale factor). Callers pass this to the dedup/ANN operators so no
    * driver-side `first()` probe is needed to discover the dimension.
    */
  val embeddingDims: Int = 64

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Register every table as a temp view so `spark.sql` corpora can run. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    all.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
