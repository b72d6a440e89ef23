package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Schema'd loaders for the driver-generated parquet tables.
  *
  * All graft operators are `DataFrame => DataFrame` transforms; this is the
  * single place that touches storage paths, so predicate pushdown / column
  * pruning reach the parquet scan untouched.
  */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Driver parquet writes plain `timestamp[us]` (no timezone marker), which
    * Spark 4 infers as TIMESTAMP_NTZ by default. NTZ breaks `unix_micros` /
    * bigint casts and diverges from DuckDB's naive-timestamp epoch
    * semantics; reading as TimestampType under a UTC session keeps
    * `unix_micros(ts)` equal to the stored micros value on both engines.
    * Session-level conf set idempotently (consulted at scan planning), and
    * done at the reader so `ts` predicates still push down — a per-column
    * cast here would block pushdown.
    */
  private def tzSafe(spark: SparkSession): SparkSession = {
    if (spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled", "true") != "false")
      spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    spark
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    tzSafe(spark).read.parquet(s"$dir/$name.parquet")

  /** Parquet reader tolerant of TIMESTAMP(NANOS) columns (which Spark's
    * reader rejects outright): reads nanos as long, then rebuilds the
    * microsecond timestamp for columns named in `nanosCols` using integer
    * arithmetic (`div` — a double division would lose precision above
    * 2^53 ns). The nanos→long conversion drops the logical-type marker,
    * so callers name the affected columns (for the driver tables that is
    * `events.ts`).
    */
  def readParquet(spark: SparkSession, path: String,
                  nanosCols: Seq[String] = Seq("ts")): DataFrame = {
    // nanosAsLong is a session-level SQLConf with no per-read option, and
    // the scan consults it again at execution time — so it cannot be
    // save/restored around the read. Set idempotently; the flag only
    // affects tables that actually carry TIMESTAMP(NANOS) columns.
    if (spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    var df = tzSafe(spark).read.parquet(path)
    df.schema.fields.foreach { f =>
      if (nanosCols.contains(f.name) &&
          f.dataType == org.apache.spark.sql.types.LongType)
        df = df.withColumn(f.name,
          org.apache.spark.sql.functions.expr(s"timestamp_micros(`${f.name}` div 1000)"))
    }
    df
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  /** `events.ts` is written as parquet TIMESTAMP(NANOS) — see readParquet. */
  def events(spark: SparkSession, dir: String): DataFrame =
    readParquet(spark, s"$dir/events.parquet")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
