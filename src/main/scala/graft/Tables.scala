package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** One registered engine operation: a Spark query plus (optionally) the
  * equivalent ANSI SQL the driver runs in DuckDB over the same parquet
  * tables. Column names/types and row ordering must match exactly — the
  * driver sorts columns by name then hashes values.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
)

/** Parquet table loading for the driver-generated star schema
  * (see TESTDATA.md / FIXTURES.md). Every query receives the sf dir at
  * call time, so nothing is cached across scale factors.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = t(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = t(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = t(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = t(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = t(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = t(s, d, "lineitem")
  /** The driver-generated events.parquet stores `ts` as INT64
    * TIMESTAMP(NANOS), which Spark 4 refuses to read as a timestamp
    * ([PARQUET_TYPE_ILLEGAL]). Read it as a long (legacy nanosAsLong) and
    * convert to a micros TimestampType with integer division — the fixture
    * values are µs-aligned (verified: epoch_ns % 1000 == 0 for every row),
    * so the conversion is lossless and DuckDB (which reads the same file
    * as TIMESTAMP_NS) sees identical instants.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    // Set once per session (idempotent, so concurrent readers never see a
    // conf flip mid-plan; the flag only affects how the scan infers the
    // nanos column, and every events reader wants the same inference).
    if (s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true")
      s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    t(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame =
    t(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    t(s, d, "embeddings")
}
