package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The Verify-side guard that keeps the q58 bug class out: any
  * registered query whose output schema carries a raw TimestampType —
  * top-level or nested — must be rejected before its parquet dump can
  * silently hash-mismatch the naive-timestamp oracle. Additionally
  * sweeps every registered oracle-gated query's STATIC column naming
  * cannot be checked here (schemas need execution), so the guard's type
  * walk is what this spec pins. */
class VerifyGuardSpec extends AnyFunSuite {

  test("raw TimestampType is flagged at any nesting depth") {
    val bad = StructType(Seq(
      StructField("ok", StringType),
      StructField("t", TimestampType),
      StructField("arr", ArrayType(TimestampType)),
      StructField("st", StructType(Seq(StructField("in", TimestampType)))),
      StructField("mp", MapType(StringType, TimestampType))))
    assert(Verify.rawTimestampColumns(bad) == Seq("t", "arr", "st", "mp"))
  }

  test("string-formatted timestamps and other types pass") {
    val good = StructType(Seq(
      StructField("window_start", StringType),
      StructField("d", DateType),
      StructField("n", LongType),
      StructField("v", DoubleType)))
    assert(Verify.rawTimestampColumns(good).isEmpty)
  }
}
