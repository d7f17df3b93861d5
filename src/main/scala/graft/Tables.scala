package graft

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, expr, unix_micros}
import org.apache.spark.sql.types.{LongType, TimestampNTZType}

/** Typed accessors for the driver-generated parquet tables
  * (see TESTDATA.md). All reads go through here so partition/pushdown
  * tuning has a single seam.
  *
  * Scale note: at 100 TB these would be partitioned/bucketed tables in a
  * catalog; `spark.read.parquet(dir)` keeps the same declarative plan
  * shape (parquet scan + Catalyst pushdown), so nothing here changes
  * except the path and `maxPartitionBytes`.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def t(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region: DataFrame     = t("region")
  def nation: DataFrame     = t("nation")
  def customer: DataFrame   = t("customer")
  def supplier: DataFrame   = t("supplier")
  def part: DataFrame       = t("part")
  def orders: DataFrame     = t("orders")
  def lineitem: DataFrame   = t("lineitem")
  def events: DataFrame     = t("events")
  def documents: DataFrame  = t("documents")
  def embeddings: DataFrame = t("embeddings")
}

object Tables {
  /** `events.ts` as an epoch-microsecond LONG, whatever dtype the
    * fixture carries. The driver has shipped the column both as parquet
    * TIMESTAMP(NANOS) (read as epoch-nano BIGINT under the legacy
    * nanosAsLong flag) and, since the 2026-08 refresh, as
    * TIMESTAMP_MICROS (read as TIMESTAMP_NTZ) — so the conversion
    * dispatches on the bound schema instead of assuming either. The
    * BIGINT path stays integer arithmetic (`DIV`): a double division
    * would lose precision above 2^53 ns. The NTZ->timestamp cast is the
    * identity under the project-wide UTC session timezone, matching the
    * DuckDB oracles' `CAST(ts AS TIMESTAMP)` / `epoch_us` reading. */
  def eventMicros(events: Dataset[_]): Column =
    events.schema("ts").dataType match {
      case LongType         => expr("ts DIV 1000")
      case TimestampNTZType => unix_micros(col("ts").cast("timestamp"))
      case _                => unix_micros(col("ts"))
    }
}
