package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

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
