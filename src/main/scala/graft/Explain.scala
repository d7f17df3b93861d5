package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: prints the formatted physical plan of each query
  * (usage: Explain [sfDir] [queryName...]) — the dev loop for checking
  * pushdown (PushedFilters/ReadSchema), join strategy (Broadcast vs SMJ),
  * and WholeStageCodegen coverage before a query is called done.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // defensive: a TIMESTAMP(NANOS) fixture reads as epoch-nano LONG
      // (Tables.eventMicros normalizes); no effect on MICROS files
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // AQE coalescing targets shuffle BYTES and is blind to
      // downstream CPU: per-row kernel projections above a small
      // range shuffle would serialize onto 1-6 post-shuffle
      // partitions (q81: 1.53 -> 0.67 s at sf0.1 with the floor
      // lowered). 64k is the measured sweet spot: 16k also kept
      // CEL kernels parallel but cost q19_pivot +0.6 s in sheer
      // task overhead on its many sub-64k partitions. Large
      // shuffles are unaffected either way.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n===== $n =====")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
