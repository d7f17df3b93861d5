package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  /** Dump each query's result to `outDir/<name>` parquet. A query that
    * throws (analysis or runtime) writes `outDir/<name>.err` with the
    * message instead, so a failure can never silently vanish from the
    * correctness report — every key yields either output or an explicit
    * error artifact (asserted by VerifyArtifactSpec). Returns the
    * failed names. */
  def dump(spark: SparkSession, sfDir: String, outDir: String,
      queries: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame])
      : Seq[String] =
    queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        Files.deleteIfExists(Paths.get(s"$outDir/$name.err")) // stale marker
        None
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        Files.writeString(Paths.get(s"$outDir/$name.err"),
          s"${e.getClass.getName}: ${e.getMessage}\n")
        Some(name)
      } finally
        // a query's eager checkpoints are dead once its write returns;
        // without this the blocks pinned storage for the JVM lifetime
        // (r16 checkpoint lifecycle — see graft.Checkpoints)
        Checkpoints.releaseAll()
    }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // Defensive: fixtures have shipped events.ts as both
      // TIMESTAMP(NANOS) and TIMESTAMP_MICROS. Spark has no nanos
      // timestamp type and errors on NANOS parquet without this flag;
      // with it, a nanos column reads as epoch-nano LONG, which
      // Tables.eventMicros normalizes. No effect on MICROS files.
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
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=<regex> restricts the dump for focused dev
    // iteration with tools/check.py (same knob as Bench); the driver
    // sets no filter and always dumps everything.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.r)
    val failed = dump(spark, sfDir, outDir,
      SparkEntry.queries
        .filter { case (name, _) => only.forall(_.findFirstIn(name).isDefined) })
    if (failed.nonEmpty)
      System.err.println(
        s"[verify] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
