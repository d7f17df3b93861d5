package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File/dir source helpers mirroring the reference's file library
  * (/root/reference/lib/file.go): `file(path)` -> bytes,
  * `file(path, mime)` -> transformed, `dir(path)` -> listing maps
  * (:160-189).
  *
  * Spark-first: file contents come through the binaryFile source (spread
  * across executors, splittable listing), mime-typed reads map to the
  * corresponding DataFrameReader format, and in-row payload decode uses
  * [[graft.functions]] (gunzip/zip_expand/csv_header/ndjson_docs).
  */
object Files {

  /** file(path) — one row per file: (path, mod_time, length, content).
    * Uses the binaryFile source so a glob over millions of files scales
    * out instead of reading on the driver (file.go reads one file in
    * memory, :191-201). */
  def file(spark: SparkSession, pathGlob: String): DataFrame =
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("modificationTime").as("mod_time"),
        col("length"), col("content"))

  /** file(path, mimetype) — reference readMIMEFile (:203-253). */
  def fileMime(spark: SparkSession, pathGlob: String, mime: String): DataFrame = mime match {
    case "text/csv; header=present" =>
      spark.read.option("header", "true").csv(pathGlob)
    case "text/csv; header=absent" =>
      spark.read.option("header", "false").csv(pathGlob)
    case "application/x-ndjson" =>
      // PERMISSIVE corrupt-record capture = the reference's in-band
      // per-line error values (mime.go:302-306)
      spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "__error__").json(pathGlob)
    case "application/gzip" =>
      file(spark, pathGlob).withColumn("content", graft.functions.gunzip(col("content")))
    case "application/zip" =>
      file(spark, pathGlob)
        .select(col("path"), explode(graft.functions.zip_expand(col("content"))).as("member"))
        .select(col("path"), col("member.Name").as("name"), col("member.Size").as("size"),
          col("member.Modified").as("modified"), col("member.Data").as("data"))
    case other => throw new IllegalArgumentException(s"unsupported mime type: $other")
  }

  /** dir(path) — listing as rows (file.go:160-189: name, is_dir, size,
    * mod_time). Driver-side metadata op (like the reference), returning
    * a small DataFrame. */
  def dir(spark: SparkSession, path: String): DataFrame = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statuses = fs.listStatus(new Path(path)).toSeq.map { st =>
      (st.getPath.getName, st.isDirectory, st.getLen,
        new java.sql.Timestamp(st.getModificationTime))
    }
    import spark.implicits._
    statuses.toDF("name", "is_dir", "size", "mod_time").orderBy("name")
  }
}
