package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Mirrored-file binary scan (SURVEY.md S6).
  *
  * The reference lists a dbGaP FTP directory, filters filenames
  * (`data_dict`/`GapExchange`), and downloads each over HTTPS
  * (get_dbgap_data_dicts.py:46-136). With files mirrored to any
  * Hadoop-visible store, that becomes a declarative `binaryFile` scan:
  * listing = file index, filename filter = predicate on `path`, download =
  * the scan itself (parallel per file, retried by the task scheduler
  * instead of the reference's manual reconnect loop).
  */
object BinaryDocSource {

  /** Recursive binary scan: rows of (path, modificationTime, length,
    * content). */
  def read(spark: SparkSession, root: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .option("recursiveFileLookup", "true")
      .load(root)

  /** Filename-substring filter (`'data_dict' in ftp_filename`). */
  def filterFilenames(df: DataFrame, substr: String): DataFrame =
    df.filter(col("path").contains(substr))

  /** Latest-file pick per directory (W3: `find | sort -r | head -1`). */
  def latestPerDir(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dir = regexp_extract(col("path"), "^(.*)/[^/]+$", 1)
    val w = Window.partitionBy(dir).orderBy(col("path").desc)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1).drop("_rn")
  }
}
