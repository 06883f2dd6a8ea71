package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dug catalog listing lifecycle (SURVEY.md S11): the downloaded
  * search-program JSON → sorted TSV report with a header row and the
  * placeholder-CDE exclusion.
  *
  * Ref: scripts/dug/get_dug_data_dictionaries.sh:17-19 — jq selects
  * (collection_id, collection_name, collection_action) from `.result`,
  * sorts by collection_id, renders `@tsv` (header first), and
  * `grep -v '^\tCDE\t$'` drops the placeholder row whose rendered line is
  * exactly empty-id TAB "CDE" TAB empty-action.
  */
object DugIngest {

  /** Read side: one downloaded JSON document (`{"result": [...]}`), so
    * multiLine mode — this is a single-doc metadata fetch, not JSON-lines. */
  def readProgramList(spark: SparkSession, jsonPath: String): DataFrame =
    spark.read.option("multiLine", "true").json(jsonPath)
      .select(explode(col("result")).as("r"))
      .select(col("r.collection_id").cast("string").as("collection_id"),
        col("r.collection_name").cast("string").as("collection_name"),
        col("r.collection_action").cast("string").as("collection_action"))

  /** jq `@tsv` value escaping: backslash, tab, newline, CR. Nulls render
    * as empty fields (jq's `null | @text` inside @tsv is ""). */
  private def tsvEscape(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      coalesce(c, lit("")),
      "\\\\", "\\\\\\\\"), "\t", "\\\\t"), "\n", "\\\\n"), "\r", "\\\\r")

  /** Rendered TSV line per collection row. */
  private def tsvLine(): org.apache.spark.sql.Column =
    concat_ws("\t", tsvEscape(col("collection_id")),
      tsvEscape(col("collection_name")), tsvEscape(col("collection_action")))

  /** The report rows that survive the CDE exclusion, in collection_id
    * order, with their rendered TSV line. The filter matches the
    * reference's grep EXACTLY: it excludes on the rendered line, not on
    * field predicates (so a row with id="" name="CDE" action=""
    * disappears, but id="x" name="CDE" stays). */
  def toReport(list: DataFrame): DataFrame =
    list.withColumn("line", tsvLine())
      .filter(col("line") =!= "\tCDE\t")
      .orderBy(col("collection_id"))

  /** Write `list.tsv`: header line + sorted data lines, one file. The
    * report is metadata-scale (a catalog listing), so a single text file
    * is the faithful and appropriate sink. */
  def writeTsv(report: DataFrame, path: String): Unit = {
    val spark = report.sparkSession
    val header = spark.range(1).select(lit(0).as("ord"), lit("").as("k"),
      lit("collection_id\tcollection_name\tcollection_action").as("line"))
    val lines = report.select(lit(1).as("ord"),
      coalesce(col("collection_id"), lit("")).as("k"), col("line"))
    header.unionByName(lines)
      .coalesce(1).sortWithinPartitions(col("ord"), col("k"))
      .select("line")
      .write.mode("overwrite").text(path)
  }

  case class Result(report: DataFrame)

  /** Full lifecycle: read list.json → CDE-filtered sorted report → TSV. */
  def run(spark: SparkSession, jsonPath: String, outDir: String): Result = {
    val report = toReport(readProgramList(spark, jsonPath))
    writeTsv(report, s"$outDir/list_tsv")
    Result(report)
  }
}
