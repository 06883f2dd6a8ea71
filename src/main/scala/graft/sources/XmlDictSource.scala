package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** dbGaP data-dictionary XML scan (SURVEY.md S7/S9) on Spark 4's built-in
  * XML source. Replaces the reference's ElementTree walk
  * (generate_lakefs_dbgap_xml_index.py:110-180) with a declarative scan:
  * attributes surface as `_attr` columns, child elements as nested
  * structs/arrays.
  */
object XmlDictSource {

  /** Recursive scan of `*.xml` under `root`, one row per data_table
    * (S9's recursive listing + S7's parse in one declarative read). */
  def readDataTables(spark: SparkSession, root: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "data_table")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.xml")
      .load(root)
      .withColumn("filepath", input_file_name())

  /** Flatten data tables → one row per variable with its values nested
    * (the Study→Section→Variable→Value hierarchy of the reference's index
    * dataclasses, generate_lakefs_dbgap_xml_index.py:45-74). */
  def variables(dataTables: DataFrame): DataFrame = {
    val dt = dataTables
    // a single <variable> child infers as a struct, many as an array —
    // normalize to array so downstream is shape-independent
    val varsCol = dt.schema.find(_.name == "variable").map(_.dataType) match {
      case Some(_: org.apache.spark.sql.types.ArrayType) => col("variable")
      case Some(_) => array(col("variable"))
      case None => lit(null).cast("array<struct<_id:string>>")
    }
    dt.select(
        col("_id").as("dt_id"),
        col("_study_id").as("study_id"),
        col("filepath"),
        posexplode_outer(varsCol).as(Seq("pos", "v")))
      .select(col("dt_id"), col("study_id"), col("filepath"), col("pos"),
        col("v._id").as("var_id"),
        vField(dt, "name"), vField(dt, "description"), vField(dt, "type"))
  }

  /** GapExchange study-frame scan (S7 companion document). */
  def readGapExchange(spark: SparkSession, root: String): DataFrame =
    spark.read.format("xml")
      .option("rowTag", "GaPExchange")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "GapExchange*.xml")
      .load(root)

  /** Single-child-or-error text extraction over an array column — the
    * reference's `get_child_as_text` which RAISES on multiple children
    * (generate_lakefs_dbgap_xml_index.py:81-107). Built-ins suffice
    * (SURVEY.md §2.10): size guard + raise_error, no UDF. */
  def childAsText(children: org.apache.spark.sql.Column,
                  what: String): org.apache.spark.sql.Column =
    when(size(children) > 1,
      raise_error(concat(lit(s"multiple $what children: "), size(children).cast("string"))))
      .otherwise(get(children, lit(0)).cast("string"))

  /** Typed view: the reference's Study→Section→Variable→Value hierarchy
    * (generate_lakefs_dbgap_xml_index.py:45-74) as `Dataset[Study]` —
    * compile-time field checks for pipeline code that walks the graph. */
  def asStudies(dataTables: DataFrame,
                repository: String): org.apache.spark.sql.Dataset[graft.model.Study] = {
    val spark = dataTables.sparkSession
    import spark.implicits._
    val vars = variables(dataTables)
    vars.groupBy(col("study_id"), col("filepath"), col("dt_id"))
      .agg(sort_array(collect_list(struct(
        col("pos"),
        col("dt_id").as("ddId"),
        coalesce(col("var_id"), col("name"), lit("")).as("id"),
        coalesce(col("name"), lit("")).as("name"),
        lit(null).cast("string").as("title"),
        col("description"),
        col("type").as("typ"),
        lit(null).cast("string").as("section"),
        lit(null).cast("string").as("logicalMin"),
        lit(null).cast("string").as("logicalMax"),
        array().cast("array<struct<code:string,label:string>>").as("values")))).as("vs"))
      .select(
        lit(repository).as("repository"),
        coalesce(col("filepath"), lit("")).as("filepath"),
        coalesce(col("study_id"), lit("")).as("studyId"),
        lit(null).cast("string").as("studyName"),
        lit(null).cast("string").as("studyDescription"),
        lit(null).cast("string").as("applId"),
        lit(null).cast("string").as("studyVersion"),
        array(struct(
          coalesce(col("dt_id"), lit("")).as("section"),
          transform(col("vs"), v => v.dropFields("pos")).as("variables"))).as("sections"))
      .as[graft.model.Study]
  }

  private def vField(dt: DataFrame, name: String) = {
    val exists = dt.schema.find(_.name == "variable").exists { f =>
      val elem = f.dataType match {
        case a: org.apache.spark.sql.types.ArrayType => a.elementType
        case other => other
      }
      elem match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.contains(name)
        case _ => false
      }
    }
    (if (exists) col("v").getField(name).cast("string")
     else lit(null).cast("string")).as(name)
  }
}
