package graft.render

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._

/** dbGaP XML document rendering (SURVEY.md K3).
  *
  * The reference builds one `data_table` XML document per (study,
  * data-table) group with ElementTree (xml_generator.py:111-186,
  * get_heal_platform_mds_data_dicts.py:302-499). Spark-first shape:
  * `groupBy(dt_id).agg(collect_list(struct(...)))` assembles each
  * document's rows ON THE EXECUTORS, then a plain Scala formatter maps the
  * aggregated struct to the XML string — one row per document, fully
  * distributed, no driver collect. The sink ([[DocumentSink]]) writes each
  * (path, content) row from `foreachPartition`.
  *
  * Exact-layout notes (SURVEY.md §7.4): element order and the stylesheet
  * header match the reference's writer; tests compare canonicalized XML.
  */
object DbGapXmlRenderer {

  def escape(s: String): String =
    if (s == null) ""
    else s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case '"' => "&quot;"
      case c => c.toString
    }

  /** Assemble per-data-table documents from a variable-level DataFrame.
    *
    * Expected columns: dt_id, study_id, study_name, group_description,
    * path_prefix ("" or "subdir/" — K4 partitioned layout), pos (encounter
    * order), var_id, var_name, var_title, var_description, var_type,
    * values (array<struct<code,label>> nullable).
    * Returns (path, content) rows: one XML document per dt_id.
    */
  def renderDataTables(vars: DataFrame, participantSet: Int = 1): Dataset[(String, String)] = {
    val spark = vars.sparkSession
    import spark.implicits._
    val grouped = vars.groupBy(col("dt_id"), col("study_id"))
      .agg(
        min(col("study_name")).as("study_name"),
        min(col("group_description")).as("group_description"),
        min(col("path_prefix")).as("path_prefix"),
        array_sort(collect_list(struct(
          col("pos"), col("var_id"), col("var_name"), col("var_title"),
          col("var_description"), col("var_type"), col("values")))).as("vars"))
    grouped.map { row =>
      val dtId = row.getAs[String]("dt_id")
      val studyId = row.getAs[String]("study_id")
      val sb = new StringBuilder
      sb ++= "<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n"
      sb ++= "<?xml-stylesheet type=\"text/xsl\" href=\"./datadict_v2.xsl\"?>\n"
      sb ++= s"""<data_table id="${escape(dtId)}" study_id="${escape(studyId)}"""" +
        s""" participant_set="$participantSet"""" +
        s""" study_name="${escape(row.getAs[String]("study_name"))}">\n"""
      val desc = row.getAs[String]("group_description")
      if (desc != null) sb ++= s"  <description>${escape(desc)}</description>\n"
      row.getAs[scala.collection.Seq[Row]]("vars").foreach { v =>
        sb ++= s"""  <variable id="${escape(v.getAs[String]("var_id"))}">\n"""
        def child(tag: String, value: String): Unit =
          if (value != null) sb ++= s"    <$tag>${escape(value)}</$tag>\n"
        child("name", v.getAs[String]("var_name"))
        child("title", v.getAs[String]("var_title"))
        child("description", v.getAs[String]("var_description"))
        child("type", v.getAs[String]("var_type"))
        val values = v.getAs[scala.collection.Seq[Row]]("values")
        if (values != null) values.foreach { value =>
          sb ++= s"""    <value code="${escape(value.getAs[String]("code"))}">""" +
            s"${escape(value.getAs[String]("label"))}</value>\n"
        }
        sb ++= "  </variable>\n"
      }
      sb ++= "</data_table>\n"
      val prefix = Option(row.getAs[String]("path_prefix")).getOrElse("")
      (s"$prefix$studyId/$dtId.data_dict.xml", sb.toString)
    }
  }

  /** Companion GapExchange study-frame document (xml_generator.py:63-109).
    * Honors an optional `path_prefix` column (K4 layout). */
  def renderGapExchange(studies: DataFrame): Dataset[(String, String)] = {
    val spark = studies.sparkSession
    import spark.implicits._
    val prefixCol =
      if (studies.columns.contains("path_prefix")) col("path_prefix") else lit("")
    studies.select(col("study_id"), col("study_name"), col("study_description"),
        prefixCol.as("path_prefix"))
      .map { row =>
        val id = row.getAs[String]("study_id")
        val name = escape(row.getAs[String]("study_name"))
        val desc = escape(row.getAs[String]("study_description"))
        val xml =
          s"""<?xml version="1.0" encoding="UTF-8"?>
             |<GaPExchange>
             |  <MetaVariables>
             |    <Submitter/>
             |    <Method/>
             |  </MetaVariables>
             |  <Studies>
             |    <Study accession="${escape(id)}">
             |      <Configuration>
             |        <Data/>
             |        <StudyNameEntrez>$name</StudyNameEntrez>
             |        <Description>$desc</Description>
             |      </Configuration>
             |    </Study>
             |  </Studies>
             |</GaPExchange>
             |""".stripMargin
        // raw id in the PATH (consistent with renderDataTables) — XML
        // escaping is for document content only
        val prefix = Option(row.getAs[String]("path_prefix")).getOrElse("")
        (s"$prefix$id/GapExchange_$id.xml", xml)
      }
  }
}
