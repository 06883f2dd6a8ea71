package graft.render

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Human-readable processing summary (SURVEY.md A9/K6 parity).
  *
  * Renders the reference's `processing_summary.txt` layout
  * (run_dbgap_xml_gen_fallback.py:80-161 `write_summary`) from a per-study
  * status frame with columns (study_id, accession_id, status, method,
  * details). Counters aggregate in ONE distributed pass; only the
  * per-study detail lines collect to the driver — the frame is metadata
  * scale (one row per study), like every report the reference writes.
  * Detail order is (study_id, accession_id) — the reference iterates
  * pandas insertion order, which is not reproducible; sorting is.
  */
object SummaryReport {

  def processingSummary(summary: DataFrame, overlapIds: Seq[String],
                        maxDetailRows: Long = DocumentSink.MaxSingleFileRows): String = {
    // the per-study detail sections collect to the driver — ceiling-guard
    // like every other metadata-scale sink (DocumentSink.writeSingleCsv,
    // KgxAssembler, BdcIngest's overlap list) so data-scale misuse raises
    // instead of OOMing the driver
    val n = summary.limit(DocumentSink.probeLimit(maxDetailRows)).count()
    require(n <= maxDetailRows,
      s"processingSummary collects per-study detail rows to the driver " +
        s"(> $maxDetailRows rows); the summary frame should be metadata-scale")
    val c = summary.agg(
      count(lit(1)).as("total"),
      coalesce(sum(when(col("status") === "SUCCESS", 1).otherwise(0)), lit(0)).as("ok"),
      coalesce(sum(when(col("method") === "dbGaP_download", 1).otherwise(0)), lit(0)).as("dl"),
      coalesce(sum(when(col("method") === "XML_generator", 1).otherwise(0)), lit(0)).as("gen"),
      coalesce(sum(when(col("status") === "FAILED", 1).otherwise(0)), lit(0)).as("fail"))
      .head()

    def details(cond: org.apache.spark.sql.Column): Seq[(String, String, String)] =
      summary.filter(cond)
        .select(col("study_id").cast("string"), col("accession_id").cast("string"),
          col("details").cast("string"))
        .orderBy("study_id", "accession_id")
        .collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))

    val lines = scala.collection.mutable.ArrayBuffer(
      "\n" + "=" * 50,
      "PROCESSING SUMMARY",
      "=" * 50,
      s"Total studies processed: ${c.getAs[Long]("total")}",
      s"Successfully processed: ${c.getAs[Long]("ok")}",
      s"  - Downloaded from dbGaP: ${c.getAs[Long]("dl")}",
      s"  - Generated with XML fallback: ${c.getAs[Long]("gen")}",
      s"Failed: ${c.getAs[Long]("fail")}",
      s"Studies in both Gen3 and PicSure: ${overlapIds.size}")

    val dl = details(col("method") === "dbGaP_download")
    if (dl.nonEmpty) {
      lines += "\nStudies downloaded from dbGaP:"
      dl.zipWithIndex.foreach { case ((s, a, d), i) =>
        lines += s"  ${i + 1}. $s ($a) - $d"
      }
    }
    val gen = details(col("method") === "XML_generator")
    if (gen.nonEmpty) {
      lines += "\nStudies generated using XML generator:"
      gen.zipWithIndex.foreach { case ((s, a, d), i) =>
        lines += s"  ${i + 1}. $s ($a) - Reason: $d"
      }
    }
    val failed = details(col("status") === "FAILED")
    if (failed.nonEmpty) {
      lines += "\nFailed studies:"
      failed.zipWithIndex.foreach { case ((s, a, d), i) =>
        lines += s"  ${i + 1}. $s ($a) - Reason: $d"
      }
    }
    if (overlapIds.nonEmpty) {
      lines += "\nStudies found in both Gen3 and PicSure:"
      lines += s"  ${overlapIds.sorted.mkString("\t")}"
    }
    lines.map(_ + "\n").mkString
  }

  /** Write processing_summary.txt (driver-side — the report is one small
    * text document). */
  def writeProcessingSummary(summary: DataFrame, overlapIds: Seq[String],
                             outDir: String,
                             maxDetailRows: Long = DocumentSink.MaxSingleFileRows): String = {
    val text = processingSummary(summary, overlapIds, maxDetailRows)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outDir, "processing_summary.txt"), text)
    text
  }
}
