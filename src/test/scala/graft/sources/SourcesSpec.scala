package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("corrupt CSV rows are quarantined into _corrupt_record, not dropped") {
    val dir = Files.createTempDirectory("csv")
    val f = dir.resolve("gen3.csv")
    Files.writeString(f,
      """Accession,Consent,Study Name,Program,Last modified,Notes,Description
        |phs1,c1,Study A,prog,2026-01-01,,desc
        |"unclosed quote,c1,broken,row
        |phs2,c1,Study B,prog,2026-01-01,,desc2
        |""".stripMargin)
    val df = CsvSources.readGen3StudiesQuarantined(spark, f.toString).cache()
    val bad = df.filter(col("_corrupt_record").isNotNull)
    val good = df.filter(col("_corrupt_record").isNull)
    assert(good.count() == 2)
    assert(bad.count() == 1)
    assert(bad.select("_corrupt_record").as[String].head().contains("unclosed quote"))
  }

  test("childAsText: single child extracted, multiple children raise") {
    val df = Seq(
      (1L, Seq("only")),
      (2L, Seq.empty[String])
    ).toDF("id", "kids")
    val out = df.select(col("id"), XmlDictSource.childAsText(col("kids"), "name").as("t"))
      .orderBy("id").as[(Long, Option[String])].collect()
    assert(out.sameElements(Array((1L, Some("only")), (2L, None))))
    val boom = intercept[Exception] {
      Seq((3L, Seq("a", "b"))).toDF("id", "kids")
        .select(XmlDictSource.childAsText(col("kids"), "name")).collect()
    }
    assert(boom.getMessage.contains("multiple name children"))
  }

  test("GapExchange scan reads the study frame written by the renderer") {
    val out = Files.createTempDirectory("gap").toString
    val studies = Seq(("phs000007.v32", "Framingham", "Heart study"))
      .toDF("study_id", "study_name", "study_description")
    graft.render.DocumentSink.writeDocuments(
      graft.render.DbGapXmlRenderer.renderGapExchange(studies), out)
    val back = XmlDictSource.readGapExchange(spark, out)
    assert(back.count() == 1)
    val name = back.select(col("Studies.Study.Configuration.StudyNameEntrez").cast("string"))
      .as[String].head()
    assert(name == "Framingham")
  }
}
