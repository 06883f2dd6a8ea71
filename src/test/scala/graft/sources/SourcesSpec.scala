package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("ORC round-trip: schema and values survive, predicate pushdown reaches the scan") {
    // the lake's second columnar format (Spark-native ORC reader): an
    // engine claiming source coverage must read/write it losslessly and
    // keep filters at the scan like parquet
    val dir = Files.createTempDirectory("orc").resolve("t")
    val df = Seq((1L, "alpha", 1.5), (2L, "beta", -2.0), (3L, null: String, 0.0))
      .toDF("id", "name", "v")
    df.write.mode("overwrite").orc(dir.toString)
    val back = spark.read.orc(dir.toString)
    // names+types survive (files always read back nullable)
    assert(back.schema.map(f => (f.name, f.dataType)) ==
      df.schema.map(f => (f.name, f.dataType)))
    assert(back.orderBy("id").collect().sameElements(df.orderBy("id").collect()))
    val plan = back.filter(col("id") > 1).queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(id), GreaterThan(id,1)]"),
      s"ORC scan did not push the filter:\n$plan")
  }

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
