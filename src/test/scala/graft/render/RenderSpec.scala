package graft.render

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class RenderSpec extends SparkSpec {
  import spark.implicits._

  test("GapExchange renderer emits the study-frame document (K3 companion)") {
    val studies = Seq(("phs000007.v32", "Framingham <Cohort>", "Heart & vessels"))
      .toDF("study_id", "study_name", "study_description")
    val docs = DbGapXmlRenderer.renderGapExchange(studies).collect()
    assert(docs.length == 1)
    val (path, xml) = docs.head
    assert(path == "phs000007.v32/GapExchange_phs000007.v32.xml")
    assert(xml.contains("<StudyNameEntrez>Framingham &lt;Cohort&gt;</StudyNameEntrez>"))
    assert(xml.contains("<Description>Heart &amp; vessels</Description>"))
    assert(xml.contains("""<Study accession="phs000007.v32">"""))
  }

  test("escape handles all five XML special forms") {
    assert(DbGapXmlRenderer.escape("""a&b<c>d"e""") == "a&amp;b&lt;c&gt;d&quot;e")
    assert(DbGapXmlRenderer.escape(null) == "")
  }

  test("K4 partitioned layout: null partition values become __missing__") {
    val out = Files.createTempDirectory("part").toString
    val df = Seq(("a", "p1"), ("b", null)).toDF("v", "prog")
    DocumentSink.writePartitioned(df, Seq("prog"), out)
    assert(Files.exists(Paths.get(out, "prog=p1")))
    assert(Files.exists(Paths.get(out, "prog=__missing__")))
    // round-trips with partition pruning intact
    val back = spark.read.parquet(out)
    assert(back.filter(col("prog") === "__missing__").select("v").as[String].head() == "b")
  }
}
