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

  test("processingSummary renders all sections from ONE job (single guarded collect)") {
    val summary = Seq(
      ("phs2", "phs2.v1", "SUCCESS", "dbGaP_download", "ok"),
      ("phs1", "phs1.v3", "SUCCESS", "XML_generator", "fallback meta"),
      ("phs3", "phs3.v2", "FAILED", "none", "missing Consent"))
      .toDF("study_id", "accession_id", "status", "method", "details")
    val group = s"summary_once_${System.nanoTime()}"
    spark.sparkContext.setJobGroup(group, "processingSummary job count")
    val txt = try SummaryReport.processingSummary(summary, Seq("phs2"))
    finally spark.sparkContext.clearJobGroup()
    // status-store updates are async — poll briefly for the job count
    def jobs(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(group).length
    val deadline = System.currentTimeMillis() + 10000
    while (jobs() < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
    Thread.sleep(200) // let any EXTRA job surface before asserting the ceiling
    assert(jobs() == 1, s"expected one collect job, saw ${jobs()}")
    // the one pass still feeds counters AND every bucketed section
    assert(txt.contains("Total studies processed: 3"))
    assert(txt.contains("Successfully processed: 2"))
    assert(txt.contains("  - Downloaded from dbGaP: 1"))
    assert(txt.contains("  - Generated with XML fallback: 1"))
    assert(txt.contains("Failed: 1"))
    assert(txt.contains("\nStudies downloaded from dbGaP:\n  1. phs2 (phs2.v1) - ok"))
    assert(txt.contains(
      "\nStudies generated using XML generator:\n  1. phs1 (phs1.v3) - Reason: fallback meta"))
    assert(txt.contains("\nFailed studies:\n  1. phs3 (phs3.v2) - Reason: missing Consent"))
    assert(txt.contains("Studies in both Gen3 and PicSure: 1"))
  }

  test("processingSummary ceiling-guards the detail collect (last unguarded driver collect)") {
    val summary = (1 to 50).map(i =>
        (s"phs$i", s"phs$i.v1", "SUCCESS", "dbGaP_download", "ok"))
      .toDF("study_id", "accession_id", "status", "method", "details")
    val e = intercept[IllegalArgumentException] {
      SummaryReport.processingSummary(summary, Nil, maxDetailRows = 10L)
    }
    assert(e.getMessage.contains("metadata-scale"), e.getMessage)
    // a ceiling at/above the frame size renders normally
    val txt = SummaryReport.processingSummary(summary, Nil, maxDetailRows = 50L)
    assert(txt.contains("Total studies processed: 50"))
    // an absurd ceiling (no effective limit) must not pre-allocate a
    // Int.MaxValue heap — the plain-collect branch renders identically
    val unbounded = SummaryReport.processingSummary(summary, Nil,
      maxDetailRows = Long.MaxValue)
    assert(unbounded == txt)
  }

  test("escape handles all five XML special forms") {
    assert(DbGapXmlRenderer.escape("""a&b<c>d"e""") == "a&amp;b&lt;c&gt;d&quot;e")
    assert(DbGapXmlRenderer.escape(null) == "")
  }

  test("KGX assembly: consent collapse (A8), typed graph, single-doc render") {
    val studies = Seq("phs1.c1", "phs1.c2", "phs2.c1").toDF("study_id")
      .withColumn("name", col("study_id"))
      .withColumn("program", lit("topmed"))
    val nodes = KgxAssembler.studyNodes(studies, "study_id", "name", "program")
    assert(nodes.count() == 2) // consent variants collapsed per base id
    val phs1 = nodes.filter(col("id") === "phs1").select("consents").as[String].head()
    assert(phs1 == "phs1.c1|phs1.c2")
    val (cNodes, edges) = KgxAssembler.consentNodesAndEdges(studies, "study_id")
    val (tn, te) = KgxAssembler.typedGraph(cNodes, edges)
    assert(tn.collect().forall(_.categories == Seq("biolink:StudyPopulation")))
    assert(te.collect().forall(_.predicate == "biolink:related_to"))
    val doc = KgxAssembler.toJsonDocument(
      nodes.select("id", "name", "categories", "iri"), edges)
    assert(doc.startsWith("""{"nodes":[""") && doc.contains(""""edges":["""))
    assert(doc.contains(""""subject":"phs1.c1","predicate":"biolink:related_to","object":"phs1""""))
  }

  test("P18 composition: XML read -> field rewrite -> re-render") {
    // the reference mutates StudyNameEntrez in a parsed tree
    // (get_dbgap_data_dicts.py:24-42); our equivalent is scan -> join new
    // names -> re-render, all declarative
    val fixtures = getClass.getResource("/fixtures").getPath
    val dts = graft.sources.XmlDictSource.readDataTables(spark, s"$fixtures/lake/bdc")
    val newNames = Seq(("phs000007.v32", "Renamed Study")).toDF("sid", "new_name")
    val renderInput = graft.sources.XmlDictSource.variables(dts)
      .join(newNames, col("study_id") === col("sid"))
      .select(col("dt_id"), col("study_id"),
        col("new_name").as("study_name"),
        lit(null).cast("string").as("group_description"),
        lit("").as("path_prefix"),
        col("pos"),
        col("var_id"), col("name").as("var_name"),
        lit(null).cast("string").as("var_title"),
        col("description").as("var_description"),
        col("type").as("var_type"),
        lit(null).cast("array<struct<code:string,label:string>>").as("values"))
    val docs = DbGapXmlRenderer.renderDataTables(renderInput).collect()
    assert(docs.length == 1)
    assert(docs.head._2.contains("""study_name="Renamed Study""""))
    assert(docs.head._2.contains("<name>AGE</name>")) // variables preserved
  }

  test("writeDocuments rejects data-derived paths escaping the sink dir") {
    val out = Files.createTempDirectory("esc").toString
    val evil = Seq(("../outside.txt", "nope")).toDS()
    val boom = intercept[Exception] {
      DocumentSink.writeDocuments(evil, out)
    }
    assert(boom.getMessage.contains("escapes the sink directory")
      || boom.getCause != null)
    assert(!Files.exists(Paths.get(out).getParent.resolve("outside.txt")))
    // absolute paths are rejected too
    val abs = Seq(("/tmp/graft_abs_escape.txt", "nope")).toDS()
    intercept[Exception] { DocumentSink.writeDocuments(abs, out) }
    assert(!Files.exists(Paths.get("/tmp/graft_abs_escape.txt")))
    // a legitimate nested relative path still writes
    DocumentSink.writeDocuments(Seq(("sub/ok.txt", "yes")).toDS(), out)
    assert(Files.readString(Paths.get(out, "sub/ok.txt")) == "yes")
  }

  test("driver-funneled sinks raise past their row ceilings") {
    val big = spark.range(5).selectExpr("CAST(id AS STRING) AS id",
      "CAST(id AS STRING) AS name", "array('biolink:Study') AS categories")
    val edges = Seq.empty[(String, String, String)]
      .toDF("subject", "predicate", "object")
    val e1 = intercept[IllegalArgumentException] {
      KgxAssembler.toJsonDocument(big, edges, maxRows = 2)
    }
    assert(e1.getMessage.contains("collects nodes to the driver"))
    val out = Files.createTempDirectory("cap").toString
    val flat = big.select("id", "name")
    val e2 = intercept[IllegalArgumentException] {
      DocumentSink.writeSingleCsv(flat, s"$out/csv", maxRows = 2)
    }
    assert(e2.getMessage.contains("metadata-scale sink"))
    // under the ceiling both still work
    assert(KgxAssembler.toJsonDocument(big, edges, maxRows = 100).contains("\"id\":\"0\""))
    DocumentSink.writeSingleCsv(flat, s"$out/csv2", maxRows = 100)
    assert(Files.list(Paths.get(out, "csv2"))
      .anyMatch(_.getFileName.toString.startsWith("part-")))
    // an absurd ceiling must clamp (NOT overflow into a negative limit and
    // throw a confusing AnalysisException) — the guard degrades to a pass
    DocumentSink.writeSingleCsv(flat, s"$out/csv3", maxRows = Long.MaxValue)
    assert(DocumentSink.probeLimit(Long.MaxValue) == Int.MaxValue)
    assert(DocumentSink.probeLimit(10L) == 11)
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
