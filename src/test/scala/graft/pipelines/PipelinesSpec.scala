package graft.pipelines

import graft.SparkSpec
import graft.sources.{CsvSources, MdsJsonSource, XmlDictSource}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class PipelinesSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = getClass.getResource("/fixtures").getPath

  test("BdcIngest: validation split, join, XML per data table in program dirs") {
    val out = Files.createTempDirectory("bdc").toString
    val gen3 = CsvSources.readGen3Studies(spark, s"$fixtures/gen3.csv")
    val pic = CsvSources.cleanPicsureVars(
      CsvSources.readPicsureVars(spark, s"$fixtures/picsure.csv"))
    val res = BdcIngest.run(spark, gen3, pic, out)

    // rejects: missing Consent (phs002206), missing Description (phs000285)
    val rejects = res.rejects.select("Accession", "reason")
      .as[(String, String)].collect().toMap
    assert(rejects == Map(
      "phs002206.v2" -> "missing Consent",
      "phs000285.v3" -> "missing Description"))

    // program dir normalized from "topmed|parent" -> topmed
    val xml1 = Paths.get(out, "topmed/phs000007.v32/pht000030.data_dict.xml")
    val xml2 = Paths.get(out, "topmed/phs000007.v32/pht000031.data_dict.xml")
    assert(Files.exists(xml1), s"missing $xml1")
    assert(Files.exists(xml2), s"missing $xml2")
    val content = Files.readString(xml1)
    assert(content.contains("""<data_table id="pht000030" study_id="phs000007.v32""""))
    assert(content.contains("<name>AGE</name>"))
    // categorical SEX gets positional value codes (xml_generator.py:151-156)
    assert(content.contains("""<value code="1">Male</value>"""))
    assert(content.contains("""<value code="2">Female</value>"""))
    assert(content.contains("<type>encoded value</type>"))
    // orphan study and varId-less row never appear
    assert(!Files.exists(Paths.get(out, "g")))
    assert(!content.contains("BROKEN"))

    // companion GapExchange frame next to the data tables
    val gap = Paths.get(out, "topmed/phs000007.v32/GapExchange_phs000007.v32.xml")
    assert(Files.exists(gap), s"missing $gap")
    assert(Files.readString(gap).contains("<StudyNameEntrez>Framingham Cohort</StudyNameEntrez>"))

    val summary = res.summary.as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(summary("generated")._1 == 1L)
    assert(summary("skipped")._1 == 2L)

    // processing_summary.txt (write_summary layout, A9/K6)
    val txt = Files.readString(Paths.get(out, "processing_summary.txt"))
    assert(txt == res.processingSummary)
    assert(txt.contains("PROCESSING SUMMARY"))
    assert(txt.contains("Total studies processed: 3"))
    assert(txt.contains("Successfully processed: 1"))
    assert(txt.contains("  - Generated with XML fallback: 1"))
    assert(txt.contains("Failed: 2"))
    assert(txt.contains("\nStudies generated using XML generator:\n" +
      "  1. phs000007 (phs000007.v32) - Reason: Generated from PicSure metadata"))
    assert(txt.contains("\nFailed studies:\n"))
    assert(txt.contains("(phs000285.v3) - Reason: missing Description"))
    // Gen3∩PicSure overlap via J8 prefix-scan over ALL picsure columns
    assert(txt.contains("Studies in both Gen3 and PicSure: 1"))
    assert(txt.contains("\nStudies found in both Gen3 and PicSure:\n  phs000007"))
  }

  test("BdcIngest: overlap-id driver collect raises past the row ceiling") {
    val out = Files.createTempDirectory("bdc_guard").toString
    val gen3 = CsvSources.readGen3Studies(spark, s"$fixtures/gen3.csv")
    val pic = CsvSources.cleanPicsureVars(
      CsvSources.readPicsureVars(spark, s"$fixtures/picsure.csv"))
    // fixture yields exactly 1 overlap id; a ceiling of 0 must raise
    val e = intercept[IllegalArgumentException] {
      BdcIngest.run(spark, gen3, pic, out, maxOverlapIds = 0L)
    }
    assert(e.getMessage.contains("overlap id list"))
  }

  test("PretrainCuration: gate → line dedup → fuzzy dedup → decontaminate → carve") {
    import graft.ext.Curation
    val docs = Seq(
      (1L, "the quick brown fox jumps over dog\nBOILER PLATE LINE", "en"),
      (2L, "the quick brown fox jumps over dog\nBOILER PLATE LINE", "en"), // exact dup
      (3L, "tiny doc", "en"),                                              // too short
      (4L, "ceci nest pas anglais du tout vraiment", "fr"),                // bad lang
      (5L, "alpha beta gamma delta epsilon zeta eta theta\nBOILER PLATE LINE", "en"),
      (6L, "alpha beta gamma delta epsilon zeta eta iota\nBOILER PLATE LINE", "en"), // near-dup of 5
      (7L, "document that shares exactly these grams today", "en"),        // contaminated
      (8L, "unique filler document number eight with words", "en"),
      (9L, "another entirely different filler document nine", "en"),
      (10L, "more independent filler content document ten", "en"),
      (11L, "final standalone filler document number eleven", "en")
    ).toDF("doc_id", "text", "lang")
    val bench = Seq((100L, "benchmark shares exactly these grams okay")).toDF("doc_id", "text")

    val res = PretrainCuration.run(docs, bench,
      Curation.Rules(minTokens = 3, allowedLangs = Seq("en")), holdoutPerLang = 2)

    val rejected = res.rejected.select("doc_id", "status")
      .as[(Long, String)].collect().toMap
    assert(rejected == Map(2L -> "dup", 3L -> "too_short", 4L -> "bad_lang"))

    val attrition = res.attrition.as[(String, Long)].collect().toMap
    assert(attrition == Map(
      "0_input" -> 11L,          // all docs
      "1_rule_gate" -> 8L,       // minus dup/short/lang
      "2_line_dedup" -> 8L,      // BOILER line (3 corpus occurrences) stripped, docs survive
      "3_fuzzy_dedup" -> 7L,     // near-dup 6 dropped (keeper = min id 5)
      "4_decontaminated" -> 6L,  // 7 shares a 3-gram with the benchmark
      "5_train" -> 4L            // 2 per-lang holdout carved out
    ), attrition.toString)

    val train = res.train.select("doc_id").as[Long].collect().toSet
    val holdout = res.holdout.select("doc_id").as[Long].collect().toSet
    assert(holdout.size == 2 && (train & holdout).isEmpty)
    assert((train | holdout) == Set(1L, 5L, 8L, 9L, 10L, 11L))

    // the boilerplate line is gone from the surviving text, order kept
    val t1 = res.train.unionByName(res.holdout).filter(col("doc_id") === 1L)
      .select("text").as[String].head()
    assert(t1 == "the quick brown fox jumps over dog")
  }

  test("HealIngest: alias normalization, uniquify, enum packing, KGX") {
    val out = Files.createTempDirectory("heal").toString
    val mapping = CsvSources.readHdpidMapping(spark, s"$fixtures/mapping.csv")
    val res = HealIngest.run(spark, s"$fixtures/mds", mapping, out)

    val idx = res.variableIndex.orderBy("study_id", "dd_id", "name")
      .collect().map(r => (r.getAs[String]("study_id"), r.getAs[String]("name"),
        r.getAs[String]("section"), r.getAs[String]("encodings")))
    // HDP00001 uses property/module aliases + packed encodings form
    assert(idx.contains(("HDP00001", "opioid_use", "screening", "0=No|1=Yes")))
    // HDP00002: enumLabels map packed; duplicate name uniquified to _1
    assert(idx.exists(r => r._1 == "HDP00002" && r._2 == "pain_score" && r._4 == "1=Mild|2=Severe"))
    assert(idx.exists(r => r._1 == "HDP00002" && r._2 == "pain_score_1"))
    // 404-stub dict contributes no variables
    assert(!idx.exists(_._2 == null))
    assert(idx.length == 4)

    // study-type subdir from mapping: "HEAL Research Network" -> heal_research_network
    assert(Files.exists(Paths.get(out,
      "xml/heal_research_network/HDP00002/HEALCDE:dd-1.data_dict.xml")))
    assert(Files.exists(Paths.get(out,
      "xml/heal_studies/HDP00001/HEALCDE:dd-2.data_dict.xml")))

    // 404-stub dict surfaced in the skip report with its error
    val skipped = res.skippedDds.as[(String, String, String)].collect()
    assert(skipped.sameElements(Array(("HDP00002", "HEALCDE:dd-404", "404 not found"))))

    // KGX document contains study + dd nodes and related_to edges
    assert(res.kgxJson.contains(""""id":"HDP00002""""))
    assert(res.kgxJson.contains(""""id":"HEALCDE:dd-1""""))
    assert(res.kgxJson.contains(""""predicate":"biolink:related_to""""))
  }

  test("DugIngest: sorted TSV with header, jq escaping, CDE exclusion (golden)") {
    val out = Files.createTempDirectory("dug").toString
    DugIngest.run(spark, s"$fixtures/dug/list.json", out)
    val dir = Paths.get(out, "list_tsv")
    val part = Files.list(dir).filter(_.getFileName.toString.startsWith("part-"))
      .findFirst().get()
    val golden =
      "collection_id\tcollection_name\tcollection_action\n" +
        "dd-1\tOpioid\\tUse\t\n" + // embedded tab escaped like jq @tsv; null action -> empty
        "dd-2\tPain Study\tindex\n" +
        "dd-3\tCDE\tkeep\n" // name CDE but non-empty id: grep keeps it
    // the placeholder row ("\tCDE\t") is gone
    assert(Files.readString(part) == golden)
  }

  test("LakeIndex: per-repo variable counts pivoted into columns") {
    val piv = LakeIndex.run(spark, Map(
      "bdc" -> s"$fixtures/lake/bdc",
      "heal" -> s"$fixtures/lake/heal"))
    val rows = piv.orderBy("study_id")
      .as[(String, Long, Long)].collect()
    assert(rows.sameElements(Array(("phs000007.v32", 2L, 1L))))
  }

  test("typed Dataset[Study] view of an XML repository") {
    val studies = XmlDictSource.asStudies(
      XmlDictSource.readDataTables(spark, s"$fixtures/lake/bdc"), "bdc").collect()
    assert(studies.length == 1)
    val s0 = studies.head
    assert(s0.repository == "bdc" && s0.studyId == "phs000007.v32")
    assert(s0.sections.head.variables.map(_.name) == Seq("AGE", "SEX"))
    assert(s0.sections.head.variables.head.typ.contains("integer"))
  }

  test("XmlDictSource handles single-variable docs (struct vs array)") {
    val vars = XmlDictSource.variables(
      XmlDictSource.readDataTables(spark, s"$fixtures/lake/heal"))
    assert(vars.count() == 1)
    assert(vars.select("name").as[String].head() == "pain_score")
  }
}
