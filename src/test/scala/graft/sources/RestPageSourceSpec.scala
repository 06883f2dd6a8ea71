package graft.sources

import graft.SparkSpec
import graft.sources.rest.{PageFetcher, PageFetcherProvider, PageFetchers}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.atomic.AtomicInteger

/** Provider resolved by CLASS NAME in the task JVM (the multi-JVM path):
  * zero-arg constructed, configured from the shipped option map. */
class CountingMdsProvider extends PageFetcherProvider {
  override def create(config: Map[String, String]): PageFetcher = {
    CountingMdsProvider.instantiations.incrementAndGet()
    val n = config.getOrElse("rows", "10").toInt
    new PageFetcher {
      override def totalRows: Int = n
      override def fetch(offset: Int, limit: Int): Seq[String] =
        (offset until math.min(offset + limit, n)).map(i => s"""{"i":$i}""")
    }
  }
}
object CountingMdsProvider {
  val instantiations = new AtomicInteger(0)
}

class RestPageSourceSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory stand-in for the Gen3 MDS endpoint: 95 study records. */
  private class FakeMds extends PageFetcher {
    val calls = new AtomicInteger(0)
    override def totalRows: Int = 95
    override def fetch(offset: Int, limit: Int): Seq[String] = {
      calls.incrementAndGet()
      (offset until math.min(offset + limit, totalRows)).map(i =>
        s"""{"study_id":"phs${"%06d".format(i)}","name":"Study $i"}""")
    }
  }

  test("paginated scan: one partition per page, exactly-once rows") {
    PageFetchers.register("mds", new FakeMds)
    val df = spark.read.format("rest-pages")
      .option("fetcher", "mds").option("pagesize", "10").load()
    assert(df.rdd.getNumPartitions == 10) // ceil(95/10) pages in parallel
    assert(df.count() == 95)
    // pagination dedup guard (reference A1): offsets unique
    assert(df.select("offset").distinct().count() == 95)
  }

  test("LIMIT pushes down: only the needed pages are planned or fetched") {
    val f = new FakeMds
    PageFetchers.register("mds_limit", f)
    val df = spark.read.format("rest-pages")
      .option("fetcher", "mds_limit").option("pagesize", "10").load()
    val got = df.limit(7).collect()
    assert(got.length == 7)
    assert(f.calls.get() == 1, s"expected 1 page fetch, got ${f.calls.get()}")
    val plan = df.limit(7).queryExecution.executedPlan.toString
    assert(plan.contains("limit=7"), plan)
  }

  test("column pruning reaches the scan (offset-only plan drops payload)") {
    PageFetchers.register("mds_prune", new FakeMds)
    val df = spark.read.format("rest-pages")
      .option("fetcher", "mds_prune").option("pagesize", "10").load()
    val offsetOnly = df.select("offset")
    val plan = offsetOnly.queryExecution.executedPlan.toString
    assert(plan.contains("columns=offset"), plan)
    assert(offsetOnly.count() == 95)
  }

  test("fetcher_provider: class-named factory instantiates in the task JVM") {
    CountingMdsProvider.instantiations.set(0)
    // no PageFetchers.register at all — resolution is purely reflective
    val df = spark.read.format("rest-pages")
      .option("fetcher_provider", classOf[CountingMdsProvider].getName)
      .option("rows", "23").option("pagesize", "10").load()
    assert(df.count() == 23)
    assert(df.select("offset").distinct().count() == 23)
    // cached per (class, config): planning + 3 page tasks share one instance
    assert(CountingMdsProvider.instantiations.get() == 1,
      s"expected 1 cached instantiation, got ${CountingMdsProvider.instantiations.get()}")
    // a different config constructs a fresh fetcher
    assert(spark.read.format("rest-pages")
      .option("fetcher_provider", classOf[CountingMdsProvider].getName)
      .option("rows", "5").option("pagesize", "10").load().count() == 5)
    assert(CountingMdsProvider.instantiations.get() == 2)
  }

  test("cursor chain (S5 FHIR-style): lazy walk, LIMIT stops the chain early") {
    import graft.sources.rest.{CursorFetcher, CursorFetchers}
    // 35 rows over pages of 10; tokens are opaque strings only the server
    // understands — page N is addressable only after page N-1 returns
    class FakeFhir extends CursorFetcher {
      val pageFetches = new AtomicInteger(0)
      override def firstToken: String = "page-0"
      override def fetchPage(token: String): (Seq[String], String) = {
        pageFetches.incrementAndGet()
        val pageNo = token.stripPrefix("page-").toInt
        val start = pageNo * 10
        val rows = (start until math.min(start + 10, 35))
          .map(i => s"""{"entry_id":$i}""")
        (rows, if (start + 10 >= 35) null else s"page-${pageNo + 1}")
      }
    }
    val full = new FakeFhir
    CursorFetchers.register("fhir", full)
    val df = spark.read.format("rest-cursor").option("fetcher", "fhir").load()
    assert(df.count() == 35)
    assert(full.pageFetches.get() == 4) // ceil(35/10), exactly one walk
    assert(df.select("row_idx").distinct().count() == 35)

    // LIMIT pushdown: 12 rows -> 2 pages fetched, not 4
    val capped = new FakeFhir
    CursorFetchers.register("fhir_cap", capped)
    val got = spark.read.format("rest-cursor").option("fetcher", "fhir_cap")
      .load().limit(12).collect()
    assert(got.length == 12)
    assert(capped.pageFetches.get() == 2,
      s"expected 2 page fetches, got ${capped.pageFetches.get()}")
    val plan = spark.read.format("rest-cursor").option("fetcher", "fhir_cap")
      .load().limit(12).queryExecution.executedPlan.toString
    assert(plan.contains("limit=12"), plan)
  }

  test("payload JSON composes with from_json downstream (S4 enrich shape)") {
    PageFetchers.register("mds2", new FakeMds)
    val schema = StructType(Seq(StructField("study_id", StringType),
      StructField("name", StringType)))
    val parsed = spark.read.format("rest-pages")
      .option("fetcher", "mds2").option("pagesize", "20").load()
      .select(from_json(col("payload"), schema).as("s"))
      .select("s.study_id", "s.name")
    assert(parsed.filter(col("study_id") === "phs000042").select("name")
      .as[String].head() == "Study 42")
  }
}
