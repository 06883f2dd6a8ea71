package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BinaryDocSourceSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = getClass.getResource("/fixtures").getPath

  test("S6: recursive binary scan + filename filter + latest-per-dir pick") {
    val all = BinaryDocSource.read(spark, s"$fixtures/lake", "*.xml")
    assert(all.count() == 2)
    val dd = BinaryDocSource.filterFilenames(all, "data_dict")
    assert(dd.count() == 2)
    assert(BinaryDocSource.filterFilenames(all, "GapExchange").count() == 0)
    // content is the raw bytes of the document
    val first = dd.orderBy("path").select("content").as[Array[Byte]].head()
    assert(new String(first).contains("<data_table"))
    val latest = BinaryDocSource.latestPerDir(all)
    assert(latest.count() == 2) // one file per dir in fixtures
  }
}
