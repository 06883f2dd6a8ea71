package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def hist(rows: (Long, String, String, Option[String])*) =
    rows.toDF("k", "seg", "vf", "vt")
      .select(col("k"), col("seg"), to_date(col("vf")).as("valid_from"),
        to_date(col("vt")).as("valid_to"))

  private def upd(rows: (Long, String, String)*) =
    rows.toDF("k", "seg", "e").select(col("k"), col("seg"), to_date(col("e")).as("eff"))

  test("scd2Merge closes changed rows and appends the new version") {
    val h = hist((1L, "A", "2026-01-01", None))
    val u = upd((1L, "B", "2026-06-01"))
    val out = Merge.scd2Merge(h, u, "k", Seq("seg"))
      .orderBy("valid_from")
      .select(col("seg"), col("valid_from").cast("string"),
        col("valid_to").cast("string"))
      .as[(String, String, Option[String])].collect()
    assert(out.sameElements(Array(
      ("A", "2026-01-01", Some("2026-06-01")),
      ("B", "2026-06-01", None))))
  }

  test("scd2Merge is idempotent on no-op updates and passes closed rows through") {
    val h = hist(
      (1L, "A", "2026-01-01", None),
      (1L, "OLD", "2025-01-01", Some("2026-01-01")),
      (2L, "C", "2026-01-01", None))
    val u = upd((1L, "A", "2026-06-01")) // same attrs → no new version
    val out = Merge.scd2Merge(h, u, "k", Seq("seg"))
    assert(out.count() == 3)
    // the open row for key 1 is untouched (valid_from unchanged, still open)
    val k1open = out.filter(col("k") === 1 && col("valid_to").isNull)
      .select(col("valid_from").cast("string")).as[String].collect()
    assert(k1open.sameElements(Array("2026-01-01")))
  }

  test("scd2Merge inserts new keys as open rows") {
    val h = hist((1L, "A", "2026-01-01", None))
    val u = upd((9L, "NEW", "2026-06-01"))
    val out = Merge.scd2Merge(h, u, "k", Seq("seg"))
    val r = out.filter(col("k") === 9)
      .select(col("seg"), col("valid_from").cast("string"), col("valid_to").isNull)
      .as[(String, String, Boolean)].collect()
    assert(r.sameElements(Array(("NEW", "2026-06-01", true))))
  }

  test("snapshotDiff classifies insert/update/delete and drops unchanged rows") {
    val old = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("k", "seg")
    val cur = Seq((1L, "A"), (2L, "B2"), (4L, "D")).toDF("k", "seg")
    val out = Merge.snapshotDiff(old, cur, "k", Seq("seg"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(out.sameElements(Array(
      (2L, "B2", "update"), // new value emitted
      (3L, "C", "delete"),  // old value emitted
      (4L, "D", "insert"))))
  }

  test("snapshotDiff: update to NULL stays NULL; null attrs compare null-safely") {
    val old = Seq((1L, Some("A")), (2L, None: Option[String])).toDF("k", "seg")
    val cur = Seq((1L, None: Option[String]), (2L, None: Option[String])).toDF("k", "seg")
    val out = Merge.snapshotDiff(old, cur, "k", Seq("seg"))
      .as[(Long, Option[String], String)].collect()
    // key 2 unchanged (NULL <=> NULL) → dropped; key 1's new value is NULL
    assert(out.sameElements(Array((1L, None, "update"))))
  }

  test("snapshotDiff output merges back via scd2Merge (CDC feeds SCD2)") {
    val old = Seq((1L, "A")).toDF("k", "seg")
    val cur = Seq((1L, "B"), (2L, "N")).toDF("k", "seg")
    val changes = Merge.snapshotDiff(old, cur, "k", Seq("seg"))
      .filter(col("op") =!= "delete")
      .withColumn("eff", to_date(lit("2026-06-01"))).drop("op")
    val h = hist((1L, "A", "2026-01-01", None))
    val merged = Merge.scd2Merge(h, changes, "k", Seq("seg"))
    assert(merged.count() == 3) // closed A + open B + inserted N
    assert(merged.filter(col("valid_to").isNull).count() == 2)
  }

  /** Walk the cause chain — assert_true failures surface as a
    * SparkRuntimeException nested under the job-failure wrapper. */
  private def allMsgs(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")

  test("scd2Merge validate mode fails loudly on duplicate update keys") {
    val h = hist((1L, "A", "2026-01-01", None))
    val u = upd((1L, "B", "2026-06-01"), (1L, "C", "2026-06-01"))
    val e = intercept[Exception] {
      Merge.scd2Merge(h, u, "k", Seq("seg"), validate = true).collect()
    }
    assert(allMsgs(e).contains("duplicate update rows"), allMsgs(e))
  }

  test("scd2Merge validate mode fails loudly on multiple open rows per key") {
    val h = hist((1L, "A", "2026-01-01", None), (1L, "B", "2026-02-01", None))
    val u = upd((2L, "N", "2026-06-01"))
    val e = intercept[Exception] {
      Merge.scd2Merge(h, u, "k", Seq("seg"), validate = true).collect()
    }
    assert(allMsgs(e).contains("multiple open history rows"), allMsgs(e))
  }

  test("scd2Merge validate mode fails loudly on out-of-order eff dates") {
    // late-arriving batch: eff precedes the open row's valid_from — would
    // silently emit an inverted interval without validation
    val h = hist((1L, "A", "2026-06-01", None))
    val u = upd((1L, "B", "2026-01-01"))
    val e = intercept[Exception] {
      Merge.scd2Merge(h, u, "k", Seq("seg"), validate = true).collect()
    }
    assert(allMsgs(e).contains("out-of-order eff"), allMsgs(e))
  }

  test("scd2Merge validate mode is a pure pass-through on clean batches") {
    val h = hist(
      (1L, "A", "2026-01-01", None),
      (1L, "OLD", "2025-01-01", Some("2026-01-01")),
      (2L, "C", "2026-01-01", None))
    val u = upd((1L, "B", "2026-06-01"), (9L, "NEW", "2026-06-01"))
    val plain = Merge.scd2Merge(h, u, "k", Seq("seg"))
    val checked = Merge.scd2Merge(h, u, "k", Seq("seg"), validate = true)
    assert(checked.exceptAll(plain).isEmpty && plain.exceptAll(checked).isEmpty)
  }

  test("scd2Merge rejects reserved internal column names") {
    val h = hist((1L, "A", "2026-01-01", None)).withColumn("_m_key", lit(1))
    val u = upd((1L, "B", "2026-06-01"))
    val e = intercept[IllegalArgumentException] {
      Merge.scd2Merge(h, u, "k", Seq("seg"))
    }
    assert(e.getMessage.contains("_m_key"))
  }
}
