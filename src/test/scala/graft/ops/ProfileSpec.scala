package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior of the single-pass column profiler (x81). */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("en"), Some(10L)),
    (2L, Some("en"), Some(20L)),
    (3L, Some("de"), Some(10L)),
    (4L, Some("de"), None),
    (5L, Some("fr"), Some(30L)),
    (6L, None, Some(10L))
  ).toDF("id", "lang", "n")

  test("profileColumns: exact counts, nulls, distincts, ordered top-K") {
    val got = Profile.profileColumns(fixture, Seq("lang", "n", "id"), 2)
      .as[(String, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    // lang: 6 rows, 1 null, 3 distinct; ties (en 2, de 2) → count desc
    // then value asc: "de|en"
    assert(got("lang") == (("lang", 6L, 1L, 3L, "de|en")), got("lang"))
    // n: casts to string; 10→3 wins, then 20/30 tie at 1 → value asc "20"
    assert(got("n") == (("n", 6L, 1L, 3L, "10|20")), got("n"))
    // id: all distinct → ties everywhere, string-ordered: "1|2"
    assert(got("id") == (("id", 6L, 0L, 6L, "1|2")), got("id"))
  }

  test("profileColumns: salted two-phase top-K equals the plain window; edge cases") {
    import org.apache.spark.sql.expressions.Window
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val got = Profile.profileColumns(d, Seq("lang", "source", "n_chars"), 3)
    val vc = d.select(explode(array(Seq("lang", "source", "n_chars").map(c =>
        struct(lit(c).as("column"), col(c).cast("string").as("v"))): _*))
        .as("s"))
      .select(col("s.column").as("column"), col("s.v").as("v"))
      .groupBy("column", "v").agg(count(lit(1)).as("c"))
      .filter(col("v").isNotNull)
    val naive = vc
      .withColumn("r", row_number().over(Window.partitionBy(col("column"))
        .orderBy(col("c").desc, col("v").asc)))
      .filter(col("r") <= 3).groupBy(col("column"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("r"), col("v").as("v")))),
        x => x.getField("v")), "|").as("tv"))
      .as[(String, String)].collect().toMap
    got.as[(String, Long, Long, Long, String)].collect().foreach { r =>
      assert(r._5 == naive(r._1), s"${r._1}: ${r._5} vs ${naive(r._1)}")
    }
    // all-NULL column → empty top_values, n_distinct 0
    val allNull = Seq((1L, None: Option[String]), (2L, None)).toDF("id", "s")
    val an = Profile.profileColumns(allNull, Seq("s"), 3)
      .as[(String, Long, Long, Long, String)].head()
    assert(an == (("s", 2L, 2L, 0L, "")), an)
    // topK beyond the distinct count returns everything
    val allV = Profile.profileColumns(fixture, Seq("lang"), 10)
      .as[(String, Long, Long, Long, String)].head()
    assert(allV._5 == "de|en|fr", allV)
    intercept[IllegalArgumentException] {
      Profile.profileColumns(fixture, Seq("nope"), 3)
    }
    intercept[IllegalArgumentException] {
      Profile.profileColumns(fixture, Seq("lang", "lang"), 3)
    }
  }
}
