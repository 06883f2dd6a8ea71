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

  test("histogram: exact bins, inclusive edges, nulls excluded, empty bins absent") {
    // values 0..9 and 95..99, nBins 10 over range 0..99: width 10
    val vals = ((0L to 9L) ++ (95L to 99L)).map(Tuple1(_)).toDF("v")
    val got = Profile.histogram(vals, "v", 10)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((0L, 0L, 9L, 10L), (9L, 90L, 99L, 5L)), got.toSeq)
    // max lands INSIDE the last bin (width = range div n + 1)
    assert(got.last._3 >= 99L)
    // nulls are excluded, not a bin
    val withNull = (Seq(Some(1L), Some(2L), None)).map(Tuple1(_)).toDF("v")
    val nn = Profile.histogram(withNull, "v", 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(nn.map(_._4).sum == 2L, nn.toSeq)
    // single-value column: one bin holding everything
    val one = Profile.histogram(Seq(7L, 7L, 7L).map(Tuple1(_)).toDF("v"), "v", 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(one.toSeq == Seq((0L, 7L, 7L, 3L)), one.toSeq)
  }

  test("histogram: fixed bounds shard-merge equals one-shot; out-of-bounds raises") {
    val vals = (0L to 99L).map(Tuple1(_)).toDF("v")
    val oneShot = Profile.histogram(vals, "v", 8, Some((0L, 99L)))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // two shards with SHARED bounds re-sum to the one-shot counts
    val s1 = Profile.histogram(vals.filter($"v" % 2 === 0), "v", 8, Some((0L, 99L)))
    val s2 = Profile.histogram(vals.filter($"v" % 2 === 1), "v", 8, Some((0L, 99L)))
    val merged = s1.unionByName(s2)
      .groupBy($"bin", $"lo", $"hi").agg(sum($"c").as("c"))
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(merged.toSeq == oneShot.toSeq)
    // a value outside fixed bounds raises per row instead of mis-binning
    intercept[Exception] {
      Profile.histogram(Seq(200L).map(Tuple1(_)).toDF("v"), "v", 8,
        Some((0L, 99L))).collect()
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(vals, "v", 0)
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(vals, "v", 8, Some((5L, 1L)))
    }
    // a value column named like an output is harmless: the input is
    // projected to an internal name first
    val renamed = Profile.histogram(vals.withColumnRenamed("v", "bin"),
      "bin", 8).as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(renamed.map(_._4).sum == 100L)
  }
}
