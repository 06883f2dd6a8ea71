package graft

import graft.ops.Projections
import org.apache.spark.sql.functions._
import org.scalacheck.Gen

/** Property-based round-trips (SURVEY.md §5.3). Uses ScalaCheck
  * generators with explicit sampling (one DataFrame per property batch,
  * not per sample — Spark jobs are the expensive unit). */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val token = Gen.nonEmptyListOf(Gen.alphaNumChar).map(_.mkString)

  test("P11/P12: pack(parse(s)) == s for any packed map") {
    val packedGen = Gen.nonEmptyListOf(Gen.zip(token, token))
      .map(_.take(8).map { case (k, v) => s"$k=$v" }.mkString("|"))
    val samples = Gen.listOfN(60, packedGen).sample.get.distinct
    val out = samples.toDF("packed")
      .select(col("packed"),
        Projections.packMap(Projections.parsePackedMap(col("packed"))).as("rt"))
      .as[(String, String)].collect()
    out.foreach { case (orig, rt) =>
      // duplicate keys collapse (last wins) — compare via parsed form
      val canonical = orig.split("\\|").map(_.split("=", 2))
        .map(a => a(0) -> a(1)).toMap
      val rtMap = rt.split("\\|").map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
      assert(rtMap == canonical, s"$orig -> $rt")
    }
  }

  test("P1/P2/P3: accession split/rebuild round-trips") {
    val accGen = for {
      n <- Gen.chooseNum(1, 999999)
      v <- Gen.chooseNum(1, 99)
      c <- Gen.option(Gen.chooseNum(1, 9))
    } yield (f"phs$n%06d", s"v$v", c.map(i => s"c$i"))
    val samples = Gen.listOfN(80, accGen).sample.get.distinct
    val df = samples.map { case (p, v, c) =>
      (p, v, c.getOrElse(""), p + "." + v + c.map("." + _).getOrElse(""))
    }.toDF("phs", "ver", "consent", "acc")
    val out = df.select(
      col("phs"), col("ver"), col("consent"),
      Projections.splitPart(col("acc"), ".", 1).as("phs2"),
      Projections.splitTokenOrDefault(col("acc"), "\\.", 1, "v1").as("ver2"),
      Projections.regexGroup(col("acc"), "^(phs\\d+\\.v\\d+)(?:\\.(c\\d+))?$", 2).as("c2"))
      .collect()
    out.foreach { r =>
      assert(r.getString(0) == r.getString(3))
      assert(r.getString(1) == r.getString(4))
      assert(r.getString(2) == r.getString(5))
    }
  }

  test("pagination source: exactly-once ids for arbitrary page sizes") {
    import graft.sources.rest.{PageFetcher, PageFetchers}
    val cases = Gen.listOfN(12, Gen.zip(Gen.chooseNum(1, 25), Gen.chooseNum(0, 60)))
      .sample.get.distinct :+ ((1, 0)) :+ ((25, 1)) :+ ((10, 10))
    cases.foreach { case (pageSize, total) =>
      val name = s"prop_${pageSize}_$total"
      PageFetchers.register(name, new PageFetcher {
        override def totalRows: Int = total
        override def fetch(offset: Int, limit: Int): Seq[String] =
          (offset until math.min(offset + limit, total)).map(_.toString)
      })
      val got = spark.read.format("rest-pages")
        .option("fetcher", name).option("pagesize", pageSize.toString).load()
        .select("payload").as[String].collect().map(_.toInt).sorted
      assert(got.sameElements(0 until total), s"page=$pageSize total=$total")
    }
  }
}
