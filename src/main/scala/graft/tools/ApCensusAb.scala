package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B harness for the AllPairsIndex census question (r16 verdict #1
  * tail): does the narrow staged per-token census (`censusInIndex`)
  * beat the base-prefix re-scan once the corpus SHARES vocabulary
  * across shards (the zipf corpus), as the r16 rejected-variant note
  * predicted? Runs the x86b-shaped 80/20 ingest flow, both index
  * forms, on both rehearsal corpora. Diagnostic tool — run after
  * ScaleRehearsal has prepared /tmp/graft_rehearsal:
  *   SPARK_DRIVER_MEM=64g sbt "runMain graft.tools.ApCensusAb [factor]"
  */
object ApCensusAb {
  def main(args: Array[String]): Unit = {
    val work = "/tmp/graft_rehearsal"
    val factor = args.headOption.map(_.toInt).getOrElse(100)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def flow(dir: String, census: Boolean): Long = {
      val d = spark.read.parquet(s"$dir/documents.parquet")
        .filter(col("text").isNotNull)
        .select(col("doc_id"),
          graft.ext.Dedup.wordNgrams(col("text"), 3).as("gs"))
      val idx = graft.ext.Dedup.allPairsIndex(
        d.filter(pmod(col("doc_id"), lit(5)) =!= 0), "doc_id", "gs", 6, 10,
        censusInIndex = census)
      graft.ext.Dedup.allPairsJoinIncremental(
        d.filter(pmod(col("doc_id"), lit(5)) === 0), idx, "doc_id", "gs",
        6, 10).count()
    }

    def time(label: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.ext.Dedup.drainStageDirs()
      System.gc()
      println(f"[ap-ab] $label rows=$n ${dt}%.2fs")
      dt
    }

    for (kind <- Seq("salt", "zipf")) {
      // parity at factor 1, then JIT-warm measure at both factors
      val p1 = flow(s"$work/x1_$kind", census = false)
      val p2 = flow(s"$work/x1_$kind", census = true)
      require(p1 == p2, s"arms disagree on $kind: $p1 vs $p2")
      println(s"[ap-ab] parity OK $kind ($p1 pairs)")
      for (d <- Seq(s"$work/x1_$kind", s"$work/x${factor}_$kind")) {
        val ts = time(s"A prefix-scan $kind $d")(flow(d, census = false))
        val tc = time(s"B narrow-census $kind $d")(flow(d, census = true))
        println(f"[ap-ab] SUMMARY $kind dir=$d A_scan=$ts%.2fs B_census=$tc%.2fs")
      }
    }
    spark.stop()
  }
}
