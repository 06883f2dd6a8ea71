package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-rehearsal main (diagnostic, not part of the engine surface):
  * measures the sf0.1 → 10× runtime scaling of the heavy query
  * families the 100 TB posture leans on (connected components,
  * incremental all-pairs, compacted BM25, PageRank), so the posture
  * rests on an empirical curve, not just plan shape.
  *
  * The 10× corpora are built from sf0.1 by unioning id-shifted copies:
  * - documents for the DEDUP families get a per-copy SUBSTITUTION
  *   CIPHER (`translate` over letters+digits, rotation = copy index;
  *   copy 0 is the identity): character-level shingle structure is
  *   preserved EXACTLY within a copy (the cipher is bijective per
  *   char), while cross-copy 5-char shingles are disjoint (any shared
  *   shingle would need 5 consecutive un-ciphered chars) — so
  *   cluster/pair structure replicates 10× with no artificial
  *   cross-copy mega-clusters, the natural linear-growth regime.
  *   (The first cut of this tool SUFFIXED every token with `_c<i>`,
  *   which injected the same 5-char salt shingles into every doc and
  *   welded the whole corpus into one LSH blob — 7.6M pairs at 1×
  *   vs the real corpus's ~179k. Don't salt inside the shingle
  *   alphabet.);
  * - documents for BM25 stay RAW (shifted ids only): posting lists
  *   grow 10× and the fixed query terms keep matching — the
  *   heavy-hitter growth a bigger corpus really has;
  * - orders/lineitem for PageRank shift all keys per copy → 10
  *   disjoint copies of the graph (linear edge growth, same diameter).
  * Copy offsets are multiples of 15 so the queries' doc_id % 3 / % 5
  * batch splits keep their proportions.
  *
  * Each family runs twice at factor 1 (second reading kept — JIT-warm)
  * and once at factor 10; the printed exponent is
  * log(t10/t1) / log(10) (1.0 = perfectly linear). */
object ScaleRehearsal {
  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val work = if (args.length > 1) args(1) else "/tmp/graft_rehearsal"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.cleaner.periodicGC.interval", "15s")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    val off = 15000000L // multiple of 15: preserves % 3 and % 5 splits

    val lower = "abcdefghijklmnopqrstuvwxyz"
    val upper = lower.toUpperCase
    val digits = "0123456789"
    def rotStr(s: String, i: Int): String = s.drop(i % s.length) + s.take(i % s.length)
    def salted(d: DataFrame, i: Int): DataFrame = d.select(
      (col("doc_id") + i * off).as("doc_id"),
      translate(col("text"), lower + upper + digits,
        rotStr(lower, i) + rotStr(upper, i) + rotStr(digits, i)).as("text"))
    def shifted(d: DataFrame, i: Int): DataFrame = d.select(
      (col("doc_id") + i * off).as("doc_id"), col("text"))

    def prep(path: String, df: DataFrame): Unit = {
      val p = new java.io.File(path)
      if (!p.exists()) df.write.mode("overwrite").parquet(path)
    }
    val docs = spark.read.parquet(s"$base/documents.parquet")
      .select(col("doc_id"), col("text"))
    // factor-1 dirs reuse sf0.1 via a rewritten two-column table so both
    // factors read identically-shaped inputs (no schema-width bias)
    prep(s"$work/x1_salt/documents.parquet", salted(docs, 0))
    prep(s"$work/x10_salt/documents.parquet",
      (0 until 10).map(salted(docs, _)).reduce(_ unionByName _))
    prep(s"$work/x1_raw/documents.parquet", shifted(docs, 0))
    prep(s"$work/x10_raw/documents.parquet",
      (0 until 10).map(shifted(docs, _)).reduce(_ unionByName _))
    val orders = spark.read.parquet(s"$base/orders.parquet")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = spark.read.parquet(s"$base/lineitem.parquet")
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    def g(i: Int)(o: DataFrame, l: DataFrame): (DataFrame, DataFrame) = (
      o.select((col("o_orderkey") + i * off).as("o_orderkey"),
        (col("o_custkey") + i * off).as("o_custkey")),
      l.select((col("l_orderkey") + i * off).as("l_orderkey"),
        (col("l_suppkey") + i * off).as("l_suppkey"), col("l_quantity")))
    prep(s"$work/x1_graph/orders.parquet", g(0)(orders, li)._1)
    prep(s"$work/x1_graph/lineitem.parquet", g(0)(orders, li)._2)
    prep(s"$work/x10_graph/orders.parquet",
      (0 until 10).map(i => g(i)(orders, li)._1).reduce(_ unionByName _))
    prep(s"$work/x10_graph/lineitem.parquet",
      (0 until 10).map(i => g(i)(orders, li)._2).reduce(_ unionByName _))

    // optional 3rd arg: comma list of family-name prefixes (resume a
    // partially-completed rehearsal without re-running finished rows)
    val only = if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val families = Seq(
      ("x17_dup_clusters", "salt"),
      ("x86b_allpairs_incremental", "salt"),
      ("x43d_bm25_compacted", "raw"),
      ("x59_pagerank", "graph"),
      // the exact prefix-filter join (x86 family): the cipher keeps
      // every copy's shingle vocabulary disjoint, so prefix buckets
      // grow linearly — the natural regime for a growing corpus
      ("x86_allpairs_join", "salt"))
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    def run(name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(name)(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      graft.ext.Dedup.drainStageDirs()
      System.gc()
      println(f"[rehearsal] $name $dir rows=$n ${dt}%.2fs")
      dt
    }
    val rows = families.map { case (name, kind) =>
      run(name, s"$work/x1_$kind") // JIT warmup, discarded
      val t1 = run(name, s"$work/x1_$kind")
      val t10 = run(name, s"$work/x10_$kind")
      val exp = math.log(t10 / t1) / math.log(10.0)
      println(f"[rehearsal] SUMMARY $name t1=$t1%.2f t10=$t10%.2f exponent=$exp%.2f")
      f""""$name":{"t1_sec":$t1%.2f,"t10_sec":$t10%.2f,"exponent":$exp%.2f}"""
    }
    println(s"""{"metric":"scale_rehearsal","families":${rows.mkString("{", ",", "}")},"base":"$base"}""")
    spark.stop()
  }
}
