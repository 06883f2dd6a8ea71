package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object LshRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ext.Dedup
    // fixture dir as args(0) so the shipped jar isn't pinned to one box
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val d = spark.read.parquet(s"$dir/documents.parquet")
    // ground truth in LSH's OWN measure: 5-char-shingle-set Jaccard
    val sets = d.select(col("doc_id"), expr(
      "array_distinct(transform(sequence(1, greatest(length(text)-4, 1)), i -> substring(text, i, 5)))").as("toks"))
    val a = sets.select(col("doc_id").as("a_id"), col("toks").as("a_toks"))
    val b = sets.select(col("doc_id").as("b_id"), col("toks").as("b_toks"))
    val all = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_toks"), col("b_toks"))).cast("double") /
         size(array_union(col("a_toks"), col("b_toks")))).as("j"))
    for (t <- Seq(0.5, 0.7, 0.9)) {
      val truth = all.filter(col("j") >= t).select("a_id", "b_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val cand = Dedup.lshCandidatePairs(Dedup.minhashSignature(d, "text", 4),
        "doc_id", 4, 2).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      if (truth.nonEmpty)
        println(s"t=$t truth=${truth.size} cand=${cand.size} recall=${(cand & truth).size.toDouble / truth.size}")
      else println(s"t=$t truth empty")
    }
    spark.stop()
  }
}
