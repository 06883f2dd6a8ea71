package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val df = graft.SparkEntry.queries("x3_lsh_pairs")(spark, "/root/testdata/sf0.01")
      df.count() // materialize so AQE finalizes
      println("PLAN_START")
      println(df.queryExecution.executedPlan.toString.take(4000))
      println("PLAN_END")
    } catch { case e: Throwable => println(s"PROBE FAILED: ${e.getMessage}") }
    spark.stop()
  }
}
