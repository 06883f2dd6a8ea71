package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      val e = graft.SparkEntry.entry(spark)
      println(s"ENTRY ROWS: ${e.count()}")
      e.show(5)
    } catch { case e: Throwable => println(s"ENTRY FAILED: ${e.getMessage}") }
    spark.stop()
  }
}
