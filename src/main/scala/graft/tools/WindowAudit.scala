package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-8 audit: find which catalog queries produce an UNPARTITIONED
  * WindowExec (Spark's "No Partition Defined ... single partition"
  * regime). Bounded frames (limit-k seeds) are acceptable; a corpus-
  * sized global window is a scale bug. Prints one line per offender. */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      // WARN-level marker so the WindowExec warning interleaves with the
      // query name in one log stream (stdout/stderr ordering is unreliable)
      org.apache.log4j.Logger.getLogger("graft.audit").warn(s"QUERY $name")
      try {
        val df = fn(spark, sfDir)
        var hits = 0
        df.queryExecution.executedPlan.foreach {
          case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => hits += 1
          case _ => ()
        }
        if (hits > 0) println(s"GLOBAL_WINDOW $name $hits")
        df.count() // surface warnings from runtime-built subplans too
      } catch { case e: Throwable =>
        println(s"PLAN_ERROR $name ${e.getClass.getSimpleName}")
      }
    }
    println("WINDOW_AUDIT_DONE")
    spark.stop()
  }
}
