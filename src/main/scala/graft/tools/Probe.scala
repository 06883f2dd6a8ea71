package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch diagnostics main — not part of the engine surface. */
object Probe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus) // match Verify/Bench plans
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // default: smoke the flagship entry; pass a query name + sfDir to
    // inspect a catalog query's executed plan instead
    args.toList match {
      case name :: dir :: rest =>
        graft.functions.GraftFunctions.register(spark)
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(name)(spark, dir)
        val n = df.count() // materialize so AQE finalizes
        println(s"ROWS $n TIME ${(System.nanoTime() - t0) / 1e9}s" +
          (if (name.startsWith("x17")) s" ROUNDS ${graft.ext.Dedup.lastDupClusterRounds}" else ""))
        // optional 3rd arg: dump this one query + its oracle in Verify's
        // layout, so `tools/check.py <sfDir> <outDir>` oracle-checks it
        rest.headOption.foreach { outDir =>
          df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
          val sql = graft.SparkEntry.oracleSql.get(name)
            .map(s => "{\"" + name + "\": " + "\"" +
              s.flatMap {
                case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
                case '\r' => "\\r"; case '\t' => "\\t"
                case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
              } + "\"}")
            .getOrElse("{}")
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$outDir/oracle_sql.json"), sql)
        }
        println("PLAN_START")
        println(df.queryExecution.executedPlan.toString.take(6000))
        println("PLAN_END")
      case _ =>
        val e = graft.SparkEntry.entry(spark)
        println(s"ENTRY ROWS: ${e.count()}")
        e.show(5)
    }
    spark.stop()
  }
}
