package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for named queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/rN/`.
  *
  * {{{ sbt "runMain graft.PlanDump /root/testdata/sf0.1 plans/r10 _after q01 m05" }}}
  *
  * Writes `<outDir>/<queryName><suffix>.txt` for every registered query
  * whose name starts with one of the given prefixes. Session config
  * mirrors graft.Bench (local[$SPARK_GRAFT_CPUS], shuffle partitions =
  * cpus, AQE on) so the dumped plans are the shapes the bench measures.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val prefixes = args.drop(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => prefixes.exists(n.startsWith))
    names.foreach { name =>
      try {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"$name$suffix.txt"), plan)
        println(s"wrote $outDir/$name$suffix.txt")
      } catch {
        case e: Exception => println(s"SKIP $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
