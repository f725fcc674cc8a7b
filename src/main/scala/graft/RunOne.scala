package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE registered query by name and show/explain it.
  *
  * {{{ sbt "runMain graft.RunOne v18_ivfpq_rerank /root/testdata/sf0.01" }}}
  *
  * Third optional arg "explain" prints the formatted physical plan
  * instead of collecting rows; "time" runs it twice (warm) and prints
  * wall seconds — the same single-query loop graft.Bench runs in bulk.
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val mode = if (args.length > 2) args(2) else "show"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries",
        math.max(30000, SparkEntry.queries.size * 150).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    mode match {
      case "explain" => fn(spark, sfDir).explain("formatted")
      case "time" =>
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        Caches.reset(spark)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[runone] $name ${(System.nanoTime() - t0) / 1e9}%.3f s")
      case _ => fn(spark, sfDir).show(50, truncate = false)
    }
    spark.stop()
  }
}
