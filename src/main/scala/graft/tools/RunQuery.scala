package graft.tools

/** Ad-hoc single-query runner: `RunQuery <sfDir> <name> [cores]` — prints
  * the named [[graft.SparkEntry.queries]] result (the full Verify dump
  * takes minutes; iterating on one query should not). */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val cores = if (args.length > 2) args(2).toInt else 8
    val spark = graft.ops.Sessions.builder(cores, "graft-runquery")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).show(50, truncate = false)
    println(f"[runquery] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
