package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query: `TimeQuery <name> <sfDir> [runs] [cores]`. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3).toInt else 32
    // GRAFT_CODEC overrides the production zstd for codec A/Bs
    val spark = graft.ops.Sessions.builder(cores, s"graft-timequery")
      .config("spark.io.compression.codec", sys.env.getOrElse("GRAFT_CODEC", "zstd"))
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    (1 to runs).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"TIMEQUERY $name run=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
