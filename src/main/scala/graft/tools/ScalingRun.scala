package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ingest.CorpusGen
import graft.pipeline.ErPipeline

/**
 * One isolated scaling measurement: run the ER pipeline over an on-disk
 * corpus at `local[cores]`, print ONE line `cores sec` to stdout.
 *
 * Spawned as a fresh `java` child per core count (see Bench): measuring
 * inside an sbt-forked JVM proved wildly unstable (5× wall-clock swings from
 * launcher contention), while standalone JVMs repeat within ±3%. A fresh
 * JVM per data point also removes cross-measurement pollution (JIT state,
 * heap fragmentation, lingering block-manager entries).
 */
object ScalingRun {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val cores = args(1).toInt
    val runs = if (args.length > 2) args(2).toInt else 1

    val shufflePartitions = sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", (cores * 2).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      // The test corpus is tiny next to the default 128 MB split size: a
      // 60-220 MB corpus would coalesce to 1-3 scan partitions and run the
      // whole map side on 3 of N cores. A real cluster job over 100 TB has
      // millions of natural splits; small splits here recreate that shape.
      .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // JIT/codegen warm-up (excluded)
    ErPipeline.run(CorpusGen.pages(spark, 2000L, seed = 7L, partitions = cores)).count()

    def timed(): Double = {
      val t0 = System.nanoTime()
      ErPipeline.run(spark.read.parquet(corpusDir).as[graft.schema.Page]).count()
      (System.nanoTime() - t0) / 1e9
    }
    val best = (1 to runs).map(_ => timed()).min
    println(f"SCALING $cores $best%.2f")
    spark.stop()
  }
}
