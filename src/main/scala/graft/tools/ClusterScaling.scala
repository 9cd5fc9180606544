package graft.tools

import org.apache.spark.sql.Encoders

import graft.pipeline.ErPipeline
import graft.schema.Page

/**
 * North-rule scaling measurement on a REAL multi-executor cluster — the
 * spark-submit counterpart of [[ScalingSuite]] (which measures pinned
 * local[N] points inside one JVM because this sandbox has no cluster
 * manager by default).
 *
 * Usage (topology comes from spark-submit, not from args):
 *
 *   spark-submit --master spark://HOST:7077 \
 *     --executor-memory 6g --conf spark.executor.cores=1 \
 *     --total-executor-cores <N or 4N> \
 *     --class graft.tools.ClusterScaling <jar> <corpusDir> [timedRuns]
 *
 * Measures the SAME job as the in-JVM suite — parquet corpus scan →
 * `ErPipeline.run(...).count()` — under the same protocol: one static
 * shuffle-partition count for every cluster size (`GRAFT_STATIC_PARTS`,
 * default 16, the bench's (8,2)-pair config), one DISCARDED full-corpus
 * warm-up run (executor launch, heap pre-touch, janino codegen, shuffle
 * netty channels all land there — a cold `graft.Main` run was measured
 * 117 s where the warm floor is ~76 s at 8×1-core executors), then
 * best-of-N timed runs. Prints one parseable line:
 *
 *   CLUSTER_SCALING executors=<live> cores=<total> walls=[w1,...] min=<s>
 */
object ClusterScaling {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val runs = if (args.length > 1) args(1).toInt else 2
    val parts = sys.env.getOrElse("GRAFT_STATIC_PARTS", "16")

    // cores only sizes the local[] fallback when nothing is submitted;
    // under spark-submit the submitted master wins (Sessions.builder)
    val spark = graft.ops.Sessions.builder(8, "graft-cluster-scaling")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(): Double = {
      val t0 = System.nanoTime()
      ErPipeline.run(spark.read.parquet(corpusDir)
        .as[Page](Encoders.product[Page])).count()
      (System.nanoTime() - t0) / 1e9
    }

    val warm = timed() // discarded: executor launch + JIT + pre-touch
    val walls = (1 to runs).map(_ => timed())

    // executor JVMs actually holding blocks (driver excluded) — proves the
    // run really fanned out to the submitted topology
    val execs = spark.sparkContext.getExecutorMemoryStatus.size - 1
    val totalCores = spark.sparkContext.getConf.get("spark.cores.max", "?")
    println(f"CLUSTER_SCALING executors=$execs cores=$totalCores warm=$warm%.1f " +
      f"walls=[${walls.map(w => f"$w%.1f").mkString(",")}] min=${walls.min}%.1f")
    spark.stop()
  }
}
