package graft.tools

import org.apache.spark.sql.SparkSession

import graft.ingest.CorpusGen
import graft.pipeline.ErPipeline

/**
 * North-rule scaling measurement, all core counts in ONE JVM:
 *
 *   ScalingSuite <corpusDir> <coresCsv e.g. 32,8> <timedRuns>
 *
 * prints one `SCALING <cores> <bestSec>` line per point.
 *
 * Why one JVM (vs the round-1 fresh-JVM-per-point): this Firecracker guest
 * runs virtio-balloon FREE PAGE REPORTING — memory freed by an exiting JVM
 * is returned to the host, and the next JVM's allocations refault every
 * page through VM exits, which serializes across vCPUs (measured 70-90%
 * system time and 13s-vs-178s bimodal wall-clock for identical runs). One
 * pre-touched heap that stays resident for all points removes that noise
 * source from the measurement.
 *
 * Per-point isolation inside the JVM:
 *  - the whole process is re-pinned with `taskset -pc 0-(cores-1)` so the
 *    point really runs on `cores` CPUs (GC, netty and JIT threads included,
 *    like an N-core executor host);
 *  - a fresh SparkSession with master=local[cores] and shuffle partitions
 *    2×cores;
 *  - per-point JIT/codegen warm-up run, then best-of-N timed runs.
 *
 * Measurement order is HIGH cores first: any residual JIT/page-cache warmth
 * benefits the later LOW-core baseline, which can only UNDERSTATE the
 * reported N→4N efficiency (conservative direction). Both points get the
 * same heap (the 4N point's sizing) — extra memory for the low-core
 * baseline again only makes it faster, i.e. conservative.
 */
object ScalingSuite {

  private def pinSelf(cores: Int): Unit = {
    val pid = ProcessHandle.current().pid()
    val p = new ProcessBuilder("taskset", "-apc", s"0-${cores - 1}", pid.toString)
      .redirectErrorStream(true).start()
    p.waitFor()
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val coreList = args(1).split(",").map(_.trim.toInt).toSeq
    val runs = if (args.length > 2) args(2).toInt else 2

    // repeated core counts in the list (e.g. 32,8,32,8) interleave the
    // points across time, so slow-mode drift of the host hits both sides
    // equally; the per-cores MIN is reported
    // ONE job config for every point (the north rule compares the same job
    // at two cluster sizes; a per-size shuffle-partition count would be a
    // different job). Sized for the largest point; AQE coalesces downward.
    val shufflePartitions = coreList.max * 2

    val results = coreList.map { cores =>
      pinSelf(cores)
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .appName(s"graft-scaling-$cores")
        .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", (128L * 1024 * 1024).toString)
        // small corpus needs small splits to exercise all cores: a real
        // 100 TB input has millions of natural splits
        .config("spark.sql.files.maxPartitionBytes", (4L * 1024 * 1024).toString)
        .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
        .config("spark.local.dir", "/tmp/graft-spark-local")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")

      // optional stage telemetry: task counts expose parallelism ceilings
      val stats = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Int, Long, Long)]()
      val debug = sys.env.contains("GRAFT_STAGE_STATS")
      if (debug) spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onStageCompleted(
              sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
            val si = sc.stageInfo
            val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(0L)
            stats.add((si.stageId, si.name.takeWhile(_ != '\n').take(60), si.numTasks,
              si.taskMetrics.executorRunTime, wall))
          }
        })

      // JIT/codegen warm-up at this core count (excluded from timing)
      ErPipeline.run(CorpusGen.pages(spark, 2000L, seed = 7L, partitions = cores)).count()
      stats.clear()

      def timed(): Double = {
        val t0 = System.nanoTime()
        ErPipeline.run(spark.read.parquet(corpusDir)
          .as[graft.schema.Page](org.apache.spark.sql.Encoders.product[graft.schema.Page])).count()
        (System.nanoTime() - t0) / 1e9
      }
      val first = timed()
      if (debug) {
        import scala.jdk.CollectionConverters._
        val top = stats.asScala.toSeq.sortBy(-_._5).take(12)
        top.foreach { case (id, name, tasks, run, wall) =>
          println(f"STAGE[$cores] id=$id tasks=$tasks wall=${wall / 1e3}%.1fs cpu=${run / 1e3}%.1fs $name")
        }
      }
      val best = (Seq(first) ++ (2 to runs).map(_ => timed())).min
      spark.stop()
      cores -> best
    }
    results.groupBy(_._1).toSeq.sortBy(-_._1).foreach { case (c, rs) =>
      println(f"SCALING $c ${rs.map(_._2).min}%.2f")
    }
  }
}
