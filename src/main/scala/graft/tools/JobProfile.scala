package graft.tools

import org.apache.spark.scheduler._

/**
 * Per-JOB wall-clock breakdown of one SparkEntry query under the EXACT
 * bench session config: `JobProfile <name> <sfDir> [runs] [cores]`.
 *
 * Prints, for the LAST (warm) run, every Spark job with its duration,
 * stage count, task count and call site — the measurement the guide's §1
 * empirical loop needs when the Spark UI is disabled (all graft sessions
 * run ui.enabled=false). Gaps between jobs are driver-side time (planning,
 * collects, broadcast builds): printed as GAP lines.
 */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3).toInt else 32
    val spark = graft.ops.Sessions.builder(cores, "graft-jobprofile")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L * 1024 * 1024).toString)
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class Job(id: Int, t0: Long, var t1: Long, var stages: Int,
                   var tasks: Int, site: String)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, Job]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = if (record) {
        val site = Option(e.properties)
          .flatMap(p => Option(p.getProperty("callSite.short")))
          .orElse(e.stageInfos.sortBy(-_.stageId).headOption.map(_.name))
          .getOrElse("?")
        jobs.put(e.jobId, Job(e.jobId, e.time, -1L,
          e.stageInfos.size, e.stageInfos.map(_.numTasks).sum, site.take(90)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = if (record) {
        Option(jobs.get(e.jobId)).foreach(_.t1 = e.time)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // bench-only stress tiers (mirrors graft.Bench's clones() definitions)
    def clones(s: org.apache.spark.sql.SparkSession, dir: String) = {
      import org.apache.spark.sql.functions.col
      val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
      d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000))
    }
    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      name match {
        case "dedup_minhash_full" =>
          (s, dir) => graft.dedup.Dedup.minhashNearDupGroups(clones(s, dir), "doc_id", "text")
        case "dedup_simhash_full" =>
          (s, dir) => graft.dedup.Dedup.simhashNearDupPairs(clones(s, dir), "doc_id", "text")
        case _ => graft.SparkEntry.queries(name)
      }
    (1 to runs).foreach { i =>
      if (i == runs) { jobs.clear(); record = true }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"JOBPROFILE $name run=$i rows=$n sec=$sec%.2f")
      if (i == runs) {
        record = false
        Thread.sleep(300) // let listener events drain
        val sorted = jobs.values().toArray(Array.empty[Job]).sortBy(_.t0)
        var prevEnd = -1L
        sorted.foreach { j =>
          if (prevEnd > 0 && j.t0 - prevEnd > 30)
            println(f"  GAP   ${(j.t0 - prevEnd) / 1000.0}%7.2f s  (driver-side)")
          val dur = if (j.t1 > 0) (j.t1 - j.t0) / 1000.0 else -1.0
          println(f"  JOB ${j.id}%3d $dur%7.2f s  stages=${j.stages}%2d tasks=${j.tasks}%5d  ${j.site}")
          prevEnd = math.max(prevEnd, if (j.t1 > 0) j.t1 else j.t0)
        }
      }
    }
    spark.stop()
  }
}
