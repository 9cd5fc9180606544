package graft.tools

import org.apache.spark.scheduler._

/**
 * Per-STAGE wall/CPU breakdown of one SparkEntry query under the exact
 * bench session config: `StageProfile <name> <sfDir> [runs] [cores]`.
 *
 * Complements [[JobProfile]] (per-job walls): a job's stages name the
 * operator subtree that actually ran (exchange map sides, cache builds,
 * AQE materializations), which is the attribution §7.2 of the optimization
 * guide asks for when the UI is disabled. For the LAST (warm) run prints
 * every stage with submission-to-completion wall, summed task run time,
 * task count and the stage name Spark derived from the RDD call sites.
 */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val runs = if (args.length > 2) args(2).toInt else 2
    val cores = if (args.length > 3) args(3).toInt else 32
    val spark = graft.ops.Sessions.builder(cores, "graft-stageprofile")
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

    case class St(id: Int, t0: Long, var t1: Long, var tasks: Int,
                  var taskMs: Long, var shufReadB: Long, var shufWriteB: Long,
                  name: String, var deserMs: Long = 0L, var gcMs: Long = 0L,
                  var cpuNs: Long = 0L)
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, St]()
    @volatile var record = false
    val listener = new SparkListener {
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = if (record) {
        val si = e.stageInfo
        // rdd scope names carry the physical operator names AQE hides from
        // the stage callsite — the §7.2 plan attribution, stage-side
        val ops = si.rddInfos.sortBy(_.id).flatMap(_.scope.map(_.name))
          .distinct.mkString(">")
        stages.put(si.stageId, St(si.stageId, System.currentTimeMillis(), -1L,
          si.numTasks, 0L, 0L, 0L, ops.take(200)))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = if (record) {
        Option(stages.get(e.stageInfo.stageId)).foreach { s =>
          s.t1 = System.currentTimeMillis()
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            s.taskMs = m.executorRunTime
            s.shufReadB = m.shuffleReadMetrics.totalBytesRead
            s.shufWriteB = m.shuffleWriteMetrics.bytesWritten
            s.deserMs = m.executorDeserializeTime
            s.gcMs = m.jvmGCTime
            s.cpuNs = m.executorCpuTime
          }
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // GRAFT_PRINT_PLANS=1: dump the FINAL adaptive plan of every query
    // execution (including eager-localCheckpoint interiors, which
    // ExplainQuery cannot see) — §7.2 plan attribution for operators that
    // materialize inside themselves.
    if (sys.env.contains("GRAFT_PRINT_PLANS")) {
      spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
        override def onSuccess(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               durationNs: Long): Unit = {
          val s = qe.executedPlan.toString
          if (s.length > 2000) { // only the substantial plans
            println(s"==== QE $funcName ${durationNs / 1e9} s ====")
            println(s.take(30000))
          }
        }
        override def onFailure(funcName: String,
                               qe: org.apache.spark.sql.execution.QueryExecution,
                               exception: Exception): Unit = ()
      })
    }

    val fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      name match {
        case "dedup_minhash_full" =>
          (s, dir) => {
            import org.apache.spark.sql.functions.col
            val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
            graft.dedup.Dedup.minhashNearDupGroups(
              d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000)), "doc_id", "text")
          }
        case "dedup_simhash_full" =>
          (s, dir) => {
            import org.apache.spark.sql.functions.col
            val d = s.read.parquet(s"$dir/documents.parquet").select(col("doc_id"), col("text"))
            graft.dedup.Dedup.simhashNearDupPairs(
              d.unionByName(d.withColumn("doc_id", col("doc_id") + 1000000)), "doc_id", "text")
          }
        case _ => graft.SparkEntry.queries(name)
      }
    (1 to runs).foreach { i =>
      if (i == runs) { stages.clear(); record = true }
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"STAGEPROFILE $name run=$i rows=$n sec=$sec%.2f")
      if (i == runs) {
        record = false
        Thread.sleep(300)
        val sorted = stages.values().toArray(Array.empty[St]).sortBy(_.t0)
        sorted.foreach { s =>
          val dur = if (s.t1 > 0) (s.t1 - s.t0) / 1000.0 else -1.0
          println(f"  STAGE ${s.id}%4d $dur%6.2f s  run=${s.taskMs / 1000.0}%6.2f s cpu=${s.cpuNs / 1e9}%6.2f s " +
            f"deser=${s.deserMs / 1000.0}%5.2f s gc=${s.gcMs / 1000.0}%5.2f s tasks=${s.tasks}%4d " +
            f"sr=${s.shufReadB / 1048576.0}%7.1fMB sw=${s.shufWriteB / 1048576.0}%7.1fMB  ${s.name}")
        }
        val wall = sorted.filter(_.t1 > 0)
        println(f"  TOTAL stage-wall=${wall.map(s => s.t1 - s.t0).sum / 1000.0}%.2f s " +
          f"cpu=${sorted.map(_.taskMs).sum / 1000.0}%.2f s stages=${sorted.length}")
      }
    }
    spark.stop()
  }
}
