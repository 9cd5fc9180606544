package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ingest.CorpusGen
import graft.pipeline.ErPipeline

/**
 * 100×-scale dress rehearsal (the closest this single-host sandbox gets to
 * validating the web-scale design claims): run the flagship pipelines over a
 * MILLIONS-of-docs on-disk corpus at local[32] and report wall clock,
 * throughput, and the shuffle profile (total + peak per-stage shuffle write,
 * max tasks in any stage). The CC loop's per-iteration edge counts and
 * partition sizing are surfaced with GRAFT_CC_VERBOSE=1 — at this scale the
 * loop should be choosing partition counts ABOVE the small-N floor fan-in,
 * demonstrating the data-proportional sizing rather than the bench constant.
 *
 *   DressRehearsal <corpusDir> <nDocs> <cores>
 *
 * Corpus is generated once (CorpusGen.pages, realistic ~480-word bodies) and
 * reused across invocations. Prints one JSON line per stage of the
 * rehearsal plus a final combined line.
 */
object DressRehearsal {

  def main(args: Array[String]): Unit = {
    val corpusDir = if (args.length > 0) args(0) else "/tmp/graft-rehearsal-corpus"
    val nDocs = if (args.length > 1) args(1).toLong else 3000000L
    val cores = if (args.length > 2) args(2).toInt else 32

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-dress-rehearsal")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      // the corpus is ~11 GB here — default 128 MB splits are fine at this
      // size (≈90 splits); keep them so the rehearsal exercises the
      // production split config, not the tiny-corpus bench override
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // shuffle profile listener: totals and per-stage peaks
    val totalShuffleWrite = new java.util.concurrent.atomic.AtomicLong
    val peakStageShuffle = new java.util.concurrent.atomic.AtomicLong
    val peakStageTasks = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        totalShuffleWrite.addAndGet(w)
        peakStageShuffle.updateAndGet(p => math.max(p, w))
        peakStageTasks.updateAndGet(p => math.max(p, sc.stageInfo.numTasks.toLong))
      }
    })

    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      val t0 = System.nanoTime()
      CorpusGen.pages(spark, nDocs, seed = 42L, partitions = cores * 4,
          paragraphs = 6, paraWords = 80)
        .write.mode("overwrite").parquet(corpusDir)
      println(f"""{"stage":"corpus_gen","docs":$nDocs,"sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
      Console.flush()
    }
    val bytes = new java.io.File(corpusDir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum

    def timed(name: String)(f: => Long): (String, Double, Long) = {
      totalShuffleWrite.set(0); peakStageShuffle.set(0); peakStageTasks.set(0)
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events are posted async (and the bus API is private):
      // a short settle sleep is enough for the per-stage counters here
      Thread.sleep(3000)
      val line = f""""$name":{"sec":$sec%.1f,"rows":$rows,""" +
        f""""docs_per_sec":${nDocs / sec}%.0f,""" +
        f""""shuffle_write_gb":${totalShuffleWrite.get / 1e9}%.2f,""" +
        f""""peak_stage_shuffle_gb":${peakStageShuffle.get / 1e9}%.2f,""" +
        f""""peak_stage_tasks":${peakStageTasks.get}}"""
      println(s"{$line}")
      Console.flush()
      (line, sec, rows)
    }

    val pages = spark.read.parquet(corpusDir)
      .as[graft.schema.Page](org.apache.spark.sql.Encoders.product[graft.schema.Page])

    val er = timed("er_pipeline") { ErPipeline.run(pages).count() }
    val mh = timed("dedup_minhash_full") {
      graft.dedup.Dedup.minhashNearDupGroups(
        pages.toDF().select(col("url").as("doc_id"), col("text")), "doc_id", "text").count()
    }

    println(f"""{"rehearsal":{"docs":$nDocs,"cores":$cores,"corpus_gb":${bytes / 1e9}%.2f,""" +
      s"${er._1},${mh._1}}}")
    Console.flush()
    spark.stop()
  }
}
