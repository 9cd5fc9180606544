package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.ingest.CorpusGen
import graft.pipeline.ErPipeline

/**
 * 100×-scale dress rehearsal (BASELINE.md): one multi-million-document run
 * of the flagship ER pipeline plus the full-strength MinHash near-dup
 * pipeline at local[32], with the telemetry the 100 TB design claims rest
 * on — wall clock, per-stage and total shuffle volume, and the CC loop's
 * per-iteration edge counts / partition sizing (set GRAFT_CC_VERBOSE=1 to
 * stream those). At ≥3M docs the scored edge set (~2.4M+ edges) exceeds the
 * CC local-finish budget, so the distributed star rounds — the code path a
 * real cluster would spend its time in — actually execute, unlike at bench
 * scale.
 *
 *   DressRehearsal [nDocs=3000000] [cores=32] [corpusDir]
 *
 * Prints one JSON line per phase and a final summary line.
 */
object DressRehearsal {

  private final class ShuffleStats extends SparkListener {
    val lock = new Object
    var totalShuffleWrite = 0L
    var peakStageShuffleWrite = 0L
    var peakStageName = ""
    var stages = 0
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = lock.synchronized {
      val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      totalShuffleWrite += w
      stages += 1
      if (w > peakStageShuffleWrite) {
        peakStageShuffleWrite = w
        peakStageName = sc.stageInfo.name.takeWhile(_ != '\n').take(60)
      }
    }
    def resetWindow(): (Long, Long, String, Int) = lock.synchronized {
      val out = (totalShuffleWrite, peakStageShuffleWrite, peakStageName, stages)
      totalShuffleWrite = 0L; peakStageShuffleWrite = 0L; peakStageName = ""; stages = 0
      out
    }
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 3000000L
    val cores = if (args.length > 1) args(1).toInt else 32
    val corpusDir = if (args.length > 2) args(2) else s"/tmp/graft-rehearsal-corpus-$nDocs"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-dress-rehearsal")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (32L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (8L * 1024 * 1024).toString)
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "4g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new ShuffleStats
    spark.sparkContext.addSparkListener(stats)

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def gb(b: Long): Double = b / 1e9

    // ---- corpus (generation excluded from the measured phases)
    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      val (_, genSec) = timed {
        CorpusGen.pages(spark, nDocs, seed = 42L, partitions = cores * 4,
            paragraphs = 6, paraWords = 80)
          .write.mode("overwrite").parquet(corpusDir)
      }
      println(f"""{"phase":"corpus_gen","docs":$nDocs,"sec":$genSec%.1f}""")
    }
    stats.resetWindow()

    // ---- flagship ER pipeline
    val pages = spark.read.parquet(corpusDir)
      .as[graft.schema.Page](org.apache.spark.sql.Encoders.product[graft.schema.Page])
    val (clusters, erSec) = timed { ErPipeline.run(pages).count() }
    val (erShuffle, erPeak, erPeakName, erStages) = stats.resetWindow()
    println(f"""{"phase":"er_pipeline","docs":$nDocs,"sec":$erSec%.1f,"docs_per_sec":${nDocs / erSec}%.0f,"clusters":$clusters,"shuffle_write_gb":${gb(erShuffle)}%.2f,"peak_stage_shuffle_gb":${gb(erPeak)}%.2f,"peak_stage":"$erPeakName","stages":$erStages}""")
    Console.flush()

    // ---- full-strength MinHash near-dup over the same corpus (each page +
    //      a planted clone → known dup structure at full volume)
    val docs = spark.read.parquet(corpusDir)
      .selectExpr("url AS doc_id", "text")
    val cloned = docs.unionByName(
      docs.selectExpr("concat(doc_id, '#clone') AS doc_id", "text"))
    val (dupGroups, mhSec) = timed {
      graft.dedup.Dedup.minhashNearDupGroups(cloned, "doc_id", "text").count()
    }
    val (mhShuffle, mhPeak, mhPeakName, mhStages) = stats.resetWindow()
    println(f"""{"phase":"dedup_minhash_full","docs":${nDocs * 2},"sec":$mhSec%.1f,"docs_per_sec":${nDocs * 2 / mhSec}%.0f,"rows":$dupGroups,"shuffle_write_gb":${gb(mhShuffle)}%.2f,"peak_stage_shuffle_gb":${gb(mhPeak)}%.2f,"peak_stage":"$mhPeakName","stages":$mhStages}""")
    Console.flush()
    spark.stop()
  }
}
