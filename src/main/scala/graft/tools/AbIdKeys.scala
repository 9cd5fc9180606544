package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.ingest.CorpusGen
import graft.pipeline.ErPipeline

/**
 * A/B of the ER hot path's id discipline (BASELINE.md "url vs 128-bit hash
 * ids" table): the SAME corpus and core count through `ErPipeline.run` with
 * `hashIds = false` (STRING url shuffle keys / CC node ids) vs `true`
 * (16-byte STRUCT<h1,h2>), reporting wall clock and total shuffle WRITE
 * bytes per mode. Bytes are the design argument — on a memory-bandwidth-
 * capped executor (this guest, or any instance at 100 TB) shuffled bytes
 * are wall-clock, and the id column rides EVERY hot shuffle (block-key
 * explode, pair dedup, attach joins, edge set, CC loop).
 *
 *   AbIdKeys [nDocs=300000] [cores=8] [runsPerMode=2] [corpusDir]
 *
 * Modes alternate (url, hash, url, hash…) inside ONE pinned JVM so host
 * weather lands on both sides; per-mode result is the MIN wall (and the
 * shuffle bytes of that run — bytes are deterministic per mode up to AQE
 * coalescing jitter). One JSON line at the end.
 */
object AbIdKeys {

  private final class Bytes extends SparkListener {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val records = new java.util.concurrent.atomic.AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      total.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      records.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    // NOTE bytesWritten is POST-compression (zstd in production sessions):
    // it measures network/disk volume. recordsWritten × row width proxies
    // the UNCOMPRESSED volume the sorters/serializers/memory bus move.
    def reset(): (Long, Long) =
      { Thread.sleep(3000); (total.getAndSet(0L), records.getAndSet(0L)) } // settle async events
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.length > 0) args(0).toLong else 300000L
    val cores = if (args.length > 1) args(1).toInt else 8
    val runs = if (args.length > 2) args(2).toInt else 2
    val corpusDir = if (args.length > 3) args(3)
      else s"/tmp/graft-bench-corpus-v${graft.ingest.CorpusGen.generatorVersion}-$nDocs"

    ScalingSuite.pinSelf(cores, 0)
    val spark = graft.ops.Sessions.builder(cores, "graft-ab-idkeys")
      .config("spark.sql.shuffle.partitions", (cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", (16L * 1024 * 1024).toString)
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val bytes = new Bytes
    spark.sparkContext.addSparkListener(bytes)

    if (!new java.io.File(s"$corpusDir/_SUCCESS").exists()) {
      CorpusGen.pages(spark, nDocs, seed = 42L, partitions = cores * 4,
          paragraphs = 6, paraWords = 80)
        .write.mode("overwrite").parquet(corpusDir)
    }
    def pages = spark.read.parquet(corpusDir)
      .as[graft.schema.Page](org.apache.spark.sql.Encoders.product[graft.schema.Page])

    // JIT/codegen warm-up for BOTH modes (excluded from timing)
    for (h <- Seq(false, true))
      ErPipeline.run(CorpusGen.pages(spark, 2000L, seed = 7L, partitions = cores),
        ErPipeline.Config(hashIds = h)).count()
    bytes.reset()

    val samples = scala.collection.mutable.Map.empty[Boolean, List[(Double, Long, Long)]]
      .withDefaultValue(Nil)
    for (r <- 1 to runs; h <- Seq(false, true)) {
      val t0 = System.nanoTime()
      val n = ErPipeline.run(pages, ErPipeline.Config(hashIds = h)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      val (b, rec) = bytes.reset()
      samples(h) = (sec, b, rec) :: samples(h)
      System.err.println(f"[ab] run=$r hashIds=$h docs=$n sec=$sec%.1f shuffle_gb=${b / 1e9}%.2f shuffle_mrows=${rec / 1e6}%.1f")
    }
    def best(h: Boolean): (Double, Long, Long) = samples(h).minBy(_._1)
    val (us, ub, ur) = best(false)
    val (hs, hb, hr) = best(true)
    println(f"""{"ab":"id_keys","docs":$nDocs,"cores":$cores,"runs_per_mode":$runs,""" +
      f""""url":{"sec":$us%.1f,"shuffle_gb":${ub / 1e9}%.2f,"shuffle_mrows":${ur / 1e6}%.1f},""" +
      f""""hash":{"sec":$hs%.1f,"shuffle_gb":${hb / 1e9}%.2f,"shuffle_mrows":${hr / 1e6}%.1f},""" +
      f""""wall_ratio":${us / hs}%.3f,"bytes_ratio":${ub.toDouble / hb}%.3f}""")
    spark.stop()
  }
}
