package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.storage.StorageLevel

import graft.block.Blocking
import graft.cluster.ConnectedComponents
import graft.score.PairScorer

/** Per-stage wall-clock profile of the ER pipeline at a given core count. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cores = if (args.nonEmpty) args(0).toInt else 8
    val corpusDir = if (args.length > 1) args(1) else "/tmp/graft-bench-corpus-20000"
    val shuffleParts = sys.env.getOrElse("GRAFT_SHUFFLE_PARTITIONS", cores.toString)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", shuffleParts)
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.sql.adaptive.coalescePartitions.enabled", sys.env.getOrElse("GRAFT_AQE_COALESCE", "true"))
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PARTITION_BYTES", (4L * 1024 * 1024).toString))
      .config("spark.sql.files.openCostInBytes", (512L * 1024).toString)
      .config("spark.local.dir", "/tmp/graft-spark-local")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val total0 = System.nanoTime()
    val pages = spark.read.parquet(corpusDir).as[graft.schema.Page]
    val cfg = Blocking.Config()

    val feats = time("features(+dfstop)") {
      val f = Blocking.features(pages, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      f.count(); f
    }
    val blocks = time("blockKeys") {
      val b = Blocking.blockKeys(feats, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      b.count(); b
    }
    val pairs = time("candidatePairs") {
      val p = Blocking.candidatePairs(blocks, cfg).persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[profile]   pairs = ${p.count()}")
      p
    }
    val edges = time("attach+score") {
      val e = PairScorer.score(Blocking.attachFeatures(pairs, feats))
        .persist(StorageLevel.MEMORY_AND_DISK)
      println(s"[profile]   edges = ${e.count()}")
      e
    }
    time("connectedComponents") {
      ConnectedComponents.assignAll(pages.toDF().select("url"), edges).count()
    }
    println(f"[profile] TOTAL (cores=$cores) ${(System.nanoTime() - total0) / 1e9}%8.2f s")
    spark.stop()
  }
}
