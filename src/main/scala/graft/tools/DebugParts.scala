package graft.tools
import org.apache.spark.sql.functions._
object DebugParts {
  def main(args: Array[String]): Unit = {
    val parts = args(0)
    val dir = "/root/testdata/sf0.1"
    val spark = graft.ops.Sessions.builder(32, "graft-debug-parts")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (32L * 1024 * 1024).toString)
      .config("spark.sql.files.maxPartitionBytes", (8L * 1024 * 1024).toString)
      .config("spark.sql.join.preferSortMergeJoin", "false")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$dir/embeddings.parquet").select(col("vec_id"), col("embedding"))
    val dup = e.withColumn("vec_id", col("vec_id") + 1000000)
    val input = e.unionByName(dup)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.dedup.Dedup.embeddingNearDupPairs(input, "vec_id", "embedding").count()
      println(f"DEBUGPARTS parts=$parts run=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
