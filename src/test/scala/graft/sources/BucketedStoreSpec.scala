package graft.sources

import graft.SparkSpec

class BucketedStoreSpec extends SparkSpec {

  private def formatted(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  // count Exchange NODES via their formatted-explain detail headers
  // "(N) Exchange" — tree lines would double-count each node
  private def exchanges(df: org.apache.spark.sql.DataFrame): Int =
    raw"\(\d+\) Exchange".r.findAllIn(formatted(df)).length

  test("same-key bucketed tables join and aggregate with zero Exchange") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed").toString
    val features = (0L until 2000L).map(i => (i, s"mention $i", i % 7)).toDF("id", "mention", "f")
    val scores = (0L until 2000L).map(i => (i, i * 0.5)).toDF("id", "score")
    BucketedStore.write(features, "bs_features", s"$dir/features", "id", 8)
    BucketedStore.write(scores, "bs_scores", s"$dir/scores", "id", 8)
    try {
      val fa = BucketedStore.table(spark, "bs_features")
      val sc = BucketedStore.table(spark, "bs_scores")

      // co-located equi-join: both sides bucketed by id × 8 → NO shuffle.
      // Disable broadcast so the assertion is about bucketing, not size.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = fa.join(sc, "id")
      try {
        assert(exchanges(joined) == 0,
          s"bucketed-bucketed join must be exchange-free:\n${formatted(joined)}")
        assert(joined.count() == 2000)
        // aggregation on the bucket key is exchange-free too
        val agg = fa.groupBy($"id").count()
        assert(exchanges(agg) == 0,
          s"groupBy(bucket key) must be exchange-free:\n${formatted(agg)}")
        // sanity: the same join over UNbucketed reads of the same data shuffles
        val rawJoin = features.join(scores, "id")
        assert(exchanges(rawJoin) > 0, "control: unbucketed join should shuffle")
        // one-sided: bucketed big side + unbucketed small side shuffles ONLY
        // the unbucketed side (exactly one Exchange)
        val half = fa.join(scores, "id")
        assert(exchanges(half) == 1,
          s"bucketed-unbucketed join must shuffle only one side:\n${formatted(half)}")
      } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

      // correctness parity with the plain join
      val got = joined.select($"id", $"mention", $"score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      val want = features.join(scores, "id").select($"id", $"mention", $"score").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == want)
    } finally {
      BucketedStore.drop(spark, "bs_features")
      BucketedStore.drop(spark, "bs_scores")
    }
  }

  test("external semantics: drop keeps data; re-register sees the same rows") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bucketed-ext").toString
    val df = (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v")
    BucketedStore.write(df, "bs_ext", s"$dir/t", "id", 4)
    BucketedStore.drop(spark, "bs_ext")
    // data survives the drop (external table)
    assert(spark.read.parquet(s"$dir/t").count() == 100)
    // re-register over the same files: same contents, bucketing trusted again
    BucketedStore.write(df, "bs_ext", s"$dir/t", "id", 4)
    try assert(BucketedStore.table(spark, "bs_ext").count() == 100)
    finally BucketedStore.drop(spark, "bs_ext")
  }
}
