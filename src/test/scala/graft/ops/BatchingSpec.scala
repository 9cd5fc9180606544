package graft.ops

import graft.SparkSpec

class BatchingSpec extends SparkSpec {

  test("token-budget batching: greedy pack, sorted by length, caps respected") {
    import spark.implicits._
    val df = Seq(
      ("a", 1L, 50), ("a", 2L, 60), ("a", 3L, 10), ("a", 4L, 100), ("a", 5L, 40),
      ("b", 6L, 500)) // oversized row gets its own batch
      .toDF("grp", "id", "toks")
    val out = Batching.tokenBudgetBatches(df, "grp", "id", "toks", budget = 100, maxRows = 3)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getInt(3), r.getInt(4))).toMap
    // group a sorted by (toks,id): 3(10), 5(40), 1(50), 2(60), 4(100)
    // batch0: 10+40+50=100 (3 rows, hits maxRows AND budget)
    // batch1: 60 ... +100 would exceed → batch2: 100
    assert(out(("a", 3L)) == (0, 0))
    assert(out(("a", 5L)) == (0, 1))
    assert(out(("a", 1L)) == (0, 2))
    assert(out(("a", 2L)) == (1, 0))
    assert(out(("a", 4L)) == (2, 0))
    assert(out(("b", 6L)) == (0, 0), "oversized row alone in its batch")
  }

  test("a group spanning many partitions never materializes in one task (chunked pack)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 50k rows in 2 groups with chunkRows=512: each pack task holds ≤512
    // rows; the sequential greedy replay WITH chunk restarts is the spec
    val n = 50000
    val df = spark.range(n.toLong).select(
      (col("id") % 2).cast("string").as("grp"),
      col("id").as("rid"),
      ((col("id") * 37) % 97 + 1).cast("int").as("toks"))
    val out = Batching.tokenBudgetBatches(df, "grp", "rid", "toks",
        budget = 500, maxRows = 16, chunkRows = 512)
      .collect()
    assert(out.length == n)

    // replay: per group, rows in (tokens, id) order, greedy restarting every
    // chunkRows rows — must match the distributed result EXACTLY
    val byGroup = out.groupBy(_.getString(0))
    for ((g, rows) <- byGroup) {
      val sorted = rows.sortBy(r => (r.getInt(2), r.getLong(1)))
      var batch = 0; var acc = 0; var pos = 0; var rank = 0
      sorted.foreach { r =>
        if (rank > 0 && rank % 512 == 0) { batch += 1; acc = 0; pos = 0 } // chunk restart
        else if (pos > 0 && (acc + r.getInt(2) > 500 || pos >= 16)) {
          batch += 1; acc = 0; pos = 0
        }
        acc += r.getInt(2)
        assert(r.getInt(3) == batch, s"group $g rank $rank: batch ${r.getInt(3)} != $batch")
        assert(r.getInt(4) == pos, s"group $g rank $rank: pos ${r.getInt(4)} != $pos")
        pos += 1; rank += 1
      }
    }
  }

  test("every batch within budget unless a single row exceeds it") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val df = Seq.tabulate(200)(i => (s"g${i % 3}", i.toLong, rnd.nextInt(300) + 1))
      .toDF("grp", "id", "toks")
    val rows = Batching.tokenBudgetBatches(df, "grp", "id", "toks", budget = 512, maxRows = 16)
      .collect()
    val byBatch = rows.groupBy(r => (r.getString(0), r.getInt(3)))
    byBatch.foreach { case ((g, b), rs) =>
      val tot = rs.map(_.getInt(2)).sum
      assert(rs.length <= 16, s"batch $g/$b has ${rs.length} rows")
      assert(tot <= 512 || rs.length == 1, s"batch $g/$b holds $tot tokens")
    }
    assert(rows.length == 200)
  }
}
