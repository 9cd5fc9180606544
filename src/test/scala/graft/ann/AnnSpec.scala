package graft.ann

import graft.SparkSpec
import graft.functions.VectorKernels

class AnnSpec extends SparkSpec {

  private def corpus(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    Seq.tabulate(n)(i => (i.toLong, Array.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("bruteForceTopK matches naive computation") {
    import spark.implicits._
    val data = corpus(200, 12, 3)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter($"vec_id" < 4)
    val got = Ann.bruteForceTopK(df, queries, 7)
      .collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Int]("rank")) -> r.getAs[Long]("neighbor_id"))
      .toMap

    for (qid <- 0 until 4) {
      val qv = data(qid)._2
      val expected = data.filter(_._1 != qid)
        .map { case (id, v) => (VectorKernels.cosineArr(qv, v), id) }
        .sortBy { case (c, id) => (-c, id) }
        .take(7).map(_._2)
      for ((id, r) <- expected.zipWithIndex)
        assert(got((qid.toLong, r + 1)) == id, s"q=$qid rank=${r + 1}")
    }
  }

  test("lshTopK neighbors are genuinely similar (recall sanity)") {
    import spark.implicits._
    // clustered corpus: 20 centers × 10 jittered members
    val rnd = new scala.util.Random(11)
    val centers = Array.tabulate(20) { c =>
      val r = new scala.util.Random(c + 100)
      Array.fill(16)(r.nextFloat() * 2 - 1)
    }
    val data = for (c <- 0 until 20; m <- 0 until 10) yield {
      val v = centers(c).map(x => x + rnd.nextFloat() * 0.05f)
      ((c * 10 + m).toLong, v)
    }
    val df = data.toDF("vec_id", "embedding")
    val out = Ann.lshTopK(df, 3, Ann.LshConfig(bands = 16, bits = 8)).collect()
    assert(out.nonEmpty)
    // every reported neighbor pair should be same-cluster (cosine huge)
    val sameCluster = out.count(r =>
      r.getAs[Long]("query_id") / 10 == r.getAs[Long]("neighbor_id") / 10)
    assert(sameCluster.toDouble / out.length > 0.95,
      s"same-cluster fraction ${sameCluster.toDouble / out.length}")
  }

  test("lshTopK returns exactly k neighbors per query (sparse-bucket top-up)") {
    import spark.implicits._
    // spread-out corpus: many buckets are singletons, forcing the fallback
    val df = corpus(60, 16, 19).toDF("vec_id", "embedding")
    val k = 4
    val out = Ann.lshTopK(df, k, Ann.LshConfig(bands = 4, bits = 14)).collect()
    val perQuery = out.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) => q -> rs.length }
    assert(perQuery.size == 60, s"every vector is a query: ${perQuery.size}")
    assert(perQuery.values.forall(_ == k), s"counts: ${perQuery.filter(_._2 != k)}")
    // no self-neighbors, no duplicate (query, neighbor)
    assert(out.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    val keys = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
    assert(keys.distinct.length == keys.length, "duplicate neighbor within a query's top-k")
  }

  test("top-up is bounded: majority-sparse corpus completes via coarse probe + chunked exact") {
    import spark.implicits._
    // 120 uniform vectors at bands=4/bits=14: almost every bucket is a
    // singleton, so nearly ALL queries are sparse — the round-2 code
    // collected them all to the driver in one broadcast; the bounded path
    // must (a) still deliver exactly k, (b) record the tail in
    // lastTopUpStats, (c) run the exact residue in chunks of fallbackChunk
    val df = corpus(120, 16, 101).toDF("vec_id", "embedding")
    val k = 3
    val out = Ann.lshTopK(df, k,
      Ann.LshConfig(bands = 4, bits = 14, fallbackChunk = 16)).collect()
    val perQuery = out.groupBy(_.getAs[Long]("query_id")).map { case (q, rs) => q -> rs.length }
    assert(perQuery.size == 120 && perQuery.values.forall(_ == k))
    val st = Ann.lastTopUpStats
    assert(st.sparsePrimary > 60, s"expected majority sparse, got $st")
    assert(st.sparseAfterCoarse <= st.sparsePrimary)
    if (st.sparseAfterCoarse > 0) {
      val expectedChunks = math.ceil(st.sparseAfterCoarse / 16.0).toInt
      assert(st.exactChunks == expectedChunks,
        s"exact residue must be chunked: $st vs expected $expectedChunks chunks")
    }
  }

  test("index artifact: build once, query many, parity with lshTopK contract") {
    import spark.implicits._
    // clustered corpus: LSH recall is meaningful (random vectors have no
    // neighborhood structure for buckets to capture)
    val rnd = new scala.util.Random(41)
    val centers = Array.tabulate(12) { c =>
      val r = new scala.util.Random(c + 500)
      Array.fill(16)(r.nextFloat() * 2 - 1)
    }
    val data = for (c <- 0 until 12; m <- 0 until 10) yield {
      ((c * 10 + m).toLong, centers(c).map(x => x + rnd.nextFloat() * 0.05f))
    }
    val df = data.toDF("vec_id", "embedding")
    val path = java.nio.file.Files.createTempDirectory("graft-ann-index").toString
    Ann.buildIndex(df, path, Ann.LshConfig(bands = 12, bits = 8))
    // partition pruning is structural: buckets parquet is partitioned by band
    assert(new java.io.File(s"$path/buckets").listFiles().exists(_.getName.startsWith("band=")))
    val out = Ann.queryIndex(spark, path, df.filter($"vec_id" < 10), 5).collect()
    val perQ = out.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length).toMap
    assert(perQ.size == 10 && perQ.values.forall(_ == 5), s"per-query counts: $perQ")
    // neighbors produced through the artifact match exact search reasonably
    val exact = Ann.bruteForceTopK(df, df.filter($"vec_id" < 10), 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val got = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(got).size.toDouble / exact.size
    assert(recall >= 0.8, s"indexed-search recall vs exact: $recall")
  }

  test("ivfTopK: recall vs exact ≥ 0.9 on clustered corpus, always-k, deterministic") {
    import spark.implicits._
    val rnd = new scala.util.Random(57)
    val centers = Array.tabulate(15) { c =>
      val r = new scala.util.Random(c + 700)
      Array.fill(16)(r.nextFloat() * 2 - 1)
    }
    val data = for (c <- 0 until 15; m <- 0 until 8) yield {
      ((c * 8 + m).toLong, centers(c).map(x => x + rnd.nextFloat() * 0.05f))
    }
    val df = data.toDF("vec_id", "embedding")
    val k = 3
    val cfg = Ann.IvfConfig(nlist = 15, nprobe = 2, maxTrain = 64)
    val out = Ann.ivfTopK(df, k, cfg).collect()
    // always-k: every vector is a query with exactly k ranked neighbors
    val perQ = out.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length).toMap
    assert(perQ.size == 120 && perQ.values.forall(_ == k), s"per-query counts off")
    assert(out.forall(r => r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id")))
    // recall vs exact: the quantizer adapts to the 15 planted clusters
    val exact = Ann.bruteForceTopK(df, df, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"ivf recall $recall")
    // determinism under input partitioning: quantizer sample, assignment and
    // ranking are all pure functions of (contents, cfg)
    val out2 = Ann.ivfTopK(df.repartition(7), k, cfg).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    val out1 = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"), r.getAs[Int]("rank"))).toSet
    assert(out1 == out2, "ivfTopK must be invariant under input partitioning")
  }

  test("ivfTopK: sparse probed lists complete via bounded chunked exact") {
    import spark.implicits._
    // nlist ≈ corpus size → nearly every inverted list is a singleton and
    // nprobe=1 yields < k candidates for most queries: the top-up must
    // deliver exactly k through chunked exact passes, never one big collect
    val df = corpus(80, 16, 83).toDF("vec_id", "embedding")
    val k = 4
    val out = Ann.ivfTopK(df, k,
      Ann.IvfConfig(nlist = 64, nprobe = 1, maxTrain = 80, fallbackChunk = 16)).collect()
    val perQ = out.groupBy(_.getAs[Long]("query_id")).view.mapValues(_.length).toMap
    assert(perQ.size == 80 && perQ.values.forall(_ == k), s"per-query counts off")
    val st = Ann.lastTopUpStats
    assert(st.sparsePrimary > 0, "expected sparse queries in this geometry")
    assert(st.exactChunks == math.ceil(st.sparseAfterCoarse / 16.0).toInt,
      s"exact residue must be chunked: $st")
  }

  test("lshTopK recall vs exact brute force ≥ 0.9 on clustered corpus") {
    import spark.implicits._
    val rnd = new scala.util.Random(23)
    val centers = Array.tabulate(15) { c =>
      val r = new scala.util.Random(c + 300)
      Array.fill(16)(r.nextFloat() * 2 - 1)
    }
    val data = for (c <- 0 until 15; m <- 0 until 8) yield {
      val v = centers(c).map(x => x + rnd.nextFloat() * 0.05f)
      ((c * 8 + m).toLong, v)
    }
    val df = data.toDF("vec_id", "embedding")
    val k = 3
    val exact = Ann.bruteForceTopK(df, df, k).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val approx = Ann.lshTopK(df, k, Ann.LshConfig(bands = 16, bits = 8)).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = exact.intersect(approx).size.toDouble / exact.size
    assert(recall >= 0.9, s"recall $recall")
  }
}
