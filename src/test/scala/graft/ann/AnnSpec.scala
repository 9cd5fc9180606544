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
}
