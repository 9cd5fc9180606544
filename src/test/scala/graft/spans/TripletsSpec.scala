package graft.spans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/**
 * RE-side A1 (window→doc triplet merge, `manager.py:400-430`) and the
 * candidate-list merge (`manager.py:432-464`), plus the relation eval
 * operators over a hand-computed fixture.
 */
class TripletsSpec extends SparkSpec {

  private def tripletRow(s: (Int, Int, String), rel: String, o: (Int, Int, String), conf: Double) =
    (s._1, s._2, s._3, rel, o._1, o._2, o._3, conf)

  test("A1 triplet merge: union + dedup across overlap, first-seen conf, sorted") {
    import spark.implicits._
    // window 0 and window 16 both see the (5,6)-r-(7,8) triplet; conf must
    // come from window 0 (first seen); window 16 adds a second triplet
    val w = Seq(
      (1L, 0, Seq(tripletRow((5, 6, "ta"), "r0", (7, 8, "tb"), 1.0))),
      (1L, 16, Seq(
        tripletRow((5, 6, "ta"), "r0", (7, 8, "tb"), 17.0),
        tripletRow((20, 21, "tc"), "r1", (22, 23, "td"), 17.0))))
      .toDF("doc_id", "offset", "flat")
      .withColumn("triplets", transform(col("flat"), t => struct(
        struct(t.getField("_1").as("start"), t.getField("_2").as("end"),
          t.getField("_3").as("label"), lit(1.0).as("prob")).as("subject"),
        t.getField("_4").as("relation"),
        struct(t.getField("_5").as("start"), t.getField("_6").as("end"),
          t.getField("_7").as("label"), lit(1.0).as("prob")).as("obj"),
        t.getField("_8").as("conf"))))
      .drop("flat")
    val merged = Triplets.mergeWindowTriplets(w).collect()
    assert(merged.length == 1)
    val ts = merged.head.getSeq[org.apache.spark.sql.Row](1)
    assert(ts.length == 2, "overlap copy deduped")
    // sorted by (s_start, ...) and first-seen conf kept
    assert(ts.head.getAs[Int]("s_start") == 5 && ts.head.getAs[Double]("conf") == 1.0)
    assert(ts(1).getAs[Int]("s_start") == 20 && ts(1).getAs[Double]("conf") == 17.0)
  }

  test("A1 candidate merge: concat in window order, first-seen dedup") {
    import spark.implicits._
    val w = Seq(
      (1L, 16, Seq("x", "y", "q")),
      (1L, 0, Seq("a", "b", "x")),
      (2L, 0, Seq("m")))
      .toDF("doc_id", "offset", "cands")
    val out = Triplets.mergeWindowCandidates(w).collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // window order 0 then 16; "x" already seen in window 0 keeps rank 3
    assert(out(1L) == Seq("a", "b", "x", "y", "q"))
    assert(out(2L) == Seq("m"))
  }

  test("TripletEval: boundary vs strict counts and per-relation breakdown") {
    import spark.implicits._
    val cols = Seq("doc_id", "s_start", "s_end", "s_label", "relation",
      "o_start", "o_end", "o_label")
    val gold = Seq(
      (1L, 0, 1, "a", "r0", 2, 3, "b"),
      (1L, 4, 5, "c", "r0", 6, 7, "d"),
      (1L, 8, 9, "e", "r1", 10, 11, "f"))
      .toDF(cols: _*)
    val pred = Seq(
      (1L, 0, 1, "a", "r0", 2, 3, "b"),   // strict hit
      (1L, 4, 5, "C", "r0", 6, 7, "d"),   // boundary hit, strict miss (label)
      (1L, 8, 9, "e", "rX", 10, 11, "f")) // miss (relation in boundary key)
      .toDF(cols: _*)
    val m = graft.eval.TripletEval.strongMatching(pred, gold).collect().head
    assert(m.getAs[Long]("n_gold") == 3 && m.getAs[Long]("n_pred") == 3)
    assert(m.getAs[Long]("correct_bound") == 2)
    assert(m.getAs[Long]("correct_strict") == 1)
    assert(math.abs(m.getAs[Double]("recall_bound") - 2.0 / 3) < 1e-9)

    val per = graft.eval.TripletEval.perRelation(pred, gold).collect()
      .map(r => r.getAs[String]("relation") -> r).toMap
    assert(per.keySet == Set("r0", "r1"), "breakdown keyed by GOLD relations only")
    assert(per("r0").getAs[Long]("support") == 2)
    assert(per("r0").getAs[Long]("correct_bound") == 2)
    assert(per("r0").getAs[Long]("correct_strict") == 1)
    assert(per("r1").getAs[Long]("correct_bound") == 0)
  }
}
