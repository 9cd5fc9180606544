package graft.spans

import graft.SparkSpec
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions.tokenize_offsets

class SpansSpec extends SparkSpec {

  test("tokenize_offsets matches the reference offset contract") {
    import spark.implicits._
    val out = Seq("hello  world  foo", " a bc  def", "", "   ").toDF("text")
      .select(explode(tokenize_offsets(col("text"))).as("t"))
      .select($"t.text", $"t.i", $"t.idx", $"t.idx_end")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3)))
    assert(out.toSeq == Seq(
      ("hello", 0, 0, 5), ("world", 1, 7, 12), ("foo", 2, 14, 17),
      ("a", 0, 1, 2), ("bc", 1, 3, 5), ("def", 2, 7, 10)))
  }

  test("tokenize_offsets round-trips: substring(idx, idx_end) == token") {
    import spark.implicits._
    val texts = Seq(
      "the quick brown fox", "über  straße\tmit	tabs", "x", "a  b   c    d")
    val bad = texts.toDF("text")
      .select(col("text"), explode(tokenize_offsets(col("text"))).as("t"))
      .filter(expr("substring(text, t.idx + 1, t.idx_end - t.idx) != t.text"))
      .count()
    assert(bad == 0)
  }

  test("char→token conversion: exact boundaries and snap fallback") {
    import spark.implicits._
    // "hello world xy" tokens: hello(0,5) world(6,11) xy(12,14)
    val d = Seq(("hello world xy", 0, 5), // exact: ts=0 te=1
                ("hello world xy", 6, 11), // exact token 1
                ("hello world xy", 2, 9), // snap: inside hello→0, inside world→te=2
                ("hello world xy", 0, 14) // whole text
      ).toDF("text", "s", "e")
    val out = Spans.withTokenSpans(d, "text", col("s"), col("e"))
      .select($"s", $"e", $"ts", $"te", $"snap_start", $"snap_end")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4), r.getInt(5)))
    assert(out.toSet == Set(
      (0, 5, 0, 1, 0, 5),
      (6, 11, 1, 2, 6, 11),
      (2, 9, 0, 2, 0, 11), // snapped out to word boundaries
      (0, 14, 0, 3, 0, 14)))
  }

  test("shrinkSpanWhitespace strips flanking spaces like the reference walk") {
    import spark.implicits._
    //          0123456789012345
    val text = "ab  cd ef   gh"
    val cases = Seq((2, 6), (3, 7), (6, 12), (0, 14))
    val out = cases.toDF("s", "e")
      .withColumn("r", Spans.shrinkSpanWhitespace(lit(text), col("s"), col("e")))
      .select($"s", $"e", $"r.start", $"r.end")
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> (r.getInt(2), r.getInt(3))).toMap
    def refShrink(s0: Int, e0: Int): (Int, Int) = {
      var s = s0; var e = e0
      while (e - 1 >= 0 && text.length > e - 1 && text(e - 1) == ' ') e -= 1
      while (s >= 0 && text.length > s && text(s) == ' ') s += 1
      (s, e)
    }
    cases.foreach { case (s, e) => assert(out((s, e)) == refShrink(s, e), s"span ($s,$e)") }
  }

  test("mergeWindowSpans: dedup across overlap, first-seen prob, sorted") {
    import spark.implicits._
    // windows 0 and 1 overlap; span (4,5,'x') seen by both with different
    // probs → keep window 0's; spans sorted by start in the output
    val w = Seq(
      (1L, 0, Seq((4, 5, "x", 0.9), (1, 2, "y", 0.8))),
      (1L, 16, Seq((4, 5, "x", 0.2), (20, 21, "z", 0.7))),
      (2L, 0, Seq((0, 1, "q", 0.5)))
    ).toDF("doc_id", "offset", "raw")
      .withColumn("spans", transform(col("raw"), r => struct(
        r.getField("_1").as("start"), r.getField("_2").as("end"),
        r.getField("_3").as("label"), r.getField("_4").as("prob"))))
      .drop("raw")
    val out = Spans.mergeWindowSpans(w).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[org.apache.spark.sql.Row](1).map(s =>
          (s.getInt(0), s.getInt(1), s.getString(2), s.getDouble(3)))).toMap
    assert(out(1L) == Seq((1, 2, "y", 0.8), (4, 5, "x", 0.9), (20, 21, "z", 0.7)))
    assert(out(2L) == Seq((0, 1, "q", 0.5)))
  }
}
