package graft.merge

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WindowsSpec extends SparkSpec {

  /** Reference semantics oracle (window_based_splitter.py:34-66). */
  private def referenceStarts(n: Int, size: Int, stride: Int): Seq[Int] = {
    if (n <= size) Seq(0)
    else {
      val starts = scala.collection.mutable.ArrayBuffer.empty[Int]
      var i = 0
      while (i + size <= n) { starts += i; i += stride }
      if (starts.last + size < n) starts += n - size // right-aligned last
      starts.toSeq.distinct
    }
  }

  test("window starts match reference right-aligned semantics (property)") {
    import spark.implicits._
    val cases = for {
      n <- Seq(1, 5, 31, 32, 33, 47, 48, 64, 100, 127)
      (size, stride) <- Seq((32, 16), (32, 32), (8, 4), (16, 8))
    } yield (n, size, stride)
    for ((n, size, stride) <- cases) {
      val toks = (0 until n).map(i => s"t$i")
      val df = Seq((1L, toks)).toDF("doc_id", "tokens")
      val got = Windows.splitTokens(df, "tokens", size, stride)
        .select("offset").collect().map(_.getInt(0)).sorted.toSeq
      val want = referenceStarts(n, size, stride).sorted
      assert(got == want, s"n=$n size=$size stride=$stride got=$got want=$want")
    }
  }

  test("chunkedArray partitions into ≤n chunks (P2 chunked helper)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, Seq("a", "b", "c", "d", "e")),
      (2L, Seq("a", "b", "c")),
      (3L, Seq.empty[String]))
      .toDF("id", "xs")
    val out = df.select(col("id"), Windows.chunkedArray(col("xs"), 3).as("ch"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Seq[String]](1)).toMap
    assert(out(1L) == Seq(Seq("a", "b", "c"), Seq("d", "e")))
    assert(out(2L) == Seq(Seq("a", "b", "c")))
    assert(out(3L) == Seq.empty)
  }

  test("createWindows 3-way dispatch (annotator.py none/sentence/int)") {
    import spark.implicits._
    val text = "Dr. Smith arrived. He sat down. Then he left fast."
    val df = Seq((7L, text)).toDF("doc_id", "text")

    // none: whole doc, one window at offset 0
    val none = Windows.createWindows(df, "doc_id", "text", Windows.WindowMode.NoSplit)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(none == Seq((0, 0, text)))

    // sentence: windows partition the text; offset = exact substring position
    val sent = Windows.createWindows(df, "doc_id", "text", Windows.WindowMode.Sentence)
      .orderBy("window_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    assert(sent.map(_._3).mkString == text)
    assert(sent.map(_._3) == Seq("Dr. Smith arrived. ", "He sat down. ", "Then he left fast."))
    sent.foreach { case (_, off, w) =>
      assert(text.substring(off, off + w.length) == w, s"offset $off wrong for '$w'")
    }
    assert(sent.map(_._1) == sent.indices.toSeq)

    // tokens: slice spans first-token start .. last-token end; right-aligned
    // last window (10 whitespace tokens, size 4 stride 3 -> starts 0,3,6)
    val tok = Windows.createWindows(df, "doc_id", "text", Windows.WindowMode.Tokens(4, 3))
      .orderBy("window_id")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    val words = text.split(" ")
    assert(tok.map(_._3) == Seq(0, 3, 6).map(s => words.slice(s, s + 4).mkString(" ")))
    tok.foreach { case (_, off, w) =>
      assert(text.substring(off, off + w.length) == w, s"token-window offset $off wrong")
    }
  }

  test("split ∘ merge == identity (column fold and typed Aggregator)") {
    import spark.implicits._
    val rnd = new scala.util.Random(9)
    val docs = Seq.tabulate(20) { i =>
      val n = 1 + rnd.nextInt(100)
      (i.toLong, (0 until n).map(j => s"w${i}_$j"))
    }
    val df = docs.toDF("doc_id", "tokens")
    val windows = Windows.splitTokens(df, "tokens", 16, 8)

    val merged = Windows.mergeWindows(windows.select("doc_id", "offset", "window"), "doc_id")
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    for ((id, toks) <- docs) assert(merged(id) == toks, s"column fold doc $id")

    val typed = windows
      .select(col("doc_id"), struct(col("offset"), col("window")).as("w"))
      .as[(Long, DocMergeAggregator.WindowRow)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(DocMergeAggregator.mergeTokens.toColumn)
      .collect().toMap
    for ((id, toks) <- docs) assert(typed(id) == toks, s"typed aggregator doc $id")
  }
}
