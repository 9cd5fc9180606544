package graft.misc

import graft.SparkSpec
import graft.multimodal.Multimodal
import graft.streaming.StreamOps
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class ModulesSpec extends SparkSpec {

  // ------------------------------------------------------------ multimodal
  test("multimodal decode is deterministic and preserves partitioning") {
    val media = Multimodal.syntheticMedia(spark, 100L, partitions = 4)
    val m1 = Multimodal.decode(media).collect().sortBy(_.media_id)
    val m2 = Multimodal.decode(media).collect().sortBy(_.media_id)
    assert(m1.toSeq == m2.toSeq)
    assert(m1.forall(_.ok))
    assert(m1.count(_.kind == "image") == 34)
    assert(m1.filter(_.kind == "image").forall(m => m.width >= 64 && m.duration_ms == 0))
    assert(m1.filter(_.kind == "audio").forall(m => m.width == 0 && m.channels == 2))
    assert(media.rdd.getNumPartitions == 4)
  }

  test("frame sampling shape: bounded frames, deterministic features") {
    val meta = Multimodal.decode(Multimodal.syntheticMedia(spark, 60L))
    val frames = Multimodal.sampleFrames(meta, everyMs = 60000L, maxFrames = 5, featureDim = 4)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.feature.length == 4))
    val perMedia = frames.groupBy(_.media_id)
    assert(perMedia.values.forall(_.length <= 5))
    assert(frames.forall(f => f.offset_ms == f.frame_idx * 60000L))
  }

  // ------------------------------------------------------------- streaming
  test("streaming windowed stats == batch plan on same data (parity)") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val expected = StreamOps.windowedEventStats(batch).collect()
      .map(_.toString).sorted

    // streaming file source requires a directory, not a single file
    val streamDir = java.nio.file.Files.createTempDirectory("graft-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      streamDir.resolve("events.parquet"))
    val stream = spark.readStream
      .schema(batch.schema)
      .parquet(streamDir.toString)
    // complete mode: append would withhold windows the watermark has not
    // closed when the bounded stream ends
    val q = StreamOps.windowedEventStats(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("winstats")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(60000)
    val got = spark.table("winstats").collect().map(_.toString).sorted
    assert(got.toSeq == expected.toSeq)
  }

  test("streaming dedup within watermark") {
    val dir = "/root/testdata/sf0.001"
    val batch = spark.read.parquet(s"$dir/events.parquet")
    val doubled = batch.unionAll(batch)
    val deduped = StreamOps.dedupStream(doubled, Seq("event_id"))
    assert(deduped.count() == batch.count())
  }

  test("sessionize produces per-user gap sessions") {
    val dir = "/root/testdata/sf0.001"
    val events = spark.read.parquet(s"$dir/events.parquet")
    val sessions = StreamOps.sessionize(events, gap = "10 minutes")
    val n = sessions.count()
    assert(n > 0)
    val agg = sessions.agg(sum("n_events")).collect()(0).getLong(0)
    assert(agg == events.count(), "every event lands in exactly one session")
  }

  // ---------------------------------------------------------- text analysis
  test("langid picks the language with most function words") {
    import spark.implicits._
    val df = Seq(
      (1L, "the cat is on the mat and it was warm"),
      (2L, "der hund ist von dem haus und nicht hier"),
      (3L, "el perro es un animal y la casa es grande"),
      (4L, "zzz qqq www")).toDF("doc_id", "text")
    val out = TextAnalysis.langId(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("lang_guess")).toMap
    assert(out(1L) == "en")
    assert(out(2L) == "de")
    assert(out(3L) == "es")
    assert(out(4L) == "und")
  }

  test("quality score ranges and monotonicity") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs far away today"),
      (2L, "@@@@ #### $$$$ %%%% ^^^^")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityScore(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("quality")).toMap
    assert(out(1L) > out(2L))
    assert(out.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("repetition scores match hand-computed Gopher fractions") {
    import spark.implicits._
    val df = Seq(
      (1L, "a a a b"),          // toks 4: dup=1-2/4, top=3/4; bigrams [a a, a a, a b]: dup=1-2/3, top=2/3
      (2L, "x y z w"),          // all distinct: dup=0, top=1/4; bigrams distinct: dup=0, top=1/3
      (3L, "solo")              // single token: bigram fracs defined as 0
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScores(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> (
        r.getAs[Double]("dup_token_frac"), r.getAs[Double]("top_token_frac"),
        r.getAs[Double]("dup_bigram_frac"), r.getAs[Double]("top_bigram_frac"))).toMap
    assert(out(1L) == ((1.0 - 2.0 / 4, 3.0 / 4, 1.0 - 2.0 / 3, 2.0 / 3)))
    assert(out(2L) == ((0.0, 1.0 / 4, 0.0, 1.0 / 3)))
    assert(out(3L) == ((0.0, 1.0, 0.0, 0.0)))
  }

  // ------------------------------------------------------- JSONL source/sink
  test("JSONL round-trip (S1 scan / S4 sink parity)") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-jsonl").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").json(s"$tmp/docs.jsonl")
    val back = spark.read
      .schema(docs.schema)
      .json(s"$tmp/docs.jsonl")
    assert(back.count() == docs.count())
    val diff = back.exceptAll(docs).count() + docs.exceptAll(back).count()
    assert(diff == 0, s"jsonl round-trip altered $diff rows")
  }
}
