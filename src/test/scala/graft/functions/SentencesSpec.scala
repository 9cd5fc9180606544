package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

/** P2 abbreviation-aware sentence splitting (spacy_sentence_splitter.py
  * analog): boundary rule, abbreviation rejections, partition invariant. */
class SentencesSpec extends SparkSpec {

  private def split(s: String): Seq[String] = {
    val arr = SentenceKernels.splitSentences(UTF8String.fromString(s))
    (0 until arr.numElements()).map(i => arr.getUTF8String(i).toString)
  }

  test("boundary: punct + spaces + uppercase splits; lowercase does not") {
    assert(split("One sentence. Another one! A third? Done") ==
      Seq("One sentence. ", "Another one! ", "A third? ", "Done"))
    assert(split("version 2.5 is out. lowercase continues here") ==
      Seq("version 2.5 is out. lowercase continues here"))
    assert(split("No space.Next") == Seq("No space.Next"))
  }

  test("abbreviations do not end sentences") {
    assert(split("Dr. Smith arrived. He sat down.") ==
      Seq("Dr. Smith arrived. ", "He sat down."))
    assert(split("See e.g. Newton. Also Leibniz.") ==
      Seq("See e.g. Newton. ", "Also Leibniz."))
    assert(split("Prices rose (see Fig. 3). Nothing else moved. OK") ==
      Seq("Prices rose (see Fig. 3). ", "Nothing else moved. ", "OK"))
  }

  test("widened abbreviation model: corporate, places, months, initials") {
    assert(split("Acme Inc. The merger closed. Done") ==
      Seq("Acme Inc. The merger closed. ", "Done"))
    assert(split("He works at Foo Corp. Ltd. His desk is small.") ==
      Seq("He works at Foo Corp. Ltd. His desk is small."))
    assert(split("Born in the U.S. He moved. Later he returned.") ==
      Seq("Born in the U.S. He moved. ", "Later he returned."))
    // initials pattern, not in the enumerated list
    assert(split("J. R. Tolkien wrote. Then he rested.") ==
      Seq("J. R. Tolkien wrote. ", "Then he rested."))
    assert(split("On Jan. Mt. Rainier was climbed. It snowed.") ==
      Seq("On Jan. Mt. Rainier was climbed. ", "It snowed."))
    // a real boundary still splits even when the last word is short
    assert(split("It was hot. Very hot.") == Seq("It was hot. ", "Very hot."))
  }

  test("isInitials accepts ([a-z].)+ only") {
    assert(SentenceKernels.isInitials("j."))
    assert(SentenceKernels.isInitials("j.r."))
    assert(SentenceKernels.isInitials("u.s."))
    assert(!SentenceKernels.isInitials("."))
    assert(!SentenceKernels.isInitials("jr."))
    assert(!SentenceKernels.isInitials("2."))
    assert(!SentenceKernels.isInitials("j.r"))
    assert(!SentenceKernels.isInitials(""))
  }

  test("partition invariant: concat(sentences) == text, any input") {
    val texts = Seq(
      "Mr. A met Mrs. B. They talked! For hours? Yes.  Double space. End",
      "", "   ", "x", "A. B. C. D.", "no punct at all just words")
    texts.foreach { t =>
      assert(split(t).mkString == t, s"partition broken for: '$t'")
    }
    // property: random ascii soup
    val rnd = new scala.util.Random(7)
    (1 to 200).foreach { _ =>
      val t = Seq.fill(rnd.nextInt(60))(
        "aZ.! ?x".charAt(rnd.nextInt(7))).mkString
      assert(split(t).mkString == t, s"partition broken for: '$t'")
    }
  }

  test("column expression + SQL registration parity") {
    import spark.implicits._
    GraftFunctions.register(spark)
    val df = Seq((1L, "Dr. Who left. Then came back.")).toDF("id", "text")
    val viaCol = df.select(GraftFunctions.split_sentences(col("text"))).collect()
      .head.getSeq[String](0)
    df.createOrReplaceTempView("sentences_in")
    val viaSql = spark.sql("SELECT split_sentences(text) FROM sentences_in")
      .collect().head.getSeq[String](0)
    assert(viaCol == Seq("Dr. Who left. ", "Then came back."))
    assert(viaCol == viaSql)
  }
}
