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
