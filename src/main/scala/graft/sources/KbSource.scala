package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Knowledge-base document source (SURVEY.md §2.1 S2): the reference loads
 * KB entries from jsonl or header-driven tsv/csv with free-form metadata
 * columns and an id that defaults to a hash of the text
 * (`/root/reference/relik/retriever/indexers/document.py:312-380`).
 *
 * Spark shape: `(id LONG, text STRING, metadata MAP<STRING,STRING>)` —
 * every non-(id, text) column becomes a metadata entry, so downstream
 * operators never depend on a KB-specific schema.
 */
object KbSource {

  /** Header-driven delimited KB: every extra column → metadata map entry. */
  def loadDelimited(spark: SparkSession, path: String, sep: String = "\t"): DataFrame = {
    val raw = spark.read.option("sep", sep).option("header", "true").csv(path)
    val extras = raw.columns.filterNot(c => c == "id" || c == "text")
    val meta = map_from_arrays(
      array(extras.map(lit(_)): _*),
      array(extras.map(col): _*))
    withDefaults(raw.withColumn("metadata", meta))
  }

  /** jsonl KB: `{"id": …, "text": …, "metadata": {…}}`, id/metadata optional.
    * `spark.read.json` infers the metadata object as a STRUCT (one field per
    * key seen anywhere in the file), and Spark cannot cast STRUCT to
    * MAP<STRING,STRING> — so the map is assembled from the inferred fields,
    * dropping per-row-absent (null) entries. */
  def loadJsonl(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read.json(path)
    val withMeta =
      if (!raw.columns.contains("metadata"))
        raw.withColumn("metadata", map(): Column)
      else raw.schema("metadata").dataType match {
        case s: org.apache.spark.sql.types.StructType =>
          val fields = s.fieldNames.toSeq
          val asMap =
            if (fields.isEmpty) map(): Column
            else map_filter(
              map_from_arrays(
                array(fields.map(lit(_)): _*),
                array(fields.map(f => col(s"metadata.`$f`").cast("string")): _*)),
              (_, v) => v.isNotNull)
          raw.withColumn("metadata", asMap)
        case _ => raw // already a map (or null column)
      }
    withDefaults(withMeta)
  }

  /** id defaults to a deterministic text hash when absent (document.py:341). */
  private def withDefaults(df: DataFrame): DataFrame = {
    val withId =
      if (df.columns.contains("id"))
        df.withColumn("id", coalesce(col("id").cast("long"), xxhash64(col("text"))))
      else df.withColumn("id", xxhash64(col("text")))
    withId.select(col("id"), col("text"),
      col("metadata").cast("map<string,string>").as("metadata"))
  }

  /**
   * P8 candidate/passage formatting (`indexers/base.py:244-266`): the
   * reader's input passage is the document text plus selected metadata
   * fields joined by a separator —
   * `text ⊕ sep ⊕ meta[f1] ⊕ sep ⊕ meta[f2] …`. Missing fields contribute
   * an empty string (the reference indexes into the dict and its loaders
   * default metadata values to ""). Pure expression — no UDF.
   */
  def formatPassage(text: Column, metadata: Column, fields: Seq[String],
                    separator: String = " <def> "): Column =
    if (fields.isEmpty) text
    else concat(text, concat_ws("",
      fields.map(f => concat(lit(separator),
        coalesce(element_at(metadata, f), lit("")))): _*))
}
