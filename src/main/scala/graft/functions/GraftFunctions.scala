package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftbridge.ColumnBridge

/**
 * Column-API + SQL surface of the graft function library (SURVEY.md §2.9,
 * §2.11). Mirrors `org.apache.spark.sql.functions`: each custom Catalyst
 * expression gets a typed `Column` wrapper, plus optional SQL registration
 * so `spark.sql("SELECT jaro_winkler(a,b) ...")` works.
 */
object GraftFunctions {

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** html BINARY -> extracted text (frozen, byte-identical per input). */
  def extract_text(html: Column): Column = col(ExtractText(expr(html)))

  /** NFD-fold + lowercase(ROOT) + alnum-collapse normalization. */
  def normalize_text(s: Column): Column = col(NormalizeText(expr(s)))

  /** Offset-preserving whitespace tokenizer: ARRAY<STRUCT<text,i,idx,idx_end>>. */
  def tokenize_offsets(s: Column): Column = col(TokenizeWithOffsets(expr(s)))

  /** Abbreviation-aware sentence split (P2); sentences partition the text. */
  def split_sentences(s: Column): Column = col(SplitSentences(expr(s)))

  def jaro_winkler(a: Column, b: Column): Column = col(JaroWinkler(expr(a), expr(b)))

  def levenshtein_sim(a: Column, b: Column): Column = col(LevenshteinSim(expr(a), expr(b)))

  def char_shingle_hashes(text: Column, k: Int, seed: Long = 42L): Column =
    col(CharShingleHashes(expr(text), k, seed))

  def token_ngram_hashes(tokens: Column, n: Int, seed: Long = 42L): Column =
    col(TokenNgramHashes(expr(tokens), n, seed))

  /** Positional (in-order, duplicates kept) twin of [[token_ngram_hashes]]. */
  def token_ngram_hash_seq(tokens: Column, n: Int, seed: Long = 42L): Column =
    col(TokenNgramHashSeq(expr(tokens), n, seed))

  def tf_filtered_hashes(tokens: Column, minTf: Int = 2, minKeep: Int = 8, seed: Long = 42L): Column =
    col(TfFilteredHashes(expr(tokens), minTf, minKeep, seed))

  def minhash_signature(hashes: Column, numHashes: Int, seed: Long = 42L): Column =
    col(MinHashSignature(expr(hashes), numHashes, seed))

  def minhash_band_keys(sig: Column, bands: Int, rowsPerBand: Int): Column =
    col(MinHashBandKeys(expr(sig), bands, rowsPerBand))

  def simhash64(hashes: Column, seed: Long = 42L): Column = col(SimHash64(expr(hashes), seed))

  def simhash_band_keys(fp: Column, segments: Int, choose: Int): Column =
    col(SimHashBandKeys(expr(fp), segments, choose))

  def rolling_fingerprint(text: Column): Column = col(RollingFingerprint(expr(text)))

  def hamming_dist64(a: Column, b: Column): Column = col(HammingDist64(expr(a), expr(b)))

  def minhash_overlap(a: Column, b: Column): Column = col(MinHashOverlap(expr(a), expr(b)))

  def jaccard_sorted(a: Column, b: Column): Column = col(JaccardSorted(expr(a), expr(b)))

  def cosine_sim(a: Column, b: Column): Column = col(CosineSim(expr(a), expr(b)))

  def dot_product(a: Column, b: Column): Column = col(DotProduct(expr(a), expr(b)))

  def srp_band_keys(vec: Column, bands: Int, bits: Int, seed: Long = 42L): Column =
    col(SrpBandKeys(expr(vec), bands, bits, seed))

  /** 128-bit identity key: two independently-seeded xxhash64 lanes packed
    * as STRUCT<h1:BIGINT,h2:BIGINT> — a 16-byte, codegen'd, orderable
    * shuffle key. A single 64-bit lane is NOT identity at web scale
    * (C(n,2)/2^64 ≈ 2.7·10^4 expected false merges at 10^12 rows); two
    * lanes push that to ~10^-15 corpus-wide. xxhash64 mixes its column
    * list, so the distinct literal lane salt yields an independent hash.
    * Used as the content key by the dedup tier and as the node id by the
    * ER hot path (urls mapped in once, restored once at output). */
  def id128(c: Column): Column = {
    import org.apache.spark.sql.{functions => F}
    F.struct(F.xxhash64(c).as("h1"),
      F.xxhash64(F.lit(0x9e3779b97f4a7c15L), c).as("h2"))
  }

  private def lit(e: Expression): Int =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case i: Int  => i
      case l: Long => l.toInt
      case other   => other.toString.toInt
    }
  private def litL(e: Expression): Long =
    e.eval(org.apache.spark.sql.catalyst.InternalRow.empty) match {
      case i: Int  => i.toLong
      case l: Long => l
      case other   => other.toString.toLong
    }

  /** Register the SQL-facing functions on a session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("extract_text", es => ExtractText(es.head), "built-in")
    reg.createOrReplaceTempFunction("normalize_text", es => NormalizeText(es.head), "built-in")
    reg.createOrReplaceTempFunction("jaro_winkler", es => JaroWinkler(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("levenshtein_sim", es => LevenshteinSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("char_shingle_hashes",
      es => CharShingleHashes(es(0), lit(es(1)), if (es.length > 2) litL(es(2)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("token_ngram_hashes",
      es => TokenNgramHashes(es(0), lit(es(1)), if (es.length > 2) litL(es(2)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("token_ngram_hash_seq",
      es => TokenNgramHashSeq(es(0), lit(es(1)), if (es.length > 2) litL(es(2)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("minhash_signature",
      es => MinHashSignature(es(0), lit(es(1)), if (es.length > 2) litL(es(2)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("minhash_band_keys",
      es => MinHashBandKeys(es(0), lit(es(1)), lit(es(2))), "built-in")
    reg.createOrReplaceTempFunction("simhash64",
      es => SimHash64(es(0), if (es.length > 1) litL(es(1)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("rolling_fingerprint", es => RollingFingerprint(es.head), "built-in")
    reg.createOrReplaceTempFunction("hamming_dist64", es => HammingDist64(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("minhash_overlap", es => MinHashOverlap(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("jaccard_sorted", es => JaccardSorted(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("cosine_sim", es => CosineSim(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("dot_product", es => DotProduct(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("tf_filtered_hashes",
      es => TfFilteredHashes(es(0), lit(es(1)), lit(es(2)), if (es.length > 3) litL(es(3)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("srp_band_keys",
      es => SrpBandKeys(es(0), lit(es(1)), lit(es(2)), if (es.length > 3) litL(es(3)) else 42L), "built-in")
    reg.createOrReplaceTempFunction("simhash_band_keys",
      es => SimHashBandKeys(es(0), lit(es(1)), lit(es(2))), "built-in")
    reg.createOrReplaceTempFunction("tokenize_offsets", es => TokenizeWithOffsets(es.head), "built-in")
    reg.createOrReplaceTempFunction("split_sentences", es => SplitSentences(es.head), "built-in")
  }
}
