package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.HashKernels.mix64
import graft.functions.TextExtract
import graft.schema.{GoldCluster, Page}

/**
 * Deterministic synthetic Common-Crawl-style corpus (FIXTURES.md §1).
 *
 * Every value is a pure function of `(seed, docIdx)` — generation is
 * distributed (`spark.range(...).map`), replay-safe under task retries, and
 * scales to any size without a driver bottleneck (north-rule determinism,
 * SURVEY.md §7.4.6).
 *
 * Shape mirrors what the reference links over (documents mentioning named
 * entities, `/root/reference/relik/inference/annotator.py:250-630`): each
 * page "profiles" one entity via a perturbed surface form (typos,
 * abbreviations, case, diacritics — classic record-linkage noise) plus body
 * paragraphs drawn from an entity-specific vocabulary. Domains are
 * Zipf-distributed to create the head-domain skew the north rule requires
 * blocking to survive.
 *
 * Invariant: `text == TextExtract.extract(html)` by construction, so the
 * byte-identical-text-per-url contract is structural, and golden-tested.
 */
object CorpusGen {

  /** Bump on any change to generated CONTENT (vocabulary pools, page/url
    * shape, perturbation model). Tools that cache a generated corpus on
    * disk key the cache path on this, so a generator change can never be
    * silently measured against a stale corpus (round 5: the TOPIC-pool fix
    * changed every page body while `/tmp/graft-bench-corpus-big-*` kept
    * `_SUCCESS` from the old generator). */
  val generatorVersion: Int = 2

  val FIRST: Array[String] = Array(
    "james", "mary", "john", "patricia", "robert", "jennifer", "michael", "linda",
    "william", "elizabeth", "david", "barbara", "richard", "susan", "joseph", "jessica",
    "thomas", "sarah", "charles", "karen", "christopher", "nancy", "daniel", "lisa",
    "matthew", "betty", "anthony", "margaret", "mark", "sandra", "donald", "ashley",
    "steven", "kimberly", "paul", "emily", "andrew", "donna", "joshua", "michelle",
    "kenneth", "dorothy", "kevin", "carol", "brian", "amanda", "george", "melissa",
    "edward", "deborah", "ronald", "stephanie", "timothy", "rebecca", "jason", "sharon",
    "jeffrey", "laura", "ryan", "cynthia", "jacob", "kathleen", "gary", "amy",
    "nicholas", "angela", "eric", "shirley", "jonathan", "anna", "stephen", "brenda",
    "larry", "pamela", "justin", "emma", "scott", "nicole", "brandon", "helen",
    "benjamin", "samantha", "samuel", "katherine", "gregory", "christine", "frank", "debra",
    "alexander", "rachel", "raymond", "carolyn", "patrick", "janet", "jack", "catherine",
    "dennis", "maria", "jerry", "heather", "tyler", "diane", "aaron", "ruth",
    "jose", "julie", "adam", "olivia", "nathan", "joyce", "henry", "virginia",
    "douglas", "victoria", "zachary", "kelly", "peter", "lauren", "kyle", "christina",
    "ethan", "joan", "walter", "evelyn", "noah", "judith", "jeremy", "megan",
    "christian", "andrea", "keith", "cheryl", "roger", "hannah", "terry", "jacqueline",
    "gerald", "martha", "harold", "gloria", "sean", "teresa", "austin", "ann",
    "carl", "sara", "arthur", "madison", "lawrence", "frances", "dylan", "kathryn",
    "jesse", "janice", "jordan", "jean", "bryan", "abigail", "billy", "alice",
    "joe", "julia", "bruce", "judy", "gabriel", "sophia", "logan", "grace",
    "albert", "denise", "willie", "amber", "alan", "doris", "juan", "marilyn",
    "wayne", "danielle", "elijah", "beverly", "randy", "isabella", "roy", "theresa",
    "vincent", "diana", "ralph", "natalie", "eugene", "brittany", "russell", "charlotte",
    "bobby", "marie", "mason", "kayla", "philip", "alexis", "louis", "lori")

  val LAST: Array[String] = Array(
    "smith", "johnson", "williams", "brown", "jones", "garcia", "miller", "davis",
    "rodriguez", "martinez", "hernandez", "lopez", "gonzalez", "wilson", "anderson", "thomas",
    "taylor", "moore", "jackson", "martin", "lee", "perez", "thompson", "white",
    "harris", "sanchez", "clark", "ramirez", "lewis", "robinson", "walker", "young",
    "allen", "king", "wright", "scott", "torres", "nguyen", "hill", "flores",
    "green", "adams", "nelson", "baker", "hall", "rivera", "campbell", "mitchell",
    "carter", "roberts", "gomez", "phillips", "evans", "turner", "diaz", "parker",
    "cruz", "edwards", "collins", "reyes", "stewart", "morris", "morales", "murphy",
    "cook", "rogers", "gutierrez", "ortiz", "morgan", "cooper", "peterson", "bailey",
    "reed", "kelly", "howard", "ramos", "kim", "cox", "ward", "richardson")

  val CITY: Array[String] = Array(
    "springfield", "riverton", "lakewood", "fairview", "georgetown", "salem", "madison",
    "clinton", "arlington", "ashland", "dover", "hudson", "milton", "newport", "oxford",
    "burlington", "clayton", "dayton", "franklin", "greenville", "kingston", "lebanon",
    "manchester", "marion", "troy", "auburn", "bristol", "camden", "chester", "florence")

  val PROFESSION: Array[String] = Array(
    "engineer", "teacher", "physician", "architect", "journalist", "biologist",
    "economist", "historian", "chemist", "novelist", "violinist", "sculptor",
    "geologist", "linguist", "astronomer", "cartographer", "botanist", "pianist")

  /** 240 deterministic pseudo-words (syllable grid) — the INCIDENTAL
    * (glue) pool paragraphs interleave between topic words. Real pages
    * share a bounded glue vocabulary; at realistic page lengths these
    * repeat in-doc and appear across most documents — the DF-stop's
    * legitimate prey. */
  val FILLER: Array[String] = {
    val a = Array("tor", "ven", "mar", "sol", "bri", "cal", "dor", "fen",
      "gal", "hol", "jun", "kel", "lor", "mir", "nor", "pel", "qui", "ros", "tal", "ver")
    val b = Array("dale", "mont", "wick", "ford", "holm", "stad", "berg", "mere", "rook", "fell")
    for (x <- a; y <- b) yield x + y
  }

  /** 2000 deterministic pseudo-words (3-syllable grid, disjoint from
    * [[FILLER]]) — the TOPIC pool entities draw their vocabulary from. A
    * real corpus' topical vocabulary is orders of magnitude larger than
    * its glue vocabulary, so topic words stay corpus-RARE at any document
    * length — the property the TF≥2 + DF-stop feature design rests on.
    * The old generator drew topics from the 240-word filler pool: at the
    * bench's 6-paragraph × 80-word pages every pool word repeated in-doc
    * in ~15% of ALL documents, the DF-stop (correctly) removed the entire
    * topic signal, and same-entity token jaccard collapsed 0.85 → 0.31
    * (ScoreDist, 20k docs at 6×80) — a zero-entropy corpus mis-measuring
    * the engine, not an engine failure. */
  val TOPIC: Array[String] = {
    val a = Array("tor", "ven", "mar", "sol", "bri", "cal", "dor", "fen",
      "gal", "hol", "jun", "kel", "lor", "mir", "nor", "pel", "qui", "ros", "tal", "ver")
    val b = Array("dale", "mont", "wick", "ford", "holm", "stad", "berg", "mere", "rook", "fell")
    val c = Array("ar", "en", "is", "on", "ul", "ex", "or", "an", "il", "us")
    for (x <- a; y <- b; z <- c) yield x + y + z
  }

  private val VOWELS = "aeiou"
  private val DIACRITIC = Map('a' -> 'á', 'e' -> 'é', 'i' -> 'í', 'o' -> 'ó', 'u' -> 'ú')

  private val DOMAINS: Array[String] = (0 until 101).map {
    case 0 => "news-hub.example.com"
    case i => s"site$i.example.org"
  }.toArray

  /** Zipf(s=1.2) inverse-CDF table over DOMAINS (head-domain skew). */
  private lazy val zipfCdf: Array[Double] = {
    val w = DOMAINS.indices.map(i => 1.0 / math.pow(i + 1, 1.2)).toArray
    val total = w.sum
    val cdf = new Array[Double](w.length)
    var acc = 0.0
    for (i <- w.indices) { acc += w(i) / total; cdf(i) = acc }
    cdf
  }

  private def zipfPick(u: Double): Int = {
    val idx = java.util.Arrays.binarySearch(zipfCdf, u)
    val i = if (idx >= 0) idx else -idx - 1
    math.min(i, DOMAINS.length - 1)
  }

  /** Uniform [0,1) from a hashed long. */
  @inline private def unit(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** Non-negative index in [0, m) from a hashed long (avoids Int.MinValue.abs). */
  @inline private def idx(h: Long, m: Int): Int = ((h >>> 33) % m).toInt


  private val SECTIONS: Array[String] = Array(
    "news", "business", "people", "local", "politics", "sports", "culture",
    "community")

  /** Deterministic Common-Crawl-shaped url: scheme + registrable domain
    * (Zipf head-domain skew preserved) + section + yyyy/mm + an entity word
    * slug + unique numeric tail — ~85 bytes median, matching real crawl
    * frontiers. The corpus previously minted ~40-byte `/p/<e>/<i>` urls,
    * which are unrealistic in BOTH directions that matter to the engine:
    * too short (understates the shuffle weight of string identities the
    * north star's Iceberg corpus carries) and too repetitive (zstd squeezed
    * them below the 16 incompressible bytes of a 128-bit hash id, inverting
    * the round-5 id-width A/B vs what any real url corpus shows). Unique
    * per docIdx, pure in (seed, docIdx, entityId) — the three generators
    * (pages, goldClusters, goldPairs) must mint IDENTICAL urls per doc. */
  private[graft] def pageUrl(seed: Long, docIdx: Long, entityId: Long): String = {
    val h = mix64(seed ^ mix64(docIdx + 7777))
    val domain = DOMAINS(zipfPick(unit(h)))
    val em = entityMeta(seed, entityId)
    val h2 = mix64(h + 0x5deece66dL)
    val section = SECTIONS(idx(h2, SECTIONS.length))
    val year = 2019 + idx(mix64(h2 + 1), 7)
    val month = 1 + idx(mix64(h2 + 2), 12)
    f"https://$domain/$section/$year/$month%02d/${em.first}-${em.last}-${em.city}-${em.profession}/p$entityId-d$docIdx.html"
  }

  final case class EntityMeta(
      entityId: Long, first: String, last: String, city: String,
      birthYear: Int, profession: String, vocab: Array[String])

  def entityMeta(seed: Long, entityId: Long): EntityMeta = {
    val h0 = mix64(seed * 0x9e3779b97f4a7c15L + entityId)
    val first = FIRST(idx(mix64(h0 + 1), FIRST.length))
    val last = LAST(idx(mix64(h0 + 2), LAST.length))
    val city = CITY(idx(mix64(h0 + 3), CITY.length))
    val birthYear = 1930 + idx(mix64(h0 + 4), 70)
    val prof = PROFESSION(idx(mix64(h0 + 5), PROFESSION.length))
    val vocab = Array.tabulate(16)(i => TOPIC(idx(mix64(h0 + 10 + i), TOPIC.length)))
    EntityMeta(entityId, first, last, city, birthYear, prof, vocab)
  }

  private def cap(s: String): String =
    if (s.isEmpty) s else s.substring(0, 1).toUpperCase(java.util.Locale.ROOT) + s.substring(1)

  /** Perturbed surface form of the entity name — pure in (seed, docIdx). */
  def surfaceForm(em: EntityMeta, seed: Long, docIdx: Long): String = {
    val h = mix64(seed ^ mix64(docIdx + 0x51ed2701L))
    val first = cap(em.first); val last = cap(em.last)
    (h & 7L) match {
      case 0 | 1 => s"$first $last"
      case 2     => s"${em.first} ${em.last}" // all lower
      case 3     => s"${first.charAt(0)}. $last" // abbreviated first
      case 4     => // adjacent-swap typo inside last name
        val l = last.toCharArray
        if (l.length > 3) {
          val p = 1 + idx(mix64(h + 1), l.length - 2)
          val t = l(p); l(p) = l(p + 1); l(p + 1) = t
        }
        s"$first ${new String(l)}"
      case 5     => // drop one interior vowel of first name
        val idxs = (1 until first.length - 1).filter(i => VOWELS.indexOf(first.charAt(i).toLower) >= 0)
        if (idxs.nonEmpty) {
          val p = idxs(idx(mix64(h + 2), idxs.length))
          s"${first.substring(0, p)}${first.substring(p + 1)} $last"
        } else s"$first $last"
      case 6     => // diacritic on first vowel of first name
        val i = first.indexWhere(c => DIACRITIC.contains(c.toLower))
        if (i >= 0) s"${first.substring(0, i)}${DIACRITIC(first.charAt(i).toLower)}${first.substring(i + 1)} $last"
        else s"$first $last"
      case _     => s"$first $last, ${em.profession}" // title suffix
    }
  }

  /**
   * Body paragraph of `n` words: two of every three slots cycle through the
   * entity vocabulary (doc-dependent rotation, so word order differs per
   * doc), every third slot is random global filler noise. Guarantees each
   * vocab word appears ≥2× per doc (the TF≥2 topic signature) while filler
   * keeps the raw token sets noisy — same-entity docs are near-identical in
   * *topic* but not in *bytes*.
   */
  private def paragraph(em: EntityMeta, seed: Long, docIdx: Long, para: Int, n: Int): String = {
    val nv = em.vocab.length
    val rot = idx(mix64(seed ^ mix64(docIdx * 7919L + para)), nv)
    val words = new StringBuilder
    var v = 0
    var i = 0
    while (i < n) {
      val h = mix64(seed ^ mix64(docIdx * 1000003L + para * 131L + i))
      val w =
        if (i % 3 == 2) FILLER(idx(h, FILLER.length))
        else { val w0 = em.vocab((rot + v) % nv); v += 1; w0 }
      if (i > 0) words.append(' ')
      words.append(w)
      i += 1
    }
    words.toString
  }

  private def escapeHtml(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  /** Full html page for (seed, docIdx); text := TextExtract of it.
    * `paragraphs`/`paraWords` scale per-doc text volume (bench realism);
    * defaults match the frozen golden fixtures. */
  def genHtml(seed: Long, docIdx: Long, nEntities: Long,
              paragraphs: Int = 2, paraWords: Int = 40): String = {
    val entityId = docIdx % nEntities
    val em = entityMeta(seed, entityId)
    val mention = surfaceForm(em, seed, docIdx)
    val h = mix64(seed ^ mix64(docIdx))
    // ~1.5% exact near-duplicate pages: re-render an earlier doc of the same
    // entity (same mention + paragraphs, different url) — dedup-op fodder.
    val contentIdx =
      if (docIdx >= nEntities && (h & 63L) == 0L) docIdx - nEntities else docIdx
    val m2 = if (contentIdx == docIdx) mention else surfaceForm(em, seed, contentIdx)
    val paras = (1 to paragraphs)
      .map(p => paragraph(em, seed, contentIdx, p, paraWords))
      .map(p => s"<p>$p</p>").mkString("\n")
    s"""<!DOCTYPE html><html><head>
       |<title>${escapeHtml(m2)}</title>
       |<style>body { font: 14px sans-serif; }</style>
       |<script>var tracker = ${h & 0xffff}; track();</script>
       |</head><body>
       |<h1>${escapeHtml(m2)}</h1>
       |<!-- boilerplate nav -->
       |<div>Profile of ${escapeHtml(m2)} &amp; associates.</div>
       |<p>Born in ${em.birthYear} in ${cap(em.city)}. Works as a ${em.profession}.</p>
       |$paras
       |<div>&copy; crawl ${2024}</div>
       |</body></html>""".stripMargin
  }

  def genPage(seed: Long, docIdx: Long, nEntities: Long,
              paragraphs: Int = 2, paraWords: Int = 40): Page = {
    val entityId = docIdx % nEntities
    val h = mix64(seed ^ mix64(docIdx + 7777))
    val url = pageUrl(seed, docIdx, entityId)
    val html = genHtml(seed, docIdx, nEntities, paragraphs, paraWords)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val text = TextExtract.extract(html)
    val ts = new Timestamp(1704067200000L + (mix64(h + 1).abs % (365L * 86400)) * 1000L)
    val lang = if ((mix64(h + 2) & 15L) == 0L) "de" else "en"
    Page(url, ts, html, text, lang)
  }

  /** Distributed pages table: nDocs rows, nDocs/avgClusterSize entities. */
  def pages(spark: SparkSession, nDocs: Long, seed: Long = 42L,
            avgClusterSize: Int = 5, partitions: Int = 32,
            paragraphs: Int = 2, paraWords: Int = 40): Dataset[Page] = {
    import spark.implicits._
    val nEntities = math.max(1L, nDocs / avgClusterSize)
    spark.range(0L, nDocs, 1L, partitions)
      .map(i => genPage(seed, i, nEntities, paragraphs, paraWords))
  }

  /** Ground-truth entity per url (same pure functions as `pages`). */
  def goldClusters(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                   avgClusterSize: Int = 5, partitions: Int = 32): Dataset[GoldCluster] = {
    import spark.implicits._
    val nEntities = math.max(1L, nDocs / avgClusterSize)
    spark.range(0L, nDocs, 1L, partitions).map { i =>
      val entityId = i % nEntities
      GoldCluster(pageUrl(seed, i, entityId), entityId)
    }
  }

  /**
   * Labeled pairs sharing a blocking key (FIXTURES.md §2): positives chain
   * consecutive same-entity pages; negatives pair representatives of
   * different entities that share a (normalized) last name — the hard case a
   * naive name-only matcher gets wrong. Both populations share the
   * `last:<name>` blocking key by construction. Built with window functions
   * + a bounded self-join — no driver-side generation.
   */
  def goldPairs(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                avgClusterSize: Int = 5, partitions: Int = 32): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val nEntities = math.max(1L, nDocs / avgClusterSize)
    val labeled = spark.range(0L, nDocs, 1L, partitions).map { i =>
      val entityId = i % nEntities
      val em = entityMeta(seed, entityId)
      (pageUrl(seed, i, entityId), entityId, em.last)
    }.toDF("url", "entity_id", "last")

    val w = Window.partitionBy($"entity_id").orderBy($"url")
    val positives = labeled
      .withColumn("next_url", lead($"url", 1).over(w))
      .filter($"next_url".isNotNull)
      .select(
        least($"url", $"next_url").as("url_a"),
        greatest($"url", $"next_url").as("url_b"),
        concat(lit("last:"), $"last").as("block_key"),
        lit(true).as("is_match"))

    // one representative page per entity
    val reps = labeled
      .withColumn("rn", row_number().over(Window.partitionBy($"entity_id").orderBy($"url")))
      .filter($"rn" === 1).drop("rn")
    // rank entities within a last-name group; pair each with the next 2
    val wl = Window.partitionBy($"last").orderBy($"entity_id")
    val ranked = reps.withColumn("rk", row_number().over(wl))
    val negatives = ranked.as("x").join(ranked.as("y"),
        $"x.last" === $"y.last" && ($"y.rk" - $"x.rk").between(1, 2))
      .select(
        least($"x.url", $"y.url").as("url_a"),
        greatest($"x.url", $"y.url").as("url_b"),
        concat(lit("last:"), $"x.last").as("block_key"),
        lit(false).as("is_match"))

    positives.unionByName(negatives)
  }
}
