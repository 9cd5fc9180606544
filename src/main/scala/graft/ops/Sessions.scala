package graft.ops

import org.apache.spark.sql.SparkSession

/**
 * Shared SparkSession configuration for every production entry point (Main,
 * Bench, Verify, ScalingSuite, DressRehearsal).
 *
 * `survival` carries the settings the 100×-scale dress rehearsal proved
 * necessary (BASELINE.md "failure→fix lessons") — they used to live only in
 * the rehearsal tool, which meant the library's own sessions would re-hit
 * the same per-executor failures at scale:
 *
 *  - `spark.sql.windowExec.buffer.in.memory.threshold=512`: WindowExec holds
 *    the first N rows of every group in an UNSPILLABLE in-memory buffer
 *    (default 4096). The sorted-neighborhood `lead()` window buffers whole
 *    hot-band groups, and 32 concurrent tasks × thousands of unspillable
 *    rows drained the task-memory pool before any task could even create
 *    its spill sorter (the 16 KB init allocation is what failed at a 32 GB
 *    heap / 6M docs). Registering buffers with the memory manager from row
 *    512 makes them evictable under pressure instead.
 *  - `spark.cleaner.periodicGC.interval=2min`: shuffle files are deleted
 *    only when the ContextCleaner GCs the dead ShuffleDependency, and a
 *    large mostly-idle heap can go 30+ min without a full GC — the first
 *    3M-doc run filled the disk with ~35 GB of DEAD shuffle files mid-CC
 *    loop. A periodic GC bounds concurrent shuffle footprint to the live
 *    working set (same failure and fix per-executor on a real cluster).
 *  - `spark.io.compression.codec=zstd`: the near-dup/ER shuffles carry
 *    shingle/minhash arrays and mention text — zstd roughly halves their
 *    on-disk and in-flight footprint vs the lz4 default for single-digit %
 *    CPU. Shuffle bytes are the binding resource on instance disks and on
 *    this memory-bandwidth-capped guest alike.
 *  - `spark.driver.maxResultSize=4g`: the CC local finish collects up to
 *    [[graft.cluster.ConnectedComponents.localFinishEdges]] thin pairs
 *    (≲ 250 MB of url pairs at the 2M default, far less with 128-bit hash
 *    ids) and the ANN top-up collects bounded query chunks; a run near
 *    those budgets must not die on the 1g default ceiling.
 */
object Sessions {

  /** The dress-rehearsal survival settings (see object doc), as data so
    * SessionsSpec can pin them — a refactor that drops one must fail a
    * test, not resurface as an OOM at the next 6M-doc run. */
  val survivalConfigs: Map[String, String] = Map(
    "spark.sql.windowExec.buffer.in.memory.threshold" -> "512",
    "spark.cleaner.periodicGC.interval" -> "2min",
    "spark.io.compression.codec" -> "zstd",
    "spark.driver.maxResultSize" -> "4g",
    // BypassMergeSortShuffleWriter concatenates its per-reducer files with
    // FileChannel.transferTo, which mmaps and munmaps every segment; on
    // this Firecracker guest every map/unmap is a VM-exit/TLB-shootdown
    // storm (the same pathology run_java.sh documents for heap paging).
    // Thread-dump sampling of a warm dedup_minhash_full run caught the
    // majority of RUNNABLE task samples inside FileChannelImpl.map0/unmap0
    // under BypassMergeSortShuffleWriter.writePartitionedDataWithChannel —
    // shuffle-map stages at 13 s summed task time with only 1.7 s of
    // executor CPU. Plain stream copy avoids the mapping; on hosts with
    // sane mmap cost the difference is a wash for the KB-to-MB segment
    // sizes this engine shuffles (transferTo's zero-copy win is for
    // GB-scale segments).
"spark.file.transferTo" -> "false")

  /** Apply [[survivalConfigs]]. Used by [[builder]]; exposed separately so
    * tools that build exotic sessions (e.g. the rehearsal itself) can
    * compose them explicitly. */
  def survival(b: SparkSession.Builder): SparkSession.Builder =
    survivalConfigs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }

  /** Base builder with the survival configs and the settings every entry
    * point shares (UTC, no UI). Callers layer their own sizing (shuffle
    * partitions, broadcast threshold, …) on top.
    *
    * Master resolution: an externally supplied master wins — spark-submit
    * publishes `--master` as the `spark.master` system property, and a
    * hardcoded `.master()` here would silently override it, turning every
    * cluster submission into a single-JVM local run. Only when nothing is
    * supplied (plain `sbt runMain`, tests) does the builder default to
    * `local[cores]`. */
  def builder(cores: Int, appName: String): SparkSession.Builder = {
    val base = SparkSession.builder()
      .appName(appName)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    survival(
      if (sys.props.get("spark.master").exists(_.nonEmpty)) base
      else base.master(s"local[$cores]"))
  }
}
