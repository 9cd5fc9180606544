package graft.cluster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Transitive clustering (SURVEY.md §2.5 A6): iterative large-star/small-star
 * connected components over the match-edge DataFrame — the Kiveris et al.
 * "Connected Components in MapReduce and Beyond" algorithm expressed as pure
 * joins + aggregations (no GraphX/RDD; `input_hint` forbids RDDs unless
 * forced, and GraphFrames isn't in /opt/spark/jars).
 *
 * This is the scale-out analog of the reference's window-merge transitivity
 * (`/root/reference/relik/inference/data/window/manager.py:213-246` unions
 * per-window predictions into document-level entities): above-threshold
 * edges are merged into components in O(log n) rounds.
 *
 * Scale notes (10^12 nodes):
 *  - each round is two joins + two aggregations, all hash-partitioned on the
 *    node id — no collect_list of neighborhoods, so a celebrity node never
 *    materializes its adjacency in one task;
 *  - `localCheckpoint` truncates lineage every round (else the plan doubles);
 *  - convergence is detected by an (count, xor-of-hashes) checksum — one
 *    cheap aggregate per round instead of a full `except`.
 *
 * Node ids are STRING urls: correct at any scale (no 64-bit hash-collision
 * risk at 10^12 rows) at the cost of wider shuffles; cluster_id is the
 * lexicographic min url of the component (deterministic labeling,
 * SURVEY.md §7.4.4).
 */
object ConnectedComponents {

  /** Floor fan-in for the per-iteration edge checkpoint and loop shuffles.
    * The converging edge set is TINY relative to the input (thin id pairs),
    * but a checkpoint inheriting the full shuffle-partition count spawns
    * that many map tasks per downstream stage PER ITERATION — measured
    * ~1 s/iteration of pure scheduling on a 1.6k-edge graph (64 near-empty
    * tasks × ~6 stages × 6 iterations is the serial floor the north-rule
    * scaling measurement pays at every cluster size). Env-overridable for
    * A/B measurement only. */
  private def ccFanIn: Int =
    sys.env.get("GRAFT_CC_FANIN").map(_.toInt).getOrElse(16)

  /** Target thin-edge rows per loop shuffle partition (~60-100 MB of
    * (url, url) pairs). Env-overridable for A/B measurement only. */
  private def rowsPerPartition: Long =
    sys.env.get("GRAFT_CC_ROWS_PER_PARTITION").map(_.toLong).getOrElse(500000L)

  /** Shuffle-partition count for one loop iteration, sized from the CURRENT
    * edge count: `max(ccFanIn, edges / rowsPerPartition)`. At bench scale
    * (≤ a few hundred k edges) this is the fixed small fan-in that cut the
    * measured serial floor (scheduling ~1 s/iteration of near-empty tasks);
    * at web scale (10^9+ edges) the first large-star/small-star iterations
    * get data-proportional parallelism instead of funnelling the full edge
    * set through 16 reduce tasks, and the count DECAYS with the edge set as
    * contraction converges. Capped at 200k partitions (2 shuffle-file-count
    * orders above any sane cluster default) purely as an overflow guard. */
  private[cluster] def loopShufflePartitions(edgeCount: Long): Int = {
    val byData = (edgeCount + rowsPerPartition - 1) / rowsPerPartition
    math.max(ccFanIn.toLong, math.min(byData, 200000L)).toInt
  }

  /**
   * @param edges DataFrame with two string columns (default url_a/url_b)
   * @return (url, cluster_id) for every node that appears in `edges`
   */
  def run(edges: DataFrame, aCol: String = "url_a", bCol: String = "url_b",
          maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    val (assign, prev) = converge(edges, aCol, bCol, maxIterations)
    // converged star edges point child -> root; roots (parents that are
    // nobody's child) map to themselves
    val roots = assign.select($"cluster_id".as("url"))
      .distinct()
      .join(assign, Seq("url"), "left_anti")
      .select($"url", $"url".as("cluster_id"))
    val out = assign.unionByName(roots).localCheckpoint(eager = true)
    prev.foreach(_.unpersist(blocking = false))
    out
  }

  /** Star-contraction loop → (child → root) assignment for NON-ROOT nodes
    * only (roots are absent; `run` adds them, `assignAll` covers them via
    * its left-join + coalesce-to-self). Returns the lazy assignment plus the
    * final checkpoint blocks for the caller to free after materializing. */
  private def converge(edges: DataFrame, aCol: String, bCol: String,
                       maxIterations: Int): (DataFrame, Option[org.apache.spark.rdd.RDD[_]]) = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical undirected edge set (u > v convention dropped — keep both).
    // NOT coalesced: a narrow coalesce here would cap the FUSED final stage
    // of the whole upstream pipeline (join + score + dedup partials land in
    // the same stage) at ccFanIn tasks — measured 600+ CPU-seconds starved
    // onto 16 tasks at 400k docs. Only the in-loop checkpoints (sized from
    // the shrinking edge count) use the small fan-in.
    val e0 = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(eager = true)

    val initialEdges = e0.count() // cheap: counts the checkpoint blocks
    if (initialEdges == 0L)
      return (e0.select($"u".as("url"), $"v".as("cluster_id")), None)

    // The iterative loop's serial floor is (stage waves) × (per-wave
    // scheduling latency), paid identically at every cluster size — the
    // north-rule scaling measurement's biggest fixed cost. Two levers:
    //  - shuffle partitions sized from the CURRENT edge count (see
    //    loopShufflePartitions): near-empty reduce tasks per wave are pure
    //    scheduling overhead at bench scale, while a pinned small constant
    //    would funnel a web-scale edge set through 16 tasks;
    //  - AQE off: adaptive execution materializes and replans at every
    //    exchange — the right call for the big one-shot stages upstream,
    //    pure per-wave latency on a fixed-shape iteration.
    // Both are scoped to a CLONED session (spark.newSession() shares the
    // SparkContext and the builder's initial conf but has its own mutable
    // SQL conf), so concurrent queries on the caller's session never plan
    // under the loop's degraded config and nested runs can't stomp each
    // other's settings. The checkpointed edge RDD is re-bound to the clone
    // without copying (ColumnBridge.rebindToSession).
    val loop = spark.newSession()
    loop.conf.set("spark.sql.adaptive.enabled", "false")
    var parts = loopShufflePartitions(initialEdges)
    loop.conf.set("spark.sql.shuffle.partitions", parts.toString)
    var e = org.apache.spark.sql.graftbridge.ColumnBridge.rebindToSession(loop, e0)

    val verbose = sys.env.contains("GRAFT_CC_VERBOSE")
    var converged = false
    var iter = 0
    var lastSig: (Long, Long) = (-1L, -1L)
    var prevBlocks: Option[org.apache.spark.rdd.RDD[_]] =
      org.apache.spark.sql.graftbridge.ColumnBridge.checkpointedRdd(e0)

    // one large-star + small-star application (Kiveris et al.)
    def starRound(in: DataFrame): DataFrame = {
      // ---- large-star: for every u, m = min(N(u) ∪ {u});
      //      emit (v, m) for every neighbor v > u
      val sym = in.select($"u", $"v").unionAll(in.select($"v".as("u"), $"u".as("v")))
      val mins = sym.groupBy($"u").agg(min($"v").as("mv"))
      val large = sym.filter($"v" > $"u")
        .join(mins, "u")
        .select($"v".as("nu"), least($"mv", $"u").as("nv"))
        .filter($"nu" =!= $"nv")
        .select($"nu".as("u"), $"nv".as("v"))

      // ---- small-star: direct edges larger->smaller; for every u,
      //      m = min(N⁻(u)); emit (v, m) for v ∈ N⁻(u) and (u, m)
      val dir = large.select(
        greatest($"u", $"v").as("u"), least($"u", $"v").as("v"))
      val minsS = dir.groupBy($"u").agg(min($"v").as("m"))
      dir.join(minsS, "u")
        .select($"v".as("nu"), $"m".as("nv"))
        .unionAll(minsS.select($"u".as("nu"), $"m".as("nv")))
        .filter($"nu" =!= $"nv")
        .select($"nu".as("u"), $"nv".as("v"))
        .distinct()
    }

    while (!converged && iter < maxIterations) {
      val iterT0 = System.nanoTime()
      val small = starRound(e)

      // lazy checkpoint: the checksum aggregate below materializes it, so
      // each loop pass is ONE job instead of checkpoint-then-aggregate
      val next = small.coalesce(parts).localCheckpoint(eager = false)
      // xor-fold checksum: order-independent, overflow-free under ANSI mode
      val sig = next
        .agg(count(lit(1)).as("c"),
          coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L)).as("s"))
        .as[(Long, Long)].first()
      converged = sig == lastSig
      // `next` is materialized by the checksum job above; the previous
      // round's checkpoint blocks are dead — free them now instead of
      // waiting for the async ContextCleaner (GC-stall avoidance)
      prevBlocks.foreach(_.unpersist(blocking = false))
      prevBlocks = org.apache.spark.sql.graftbridge.ColumnBridge.checkpointedRdd(next)
      // decay the loop parallelism with the contracting edge set (the
      // checksum already counted it — no extra job)
      val nextParts = loopShufflePartitions(sig._1)
      if (nextParts != parts) {
        parts = nextParts
        loop.conf.set("spark.sql.shuffle.partitions", parts.toString)
      }
      if (verbose) println(f"[cc] iter=$iter edges=${sig._1} parts=$parts sec=${(System.nanoTime() - iterT0) / 1e9}%.2f converged=$converged")
      lastSig = sig
      e = next
      iter += 1
    }
    if (!converged)
      // star-contraction halves component diameter per round, so 50 rounds
      // covers diameters ~2^50; hitting this means pathological input, and
      // silently returning would split components across cluster_ids
      throw new IllegalStateException(
        s"connected components did not converge after $maxIterations iterations " +
        s"(edges=${lastSig._1}); raise maxIterations or check the edge set")

    val assign = e.select(
        greatest($"u", $"v").as("url"), least($"u", $"v").as("root"))
      .groupBy($"url").agg(min($"root").as("cluster_id"))
    (assign, prevBlocks)
  }

  /**
   * Full assignment over a node universe: nodes absent from `edges` (and
   * component roots, which the converged star edges never list as a child)
   * become their own cluster_id via the coalesce-to-self — this skips the
   * roots anti-join `run` needs, two shuffles fewer on the flagship path.
   *
   * The assignment is materialized (O(nodes-in-edges) thin rows) so the
   * final iteration's checkpoint blocks are freed NOW — a long-lived bench
   * JVM otherwise accumulates one edge-set worth of storage per invocation.
   */
  def assignAll(nodes: DataFrame, edges: DataFrame, urlCol: String = "url"): DataFrame = {
    val (assign, prev) = converge(edges, "url_a", "url_b", maxIterations = 50)
    val cc = assign.localCheckpoint(eager = true)
    prev.foreach(_.unpersist(blocking = false))
    nodes.select(col(urlCol).as("url"))
      .join(cc, Seq("url"), "left")
      .select(col("url"), coalesce(col("cluster_id"), col("url")).as("cluster_id"))
  }
}
