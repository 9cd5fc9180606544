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

  /**
   * @param edges DataFrame with two string columns (default url_a/url_b)
   * @return (url, cluster_id) for every node that appears in `edges`
   */
  def run(edges: DataFrame, aCol: String = "url_a", bCol: String = "url_b",
          maxIterations: Int = 50): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // canonical undirected edge set (u > v convention dropped — keep both)
    var e = edges.select(col(aCol).as("u"), col(bCol).as("v"))
      .filter($"u" =!= $"v")
      .distinct()
      .localCheckpoint(eager = true)

    if (e.isEmpty) return e.select($"u".as("url"), $"v".as("cluster_id"))

    val verbose = sys.env.contains("GRAFT_CC_VERBOSE")
    var converged = false
    var iter = 0
    var lastSig: (Long, Long) = (-1L, -1L)
    var prevBlocks: Option[org.apache.spark.rdd.RDD[_]] =
      org.apache.spark.sql.graftbridge.ColumnBridge.checkpointedRdd(e)

    while (!converged && iter < maxIterations) {
      val iterT0 = System.nanoTime()
      // ---- large-star: for every u, m = min(N(u) ∪ {u});
      //      emit (v, m) for every neighbor v > u
      val sym = e.select($"u", $"v").unionAll(e.select($"v".as("u"), $"u".as("v")))
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
      val small = dir.join(minsS, "u")
        .select($"v".as("nu"), $"m".as("nv"))
        .unionAll(minsS.select($"u".as("nu"), $"m".as("nv")))
        .filter($"nu" =!= $"nv")
        .select($"nu".as("u"), $"nv".as("v"))
        .distinct()

      // lazy checkpoint: the checksum aggregate below materializes it, so
      // each iteration is ONE job instead of checkpoint-then-aggregate
      val next = small.localCheckpoint(eager = false)
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
      if (verbose) println(f"[cc] iter=$iter edges=${sig._1} sec=${(System.nanoTime() - iterT0) / 1e9}%.2f converged=$converged")
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

    // converged star edges point child -> root; roots map to themselves
    val assign = e.select(
        greatest($"u", $"v").as("url"), least($"u", $"v").as("root"))
      .groupBy($"url").agg(min($"root").as("cluster_id"))
    val roots = e.select(least($"u", $"v").as("url"))
      .distinct()
      .join(assign, Seq("url"), "left_anti")
      .select($"url", $"url".as("cluster_id"))
    assign.unionByName(roots)
  }

  /**
   * Full assignment over a node universe: nodes absent from `edges` become
   * singleton clusters (cluster_id = own url).
   */
  def assignAll(nodes: DataFrame, edges: DataFrame, urlCol: String = "url"): DataFrame = {
    val cc = run(edges)
    nodes.select(col(urlCol).as("url"))
      .join(cc, Seq("url"), "left")
      .select(col("url"), coalesce(col("cluster_id"), col("url")).as("cluster_id"))
  }
}
