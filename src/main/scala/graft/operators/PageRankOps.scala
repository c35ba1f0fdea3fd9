package graft.operators

import graft.Checkpoints.CheckpointSyntax

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed PageRank over an edge list (beyond-reference, SURVEY
  * §2.11) — the source-authority score a crawl-driven corpus pipeline
  * uses to prioritize fetches and to weight documents by the link
  * standing of their origin (the reference crawls a flat catalog, but
  * any web-scale corpus build ranks its frontier; Common Crawl derived
  * corpora ship exactly this signal as a quality feature).
  *
  * Arithmetic is integer fixed-point end-to-end so the scores replay
  * bit-for-bit in a second engine: ranks live in micro-units (1e6 =
  * rank 1.0), a node's per-edge contribution is `rank // out_degree`
  * (floor), and the damped update is
  * `rank' = (1-d)·1e6 + (d_num · Σ contribs) // d_den` with d = 85/100.
  * Floor-division truncation loses ≤ out_degree − 1 micro-units per
  * node per round — a deterministic, engine-identical bias, the same
  * trade every other fixed-point oracle in this repo makes (DSIR,
  * Moore–Lewis, BM25). Dangling nodes (no out-edges) simply leak their
  * mass rather than redistributing it: with a fixed iteration count
  * and identical arithmetic in the oracle this is a defined, replayable
  * variant (and the registered query's bipartite graph has none by
  * construction).
  *
  * Scale shape per iteration: ONE shuffle — contributions are formed by
  * an equi-join of the bounded rank table (|V| rows) against the edge
  * list on `src`, then summed by `dst` with map-side combine. Short
  * loops stay one lazy DAG (repeated edge/node subtrees collapse via
  * exchange reuse); long loops truncate lineage periodically per
  * `checkpointEvery` (the GraphOps/KMeansOps treatment, made
  * conditional after measurement — see the param doc). Ranks are |V|
  * rows per round, never collected.
  * A fixed small iteration count is the norm for quality-signal ranks
  * (convergence to 1e-3 relative takes ~O(log n / (1-d)) rounds; corpus
  * weighting uses the coarse ordering, which stabilizes in 3-5).
  *
  * Job-count floor verdict (r13, JobCensus on g1 at sf0.1): the short
  * loop is ALREADY one lazy DAG — there is no per-round barrier left
  * to batch. Its 19 driver jobs are the base checkpoints (~3) plus
  * AQE stage materializations and the two broadcast builds each round
  * (rank side into the contribution join, contribution sums into the
  * update join) — structural to adaptive execution within one action,
  * not to this loop. Σ in-job wall was 2.8 s of a 4.0 s query at a
  * degraded ~104 ms/execution driver planning floor; at a healthy
  * ~25 ms floor the same 19 jobs cost ~0.5 s of overhead. The
  * remaining lever would be disabling AQE for the final action, which
  * trades away runtime coalescing and the adaptive broadcast the
  * keyed-shuffle mode depends on at real scale — not taken.
  *
  * Fault tolerance: every lineage cut routes through [[graft.Checkpoints]]
  * — default `local` mode stores checkpoint blocks on executors only
  * (fast; one lost executor kills a long run), `reliable` mode writes
  * them to the durable checkpoint dir and survives executor loss. Long
  * cluster runs of this iterative loop should set
  * `spark.graft.checkpoint.mode=reliable`.
  */
object PageRankOps {

  /** PageRank after `iters` damped rounds on the directed graph
    * `edges0(srcCol, dstCol)`. Duplicate edges are collapsed; null
    * endpoints dropped; self-loops kept (they contribute to their own
    * node, as in the standard formulation). Returns one row per node
    * that appears as a source OR destination: (node, rank_micro).
    *
    * dampNum/dampDen: damping factor as an exact rational (default
    * 85/100). Every node starts at 1e6 micro-units.
    *
    * `checkpointEvery`: truncate the iterative lineage every N rounds
    * (and materialize the shared edge/node/degree inputs only when the
    * loop is long enough to cross a checkpoint). Measured at sf0.1,
    * iters = 3: per-round eager checkpoints cost 11.9 s against 4.9 s
    * for one lazy plan — a short loop is ONE DAG whose repeated
    * edge/node subtrees collapse via exchange reuse, while eager
    * checkpoints serialize 5+ jobs and materialize every intermediate.
    * Long loops still need truncation (lineage doubles per round), so
    * rounds at multiples of `checkpointEvery` checkpoint; 3-5-round
    * quality-signal runs never pay it.
    *
    * `dimensionNodes`: the caller asserts the node universe is
    * DIMENSION-bounded (a part/supplier/vocab catalog — fits one
    * executor), not fact-scaled. Then the |V|-row rank and contribution
    * tables ride BROADCAST joins each round: the edge list — the only
    * fact-scaled input — is materialized once and never re-shuffled,
    * and each round is one map-side-combined aggregate instead of three
    * keyed exchanges (4.2 -> ~2 s on the sf0.1 supply graph). Default
    * false: with web-scale node sets the rank table is itself
    * fact-sized, and the keyed-shuffle rounds are the only shape that
    * survives — same opt-in contract as `assumeDistinct`.
    *
    * `restartSeeds`: when set, computes PERSONALIZED PageRank — the
    * restart mass (1−d)·1e6 lands only on the seed nodes (one id
    * column; duplicates collapsed) instead of uniformly, and ranks
    * start from that seed mass. Scores then measure proximity to the
    * seed set under random-walk-with-restart — the "trusted pages"
    * relevance signal (TrustRank-style) next to g4's hop distance.
    * Same integer arithmetic; non-seed nodes can reach rank 0, which
    * is data (unreachable from the seeds within the walk), not
    * absence. Seeded rounds are FRONTIER-RESTRICTED: the intermediate
    * rank table holds only nodes with nonzero mass (round 1 touches
    * |seeds| rows, not |V|), and the dense zero rows materialize once
    * in the final output join.
    *
    * `restartWhere`: the seed set as a deterministic per-node predicate
    * instead of a table — same personalized semantics, but the seed
    * membership is a filter on the node table (no derivation scan, no
    * membership join). Mutually exclusive with `restartSeeds`.
    *
    * `sourcesSpanNodes`: the caller asserts every node also appears as
    * an edge SOURCE (true for mirrored/symmetric edge lists) — the node
    * universe is then a free projection of the out-degree table instead
    * of a distinct over 2|E| endpoint rows. Wrong claims drop pure-sink
    * nodes from the output — a correctness contract like
    * `assumeDistinct`.
    */
  def pageRank(
      edges0: DataFrame, srcCol: String, dstCol: String,
      iters: Int = 3, dampNum: Long = 85L, dampDen: Long = 100L,
      checkpointEvery: Int = 4, assumeDistinct: Boolean = false,
      dimensionNodes: Boolean = false,
      restartSeeds: Option[DataFrame] = None,
      restartWhere: Option[Column] = None,
      sourcesSpanNodes: Boolean = false): DataFrame = {
    require(restartSeeds.isEmpty || restartWhere.isEmpty,
      "restartSeeds and restartWhere are alternative seed specs — pass one")
    require(checkpointEvery > 0, "checkpointEvery must be positive")
    require(iters > 0, "iters must be positive")
    require(dampNum >= 0 && dampNum <= dampDen && dampDen > 0,
      s"damping $dampNum/$dampDen must be a fraction in [0,1]")
    val base = (dampDen - dampNum) * 1000000L / dampDen // (1-d) * 1e6

    // Canonical edge list + out-degree. `assumeDistinct` skips the
    // dedup shuffle when the CALLER's construction already guarantees
    // unique edges (e.g. a union of two namespace-disjoint mirrors of
    // one distinct frame — half the dedup volume of deduping the union;
    // measured 3.5 -> 2.3 s on the registered query's 1.2M-edge graph).
    // Duplicates under a false claim would inflate degrees AND double
    // contributions — a correctness contract, so callers get it only by
    // asking.
    val projected = edges0
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
    val edgesRaw = if (assumeDistinct) projected else projected.distinct()
    // Under dimensionNodes the edge list is re-SCANNED per round by a
    // broadcast join (no exchange to reuse), so the one-time cut always
    // pays; lazy rounds only materialize when the loop crosses a
    // checkpoint.
    val materializeBase = dimensionNodes || iters >= checkpointEvery
    val edges = if (materializeBase) edgesRaw.checkpointed() else edgesRaw
    val degrees0 = edges.groupBy("src").agg(count(lit(1)).as("out_deg"))
    // Broadcast mode folds the degree onto the rank side EVERY round,
    // so the |V|-row degree table is cut once; shuffle mode reads it
    // once (the outEdges build) and leaves it lazy.
    val degrees =
      if (dimensionNodes && materializeBase) degrees0.checkpointed()
      else degrees0

    // All nodes (sources ∪ destinations): pure sinks still hold rank
    // and must appear in the output. `sourcesSpanNodes` is the caller's
    // assertion that every node also appears as a source (true for any
    // mirrored/symmetric edge list) — then the node set is a free
    // projection of the degree table instead of a second distinct over
    // 2|E| endpoint rows.
    val nodesRaw =
      if (sourcesSpanNodes) degrees.select(col("src").as("node"))
      else edges.select(col("src").as("node"))
        .union(edges.select(col("dst").as("node")))
        .distinct()
    val nodes =
      if (materializeBase && !(sourcesSpanNodes && dimensionNodes))
        nodesRaw.checkpointed()
      else nodesRaw // projection of the already-cut degree table, or lazy

    // Rank-side tables are |V| rows: broadcast them under the caller's
    // dimension bound, keyed-shuffle otherwise.
    // else-branch hints shuffle_hash: without it the caller's "nodes
    // are fact-scaled" declaration is advisory only — Spark's
    // under-10MB estimate would auto-broadcast the rank/frontier table
    // at test SF anyway (the a19 class, r10 audit finding).
    def maybeB(df: DataFrame): DataFrame =
      if (dimensionNodes) broadcast(df) else df.hint("shuffle_hash")

    // Per-edge contribution rows for one round, given the round's rank
    // table. Shuffle mode pre-joins the source out-degree onto the edge
    // list ONCE (the join would otherwise repeat identically inside
    // every round); broadcast mode instead folds the degree onto the
    // |V|-bounded RANK side each round (a dimension-sized join) so the
    // fact-scaled edge list is scanned plain — skipping the
    // 3-column outEdges materialization entirely (measured ~0.7 s off
    // g1/g10 setup at sf0.1).
    val outEdges =
      if (dimensionNodes) edges
      else {
        val oe = edges.join(degrees, "src")
        if (materializeBase) oe.checkpointed() else oe
      }
    def roundContribs(ranks: DataFrame): DataFrame = {
      // A rank table that already carries out_deg (the classic-branch
      // degree fold) skips the per-round degree join; only nodes WITH
      // out-edges contribute (the inner-join semantics the fold's left
      // join relaxed). The PPR branch's sparse tables still fold the
      // degree on per round.
      val rankSide =
        if (ranks.columns.contains("out_deg"))
          ranks.filter(col("out_deg").isNotNull)
        else if (dimensionNodes)
          ranks.join(degrees, ranks("node") === degrees("src"))
            .select(col("node"), col("rank_micro"), col("out_deg"))
        else ranks
      outEdges.join(maybeB(rankSide), outEdges("src") === rankSide("node"))
        .select(col("dst"), expr("rank_micro div out_deg").as("contrib"))
    }

    if (restartSeeds.isEmpty && restartWhere.isEmpty) {
        // Classic PageRank: uniform (1−d)·1e6 restart on every node, so
        // the rank table is dense (|V| rows) from round 0 and stays
        // dense — the per-round shape is contribution join + keyed sum,
        // then a left join back onto the node table.
        //
        // Degree fold (r11): under dimensionNodes the dense node table
        // carries out_deg from round 0, so each round's rank table
        // ALREADY holds the divisor and roundContribs drops its
        // ranks⋈degrees join from the contribution side. Honest
        // accounting (r11 review): the plan is LAZY, so the
        // nodes⋈degrees fold itself still unrolls inside every round's
        // update join — the fold RELOCATES the per-round degree join
        // from the contribution path to the update path rather than
        // eliminating it, and the measurement agrees (g1 min
        // 3.04 -> 2.95 s same-session, i.e. neutral). Kept for
        // semantics, not speed: pure sinks carry an explicit null
        // out_deg (hold rank, contribute nothing — the non-null filter
        // in roundContribs makes the old inner-join behavior visible),
        // and both rank-table shapes are pinned by tests including the
        // mid-loop checkpoint of the 3-column table. Shuffle mode is
        // untouched: it folds the degree onto the EDGE side (outEdges)
        // — |V| extra longs per edge row beat re-shuffling the
        // fact-scaled edges.
        val flagged0 = nodes.withColumn("__base", lit(base))
        val flagged =
          if (dimensionNodes) {
            // Fresh projection of the degree table: under
            // sourcesSpanNodes `nodes` IS a projection of `degrees`, so
            // joining the original frame back would hit Spark's
            // ambiguous-self-join attribute resolution.
            // broadcast: this branch only runs under dimensionNodes, so
            // deg is dimension-bounded — and because the fold subtree
            // is LAZY it unrolls inside EVERY round's update join;
            // binding the strategy by hint (like maybeB does for the
            // rank-side joins) stops a size-estimate miss from planning
            // a per-round |V|⋈|V| shuffle at real scale (ADVICE r11).
            val deg = broadcast(
              degrees.select(col("src").as("__dnode"), col("out_deg")))
            flagged0.join(deg, flagged0("node") === deg("__dnode"), "left")
              .select(col("node"), col("__base"), col("out_deg"))
          } else flagged0
        var ranks =
          if (dimensionNodes)
            flagged.select(col("node"), lit(1000000L).as("rank_micro"), col("out_deg"))
          else flagged.select(col("node"), lit(1000000L).as("rank_micro"))
        for (i <- 1 to iters) {
          // `div` is exact integer division (Spark's `/` would
          // round-trip through DOUBLE); all quantities are positive,
          // so truncation == floor == DuckDB's `//`.
          val contribs = roundContribs(ranks)
            .groupBy("dst")
            .agg(sum(col("contrib")).as("mass"))
          val rankExpr =
            (col("__base") + expr(s"($dampNum * coalesce(mass, 0L)) div $dampDen"))
              .cast("long").as("rank_micro")
          ranks = flagged
            .join(maybeB(contribs), flagged("node") === contribs("dst"), "left")
            .select(
              (if (dimensionNodes)
                 Seq(flagged("node"), rankExpr, flagged("out_deg"))
               else Seq(flagged("node"), rankExpr)): _*)
          if (i % checkpointEvery == 0 && i < iters)
            ranks = ranks.checkpointed() // truncate iterative lineage
        }
        ranks.select(col("node"), col("rank_micro"))
    } else {
        // Personalized PageRank: restart mass lands only on seeds, so
        // early rounds have rank mass on a sparse frontier — round 1's
        // contribution join touches |seeds| rows, not |V|. The rank
        // update `base + (d·mass) div den` is ADDITIVE in its two
        // parts, so instead of left-joining a dense node table each
        // round, each round is one union + keyed aggregate over
        //   (frontier-edge contributions) ∪ (seed restart rows)
        // — nodes with neither stay implicitly 0 and are materialized
        // only once, in the final left join. One shuffle per round,
        // volume proportional to the frontier's out-edges (measured
        // 4.3 -> ~2 s on g10 at sf0.1; semantics unchanged — a
        // zero-rank source contributes rank div deg = 0).
        // Seeds outside the graph get no mass (the join/filter runs on
        // `nodes`). `restartWhere` names the seed set as a
        // deterministic per-node predicate instead of a table — no
        // seed-derivation scan, no membership join (g10: 0.3 s of its
        // seed subtree gone).
        val seedBase0 = restartSeeds match {
          case Some(sd) =>
            val seeds = sd
              .select(col(sd.columns.head).cast("long").as("node"))
              .distinct()
            nodes.join(maybeB(seeds), Seq("node"))
              .select(col("node"), lit(base).as("__b"))
          case None =>
            nodes.filter(restartWhere.get).select(col("node"), lit(base).as("__b"))
        }
        val seedBase =
          if (materializeBase) seedBase0.checkpointed() else seedBase0

        // Step-0 distribution = the seed mass itself.
        var ranks = seedBase.select(col("node"), col("__b").as("rank_micro"))
        for (i <- 1 to iters) {
          val contribs = roundContribs(ranks.filter(col("rank_micro") > 0))
            .select(col("dst").as("node"), col("contrib"), lit(0L).as("__b"))
          // Each seed appears exactly once in seedBase, so sum(__b)
          // recovers its restart mass; scaling applies to the SUMMED
          // contribution mass ((d·Σc) div den ≠ Σ(d·c div den)).
          ranks = contribs
            .union(seedBase.select(col("node"), lit(0L).as("contrib"), col("__b")))
            .groupBy("node")
            .agg((sum(col("__b")) +
              expr(s"($dampNum * sum(contrib)) div $dampDen"))
              .cast("long").as("rank_micro"))
          if (i % checkpointEvery == 0 && i < iters)
            ranks = ranks.checkpointed() // truncate iterative lineage
        }
        // Materialize the zeros exactly once: every graph node absent
        // from the sparse table is unreached-within-the-walk — data,
        // reported as exact 0.
        nodes.join(maybeB(ranks), Seq("node"), "left")
          .select(col("node"),
            coalesce(col("rank_micro"), lit(0L)).as("rank_micro"))
    }
  }
}
