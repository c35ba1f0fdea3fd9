package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components over an edge list — the transitive-
  * closure step that turns near-duplicate PAIRS (what every detector in
  * DedupOps/SimilarityOps emits) into duplicate CLUSTERS, so a pipeline
  * can keep exactly one survivor per cluster. Pairs alone under-delete:
  * A~B and B~C with no direct A~C edge still means {A,B,C} is one
  * duplicate group.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", 2014) — the standard
  * O(log n)-round formulation. Naive label propagation needs O(diameter)
  * rounds, and near-dup graphs DO form long chains (documents drifting
  * one edit at a time), so diameter is not bounded by a constant at
  * corpus scale; star rounds square away chains instead.
  *
  * Scale shape per round: one groupBy(node) for the neighborhood minima
  * and one equi-join back on the same node key (exchange reuse — no
  * second shuffle of the edge list), never a collect_list of a
  * neighborhood: a converged star's center has degree = cluster size,
  * and materializing that list in one task is exactly the hub-OOM this
  * formulation exists to avoid. Driver-side state is one (count,
  * hash-sum) signature pair per round for the convergence test;
  * `localCheckpoint` truncates the iterative lineage each round
  * (SURVEY §4.2 iterative-plan note, same treatment as KMeansOps).
  */
object GraphOps {

  /** Connected components of the undirected graph given by `edges0`
    * (two integral columns; loops and duplicate/reversed edges are
    * tolerated and canonicalized away; null endpoints dropped).
    *
    * Returns one row per distinct node: (node, component) where
    * `component` is the MINIMUM node id in the node's component —
    * deterministic, so downstream "survivor = (node == component)"
    * is a stable keep-first rule.
    */
  def connectedComponents(
      edges0: DataFrame, srcCol: String, dstCol: String,
      maxIter: Int = 50): DataFrame = {
    require(maxIter > 0, "maxIter must be positive")

    def canon(df: DataFrame): DataFrame =
      df.filter(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
        .select(least(col("u"), col("v")).as("u"),
          greatest(col("u"), col("v")).as("v"))
        .distinct()

    // Materialize the (possibly expensive) upstream ONCE — node capture
    // and edge canonicalization both read this checkpoint, not the
    // input lineage (a candidate-pair generator would otherwise run
    // twice).
    val raw = edges0
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .localCheckpoint(true)

    // Nodes of the input graph (captured before star rounds rewrite the
    // edge set): isolated self-loop nodes still get a component row.
    val inputNodes = raw
      .select(col("u").as("n")).union(raw.select(col("v").as("n")))
      .filter(col("n").isNotNull)
      .distinct()

    var edges = canon(raw).localCheckpoint(true)

    // Cheap fixpoint signature: (|E|, xor of a 64-bit edge hash) — xor,
    // not sum, because it is order-independent AND cannot overflow under
    // ANSI arithmetic. A star round that changes nothing reproduces the
    // exact edge set; colliding signatures for DIFFERENT sets would need
    // a 2^-64 accident on top of an equal count. The iteration is
    // monotone (components never merge incorrectly), so a false stop is
    // the only failure mode this guards.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(expr("bit_xor(xxhash64(u, v))"), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    // large-star: per node u over the SYMMETRIZED adjacency, m =
    // min(N(u) ∪ {u}); rewire every strictly-larger neighbor to m.
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.union(e.select(col("v").as("u"), col("u").as("v")))
      val mins = sym.groupBy("u")
        .agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      canon(sym.join(mins, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")))
    }

    // small-star: key each edge by its LARGER endpoint u with smaller
    // neighbors N(u); m = min(N(u)); rewire N(u) ∪ {u} minus m to m.
    def smallStar(e: DataFrame): DataFrame = {
      // canon() keeps u < v, so the larger endpoint is v: group by it.
      val dirE = e.select(col("v").as("u"), col("u").as("v"))
      val mins = dirE.groupBy("u").agg(min(col("v")).as("m"))
      canon(
        dirE.join(mins, "u").filter(col("v") =!= col("m"))
          .select(col("v").as("u"), col("m").as("v"))
          .union(mins.select(col("u"), col("m").as("v"))))
    }

    var sig = signature(edges)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      // Adaptive parallelism: the signature already told us |E|, so a
      // small edge set (every late round, and every round at test/sf
      // scale) runs its star ops on a handful of tasks instead of
      // paying full-width task overhead per round. Same idea as AQE's
      // partition coalescing, driven by a count we get for free; large
      // edge sets keep their native width.
      val base =
        if (sig._1 <= 2_000_000L) edges.coalesce(4) else edges
      val next = smallStar(largeStar(base)).localCheckpoint(true)
      val nextSig = signature(next)
      converged = nextSig == sig
      sig = nextSig
      edges = next
      it += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds")

    // At fixpoint the edge set is a union of stars (u < v with u the
    // component min): v's component is u, centers and isolated nodes
    // map to themselves.
    inputNodes
      .join(edges.select(col("v").as("n"), col("u").as("c")), Seq("n"), "left")
      .select(col("n").as("node"), coalesce(col("c"), col("n")).as("component"))
  }
}
