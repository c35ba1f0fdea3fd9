package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sparse (term-space) cosine similarity via an inverted-index posting
  * join — the term-based complement to the dense-embedding ANN family:
  * no model, no hyperplanes, pairs meet only on SHARED TERMS, so unlike
  * LSH there are no probabilistic misses for lexically-overlapping
  * documents.
  *
  * Scale shape: tokenize → (doc, term, tf) postings; join postings to
  * postings on the term — one shuffle on the term key, the inverted
  * index materialized as a co-partitioned join, never an all-pairs
  * product. The classic scale lever is the POSTING-LIST CAP: a term in
  * more than `dfCap` documents is dropped from every vector (vocabulary
  * filtering, the IR stopword move) — each term's join fan-out is then
  * ≤ dfCap², and the frequent terms removed are exactly the ones that
  * carry no discriminating signal. The cap changes the metric (cosine
  * over the filtered vocabulary) identically in both engines, so it is
  * part of the operator's contract, not an approximation.
  *
  * Determinism across engines: tf counts, dot products, and squared
  * norms are EXACT integers; the only floating-point steps are
  * sqrt/multiply/divide, each correctly rounded under IEEE-754, so the
  * cosine is bit-identical in Spark and the SQL oracle — same
  * portable-math discipline as SketchOps (there via integer hashes,
  * here via integer accumulation).
  */
object SparseSimOps {

  /** Candidate pairs with tf-cosine ≥ `minCosine` over the `dfCap`-
    * filtered vocabulary. Output: (id_a, id_b, cosine), id_a < id_b.
    * Tokens are the `[a-z0-9]+` runs of the lowercased text. */
  def tfCosinePairs(
      docs: DataFrame, idCol: String, textCol: String,
      minCosine: Double, dfCap: Long): DataFrame = {
    require(minCosine > 0, "minCosine must be positive (join emits shared-term pairs only)")
    require(dfCap >= 2, "dfCap < 2 drops every joinable term")
    // Per-doc term frequency is row-local (tf_map kernel): one
    // pre-counted row per DISTINCT (doc, term) straight off the scan —
    // the explode + groupBy(doc, term) form this replaces shuffled one
    // row per token OCCURRENCE to count what the row already owned.
    val tf = docs
      .select(col(idCol).as("__id"),
        explode(expr(s"tf_map(ascii_tokens($textCol))"))
          .as(Seq("__term", "__tfi")))
      .select(col("__id"), col("__term"),
        col("__tfi").cast("bigint").as("__tf"))
    // document frequency from the postings themselves (one row per
    // (doc, term) already): count per term, keep the long tail
    val kept = tf
      .withColumn("__df", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("__term")))
      .filter(col("__df") <= dfCap)
      .drop("__df")
    val norms = kept.groupBy("__id")
      .agg(sum(col("__tf") * col("__tf")).as("__n2"))
    val a = kept.select(col("__id").as("id_a"), col("__term"), col("__tf").as("__tfa"))
    val b = kept.select(col("__id").as("id_b"), col("__term"), col("__tf").as("__tfb"))
    val dots = a.join(b, Seq("__term"))
      .filter(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("__tfa") * col("__tfb")).as("__dot"))
    dots
      .join(norms.select(col("__id").as("id_a"), col("__n2").as("__n2a")), "id_a")
      .join(norms.select(col("__id").as("id_b"), col("__n2").as("__n2b")), "id_b")
      .select(col("id_a"), col("id_b"),
        (col("__dot").cast("double") /
          (sqrt(col("__n2a").cast("double")) * sqrt(col("__n2b").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }
}
