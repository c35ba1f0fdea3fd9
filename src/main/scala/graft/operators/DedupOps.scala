package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TextFns

/** Deduplication operators for large-scale training-data pipelines:
  * exact (canonical-form hash), MinHash+LSH banding, SimHash, and n-gram
  * Jaccard — all built from codegen'd column expressions (no UDFs) and
  * all md5-keyed so a SQL oracle can replicate them bit-for-bit.
  *
  * Scale shapes:
  *   - exact dedup: one shuffle on the 128-bit fingerprint; map-side
  *     nothing to combine, but the key is tiny regardless of doc size.
  *   - MinHash/LSH: signatures are computed scan-side (per-row, no
  *     shuffle), then ONE shuffle on (band, band-signature). Candidate
  *     pairs only ever meet inside a bucket — there is no all-pairs
  *     product anywhere, which is what makes near-dup feasible at 100 TB.
  *   - SimHash: same shape with a prefix-block join.
  *   - n-gram Jaccard: quadratic WITHIN a caller-chosen block only; the
  *     caller must provide a blocking column (use LSH for unblocked data).
  */
object DedupOps {

  /** Exact dedup: keep the lowest-`orderCol` row per canonical-text
    * fingerprint. */
  def exactDedup(df: DataFrame, textCol: String, orderCol: String): DataFrame = {
    val w = Window.partitionBy("__fp").orderBy(col(orderCol))
    df.withColumn("__fp", TextFns.fingerprint(col(textCol)))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .withColumnRenamed("__fp", "fingerprint")
  }

  /** Word k-gram shingles (lowercased alnum tokens). Word shingles over
    * char shingles is a volume decision: ~5x fewer shingle rows per doc
    * for the same near-dup recall on natural text — and shingle-row count
    * is the direct cost driver of the signature aggregation. At least one
    * (possibly empty) shingle is produced so empty docs keep a signature
    * (mirrors the greatest(...,1) in the oracle SQL). */
  def shingles(textCol: String, k: Int): Column =
    shinglesOfTokens(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)", k)

  /** Shingles over an already-tokenized expression. Callers on a hot
    * path should project the token array into its OWN column first and
    * pass that column's name: higher-order functions are interpreted,
    * so a tokenizer inlined here re-runs PER ELEMENT of the sequence
    * (~shingle-count regex evaluations per row, measured ~2x the whole
    * minhash query) — while a column reference is computed once per row
    * and CollapseProject keeps multi-referenced aliases materialized. */
  def shinglesOfTokens(toksExpr: String, k: Int): Column =
    expr(s"transform(sequence(1, greatest(size($toksExpr) - ${k - 1}, 1)), " +
      s"j -> concat_ws(' ', slice($toksExpr, j, $k)))")

  /** MinHash signature: numHashes mins over a chunked-md5 hash family —
    * lane i draws its value from an 8-hex-char (32-bit) slice of
    * md5('<i/4>:<shingle>'), so FOUR lanes share one digest. md5's
    * output bits are uniformly mixed, so disjoint 32-bit chunks behave
    * as independent hash functions (the one-permutation-hashing
    * argument), and 32 bits is ample for a min over a document's
    * shingle set. Versus one-md5-per-lane this computes 4x fewer
    * digests AND min-aggregates 4x shorter strings — both terms of the
    * dominant cost. Deterministic, seedless, reproducible in any
    * engine with md5 + substring.
    *
    * Computed EXPLODED, not as nested array lambdas: higher-order
    * functions are interpreted (no whole-stage codegen), so
    * transform-inside-transform is ~100x slower than exploding shingles
    * to rows and min-aggregating flat codegen'd md5 columns. min(string)
    * does plan a SortAggregate (variable-width buffer), which is why
    * shingle-row VOLUME — not the hash function — is the cost knob.
    * (Numeric mins were tried and rejected: conv() is slower than the
    * sort, and inlined hex arithmetic re-evaluates md5 per digit.) */
  def minHashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int, numHashes: Int): DataFrame = {
    val nDigests = (numHashes + 3) / 4
    val digests = (0 until nDigests).map(d =>
      md5(concat(lit(d.toString), lit(":"), col("__sh"))).as(s"__h$d"))
    val exploded = df
      .select(col(idCol),
        expr(s"regexp_extract_all(lower($textCol), '[a-z0-9]+', 0)").as("__toks"))
      .select(col(idCol),
        explode(shinglesOfTokens("__toks", shingleK)).as("__sh"))
      .select(col(idCol) +: digests: _*)
    val mins = (0 until numHashes).map(i =>
      min(substring(col(s"__h${i / 4}"), (i % 4) * 8 + 1, 8)).as(s"mh$i"))
    exploded.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** LSH banding: candidate near-dup pairs (idA < idB) that share at least
    * one band signature. One shuffle on (band, sig) to group buckets, pairs
    * generated inside each bucket — no cartesian, no recomputing self-join. */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleK: Int = 3, numHashes: Int = 8, bands: Int = 2): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rows = numHashes / bands
    val sigs = minHashSignatures(df, idCol, textCol, shingleK, numHashes)
    val bandCols = (0 until bands).map(b =>
      md5(concat_ws(",", (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)))
    val banded = sigs.select(col(idCol),
      posexplode(array(bandCols: _*)).as(Seq("band", "sig")))
    pairsWithinBuckets(banded, idCol, Seq("band", "sig"))
  }

  /** Group rows by bucket keys and emit all (a < b) id pairs inside each
    * bucket, deduplicated. The bucket member lists are sorted so pair
    * generation is deterministic; bucket size bounds the quadratic blowup
    * (LSH parameters control expected bucket size). */
  private[operators] def pairsWithinBuckets(
      df: DataFrame, idCol: String, bucketCols: Seq[String]): DataFrame =
    df.groupBy(bucketCols.map(col): _*)
      .agg(sort_array(collect_set(col(idCol))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(ids) - 1), " +
        "i -> transform(slice(ids, i + 1, size(ids) - i), " +
        "x -> struct(element_at(ids, i) as id_a, x as id_b))))")).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()

  /** SimHash bit-string fingerprint (bits chars of '0'/'1'): per token,
    * md5-parity votes ±1 on each bit; bit set iff the vote sum >= 0.
    * Integer vote sums are order-independent, so partial aggregation and
    * SQL oracles agree exactly. */
  def simHash(textCol: String, bits: Int = 16): Column = {
    val toks = s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"
    expr(s"concat_ws('', transform(sequence(0, ${bits - 1}), i -> " +
      s"case when aggregate($toks, 0, (acc, t) -> acc + " +
      s"(ascii(substring(md5(concat(t, ':', cast(i as string))), 1, 1)) % 2) * 2 - 1) >= 0 " +
      s"then '1' else '0' end))")
  }

  /** SimHash fingerprints computed EXPLODED (same codegen rationale as
    * [[minHashSignatures]]): one row per token, `bits` flat ±1 vote
    * columns, summed per doc (integer sums — order-independent), bit i
    * set iff vote sum >= 0. Docs with zero tokens keep an all-'1' hash
    * via explode_outer + zero votes. */
  def simHashes(df: DataFrame, idCol: String, textCol: String,
      bits: Int): DataFrame = {
    val exploded = df.select(col(idCol),
      explode_outer(expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
        .as("__tok"))
    val votes = (0 until bits).map { i =>
      sum(when(col("__tok").isNull, 0).otherwise(
        (ascii(substring(md5(concat(col("__tok"), lit(":"), lit(i.toString))), 1, 1)) % 2) * 2 - 1))
        .as(s"v$i")
    }
    val bitCols = (0 until bits).map(i =>
      when(col(s"v$i") >= 0, lit("1")).otherwise(lit("0")))
    exploded.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
      .select(col(idCol), concat(bitCols: _*).as("sim"))
  }

  /** SimHash near-dup pairs: block on the first prefixBits bits (one
    * shuffle on the block key), then exact Hamming distance <= maxHamming
    * within blocks. Pairs differing inside the prefix are missed — that is
    * the standard recall/cost trade; run b permutations for full recall. */
  def simHashPairs(
      df: DataFrame, idCol: String, textCol: String,
      bits: Int = 16, prefixBits: Int = 8, maxHamming: Int = 3): DataFrame = {
    val withSim = simHashes(df, idCol, textCol, bits)
      .withColumn("block", substring(col("sim"), 1, prefixBits))
    // pairs generated inside buckets (single shuffle, no self-join recompute)
    withSim.groupBy(col("block"))
      .agg(sort_array(collect_list(struct(col(idCol).as("id"), col("sim")))).as("items"))
      .filter(size(col("items")) > 1)
      .select(explode(expr(
        "flatten(transform(sequence(1, size(items) - 1), " +
        "i -> transform(slice(items, i + 1, size(items) - i), " +
        "x -> struct(element_at(items, i) as a, x as b))))")).as("p"))
      .select(col("p.a.id").as("id_a"), col("p.b.id").as("id_b"),
        expr(s"aggregate(sequence(1, $bits), 0, (acc, i) -> acc + " +
          "if(substring(p.a.sim, i, 1) = substring(p.b.sim, i, 1), 0, 1))")
          .as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** n-gram (word-set) Jaccard pairs within a blocking column. Jaccard
    * computed as |A∩B| / (|A|+|B|-|A∩B|) over DISTINCT token sets so both
    * engines divide the same two integers. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String, blockCol: String,
      threshold: Double): DataFrame = {
    val toks = array_distinct(
      expr(s"regexp_extract_all(lower($textCol), '[a-z]+', 0)"))
    val prepped = df.select(col(idCol), col(blockCol).as("block"), toks.as("toks"))
    val a = prepped.toDF("id_a", "block", "toks_a")
    val b = prepped.toDF("id_b", "block", "toks_b")
    a.join(b, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("toks_a"), col("toks_b"))))
      .withColumn("jaccard",
        col("inter") / (size(col("toks_a")) + size(col("toks_b")) - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }
}
