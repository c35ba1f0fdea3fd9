package graft.tools

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType, StructField, StructType}

import graft.operators.PowerIterOps

/** r13 VERDICT item 5 bake-off (CLOSED r14 — round-batching LOST;
  * the per-round-collect loop in PowerIterOps stays): emb_power_iter
  * is the worst weak-list ratio (46.8x, pure floor by the r13
  * JobCensus) and the one loop whose driver-job count scales with
  * iterations, so the candidate was batching TWO rounds per collect —
  * round A from the driver-held iterate as a literal, round B
  * consuming A's renormalized iterate as a broadcast 1-row side, one
  * driver round-trip saved per pair. Parity is exact (same fixed-IEEE
  * fold in-plan, BIGINT micro-unit intermediate; checksummed here).
  *
  * Measured verdict (sf0.1, alternating GC-separated reps, one JVM,
  * BOTH variants paying the same collect+parallelize materialization):
  * batched LOST 7/8 reps, median 1.38 -> 1.53 s, driver jobs 10 -> 11
  * — the broadcast materialization of the intermediate iterate costs
  * MORE than the driver round-trip it replaces (the HitsOps
  * round-batching result again). An earlier 8/11-win reading was an
  * apples-to-oranges artifact: the candidate returned a raw DataFrame
  * while the baseline paid collect+parallelize; equalizing the
  * output path flipped the sign. Usage:
  * `sbt "runMain graft.tools.ProfilePowerIter [sfDir] [reps]"`.
  */
object ProfilePowerIter {

  /** The rejected candidate: two rounds per collect, round B chained
    * through a broadcast of round A's iterate. */
  def batched(df: DataFrame, vecCol: String, dim: Int): DataFrame = {
    val spark = df.sparkSession
    val xq = df.select(expr(
      s"transform($vecCol, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
      .as("xq"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    def cj(src: DataFrame, sExpr: String): DataFrame = src
      .select(expr(sExpr).as("s"), col("xq"))
      .select(posexplode(col("xq")).as(Seq("j", "x")), col("s"))
      .groupBy("j")
      .agg(sum(expr("CAST(x AS DECIMAL(38,0)) * s")).as("c"))
    def fold(c: DataFrame): DataFrame = c
      .groupBy()
      .agg(expr("transform(array_sort(collect_list(struct(j, c))), t -> CAST(t.c AS DOUBLE))")
        .as("cd"))
      .select(col("cd"),
        expr("sqrt(aggregate(cd, CAST(0 AS DOUBLE), (acc, x) -> acc + x * x))")
          .as("nrm"))
      .select(expr(
        "transform(cd, x -> CAST(floor(x / nrm * 1000000.0) AS BIGINT))").as("vq"))
    val ones = Array.fill(dim)(1L).mkString("array(", "L,", "L)")
    val vA = fold(cj(xq,
      s"aggregate(zip_with(xq, $ones, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"))
    val vB = fold(cj(xq.crossJoin(broadcast(vA)),
      "aggregate(zip_with(xq, vq, (a, b) -> a * b), 0L, (acc, t) -> acc + t)"))
    val v = vB.collect()(0).getSeq[Long](0).toArray
    xq.unpersist(blocking = false)
    spark.createDataFrame(
      spark.sparkContext.parallelize(v.zipWithIndex.map {
        case (vf, j) => Row(j, vf)
      }.toIndexedSeq, 1),
      StructType(Seq(StructField("dim_j", IntegerType, nullable = false),
        StructField("v_fp", LongType, nullable = false))))
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, sf, "embeddings")
    val h = new ProbeHarness(spark, "pi")

    def cur() = PowerIterOps
      .dominantDirection(emb, "embedding", dim = 64, iters = 2)
      .orderBy("dim_j")
    def cand() = batched(emb, "embedding", 64).orderBy("dim_j")

    val base = h.sig(cur())
    h.parity(base, Seq("batched(candidate)" -> (() => cand())))

    // alternating GC-separated reps, one JVM — the only valid
    // comparison on this host (Bench.scala discipline)
    for (r <- 1 to reps) {
      h.time(s"current#$r")(cur())
      h.time(s"batched#$r")(cand())
    }
    spark.stop()
  }
}
