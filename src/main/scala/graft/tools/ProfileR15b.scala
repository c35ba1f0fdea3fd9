package graft.tools

import graft.Checkpoints.CheckpointSyntax
import graft.{Sessions, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** r15 probe 2: can the native packed_pairs kernel beat the
  * distinct+self-join co-purchase pair generation (coEdges) that every
  * g2/g3/g6/g8 run pays? a19 measured the basket form and REJECTED it
  * — but a19 needs the distinct (o, p) table anyway for its count
  * sidecars, so the basket collect was ADDED cost there. coEdges
  * consumers use (o, p) only to make pairs: the collect_set aggregate
  * would REPLACE the distinct + hinted self-join (2 keyed exchanges ->
  * 1, explode goes row-local), not sit beside it.
  *
  * A/B on the g3_assortativity shape (the lightest consumer: its own
  * fold is ~0.35 s, so the fixture dominates) plus the g6 LPA shape.
  * Parity checksummed first. Usage: runMain ... <sfDir> <reps>
  */
object ProfileR15b {

  private def coEdgesJoin(s: SparkSession, dir: String): DataFrame = {
    val op = Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val a = op.select(col("o"), col("p").as("p1")).hint("shuffle_hash")
    val b = op.select(col("o"), col("p").as("p2"))
    a.join(b, Seq("o")).filter(col("p1") < col("p2")).select("p1", "p2")
  }

  /** Basket form: ONE shuffle (groupBy o, set-dedup in the aggregate),
    * then the codegen'd C(n,2) kernel + explode, all row-local. Emits
    * each (p1 < p2) pair once per shared order — the same multiset as
    * the self-join, so downstream distinct/canon behavior is identical. */
  private def coEdgesPacked(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .groupBy("o").agg(sort_array(collect_set(col("p"))).as("ps"))
      .select(explode(expr("packed_pairs(ps, 31)")).as("pk"))
      .select(shiftright(col("pk"), 31).as("p1"),
        (col("pk").bitwiseAND(lit((1L << 31) - 1))).as("p2"))

  private def g3Of(co: (SparkSession, String) => DataFrame)(
      s: SparkSession, dir: String): DataFrame = {
    val e = co(s, dir).distinct().checkpointed()
    val deg = e.select(col("p1").as("v")).union(e.select(col("p2").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
      .checkpointed()
    val degB: DataFrame => DataFrame =
      if (deg.count() <= 5_000_000L) broadcast else identity
    val sym = e.union(e.select(col("p2").as("p1"), col("p1").as("p2")))
    sym
      .join(degB(deg.select(col("v").as("p1"), col("d").as("x"))), Seq("p1"))
      .join(degB(deg.select(col("v").as("p2"), col("d").as("y"))), Seq("p2"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast("decimal(38,0)")).as("sx"),
        sum((col("x") * col("y")).cast("decimal(38,0)")).as("sxy"),
        sum((col("x") * col("x")).cast("decimal(38,0)")).as("sxx"))
      .select(expr("CAST(n div 2 AS BIGINT)").as("n_edges"),
        expr("""CAST(CASE WHEN n * sxx - sx * sx > 0
                THEN ((n * sxy - sx * sx) * 1000000) div (n * sxx - sx * sx)
                END AS BIGINT)""".replaceAll("\\s+", " ")).as("assort_ppm"))
  }

  private def g6Of(co: (SparkSession, String) => DataFrame)(
      s: SparkSession, dir: String): DataFrame =
    graft.operators.GraphOps.labelPropagation(co(s, dir), "p1", "p2",
        rounds = 2, dimensionNodes = true)
      .groupBy("label")
      .agg(count(lit(1)).as("n_nodes"), min(col("v")).as("min_node"),
        max(col("v")).as("max_node"))
      .select(col("label").as("community"), col("n_nodes"),
        col("min_node"), col("max_node"))
      .orderBy("community")

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 4
    val spark = Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)
    val h = new ProbeHarness(spark, "r15b")

    val g3Base = h.sig(g3Of(coEdgesJoin)(spark, sfDir))
    h.parity(g3Base, Seq(
      "g3_packed" -> (() => g3Of(coEdgesPacked)(spark, sfDir))))
    val g6Base = h.sig(g6Of(coEdgesJoin)(spark, sfDir))
    h.parity(g6Base, Seq(
      "g6_packed" -> (() => g6Of(coEdgesPacked)(spark, sfDir))))

    for (r <- 1 to reps) {
      h.time(s"g3_join#$r")(g3Of(coEdgesJoin)(spark, sfDir))
      h.time(s"g3_packed#$r")(g3Of(coEdgesPacked)(spark, sfDir))
    }
    for (r <- 1 to reps) {
      h.time(s"g6_join#$r")(g6Of(coEdgesJoin)(spark, sfDir))
      h.time(s"g6_packed#$r")(g6Of(coEdgesPacked)(spark, sfDir))
    }
    spark.stop()
  }
}
