package graft.tools

import org.apache.spark.sql.functions._

import graft.{Checkpoints, Tables}

/** Dev probe (r12, VERDICT item 4): price the `reliable` checkpoint
  * mode so the Checkpoints scaladoc can state the cost it only
  * gestured at. Runs a long PageRank (iters=12, checkpointEvery=4 →
  * 2 mid-loop lineage cuts) on the sf0.1 events graph, alternating
  * local / reliable reps in ONE JVM with GC separation, and prints the
  * per-mode min/median and the ratio. */
object ProfileReliable {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)
    import spark.implicits._

    // the g1 fixture graph: supplier-part bipartite mirror (1.2M edges)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_suppkey"), col("l_partkey"))
    val fwd = li.select((col("l_suppkey") * 2 + 1).as("src"),
      (col("l_partkey") * 2).as("dst")).distinct()
    val ev = fwd.union(fwd.select(col("dst").as("src"), col("src").as("dst")))

    val dir = java.nio.file.Files.createTempDirectory("graft-rel-bench").toString
    def once(mode: String): Double = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc(); Thread.sleep(300)
      spark.conf.set(Checkpoints.ModeKey, mode)
      if (mode == "reliable") spark.conf.set(Checkpoints.DirKey, dir)
      val t0 = System.nanoTime()
      graft.operators.PageRankOps.pageRank(ev, "src", "dst",
          iters = 12, checkpointEvery = 4, assumeDistinct = true,
          dimensionNodes = true, sourcesSpanNodes = true)
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.conf.unset(Checkpoints.ModeKey)
      spark.conf.unset(Checkpoints.DirKey)
      dt
    }
    once("local"); once("reliable") // warm both paths
    val loc = collection.mutable.Buffer[Double]()
    val rel = collection.mutable.Buffer[Double]()
    for (_ <- 1 to 4) { loc += once("local"); rel += once("reliable") }
    def stats(xs: Seq[Double]) = (xs.min, xs.sorted.apply(xs.size / 2))
    val (lm, lmed) = stats(loc.toSeq)
    val (rm, rmed) = stats(rel.toSeq)
    println(f"[rel] local    min $lm%6.3f med $lmed%6.3f  (${loc.map(x => f"$x%.2f").mkString(" ")})")
    println(f"[rel] reliable min $rm%6.3f med $rmed%6.3f  (${rel.map(x => f"$x%.2f").mkString(" ")})")
    println(f"[rel] ratio min ${rm / lm}%5.2f  med ${rmed / lmed}%5.2f")
    spark.stop()
  }
}
