package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev profiler: a19 pair-pass variants. */
object ProfileA19b {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    def opRaw = li.select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val op = opRaw.localCheckpoint(true)
    def pairsSmj = op.select(col("o"), col("p").as("p1"))
      .join(op.select(col("o"), col("p").as("p2")), Seq("o"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("p1"), col("p2")).limit(20)
    def pairsShj = op.select(col("o"), col("p").as("p1")).hint("shuffle_hash")
      .join(op.select(col("o"), col("p").as("p2")), Seq("o"))
      .filter(col("p1") < col("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("p1"), col("p2")).limit(20)
    // packed pair key: one long instead of two
    def pairsPacked = op.select(col("o"), col("p").as("p1")).hint("shuffle_hash")
      .join(op.select(col("o"), col("p").as("p2")), Seq("o"))
      .filter(col("p1") < col("p2"))
      .select((col("p1") * 1048576 + col("p2")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("support"))
      .select(expr("pk div 1048576").as("p1"), (col("pk") % 1048576).as("p2"), col("support"))
      .orderBy(col("support").desc, col("p1"), col("p2")).limit(20)
    // basket collect + native packed-pair kernel: no self-join at all —
    // one groupBy(o) collect, codegen'd packed_pairs + explode, then a
    // single-long-key count.
    def pairsBasket = op
      .select(col("o"), col("p").cast("long").as("p"))
      .groupBy("o").agg(collect_list(col("p")).as("ps"))
      .select(explode(expr("packed_pairs(ps, 20)")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("support"))
      .select(expr("pk div 1048576").as("p1"), (col("pk") % 1048576).as("p2"),
        col("support"))
      .orderBy(col("support").desc, col("p1"), col("p2")).limit(20)
    noop(pairsSmj) // warm
    noop(pairsBasket)
    for (r <- 1 to 3) {
      time(s"[$r] pairs current")(noop(pairsSmj))
      time(s"[$r] pairs shuffle_hash")(noop(pairsShj))
      time(s"[$r] pairs packed")(noop(pairsPacked))
      time(s"[$r] pairs basket")(noop(pairsBasket))
    }
    val pa = pairsShj.collect().map(_.toString)
    val pb = pairsBasket.collect().map(_.toString)
    println(s"basket parity: ${pa.sameElements(pb)} (${pa.length})")
    println("=== current plan ===")
    pairsSmj.explain("formatted")
    spark.stop()
  }
}
