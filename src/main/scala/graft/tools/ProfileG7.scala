package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev profiler: bakes off g7_link_predict's pair-generation forms at
  * sf0.1 — the r9 self-join (distinct edge list, broadcast weight
  * table, merge-hinted pair join) against an in-row combination
  * explode over a per-part supplier array (deg-capped, so the array
  * and the pair fan-out are bounded). Not part of the query surface. */
object ProfileG7 {
  private def lnFp(x: String): String =
    s"CAST(floor(CAST(1000000 AS DOUBLE) * ln(CAST($x AS DOUBLE))) AS BIGINT)"

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[profile] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val cap = 64

    def selfJoin: DataFrame = {
      val e = li.select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct().localCheckpoint(true)
      val w = e.groupBy("p").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2 && col("d") <= cap)
        .select(col("p"), expr(s"1000000000000L div ${lnFp("d")}").as("w_fp"))
      e.join(broadcast(w), Seq("p"))
        .join(e.select(col("p"), col("s").as("s2")).hint("merge"), Seq("p"))
        .filter(col("s") < col("s2"))
        .groupBy(col("s").as("s1"), col("s2"))
        .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_fp"))
        .orderBy(col("aa_fp").desc, col("s1"), col("s2")).limit(20)
    }

    def arrayExplode: DataFrame = {
      val idx = li.select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .groupBy("p").agg(sort_array(collect_set(col("s"))).as("ss"))
        .filter(size(col("ss")).between(2, cap))
        .select(expr(s"1000000000000L div ${lnFp("size(ss)")}").as("w_fp"),
          explode(expr("flatten(transform(ss, (x, i) -> " +
            "transform(slice(ss, i + 2, size(ss)), " +
            "y -> struct(x AS s1, y AS s2))))")).as("pr"))
      idx.groupBy(col("pr.s1").as("s1"), col("pr.s2").as("s2"))
        .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_fp"))
        .orderBy(col("aa_fp").desc, col("s1"), col("s2")).limit(20)
    }

    // Two-step codegen'd generators: posexplode the supplier array to
    // (i, s1), then explode the tail slice — no interpreted lambdas.
    def posExplode2: DataFrame = {
      val idx = li.select(col("l_partkey").as("p"), col("l_suppkey").as("s"))
        .groupBy("p").agg(sort_array(collect_set(col("s"))).as("ss"))
        .filter(size(col("ss")).between(2, cap))
        .select(expr(s"1000000000000L div ${lnFp("size(ss)")}").as("w_fp"),
          col("ss"), posexplode(col("ss")).as(Seq("i", "s1")))
        .select(col("w_fp"), col("s1"),
          explode(expr("slice(ss, i + 2, size(ss))")).as("s2"))
      idx.groupBy("s1", "s2")
        .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_fp"))
        .orderBy(col("aa_fp").desc, col("s1"), col("s2")).limit(20)
    }

    // Self-join but shuffle_hash instead of merge: same keyed exchange,
    // no sort on either 590k-row side.
    def selfJoinHash: DataFrame = {
      val e = li.select(col("l_suppkey").as("s"), col("l_partkey").as("p"))
        .distinct().localCheckpoint(true)
      val w = e.groupBy("p").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2 && col("d") <= cap)
        .select(col("p"), expr(s"1000000000000L div ${lnFp("d")}").as("w_fp"))
      e.join(broadcast(w), Seq("p"))
        .join(e.select(col("p"), col("s").as("s2")).hint("shuffle_hash"), Seq("p"))
        .filter(col("s") < col("s2"))
        .groupBy(col("s").as("s1"), col("s2"))
        .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_fp"))
        .orderBy(col("aa_fp").desc, col("s1"), col("s2")).limit(20)
    }

    // packed_pairs: native codegen'd pair kernel — one primitive long
    // array per part, codegen'd explode, single-long-key hash agg.
    def packedPairs: DataFrame = {
      val idx = li.select(col("l_partkey").as("p"),
          col("l_suppkey").cast("long").as("s"))
        .groupBy("p").agg(sort_array(collect_set(col("s"))).as("ss"))
        .filter(size(col("ss")).between(2, cap))
        .select(expr(s"1000000000000L div ${lnFp("size(ss)")}").as("w_fp"),
          explode(expr("packed_pairs(ss, 20)")).as("pk"))
      idx.groupBy("pk")
        .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_fp"))
        .select(expr("pk div 1048576").as("s1"), (col("pk") % 1048576).as("s2"),
          col("n_common"), col("aa_fp"))
        .orderBy(col("aa_fp").desc, col("s1"), col("s2")).limit(20)
    }

    // Hash self-join, but the 9M-row aggregate keys on ONE packed long
    // instead of two columns (the a19 packed-key finding).
    def selfJoinHashPacked: DataFrame = {
      val e = li.select(col("l_suppkey").cast("long").as("s"), col("l_partkey").as("p"))
        .distinct().localCheckpoint(true)
      val w = e.groupBy("p").agg(count(lit(1)).as("d"))
        .filter(col("d") >= 2 && col("d") <= cap)
        .select(col("p"), expr(s"1000000000000L div ${lnFp("d")}").as("w_fp"))
      e.join(broadcast(w), Seq("p"))
        .join(e.select(col("p"), col("s").as("s2")).hint("shuffle_hash"), Seq("p"))
        .filter(col("s") < col("s2"))
        .select((col("s") * 1048576 + col("s2")).as("pk"), col("w_fp"))
        .groupBy("pk")
        .agg(count(lit(1)).as("n_common"), sum(col("w_fp")).as("aa_fp"))
        .select(expr("pk div 1048576").as("s1"), (col("pk") % 1048576).as("s2"),
          col("n_common"), col("aa_fp"))
        .orderBy(col("aa_fp").desc, col("s1"), col("s2")).limit(20)
    }

    time("selfJoin warmup")(noop(selfJoin))
    time("packedPairs warmup")(noop(packedPairs))
    time("selfJoinHashPacked warmup")(noop(selfJoinHashPacked))
    time("posExplode2 warmup")(noop(posExplode2))
    time("selfJoinHash warmup")(noop(selfJoinHash))
    for (r <- 1 to 4) {
      System.gc(); Thread.sleep(500)
      time(s"selfJoin r$r")(noop(selfJoin))
      System.gc(); Thread.sleep(500)
      time(s"selfJoinHash r$r")(noop(selfJoinHash))
      System.gc(); Thread.sleep(500)
      time(s"posExplode2 r$r")(noop(posExplode2))
      System.gc(); Thread.sleep(500)
      time(s"packedPairs r$r")(noop(packedPairs))
      System.gc(); Thread.sleep(500)
      time(s"selfJoinHashPacked r$r")(noop(selfJoinHashPacked))
    }

    println("--- parity check (top-20 rows) ---")
    val a = selfJoin.collect().map(_.toString)
    val b = arrayExplode.collect().map(_.toString)
    val c = posExplode2.collect().map(_.toString)
    val d = selfJoinHash.collect().map(_.toString)
    val e = packedPairs.collect().map(_.toString)
    println(s"rows equal b: ${a.sameElements(b)} c: ${a.sameElements(c)} " +
      s"d: ${a.sameElements(d)} e: ${a.sameElements(e)} (${a.length})")
    val _ = arrayExplode
    spark.stop()
  }
}
