package graft.tools

import java.lang.management.ManagementFactory
import java.nio.file.{Files, Path, Paths}

/** Dev profiler for the in-suite bench degradation leak (r10 VERDICT
  * item 1): `dedup_lsh_recall` read 3.14 → 6.71 → 8.58 → 9.09 s across
  * its OWN warm+3 back-to-back runs (bench.json "runs"), while the next
  * query's warm run — after Bench.cooldown() — was fast again. A fresh
  * session does NOT reproduce it (flat ~2.1 s), so the leak needs
  * mid-suite state: this tool replays the suite PREFIX (every query
  * before the probe in Bench order, once each, same cooldown), then
  * runs the probe warm+3 instrumented — wall time, GC time delta, JIT
  * time delta, heap, block-manager storage, local-dir bytes — and
  * A/B-tests per-run hygiene. Not part of the query surface.
  *
  * Usage: ProfileLeak [probeName] [prefixN|full] [hygieneLevels...]
  */
object ProfileLeak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val probe = args.headOption.getOrElse("dedup_lsh_recall")
    val prefixArg = args.lift(1).getOrElse("full")
    val levels = if (args.length > 2) args.drop(2).toSeq else Seq("none")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.registerAll(spark, sfDir)
    graft.functions.TextFns.registerAll(spark)

    val all = graft.Bench.headline.filter(graft.SparkEntry.queries.contains) ++
      (graft.SparkEntry.queries.keys.toSeq.sorted diff graft.Bench.headline)
    val upTo = all.indexOf(probe) match { case -1 => 0; case i => i }
    val prefix = prefixArg match {
      case "full" => all.take(upTo)
      case n      => all.take(upTo).takeRight(n.toInt)
    }

    def localDirBytes(): Long = {
      val tmp = Paths.get(System.getProperty("java.io.tmpdir", "/tmp"))
      def sizeOf(p: Path): Long =
        try {
          val s = Files.walk(p)
          try s.filter(Files.isRegularFile(_)).mapToLong(f =>
            try Files.size(f) catch { case _: Exception => 0L }).sum()
          finally s.close()
        } catch { case _: Exception => 0L }
      val ds = Files.list(tmp)
      try {
        import scala.jdk.CollectionConverters._
        ds.iterator().asScala
          .filter(p => p.getFileName.toString.startsWith("blockmgr-") ||
            p.getFileName.toString.startsWith("spark-"))
          .map(sizeOf).sum
      } finally ds.close()
    }
    def gcMs(): Long = {
      import scala.jdk.CollectionConverters._
      ManagementFactory.getGarbageCollectorMXBeans.asScala
        .map(_.getCollectionTime).sum
    }
    def jitMs(): Long = ManagementFactory.getCompilationMXBean.getTotalCompilationTime
    def heapMb(): Long = {
      val m = ManagementFactory.getMemoryMXBean.getHeapMemoryUsage
      m.getUsed / (1 << 20)
    }
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      try org.apache.spark.sql.GraftBenchShim.stripRootSort(
        graft.SparkEntry.benchVariants.getOrElse(name,
          graft.SparkEntry.queries(name))(spark, sfDir))
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[leak] $name failed: ${e.getMessage}")
      }
      (System.nanoTime() - t0) / 1e9
    }
    def cooldown(): Unit = {
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      System.gc(); Thread.sleep(120); System.gc(); Thread.sleep(80)
    }
    def hygiene(level: String): Unit = level match {
      case "none" =>
      case "unpersist" =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      case "full" =>
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
        System.gc(); Thread.sleep(120); System.gc(); Thread.sleep(80)
    }
    def report(tag: String, t: Double, gc0: Long, jit0: Long): Unit = {
      val rdds = spark.sparkContext.getPersistentRDDs.size
      println(f"[leak] $tag $t%6.2f s  gc+${gcMs() - gc0}%5d ms jit+${jitMs() - jit0}%6d ms " +
        f"heap=${heapMb()}%5d MB rdds=$rdds localdir=${localDirBytes() / 1e6}%.0f MB")
    }

    println(s"[leak] prefix of ${prefix.size} queries before probe=$probe")
    // suite-global warmup, as Bench does
    all.headOption.foreach { q => once(q); once(q) }
    val tPrefix0 = System.nanoTime()
    prefix.zipWithIndex.foreach { case (q, i) =>
      cooldown()
      val w = once(q)
      val t = once(q) // 2 runs per query: cheaper than Bench's 4, same state class
      if ((i + 1) % 25 == 0)
        println(f"[leak] ...prefix ${i + 1}/${prefix.size} ($q $w%.2f/$t%.2f) " +
          f"heap=${heapMb()} MB gc=${gcMs()} ms jit=${jitMs()} ms localdir=${localDirBytes() / 1e6}%.0f MB")
    }
    println(f"[leak] prefix done in ${(System.nanoTime() - tPrefix0) / 1e9}%.0f s")

    for (level <- levels) {
      cooldown()
      println(s"[leak] === probe $probe level=$level ===")
      for (r <- 0 to 3) {
        val gc0 = gcMs(); val jit0 = jitMs()
        val t = once(probe)
        report(if (r == 0) "warm" else s"run$r", t, gc0, jit0)
        if (r < 3) hygiene(level)
      }
    }
    spark.stop()
  }
}
