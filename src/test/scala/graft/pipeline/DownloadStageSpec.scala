package graft.pipeline

import java.nio.file.{Files, Paths}
import java.util.concurrent.ConcurrentHashMap

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Fails the first `failuresPerUrl` attempts per url, then succeeds;
  * no real sleeping. Top-level so the closure stays serializable. */
private class FlakyFetcher(failuresPerUrl: Int, payload: Int)
    extends DownloadStage.Fetcher {
  @transient private lazy val attempts = new ConcurrentHashMap[String, Integer]()
  override def fetch(url: String): Array[Byte] = {
    val n = attempts.merge(url, 1, (a, b) => a + b)
    if (n <= failuresPerUrl) throw new RuntimeException(s"flaky $url try $n")
    if (url.contains("dead")) throw new RuntimeException("permanently dead")
    Array.fill[Byte](payload)(7)
  }
  override def backoff(retry: Int): Unit = () // tests don't sleep
}

class DownloadStageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("download stage: retries recover flaky urls, permanent failures become data") {
    val dir = Files.createTempDirectory("dl").toString
    val tasks = Seq(
      ("http://x/a.mp3", s"$dir/a.mp3"),
      ("http://x/b.mp3", s"$dir/b.mp3"),
      ("http://x/dead.mp3", s"$dir/dead.mp3")).toDF("url", "dest")
    // 2 failures per url; maxRetries=3 -> flaky urls succeed on attempt 3
    val status = DownloadStage.run(tasks, new FlakyFetcher(2, 20000),
      maxRetries = 3, parallelism = 2)
    val rows = status.orderBy("url").collect()
    val byUrl = rows.map(r => r.getString(0) -> r).toMap
    assert(byUrl("http://x/a.mp3").getBoolean(2))
    assert(byUrl("http://x/a.mp3").getInt(3) == 3) // 2 failures + 1 success
    assert(!byUrl("http://x/dead.mp3").getBoolean(2))
    assert(byUrl("http://x/dead.mp3").getInt(3) == 4) // maxRetries+1 attempts
    // chunked write produced the full payload on disk
    assert(Files.size(Paths.get(dir, "a.mp3")) == 20000)
    assert(!Files.exists(Paths.get(dir, "dead.mp3")))

    val s = DownloadStage.summarize(status).collect()(0)
    assert(s.getAs[Long]("n_ok") == 2 && s.getAs[Long]("n_failed") == 1)
    assert(math.abs(s.getAs[Double]("success_rate") - 200.0 / 3) < 1e-9)
    assert(s.getAs[Long]("total_bytes") == 40000)
  }
}
