package graft.io

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** io_s17: mergeSchema must null the late-added column for old-batch
  * rows and keep new-batch values exact — checked against the authoring
  * rule on a scratch documents table. */
class SchemaEvolutionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("schema evolution: old batches read with the new column null") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_evolve").toString
    val rows = (0L until 40L).map(i =>
      (i, "x", if (i % 3 == 0) "en" else "vi", 100L + i))
    rows.toDF("doc_id", "text", "lang", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = graft.SparkEntry.queries("io_s17_schema_evolution")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // reference from the authoring rule: evens -> batch1 (no quality),
    // odds -> batch2 with quality = n_chars % 97
    val ref = rows.groupBy(_._3).map { case (lang, rs) =>
      val odds = rs.filter(_._1 % 2 == 1)
      lang -> (rs.size.toLong, odds.size.toLong,
        odds.map(r => r._4 % 97).sum, rs.map(_._4).sum)
    }
    assert(got == ref)
    assert(got.values.forall { case (n, nq, _, _) => nq < n },
      "old-batch rows must survive with quality null, not vanish")
  }
}
