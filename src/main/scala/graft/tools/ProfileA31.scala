package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}

/** Dev probe (r15, VERDICT directive 4): a31_column_profile stands at
  * 2.02 s isolated / 34× duck with an r12 census verdict: TWO scans of
  * lineitem (the exact-NDV multi-distinct pass and a separate stats
  * pass) because min/max over STRING buffers forces SortAggregate,
  * which on the ×(k+1) Expand of the NDV pass measured 11.3 s.
  *
  * Candidate FUSEDPRIM: collapse to ONE scan by making every min/max
  * buffer primitive so the whole profile — countDistincts AND
  * min/max — fits a single HashAggregate over the Expand:
  * l_orderkey min/max as BIGINT, l_quantity as floor(x*100) cents
  * (floor∘(*100) is monotone, so min/max commute with the rendering),
  * l_shipdate as DATE (truncation is monotone), and the single-char
  * flag column as its code point (order-identical to string order for
  * 1-char ASCII values — the rendering-rule-per-column contract a31
  * already defines). Strings are rendered AFTER the 1-row agg.
  * Same JVM, alternating GC-separated reps, parity checksummed.
  */
object ProfileA31 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.Sessions.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.registerAll(spark, sfDir)

    val standing = () => SparkEntry.queries("a31_column_profile")(spark, sfDir)

    // (column, primitive min/max encoding, post-agg string rendering)
    val cols: Seq[(String, String, String)] = Seq(
      ("l_orderkey", "%s(l_orderkey)", "CAST(%s AS STRING)"),
      ("l_quantity", "%s(CAST(floor(l_quantity * 100) AS BIGINT))",
        "CAST(%s AS STRING)"),
      ("l_returnflag", "%s(ascii(l_returnflag))", "char(%s)"),
      ("l_shipdate", "%s(CAST(l_shipdate AS DATE))", "CAST(%s AS STRING)"))

    def fusedPrim(): DataFrame = {
      val li = Tables.load(spark, sfDir, "lineitem")
      val aggs = Seq(count(lit(1)).as("n")) ++ cols.zipWithIndex.flatMap {
        case ((c, enc, _), i) => Seq(
          count(col(c)).as(s"c$i"),
          countDistinct(col(c)).as(s"d$i"),
          expr(enc.format("min")).as(s"pmn$i"),
          expr(enc.format("max")).as(s"pmx$i"))
      }
      val stackArgs = cols.zipWithIndex.map { case ((c, _, render), i) =>
        s"'$c', n - c$i, d$i, ${render.format(s"pmn$i")}, ${render.format(s"pmx$i")}"
      }.mkString(", ")
      li.agg(aggs.head, aggs.tail: _*)
        .select(col("n").as("n_rows"), expr(
          s"stack(${cols.size}, $stackArgs) AS (col_name, n_nulls, ndv, min_s, max_s)"))
        .select(col("col_name"), col("n_rows"), col("n_nulls"), col("ndv"),
          col("min_s"), col("max_s"))
        .orderBy("col_name")
    }

    val h = new ProbeHarness(spark, "a31")
    val base = h.sig(standing())
    h.parity(base, Seq("fusedPrim" -> (() => fusedPrim())))

    val as = collection.mutable.Buffer[Double]()
    val bs = collection.mutable.Buffer[Double]()
    for (_ <- 1 to 5) {
      as += h.time("standing")(standing())
      bs += h.time("fusedPrim")(fusedPrim())
    }
    def report(tag: String, xs: collection.mutable.Buffer[Double]): Unit =
      println(f"[ab] $tag%-9s min ${xs.min}%6.3f med ${xs.sorted.apply(xs.size / 2)}%6.3f  (${xs.map(x => f"$x%.2f").mkString(" ")})")
    report("standing", as)
    report("fusedPrim", bs)
    spark.stop()
  }
}
