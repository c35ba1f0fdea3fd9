package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** End-to-end golden tests for the three §3 pipelines over FIXTURES.md
  * shapes, externals stubbed deterministically. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  // ------------------------------------------------------------ §3.1
  test("CatalogPipeline: fetch -> widen -> filter -> CSV") {
    val urls = tmp("cat_urls")
    val lines = Seq(
      "http://a/book1, http://t/book1, thuviensach",
      "http://a/book2, http://t/book2, taisachhay",
      "http://a/tvshows/bad, http://t/bad, thuviensach",
      "http://a/book3, http://t/book3, invalid").toDF("line")
    graft.io.IoOps.writeTextLines(lines, "line", urls)
    val out = tmp("cat_out")
    val catalog = CatalogPipeline.run(spark, urls + "/*.txt", out)

    // invalid source dropped (F11) and tvshows filtered (2.2-F1)
    val audioUrls = catalog.select("audio_url").as[String].collect()
    assert(audioUrls.toSet == Set("http://a/book1", "http://a/book2"))
    // narrator wide columns exist up to the observed max (A6/F13)
    assert(catalog.columns.contains("narrator_1_name"))
    // duration parsed to hours (F1), name slugified (F2), id content-keyed (F16)
    val r = catalog.filter(col("audio_url") === "http://a/book1").collect()(0)
    assert(!r.isNullAt(r.fieldIndex("duration_hours")))
    assert(!r.getAs[String]("name").exists(_.isUpper))
    assert(r.getAs[String]("id").matches("[0-9a-f]{8}"))
    // K1 sink wrote a header CSV
    assert(Files.list(Paths.get(out)).toArray.exists(_.toString.endsWith(".csv")))
  }

  // ------------------------------------------------------------ §3.2
  private def writeWav(path: java.nio.file.Path, sr: Int, samples: Array[Short]): Unit = {
    val dataBytes = samples.length * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataBytes)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1).putShort(1).putInt(sr).putInt(sr * 2).putShort(2).putShort(16)
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataBytes)
    samples.foreach(bb.putShort)
    Files.write(path, bb.array())
  }

  test("PreprocessPipeline text: extract -> tokenize -> normalize -> regroup -> metrics") {
    val pdfs = tmp("pp_pdf")
    val d = Paths.get(pdfs, "spk1"); Files.createDirectories(d)
    val text = ("one two three four five six seven eight. " * 6) +
      "alpha beta gamma delta epsilon zeta eta theta iota kappa."
    Files.write(d.resolve("bookA_1.pdf"), text.getBytes(StandardCharsets.US_ASCII))
    val (grouped, metrics) = PreprocessPipeline.processText(spark, pdfs + "/*/*.pdf")
    val g = grouped.orderBy("grp_idx").collect()
    assert(g.nonEmpty)
    // every emitted group except possibly the tail reaches the threshold
    val wcs = g.map(_.getLong(3))
    assert(wcs.init.forall(_ >= PreprocessPipeline.RegroupThreshold))
    assert(wcs.last >= PreprocessPipeline.RegroupThreshold / 2)
    val m = metrics.collect()(0)
    assert(m.getAs[Long]("word_count") == wcs.sum)
  }

  test("PreprocessPipeline text over REAL PDFs: native extract feeds the " +
      "same tokenize -> regroup -> metrics chain") {
    // r13: S10 is no longer stub-only — JavaSoundExternals routes
    // %PDF- payloads through the native PdfText extractor (linear
    // object scan + FlateDecode + BT/ET text operators), so the text
    // phase runs end-to-end on structurally valid, Flate-compressed
    // PDF documents.
    val pdfs = tmp("pp_realpdf")
    val d = Paths.get(pdfs, "spk1"); Files.createDirectories(d)
    val sentences = (1 to 6).map(i =>
      s"sentence number $i carries exactly eight words total.")
    val pageOps = sentences.grouped(3).map { page =>
      "BT /F1 12 Tf " +
        page.map(s => s"($s) Tj T*").mkString(" ") + " ET"
    }.toSeq
    Files.write(d.resolve("bookR_1.pdf"),
      graft.operators.PdfFixtures.makePdf(pageOps, compress = true))
    val (grouped, metrics) = PreprocessPipeline.processText(
      spark, pdfs + "/*/*.pdf", ext = JavaSoundExternals)
    val g = grouped.orderBy("grp_idx").collect()
    assert(g.nonEmpty, "no regrouped lines from the real-PDF path")
    // 6 sentences x 8 words = 48 words end to end, none dropped; the
    // 20-word regroup threshold packs them into 2 lines of 24 (W3)
    val m = metrics.collect()(0)
    assert(m.getAs[String]("book_id") == "bookR")
    assert(m.getAs[Long]("word_count") == 48L, m.toString)
    assert(m.getAs[Long]("num_sentences") == g.length.toLong, m.toString)
    assert(g.length == 2, g.mkString(", "))
  }

  test("PreprocessPipeline audio: decode -> gate -> resample -> normalize -> concat") {
    val wavs = tmp("pp_wav")
    val d = Paths.get(wavs, "spk1"); Files.createDirectories(d)
    // bookA: two 24k parts; bookB: one 8k part (fails the 16k gate)
    writeWav(d.resolve("bookA_1.wav"), 24000, Array.tabulate(2400)(i => (i % 1000).toShort))
    writeWav(d.resolve("bookA_2.wav"), 24000, Array.tabulate(1200)(i => (i % 500).toShort))
    writeWav(d.resolve("bookB_1.wav"), 8000, Array.tabulate(800)(i => (i % 100).toShort))
    val out = PreprocessPipeline.processAudio(spark, wavs + "/*/*.wav")
      .orderBy("book_id").collect()
    val a = out(0); val b = out(1)
    assert(a.getAs[String]("book_id") == "bookA")
    assert(a.getAs[Boolean]("qualified"))
    assert(a.getAs[Long]("n_samples") == 3600) // 2400 + 1200 at native 24k
    assert(!b.getAs[Boolean]("qualified"))     // 8k < 16k min
    assert(b.getAs[Long]("n_samples") == 2400) // 800 upsampled 8k -> 24k
    assert(math.abs(a.getAs[Double]("audio_duration_s") - 0.15) < 1e-9)
  }

  test("PreprocessPipeline merge: metrics upsert into catalog (J3)") {
    val catalog = Seq(
      ("b1", Some(10L), None: Option[Long], None: Option[Long], None: Option[Int], None: Option[String]),
      ("b2", None, None, None, None, None))
      .toDF("id", "word_count", "num_sentences", "text_size", "sample_rate", "quality")
    val textM = Seq(("b1", 100L, 5L, 999L)).toDF("book_id", "word_count", "num_sentences", "text_size")
    val audioM = Seq(("b2", 24000, true)).toDF("book_id", "sample_rate", "qualified")
    val merged = PreprocessPipeline.updateCatalog(catalog, textM, audioM)
      .orderBy("id").collect()
    assert(merged(0).getAs[Long]("word_count") == 100L) // updated
    assert(merged(1).getAs[Int]("sample_rate") == 24000)
    assert(merged(1).getAs[String]("quality") == "true")
  }

  // ------------------------------------------------------------ §3.3
  test("AlignPublishPipeline: outliers -> line join -> QC gate -> publish") {
    val segDir = tmp("ap_seg"); val linesDir = tmp("ap_lines"); val outDir = tmp("ap_out")
    // 6 segments for bookA (one 0.5s outlier, one out-of-range id), 2 for bookB
    val segRows = Seq(
      "0.0\t5.0\tf1\tbookA\tspk1", "5.0\t10.0\tf2\tbookA\tspk1",
      "10.0\t10.5\tf3\tbookA\tspk1", // outlier: 0.5s
      "10.5\t16.0\tf4\tbookA\tspk1", "16.0\t21.0\tf5\tbookA\tspk1",
      "21.0\t99.0\tf9\tbookA\tspk1", // id 9 has no text line -> dropped by J7
      "0.0\t4.0\tf1\tbookB\tspk2", "4.0\t8.0\tf2\tbookB\tspk2")
    graft.io.IoOps.writeTextLines(segRows.toDF("line"), "line", segDir)
    // text lines: book|line_no|text — 5 lines for bookA, 2 for bookB
    val lineRows = (0 until 5).map(i =>
      s"bookA|$i|" + ("w " * 20).trim) ++ Seq("bookB|0|short words here", "bookB|1|more words again")
    graft.io.IoOps.writeTextLines(lineRows.toDF("line"), "line", linesDir)

    val res = AlignPublishPipeline.run(spark, segDir + "/*.txt", linesDir + "/*.txt",
      outDir, samplePct = 0.5, werThreshold = 20.0)
    val utts = res.utterances
    // outlier excluded (J6), out-of-range id dropped (J7)
    assert(utts.filter(col("book_id") === "bookA").count() == 4)
    // WER: stub drops every 7th word -> bookA refs 20 words => ~14% < 20 kept;
    // bookB refs 3 words -> 0 dropped within 3 words? (indices 0..2, none %7==6) -> 0 WER
    val wer = res.bookWer.orderBy("book_id").collect()
    assert(wer.forall(_.getDouble(1) < 20.0))
    // speaker labels dense from 1 (A9)
    val labels = utts.select("speaker_label").distinct().as[Long].collect().sorted
    assert(labels.head == 1L)
    assert(res.corpusHours > 0)
    assert(Files.list(Paths.get(outDir)).toArray.exists(_.toString.endsWith(".json")))
  }

  test("AlignPublishPipeline.materializeUtterances: K6 wav/txt pairs, sample-exact cuts") {
    import graft.operators.AudioOps
    val outDir = tmp("ap_wav")
    val sr = 8000
    // bookA: 2s ramp; utterance 1 = [0.5s, 1.0s), utterance 2 = [1.0s, 2.0s)
    val samples = Array.tabulate(2 * sr)(i => (i % 1000) / 2000.0f)
    val bookAudio = Seq(("bookA", samples.toSeq, sr)).toDF("book_id", "samples", "sr")
    val utts = Seq(
      ("bookA", 1, 0.5, 1.0, "first utterance"),
      ("bookA", 2, 1.0, 2.0, "second utterance"))
      .toDF("book_id", "utt_idx", "start", "end", "text")
    val n = AlignPublishPipeline.materializeUtterances(utts, bookAudio, outDir)
    assert(n == 2L)
    val (cut1, sr1) = AudioOps.decodePcm16Wav(
      Files.readAllBytes(Paths.get(outDir, "bookA_0001.wav")))
    assert(sr1 == sr && cut1.length == sr / 2)
    // byte-exact round-trip of the slice: re-encoding the decoded cut
    // reproduces the file, and the cut equals the quantized source span
    val expected = AudioOps.decodePcm16Wav(AudioOps.encodePcm16Wav(
      AudioOps.sliceSeconds(samples, sr, 0.5, 1.0), sr))._1
    assert(cut1.sameElements(expected))
    assert(new String(Files.readAllBytes(Paths.get(outDir, "bookA_0002.txt")),
      java.nio.charset.StandardCharsets.UTF_8) == "second utterance")
  }
}
