package graft.queries

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.io.IoOps
import graft.operators.MultimodalOps

/** Source/sink coverage (SURVEY §2.1): each query materializes a fixture
  * from the driver's tables through the matching K-sink, reads it back
  * through the matching S-reader, and the oracle reads the SAME files with
  * DuckDB's readers — so both the write and read paths are checked.
  */
object IoQueries {
  private type Q = (SparkSession, String) => DataFrame

  private def t(s: SparkSession, dir: String, n: String): DataFrame =
    Tables.load(s, dir, n)

  private val fixRoot = "/tmp/graft_fixtures"
  private def fixDir(name: String): String = {
    val p = Paths.get(fixRoot, name)
    if (Files.exists(p))
      Files.walk(p).sorted(java.util.Comparator.reverseOrder())
        .forEach((f: Path) => Files.delete(f))
    Files.createDirectories(p)
    p.toString
  }

  // ---------------------------------------------------------- S1 + K1
  private val s1: Q = (s, dir) => {
    val d = fixDir("s1_csv")
    IoOps.writeCsv(t(s, dir, "nation"), d)
    IoOps.readCsv(s, d + "/*.csv", StructType(Seq(
        StructField("n_nationkey", IntegerType),
        StructField("n_name", StringType),
        StructField("n_regionkey", IntegerType))))
      .orderBy("n_nationkey")
  }
  private val s1Sql =
    s"""SELECT * FROM read_csv('$fixRoot/s1_csv/*.csv', header=true,
       |  columns={'n_nationkey':'INTEGER','n_name':'VARCHAR','n_regionkey':'INTEGER'})
       |ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------- S2
  /** Forced-all-string CSV where empty cells survive as '' (pandas
    * keep_default_na=False), not null. */
  private val s2: Q = (s, dir) => {
    val d = fixDir("s2_csv_str")
    val src = t(s, dir, "customer").select(
      col("c_custkey").cast("string").as("k"),
      when(col("c_custkey") % 7 === 0, lit("")).otherwise(col("c_name")).as("name"),
      col("c_mktsegment").as("seg"))
    IoOps.writeCsv(src, d)
    IoOps.readCsvAllString(s, d + "/*.csv", StructType(Seq(
        StructField("k", StringType),
        StructField("name", StringType),
        StructField("seg", StringType))))
      .orderBy(col("k").cast("long"))
  }
  private val s2Sql =
    s"""SELECT * FROM read_csv('$fixRoot/s2_csv_str/*.csv', header=true, nullstr='\\x01',
       |  columns={'k':'VARCHAR','name':'VARCHAR','seg':'VARCHAR'})
       |ORDER BY CAST(k AS BIGINT)""".stripMargin

  // ---------------------------------------------------------- S3 + K2
  private val s3: Q = (s, dir) => {
    val d = fixDir("s3_tsv")
    val segs = t(s, dir, "lineitem").filter(col("l_orderkey") % 40 === 0)
      .select(((col("l_orderkey") % 1000).cast("double") / 10).as("start"),
        ((col("l_orderkey") % 1000).cast("double") / 10 +
          (col("l_quantity") / 10)).as("end"),
        concat(lit("f"), col("l_orderkey"), lit("_"), col("l_linenumber")).as("id"))
    IoOps.writeTsv(segs, d)
    IoOps.readTsv(s, d + "/*.csv", StructType(Seq(
        StructField("start", DoubleType),
        StructField("end", DoubleType),
        StructField("id", StringType))))
      .orderBy("id")
  }
  private val s3Sql =
    s"""SELECT * FROM read_csv('$fixRoot/s3_tsv/*.csv', delim='\\t', header=false,
       |  columns={'start':'DOUBLE','end':'DOUBLE','id':'VARCHAR'})
       |ORDER BY id""".stripMargin

  // ---------------------------------------------------------- S4 + K8
  private val s4: Q = (s, dir) => {
    val d = fixDir("s4_pipe")
    val lj = t(s, dir, "orders").select(
      concat(lit("wavs/"), col("o_orderkey"), lit(".wav")).as("audio"),
      col("o_orderpriority").as("text"),
      concat(lit("spk"), col("o_custkey") % 10).as("speaker"))
    IoOps.writePipeCsv(lj, d)
    IoOps.readPipeCsv(s, d + "/*.csv", StructType(Seq(
        StructField("audio", StringType),
        StructField("text", StringType),
        StructField("speaker", StringType))))
      .orderBy("audio")
  }
  private val s4Sql =
    s"""SELECT * FROM read_csv('$fixRoot/s4_pipe/*.csv', delim='|', header=false,
       |  columns={'audio':'VARCHAR','text':'VARCHAR','speaker':'VARCHAR'})
       |ORDER BY audio""".stripMargin

  // ---------------------------------------------------------- S5 + K3
  private val s5: Q = (s, dir) => {
    val d = fixDir("s5_json")
    val src = t(s, dir, "nation")
      .select(concat(lit("n"), col("n_nationkey")).as("name"),
        col("n_nationkey"), col("n_regionkey"))
    IoOps.writeJsonPerRow(src, "name", d)
    IoOps.readMultiJson(s, d + "/*.json", StructType(Seq(
        StructField("name", StringType),
        StructField("n_nationkey", LongType),
        StructField("n_regionkey", LongType))))
      .orderBy("n_nationkey")
  }
  private val s5Sql =
    s"""SELECT name, n_nationkey, n_regionkey
       |FROM read_json('$fixRoot/s5_json/*.json',
       |  columns={'name':'VARCHAR','n_nationkey':'BIGINT','n_regionkey':'BIGINT'})
       |ORDER BY n_nationkey""".stripMargin

  // ---------------------------------------------------------- S6 + K4
  private val s6: Q = (s, dir) => {
    val d = fixDir("s6_jsonl")
    IoOps.writeJsonl(t(s, dir, "supplier"), d)
    IoOps.readJsonl(s, d + "/*.json")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }
  private val s6Sql =
    s"""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
       |FROM read_json('$fixRoot/s6_jsonl/*.json')
       |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------- A11 (jsonl schema union)
  private val a11: Q = (s, dir) => {
    val da = fixDir("a11_a"); val db = fixDir("a11_b")
    IoOps.writeJsonl(t(s, dir, "supplier")
      .select(col("s_suppkey").as("id"), col("s_name").as("name")), da)
    // second file carries {id, bal}; first {id, name} -> union-of-keys schema
    IoOps.writeJsonl(t(s, dir, "customer").filter(col("c_custkey") % 100 === 0)
      .select((col("c_custkey") + 500000).as("id"), col("c_acctbal").as("bal")), db)
    IoOps.readJsonl(s, da + "/*.json", db + "/*.json")
      .select("id", "name", "bal")
      .orderBy("id")
  }
  private val a11Sql =
    s"""SELECT id, name, bal
       |FROM read_json(['$fixRoot/a11_a/*.json', '$fixRoot/a11_b/*.json'],
       |  columns={'id':'BIGINT','name':'VARCHAR','bal':'DOUBLE'}, union_by_name=true)
       |ORDER BY id""".stripMargin

  // ---------------------------------------------------------- S7 + K5
  private val s7: Q = (s, dir) => {
    val d = fixDir("s7_lines")
    val lines = t(s, dir, "nation").select(concat(
      col("n_name"), lit(", url_"), col("n_nationkey"), lit(", src")).as("line"))
    IoOps.writeTextLines(lines, "line", d)
    IoOps.readDelimLines(s, d, ", ", Seq("audio_url", "text_url", "source"))
      .orderBy("audio_url")
  }
  private val s7Sql =
    s"""SELECT split_part(line, ', ', 1) AS audio_url, split_part(line, ', ', 2) AS text_url,
       |  split_part(line, ', ', 3) AS source
       |FROM read_csv('$fixRoot/s7_lines/*.txt', delim='\\t', header=false, columns={'line':'VARCHAR'})
       |ORDER BY audio_url""".stripMargin

  // ---------------------------------------------------------- S8
  private val s8: Q = (s, dir) => {
    val d = fixDir("s8_textlines")
    val lines = t(s, dir, "documents").filter(col("doc_id") < 50)
      .orderBy("doc_id")
      .select(concat(lit("d"), col("doc_id"), lit("|"),
        substring(regexp_replace(col("text"), "[|\n]", " "), 1, 40)).as("line"))
    IoOps.writeTextLines(lines, "line", d)
    IoOps.readTextLines(s, d + "/*.txt")
      .select(col("line_no"),
        regexp_extract(col("line"), "^d(\\d+)\\|", 1).cast("bigint").as("doc_id"),
        col("line"))
      .orderBy("doc_id")
  }
  // line_no must equal the written order (docs were written ordered by id)
  private val s8Sql =
    s"""SELECT CAST(row_number() OVER (ORDER BY CAST(regexp_extract(line, '^d(\\d+)\\|', 1) AS BIGINT)) - 1 AS INT) AS line_no,
       |  CAST(regexp_extract(line, '^d(\\d+)\\|', 1) AS BIGINT) AS doc_id, line
       |FROM read_csv('$fixRoot/s8_textlines/*.txt', delim=chr(1), header=false, columns={'line':'VARCHAR'})
       |ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- S9 fixture
  private def genTree(base: String): Unit =
    (0 until 30).foreach { k =>
      val spk = Paths.get(base, s"spk${k % 3}")
      Files.createDirectories(spk)
      Files.write(spk.resolve(s"b${k % 5}_$k.txt"),
        s"payload-$k-${"x" * (k % 7)}".getBytes(StandardCharsets.US_ASCII))
    }

  private val s9: Q = (s, dir) => {
    val d = fixDir("s9_tree")
    genTree(d)
    IoOps.readBinaryTree(s, d + "/*/*.txt")
      .select(col("speaker_id"), col("book_id"), col("utt_idx"),
        length(col("content")).cast("bigint").as("n_bytes"),
        md5(col("content")).as("content_md5"))
      .orderBy("speaker_id", "utt_idx")
  }
  private val s9Sql =
    s"""SELECT regexp_extract(filename, '([^/]+)/[^/]+$$', 1) AS speaker_id,
       |  regexp_extract(filename, '([^/]+)_\\d+\\.\\w+$$', 1) AS book_id,
       |  CAST(regexp_extract(filename, '_(\\d+)\\.\\w+$$', 1) AS INT) AS utt_idx,
       |  octet_length(content) AS n_bytes,
       |  md5(CAST(content AS VARCHAR)) AS content_md5
       |FROM read_blob('$fixRoot/s9_tree/*/*.txt')
       |ORDER BY speaker_id, utt_idx""".stripMargin

  // ---------------------------------------------------------- S14 + K9
  /** Hive-partitioned parquet round-trip: partitionBy(lang) on write,
    * then a read filtered on the partition column. THE storage-layout
    * lever at 100 TB — the predicate prunes whole directories before any
    * I/O happens (plan shows PartitionFilters, asserted in
    * PlanShapeSpec); a fleet reading one language touches 1/|langs| of
    * the bytes. Oracle reads the same tree with hive_partitioning. */
  private val s14: Q = (s, dir) => {
    val d = fixDir("s14_part")
    t(s, dir, "documents").select(col("doc_id"), col("source"),
        col("n_chars"), col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(d)
    s.read.parquet(d)
      .filter(col("lang") === "vi")
      .select(col("doc_id"), col("source"), col("n_chars"), col("lang"))
      .orderBy("doc_id")
  }
  private val s14Sql =
    s"""SELECT doc_id, source, n_chars, lang
       |FROM read_parquet('$fixRoot/s14_part/*/*.parquet', hive_partitioning=true)
       |WHERE lang = 'vi' ORDER BY doc_id""".stripMargin

  // ---------------------------------------------------------- S15 (ORC)
  /** ORC round-trip: write supplier as ORC (second columnar format the
    * engine speaks; Spark's reader gets the same pushdown/pruning
    * machinery as parquet), read it back, aggregate. DuckDB has no ORC
    * reader, so the oracle computes the identical aggregate from the
    * parquet source — equality proves the ORC write+read is lossless
    * across int32/int64/double/string. Decimal-sum keeps the double
    * aggregation order-independent on both engines (w6 pattern). */
  /** S16: gzip JSONL round-trip — the engine writes compressed JSONL
    * and BOTH readers (Spark's json source and DuckDB's read_json)
    * decompress transparently by extension, so the oracle checks the
    * compressed bytes on disk, not a convenient uncompressed copy. */
  private val s16: Q = (s, dir) => {
    val d = fixDir("s16_jsonl_gz")
    IoOps.writeJsonlGz(t(s, dir, "supplier"), d)
    IoOps.readJsonl(s, d + "/*.json.gz")
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      .orderBy("s_suppkey")
  }
  private val s16Sql =
    s"""SELECT s_suppkey, s_name, CAST(s_nationkey AS BIGINT) AS s_nationkey, s_acctbal
       |FROM read_json('$fixRoot/s16_jsonl_gz/*.json.gz', format='newline_delimited')
       |ORDER BY s_suppkey""".stripMargin

  private val s15: Q = (s, dir) => {
    val d = fixDir("s15_orc")
    t(s, dir, "supplier").write.mode("overwrite").orc(d)
    s.read.orc(d)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n"),
        sum(col("s_acctbal").cast(DecimalType(25, 10))).cast("double").as("sum_bal"),
        min(col("s_name")).as("first_name"))
      .orderBy("s_nationkey")
  }
  private val s15Sql =
    """SELECT s_nationkey, COUNT(*) AS n,
      |  CAST(SUM(CAST(s_acctbal AS DECIMAL(25,10))) AS DOUBLE) AS sum_bal,
      |  MIN(s_name) AS first_name
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // ---------------------------------------------------------- multimodal
  private def genWavs(base: String): Unit =
    (0 until 12).foreach { k =>
      val ch = 1 + k % 2
      val sr = if (k % 3 == 0) 16000 else 24000
      val nSamples = 100L + k * 37
      val dataBytes = (nSamples * ch * 2).toInt
      val bb = java.nio.ByteBuffer.allocate(44 + dataBytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataBytes)
        .put("WAVE".getBytes(StandardCharsets.US_ASCII))
        .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
        .putShort(1).putShort(ch.toShort).putInt(sr)
        .putInt(sr * ch * 2).putShort((ch * 2).toShort).putShort(16)
        .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataBytes)
      (0 until dataBytes / 2).foreach(i => bb.putShort(((i * 7 + k) % 32768).toShort))
      Files.write(Paths.get(base, s"sr${sr}_ch${ch}_$k.wav"), bb.array())
    }

  /** Synthesized CBR MPEG-audio streams: valid frame-header chains (sync,
    * version/layer/bitrate/samplerate fields, per-frame length arithmetic)
    * with zero payloads — the parser walks real framing; ground truth
    * rides in the filename. vg=1 -> MPEG1 Layer III (1152 samples/frame),
    * vg=2 -> MPEG2 Layer III (576). Half the files carry an ID3v2 tag the
    * probe must skip. */
  /** Steady-state decoded peak of the audible mp3 fixture class (a
    * single +1 count1 line per frame, global_gain 206, frames repeated)
    * — FROZEN from Mp3SpectralSpec's direct-form reference pipeline
    * ("impulse-response peak constant" test re-measures it to 1e-4).
    * genMp3s bakes floor(peak·1000) into the audible filenames, so the
    * mm_mp3_decode DuckDB oracle pins the whole native spectral decode
    * (Huffman → requantize → IMDCT → synthesis) against a constant that
    * did NOT come from the decoder under test. Gains at other
    * global_gain values scale by exact powers of two (the pipeline is
    * linear). */
  val Mp3AudiblePeakGg206: Double = 0.4505385

  private def genMp3s(base: String): Unit = {
    // ---- audible files: MPEG1 L3 mono 44.1k/128k, gr0 = one +1 count1
    // line (table B), gr1 silent; nothing below fabricates ISO print
    // tables — see Mp3Layer3's object doc for the native class.
    val audible = Seq((206, 40), (194, 25)) // (global_gain, nFrames)
    audible.foreach { case (gg, nf) =>
      val fr = new Array[Byte](417)
      fr(0) = 0xff.toByte; fr(1) = 0xfb.toByte
      fr(2) = 0x90.toByte // 128 kbps, 44.1 kHz
      fr(3) = 0xc0.toByte // mono
      // side info (17 B): all zero except gr0's part2_3_length = 5
      // (bits 18-29), global_gain (bits 39-46), count1table_select = B
      // (bit 76); gr1 all zero.
      def setBits(startBit: Int, v: Int, n: Int): Unit = {
        var i = 0
        while (i < n) {
          if (((v >> (n - 1 - i)) & 1) == 1) {
            val abs = 32 + startBit + i // side info starts at byte 4
            fr(abs / 8) = (fr(abs / 8) | (1 << (7 - (abs % 8)))).toByte
          }
          i += 1
        }
      }
      setBits(18, 5, 12)  // gr0 part2_3_length
      setBits(39, gg, 8)  // gr0 global_gain
      setBits(76, 1, 1)   // gr0 count1table_select = table B
      fr(21) = 0x70.toByte // main data: quad ~1000=0111 then sign 0
      val out = new Array[Byte](nf * 417)
      (0 until nf).foreach(i => System.arraycopy(fr, 0, out, i * 417, 417))
      val peak = Mp3AudiblePeakGg206 * math.pow(2.0, (gg - 206) / 4.0)
      val milli = peak * 1000.0
      // mid-bucket guard: the float decode must floor to the same int
      require(milli - math.floor(milli) > 0.05 && milli - math.floor(milli) < 0.95,
        s"fixture gain gg=$gg lands on a milli boundary ($milli) - pick another")
      Files.write(Paths.get(base,
        f"mp3_v1_sr44100_br128_nf${nf}_pk${math.floor(milli).toLong}_raw.mp3"), out)
    }
    val cases = Seq(
      // (vg, sr, brKbps, brIdx, nFrames, id3)
      (1, 44100, 128, 9, 200, false),
      (1, 32000, 192, 11, 150, true),
      (1, 48000, 64, 5, 120, false),
      (2, 22050, 64, 8, 100, true),
      (2, 16000, 32, 4, 80, false))
    val srIdx = Map(44100 -> 0, 48000 -> 1, 32000 -> 2, // MPEG1 table
      22050 -> 0, 24000 -> 1, 16000 -> 2)               // MPEG2 table
    cases.foreach { case (vg, sr, br, brIdx, nf, id3) =>
      val spf = if (vg == 1) 1152 else 576
      val frameLen = spf / 8 * (br * 1000) / sr // pad = 0
      val b1 = if (vg == 1) 0xfb else 0xf3 // sync|version|LayerIII|noCRC
      val tag = if (id3) {
        val t = new Array[Byte](110) // "ID3" + syncsafe size 100 + body
        t(0) = 'I'; t(1) = 'D'; t(2) = '3'; t(3) = 4; t(9) = 100
        t
      } else Array.empty[Byte]
      val out = new Array[Byte](tag.length + nf * frameLen)
      System.arraycopy(tag, 0, out, 0, tag.length)
      (0 until nf).foreach { i =>
        val o = tag.length + i * frameLen
        out(o) = 0xff.toByte
        out(o + 1) = b1.toByte
        out(o + 2) = ((brIdx << 4) | (srIdx(sr) << 2)).toByte // no padding
        out(o + 3) = 0 // stereo
      }
      val id3s = if (id3) "id3" else "raw"
      Files.write(Paths.get(base, s"mp3_v${vg}_sr${sr}_br${br}_nf${nf}_$id3s.mp3"), out)
    }
  }

  /** MP3 frame-header walk over binary files (MultimodalOps.mp3Probe);
    * the oracle replays duration/frame arithmetic from filename-encoded
    * ground truth — so a parser that miscounts frames, misreads a
    * bitrate table, or fails to skip ID3v2 diverges. */
  private val mmMp3: Q = (s, dir) => {
    val d = fixDir("mm_mp3")
    genMp3s(d)
    val files = s.read.format("binaryFile").load(d + "/*.mp3")
    MultimodalOps.mp3Probe(files, "path", "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("version"), col("sample_rate"), col("bitrate_kbps"),
        col("channels"), col("n_frames"), col("n_samples"), col("duration_s"))
      .orderBy("fname")
  }
  private val mmMp3Sql =
    s"""SELECT fname, CASE vg WHEN 1 THEN 'MPEG1' ELSE 'MPEG2' END AS version,
       |  sr AS sample_rate, br AS bitrate_kbps,
       |  CASE WHEN pk = '' THEN 2 ELSE 1 END AS channels,
       |  nf AS n_frames, nf * spf AS n_samples,
       |  CAST(nf * spf AS DOUBLE) / sr AS duration_s
       |FROM (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |    CAST(regexp_extract(filename, '_v(\\d+)_', 1) AS INT) AS vg,
       |    CAST(regexp_extract(filename, '_sr(\\d+)_', 1) AS INT) AS sr,
       |    CAST(regexp_extract(filename, '_br(\\d+)_', 1) AS INT) AS br,
       |    CAST(regexp_extract(filename, '_nf(\\d+)_', 1) AS BIGINT) AS nf,
       |    regexp_extract(filename, '_pk(\\d+)_', 1) AS pk,
       |    CASE CAST(regexp_extract(filename, '_v(\\d+)_', 1) AS INT)
       |      WHEN 1 THEN 1152 ELSE 576 END AS spf
       |  FROM read_blob('$fixRoot/mm_mp3/*.mp3'))
       |ORDER BY fname""".stripMargin

  /** MP3 → PCM decode (MultimodalOps.mp3Decode): silent fixtures must
    * decode to exact digital zero; AUDIBLE fixtures (count1-line
    * spectral frames, Mp3Layer3's native class) must decode to the
    * filename-frozen peak that came from the INDEPENDENT direct-form
    * reference pipeline (Mp3AudiblePeakGg206) — a decoder that walks
    * frames wrong, mis-sizes side info, drops the Huffman stage,
    * mis-gains the requantizer, or perturbs the filterbank diverges
    * from the oracle. */
  private val mmMp3Dec: Q = (s, dir) => {
    val d = fixDir("mm_mp3")
    genMp3s(d)
    val files = s.read.format("binaryFile").load(d + "/*.mp3")
    MultimodalOps.mp3Decode(files, "path", "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("sample_rate"), col("n_samples"), col("peak_milli"))
      .orderBy("fname")
  }
  // Audible fixtures carry their expected decoded peak (frozen from the
  // independent direct-form reference, see Mp3AudiblePeakGg206) in the
  // filename; silent fixtures have no _pk_ segment and must decode to
  // exact digital zero.
  private val mmMp3DecSql =
    s"""SELECT fname, sr AS sample_rate, nf * spf AS n_samples,
       |  CAST(CASE WHEN pk = '' THEN '0' ELSE pk END AS BIGINT) AS peak_milli
       |FROM (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |    CAST(regexp_extract(filename, '_sr(\\d+)_', 1) AS INT) AS sr,
       |    CAST(regexp_extract(filename, '_nf(\\d+)_', 1) AS BIGINT) AS nf,
       |    regexp_extract(filename, '_pk(\\d+)_', 1) AS pk,
       |    CASE CAST(regexp_extract(filename, '_v(\\d+)_', 1) AS INT)
       |      WHEN 1 THEN 1152 ELSE 576 END AS spf
       |  FROM read_blob('$fixRoot/mm_mp3/*.mp3'))
       |ORDER BY fname""".stripMargin

  /** Real RIFF header parsing over binary files; the oracle checks against
    * filename-encoded ground truth + byte-size arithmetic. */
  private val mmWav: Q = (s, dir) => {
    val d = fixDir("mm_wav")
    genWavs(d)
    val files = s.read.format("binaryFile").load(d + "/*.wav")
    MultimodalOps.wavProbe(files, "path", "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("channels"), col("sample_rate"), col("bits_per_sample"),
        col("n_samples"), col("duration_s"))
      .orderBy("fname")
  }
  private val mmWavSql =
    s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |  CAST(regexp_extract(filename, '_ch(\\d+)_', 1) AS INT) AS channels,
       |  CAST(regexp_extract(filename, 'sr(\\d+)_', 1) AS INT) AS sample_rate,
       |  16 AS bits_per_sample,
       |  (octet_length(content) - 44) // (CAST(regexp_extract(filename, '_ch(\\d+)_', 1) AS INT) * 2) AS n_samples,
       |  CAST((octet_length(content) - 44) // (CAST(regexp_extract(filename, '_ch(\\d+)_', 1) AS INT) * 2) AS DOUBLE)
       |    / CAST(regexp_extract(filename, 'sr(\\d+)_', 1) AS INT) AS duration_s
       |FROM read_blob('$fixRoot/mm_wav/*.wav')
       |ORDER BY fname""".stripMargin

  /** VAD fixture wavs: mono 16 kHz PCM16, layout silence(a) + tone(b) +
    * silence(c) + tone(d) samples, parameters in the filename (the
    * oracle's ground truth, the genWavs convention). Tone = alternating
    * ±16384, i.e. |s| = 0.5 EXACTLY in float — frame energy sums are
    * multiples of 0.5 with no rounding, so the active set is pure
    * integer overlap arithmetic both engines replay. Cases cover
    * frame-aligned segments, boundary-straddling tones, a leading tone,
    * an all-silence file (must emit NO rows), a barely-over-threshold
    * sliver (33 samples > the 32-sample cut), and a dropped partial
    * tail frame. */
  private def genVadWavs(base: String): Unit = {
    val cases = Seq(
      (320, 480, 320, 480), // frame-aligned: segments (2,5) and (7,10)
      (100, 500, 200, 0),   // straddles boundaries: one segment (0,4)
      (0, 250, 350, 170),   // leading tone; tail frame [640,770) dropped
      (1600, 0, 0, 0),      // all silence: no output rows
      (50, 33, 400, 160))   // 33-sample sliver: ov=33 > 32, barely active
    cases.foreach { case (a, b, c, d) =>
      val n = a + b + c + d
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + n * 2)
        .put("WAVE".getBytes(StandardCharsets.US_ASCII))
        .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
        .putShort(1).putShort(1).putInt(16000)
        .putInt(16000 * 2).putShort(2).putShort(16)
        .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(n * 2)
      (0 until n).foreach { i =>
        val inTone = (i >= a && i < a + b) || i >= a + b + c
        bb.putShort(if (!inTone) 0 else if (i % 2 == 0) 16384 else -16384)
      }
      Files.write(Paths.get(base, s"vad_a${a}_b${b}_c${c}_d$d.wav"), bb.array())
    }
  }

  /** MM-VAD: energy-threshold utterance segmentation of the wav tree —
    * 160-sample (10 ms) frames, active iff Σ|s| > 16.0 (mean |s| > 0.1).
    * With the fixture's exact-0.5 tone amplitude that is "tone overlap
    * > 32 samples", which is what the oracle computes per frame from the
    * filename-encoded layout before replaying the same run-merging with
    * gaps-and-islands SQL. */
  private val mmVadFrame = 160
  private val mmVadThr = 16.0f
  private val mmVad: Q = (s, dir) => {
    val d = fixDir("mm_vad")
    genVadWavs(d)
    val files = s.read.format("binaryFile").load(d + "/*.wav")
    MultimodalOps.audioVad(files, "path", "content", mmVadFrame, mmVadThr)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("seg_idx"), col("start_frame"), col("end_frame"), col("n_frames"))
      .orderBy("fname", "seg_idx")
  }
  private val mmVadSql =
    s"""WITH p AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |    CAST(regexp_extract(filename, '_a(\\d+)_', 1) AS BIGINT) AS a,
       |    CAST(regexp_extract(filename, '_b(\\d+)_', 1) AS BIGINT) AS b,
       |    CAST(regexp_extract(filename, '_c(\\d+)_', 1) AS BIGINT) AS c,
       |    CAST(regexp_extract(filename, '_d(\\d+)\\.', 1) AS BIGINT) AS d
       |  FROM read_blob('$fixRoot/mm_vad/*.wav')),
       |fr AS (
       |  SELECT fname, a, b, c, d,
       |    unnest(range(0, (a + b + c + d) // $mmVadFrame)) AS f
       |  FROM p),
       |act AS (
       |  SELECT fname, f,
       |    greatest(0, least(f * $mmVadFrame + $mmVadFrame, a + b)
       |      - greatest(f * $mmVadFrame, a)) +
       |    greatest(0, least(f * $mmVadFrame + $mmVadFrame, a + b + c + d)
       |      - greatest(f * $mmVadFrame, a + b + c)) AS ov
       |  FROM fr),
       |isl AS (
       |  SELECT fname, f,
       |    f - row_number() OVER (PARTITION BY fname ORDER BY f) AS g
       |  FROM act WHERE ov > 32)
       |SELECT fname,
       |  CAST(row_number() OVER (PARTITION BY fname ORDER BY MIN(f)) - 1 AS INT)
       |    AS seg_idx,
       |  CAST(MIN(f) AS INT) AS start_frame,
       |  CAST(MAX(f) + 1 AS INT) AS end_frame,
       |  CAST(MAX(f) + 1 - MIN(f) AS INT) AS n_frames
       |FROM isl GROUP BY fname, g ORDER BY fname, seg_idx""".stripMargin

  /** aHash fixture BMPs: REAL 24bpp bottom-up bitmaps (54-byte headers,
    * BGR rows padded to 4 bytes), 32×24, pixel gray from the
    * filename-encoded formula g(x,y) = (7x + 13y + 31·seed) mod 256,
    * all three channels equal. v0/v1 are pixel-identical (planted exact
    * perceptual dups under different names); v2 (seeds 1–2 only) adds
    * +128 on the single (0,0) sample point — a NEAR dup whose hash
    * Hamming distance the oracle derives from the same formula. */
  private def genAhashBmps(base: String): Unit = {
    val (w, h) = (32, 24)
    val stride = ((3 * w + 3) / 4) * 4
    for (seed <- 1 to 5; variant <- 0 to 2
         if variant < 2 || seed <= 2) {
      val bb = java.nio.ByteBuffer.allocate(54 + stride * h)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put('B'.toByte).put('M'.toByte).putInt(54 + stride * h)
        .putInt(0).putInt(54)
        .putInt(40).putInt(w).putInt(h).putShort(1).putShort(24)
        .putInt(0).putInt(stride * h).putInt(2835).putInt(2835)
        .putInt(0).putInt(0)
      // bottom-up row order, as real BMP writers emit
      for (y <- h - 1 to 0 by -1) {
        for (x <- 0 until w) {
          val g = ((7 * x + 13 * y + 31 * seed +
            (if (variant == 2 && x == 0 && y == 0) 128 else 0)) % 256).toByte
          bb.put(g).put(g).put(g)
        }
        (3 * w until stride).foreach(_ => bb.put(0.toByte))
      }
      Files.write(Paths.get(base, s"img_s${seed}_v$variant.bmp"), bb.array())
    }
  }

  /** MM-AHASH: pixel-level image near-dup — real BMP decode, 8×8
    * average hash ([[graft.operators.ImageOps]]), candidates banded on
    * the hash's hi half (the simhash-prefix discipline: renamed exact
    * dups always collide, near dups collide when their hi bits agree),
    * Hamming ≤ 10 on the lo half confirms. The oracle never decodes a
    * byte: it recomputes every sampled gray from the filename-encoded
    * formula, rebuilds both hash halves with the identical bit packing,
    * and replays the banded join. */
  private val mmAhash: Q = (s, dir) => {
    val d = fixDir("mm_ahash")
    genAhashBmps(d)
    val files = s.read.format("binaryFile").load(d + "/*.bmp")
    val hs = MultimodalOps.imageAHash(files, "path", "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("hash_hi"), col("hash_lo"))
    val a = hs.select(col("fname").as("fname_a"), col("hash_hi"),
      col("hash_lo").as("lo_a"))
    val b = hs.select(col("fname").as("fname_b"), col("hash_hi"),
      col("hash_lo").as("lo_b"))
    a.join(b, Seq("hash_hi")).filter(col("fname_a") < col("fname_b"))
      .select(col("fname_a"), col("fname_b"),
        expr("CAST(bit_count(lo_a ^ lo_b) AS INT)").as("hamming"))
      .filter(col("hamming") <= 10)
      .orderBy("fname_a", "fname_b")
  }
  private val mmAhashSql =
    s"""WITH f AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |    CAST(regexp_extract(filename, '_s(\\d+)_', 1) AS BIGINT) AS seed,
       |    CAST(regexp_extract(filename, '_v(\\d+)\\.', 1) AS BIGINT) AS variant
       |  FROM read_blob('$fixRoot/mm_ahash/*.bmp')),
       |samp AS (
       |  SELECT fname, 8 * i + j AS b,
       |    (7 * (j * 4) + 13 * (i * 3) + 31 * seed +
       |     CASE WHEN variant = 2 AND i = 0 AND j = 0
       |          THEN 128 ELSE 0 END) % 256 AS v
       |  FROM f, range(0, 8) t1(i), range(0, 8) t2(j)),
       |m AS (SELECT fname, CAST(SUM(v) // 64 AS BIGINT) AS mean
       |      FROM samp GROUP BY fname),
       |bits AS (
       |  SELECT s.fname,
       |    CAST(SUM(CASE WHEN v > mean AND b >= 32
       |      THEN (CAST(1 AS BIGINT) << (b - 32)) ELSE 0 END) AS BIGINT) AS hash_hi,
       |    CAST(SUM(CASE WHEN v > mean AND b < 32
       |      THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS hash_lo
       |  FROM samp s JOIN m USING (fname) GROUP BY s.fname)
       |SELECT a.fname AS fname_a, b2.fname AS fname_b,
       |  CAST(bit_count(xor(a.hash_lo, b2.hash_lo)) AS INT) AS hamming
       |FROM bits a JOIN bits b2
       |  ON a.hash_hi = b2.hash_hi AND a.fname < b2.fname
       |WHERE bit_count(xor(a.hash_lo, b2.hash_lo)) <= 10
       |ORDER BY fname_a, fname_b""".stripMargin

  private val mmBin: Q = (s, dir) => {
    val d = fixDir("mm_bin")
    genTree(d)
    val files = s.read.format("binaryFile").load(d + "/*/*.txt")
    MultimodalOps.binaryFeatures(files, "path", "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("n_bytes"), col("content_md5"), col("head"))
      .orderBy("fname")
  }
  private val mmBinSql =
    s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |  octet_length(content) AS n_bytes,
       |  md5(CAST(content AS VARCHAR)) AS content_md5,
       |  substr(CAST(content AS VARCHAR), 1, 16) AS head
       |FROM read_blob('$fixRoot/mm_bin/*/*.txt')
       |ORDER BY fname""".stripMargin

  /** Hand-rolled minimal image headers, dimensions encoded in the
    * filename (the oracle's ground truth), one junk file for the
    * unknown path. */
  private def genImages(base: String): Unit = {
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def be32(v: Int) = bytes(v >>> 24, (v >> 16) & 0xff, (v >> 8) & 0xff, v & 0xff)
    def le32(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff, (v >> 16) & 0xff, v >>> 24)
    def le16(v: Int) = bytes(v & 0xff, (v >> 8) & 0xff)
    for ((w, h) <- Seq((12, 8), (640, 480), (1, 1))) {
      val png = bytes(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a) ++
        be32(13) ++ "IHDR".getBytes ++ be32(w) ++ be32(h) ++ bytes(8, 6, 0, 0, 0)
      Files.write(Paths.get(base, s"img_png_w${w}_h$h.png"), png)
      val bmp = "BM".getBytes ++ le32(26) ++ le32(0) ++ le32(26) ++
        le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24)
      Files.write(Paths.get(base, s"img_bmp_w${w}_h$h.bmp"), bmp)
      val gif = "GIF89a".getBytes ++ le16(w) ++ le16(h) ++ bytes(0, 0, 0)
      Files.write(Paths.get(base, s"img_gif_w${w}_h$h.gif"), gif)
    }
    Files.write(Paths.get(base, "img_unknown_w0_h0.dat"), "not an image".getBytes)
  }

  /** Multimodal image-header probe (decode-free dimensions, like the wav
    * probe); oracle = filename-encoded ground truth. */
  private val mmImage: Q = (s, dir) => {
    val d = fixDir("mm_img")
    genImages(d)
    val files = s.read.format("binaryFile").load(d + "/*")
    MultimodalOps.imageProbe(files, "path", "content")
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("format"), col("width"), col("height"))
      .orderBy("fname")
  }
  private val mmImageSql =
    s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |  CASE WHEN filename LIKE '%.png' THEN 'png'
       |       WHEN filename LIKE '%.bmp' THEN 'bmp'
       |       WHEN filename LIKE '%.gif' THEN 'gif' ELSE 'unknown' END AS format,
       |  CAST(regexp_extract(filename, '_w(\\d+)_', 1) AS INT) AS width,
       |  CAST(regexp_extract(filename, '_h(\\d+)\\.', 1) AS INT) AS height
       |FROM read_blob('$fixRoot/mm_img/*')
       |ORDER BY fname""".stripMargin

  /** Image resize stage over the image fixtures: the stubbed "resize"
    * emits int32(w) ++ int32(h) ++ first-16-bytes (Externals.resizeImage),
    * so the oracle rebuilds the exact bytes from a header blob literal
    * and a blob slice, and both engines hex-compare them. Exercises the
    * binary-in/binary-out mapPartitions plumbing end to end. */
  private val mmResize: Q = (s, dir) => {
    val d = fixDir("mm_img_rs")
    genImages(d)
    val files = s.read.format("binaryFile").load(d + "/*")
    MultimodalOps.resizeImages(files, "path", "content", w = 64, h = 48)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("width"), col("height"), col("n_bytes"),
        hex(col("resized")).as("resized_hex"))
      .orderBy("fname")
  }
  private val mmResizeSql =
    s"""SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |  64 AS width, 48 AS height,
       |  CAST(8 + least(16, octet_length(content)) AS BIGINT) AS n_bytes,
       |  '0000004000000030' || substr(hex(content), 1, 32) AS resized_hex
       |FROM read_blob('$fixRoot/mm_img_rs/*')
       |ORDER BY fname""".stripMargin

  /** Frame sampling over ASCII "video" blobs: every 3rd 16-byte frame,
    * the oracle re-slices the same blobs with substr arithmetic. */
  private val mmFrames: Q = (s, dir) => {
    val d = fixDir("mm_vid")
    for (i <- 1 to 4) {
      val content = (0 until 40 * i + 7).map(j => ('a' + j % 26).toChar).mkString
      Files.write(Paths.get(d, s"vid_$i.bin"), content.getBytes)
    }
    val files = s.read.format("binaryFile").load(d + "/*.bin")
    MultimodalOps.frameSample(files, "path", "content", frameBytes = 16, everyN = 3)
      .select(regexp_extract(col("path"), "([^/]+)$", 1).as("fname"),
        col("frame_idx"), col("frame").cast("string").as("frame"))
      .orderBy("fname", "frame_idx")
  }
  private val mmFramesSql =
    s"""WITH v AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |    CAST(content AS VARCHAR) AS c
       |  FROM read_blob('$fixRoot/mm_vid/*.bin'))
       |SELECT fname, CAST(i AS INT) AS frame_idx, substr(c, CAST(i AS INT) * 16 + 1, 16) AS frame
       |FROM (SELECT fname, c, unnest(range((len(c) + 15) // 16)) AS i FROM v)
       |WHERE i % 3 = 0
       |ORDER BY fname, frame_idx""".stripMargin

  // --------------------------------------------------------- S11 + K1
  /** S11-quarantine: robust CSV ingest with malformed-row capture. The
    * fixture (authored through the text sink from orders) carries three
    * row classes: clean "key,cents", legit-sparse "key," (empty cents —
    * accepted as null), and corrupt "key,N/A" (type failure —
    * quarantined). Spark's PERMISSIVE corrupt-record column and the
    * oracle's TRY_CAST replica must agree row-for-row on which class is
    * which; the summary keeps the gate auditable (the w14 convention). */
  private val s11: Q = (s, dir) => {
    val d = fixDir("s11_quarantine")
    val lines = t(s, dir, "orders").select(
      concat(col("o_orderkey").cast("string"), lit(","),
        when(col("o_orderkey") % 7 === 0, lit("N/A"))
          .when(col("o_orderkey") % 11 === 0, lit(""))
          .otherwise(expr("CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS STRING)")))
        .as("line"))
    IoOps.writeTextLines(lines, "line", d)
    IoOps.readCsvQuarantine(s, d + "/*.txt", StructType(Seq(
        StructField("k", LongType), StructField("cents", LongType))))
      .agg(
        count(when(col("_corrupt_record").isNull, 1)).as("n_good"),
        count(when(col("_corrupt_record").isNull && col("cents").isNull, 1))
          .as("n_sparse"),
        count(col("_corrupt_record")).as("n_quarantined"),
        sum(when(col("_corrupt_record").isNull, col("cents"))).as("sum_cents"))
  }
  private val s11Sql =
    s"""WITH raw AS (
       |  SELECT k, p FROM read_csv('$fixRoot/s11_quarantine/*.txt',
       |    header=false, columns={'k':'VARCHAR','p':'VARCHAR'}, auto_detect=false)),
       |cls AS (
       |  SELECT TRY_CAST(p AS BIGINT) AS cents,
       |    (p IS NOT NULL AND TRY_CAST(p AS BIGINT) IS NULL) AS bad,
       |    p IS NULL AS sparse
       |  FROM raw)
       |SELECT CAST(SUM(CASE WHEN NOT bad THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       |  CAST(SUM(CASE WHEN sparse THEN 1 ELSE 0 END) AS BIGINT) AS n_sparse,
       |  CAST(SUM(CASE WHEN bad THEN 1 ELSE 0 END) AS BIGINT) AS n_quarantined,
       |  CAST(SUM(CASE WHEN NOT bad THEN cents END) AS BIGINT) AS sum_cents
       |FROM cls""".stripMargin

  // ------------------------------------------------- mm_binary_simhash

  /** MM-SIMHASH: near-duplicate detection for OPAQUE BINARY payloads —
    * the dedup × multimodal intersection (re-encoded images, re-muxed
    * audio, and trailing-metadata variants hash differently under exact
    * md5 but sit one flipped chunk apart here). The 16-bit simhash
    * votes over non-overlapping 4-byte chunks' md5 parities (the
    * dedup_simhash vote construction applied to lower-hex 8-grams —
    * deliberately the same oracle-replicable recipe, not a second hash
    * family), candidate pairs block on the top 8 bits (prefix blocking,
    * never all-pairs), verify is exact Hamming ≤ 3. Row-local
    * signature; one keyed self-join on the block. Files shorter than
    * one chunk are excluded by contract (a sub-4-byte payload has no
    * content to vote with). */
  private def genSimTree(base: String): Unit =
    (0 until 40).foreach { k =>
      val body = s"chunk-family-${k % 8}-payload-" * 6 + s"tail-$k"
      Files.write(Paths.get(base, f"f$k%03d.bin"),
        body.getBytes(StandardCharsets.US_ASCII))
    }
  private val simhashExpr =
    """aggregate(transform(sequence(0, 15), i ->
      |  CASE WHEN aggregate(transform(hs, h ->
      |      (ascii(substring(h, i + 1, 1)) % 2) * 2 - 1), 0, (a, b) -> a + b) >= 0
      |  THEN shiftleft(1, 15 - i) ELSE 0 END), 0, (a, b) -> a + b)"""
      .stripMargin.replaceAll("\n", " ")
  private val mmSim: Q = (s, dir) => {
    val d = fixDir("mm_sim")
    genSimTree(d)
    val sims = s.read.format("binaryFile").load(d + "/*.bin")
      .select(expr("regexp_extract(path, '([^/]+)$', 1)").as("fname"),
        expr("lower(hex(content))").as("hx"))
      .filter(length(col("hx")) >= 8)
      .select(col("fname"), expr(
        "transform(sequence(1, length(hx) div 8), j -> md5(substring(hx, (j - 1) * 8 + 1, 8)))")
        .as("hs"))
      .select(col("fname"), expr(simhashExpr).as("sim"))
      .select(col("fname"), col("sim"), expr("sim div 256").as("block"))
    sims.as("a").join(sims.as("b"),
        expr("a.block = b.block AND a.fname < b.fname"))
      .select(col("a.fname").as("id_a"), col("b.fname").as("id_b"),
        expr("CAST(bit_count(a.sim ^ b.sim) AS INT)").as("hamming"))
      .filter(col("hamming") <= 3)
      .orderBy("id_a", "id_b")
  }
  private val mmSimSql =
    s"""WITH sims AS (
       |  SELECT regexp_extract(filename, '([^/]+)$$', 1) AS fname,
       |    list_sum(list_transform(range(16), i ->
       |      CASE WHEN COALESCE(list_sum(list_transform(hs,
       |             h -> (ascii(substr(h, i + 1, 1)) % 2) * 2 - 1)), 0) >= 0
       |           THEN 1 << (15 - i) ELSE 0 END)) AS sim
       |  FROM (
       |    SELECT filename, list_transform(range(1, len(hx) // 8 + 1),
       |      j -> md5(substr(hx, (j - 1) * 8 + 1, 8))) AS hs
       |    FROM (SELECT filename, lower(hex(content)) AS hx
       |          FROM read_blob('$fixRoot/mm_sim/*.bin'))
       |    WHERE len(hx) >= 8)),
       |blocked AS (SELECT fname, sim, sim // 256 AS block FROM sims)
       |SELECT a.fname AS id_a, b.fname AS id_b,
       |  CAST(bit_count(xor(a.sim, b.sim)) AS INT) AS hamming
       |FROM blocked a JOIN blocked b ON a.block = b.block AND a.fname < b.fname
       |WHERE bit_count(xor(a.sim, b.sim)) <= 3
       |ORDER BY id_a, id_b""".stripMargin

  // --------------------------------------------------- j15_bucketed_join
  /** J15: the co-located join — both sides written `bucketBy(8, key)`
    * (external tables, fixture path), so the join consumes the storage
    * layout and plans NO exchange on either side (PlanShapeSpec pins
    * it). THE shuffle lever at 100 TB: a fact-to-fact join on a shared
    * bucketing runs map-side forever after one layout write, where the
    * plain join re-shuffles both inputs every query. The oracle
    * replays the JOIN SEMANTICS from the source tables — the bucketed
    * write is a physical materialization the result must be invariant
    * to (that invariance is what the round-trip checks). */
  private val j15: Q = (s, dir) => {
    val ord = t(s, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"))
    val liAgg = t(s, dir, "lineitem")
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity")).as("sum_qty"))
    s.sql("DROP TABLE IF EXISTS graft_bkt_orders")
    s.sql("DROP TABLE IF EXISTS graft_bkt_items")
    ord.write.mode("overwrite").format("parquet")
      .option("path", fixDir("j15_bkt_orders"))
      .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("graft_bkt_orders")
    liAgg.write.mode("overwrite").format("parquet")
      .option("path", fixDir("j15_bkt_items"))
      .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("graft_bkt_items")
    // MERGE hint: at fixture scale AQE would broadcast the small side
    // and mark the scans "Bucketed: false (disabled by query planner)" —
    // correct for a dim join, but this operator exists to pin the
    // FACT-TO-FACT path where neither side broadcasts and the layout is
    // the whole point. The hint selects the plan a 100 TB join gets.
    s.table("graft_bkt_orders").hint("merge")
      .join(s.table("graft_bkt_items"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("n_items"), col("sum_qty"))
      .orderBy("o_orderkey")
  }
  private val j15Sql =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(n_items AS BIGINT) AS n_items, sum_qty
      |FROM orders JOIN (
      |  SELECT l_orderkey, COUNT(*) AS n_items, SUM(l_quantity) AS sum_qty
      |  FROM lineitem GROUP BY l_orderkey) ON o_orderkey = l_orderkey
      |WHERE o_orderkey % 100 = 0
      |ORDER BY o_orderkey""".stripMargin

  // ---------------------------------------------- io_s17_schema_evolution
  /** S17: schema-evolution ingest — a landing zone accretes batches
    * whose schema GREW over time (a `quality` column appears in later
    * drops); `mergeSchema` unions the schemas and nulls the missing
    * column in old batches, so ONE reader serves the whole history
    * (the alternative — a backfill rewrite of every old file — is the
    * operation this capability exists to avoid at fleet scale). The
    * oracle replays with DuckDB's union_by_name over the same two file
    * trees; the aggregate keeps both the null-count (old batch rows)
    * and the new column's sum auditable. */
  private val s17: Q = (s, dir) => {
    val d = fixDir("s17_evolve")
    val docs = t(s, dir, "documents")
    docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .write.mode("overwrite").parquet(s"$d/batch1")
    docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        (col("n_chars") % 97).as("quality"))
      .write.mode("overwrite").parquet(s"$d/batch2")
    s.read.option("mergeSchema", "true").parquet(s"$d/batch1", s"$d/batch2")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        count(col("quality")).as("n_with_quality"),
        sum(col("quality")).as("sum_quality"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("lang")
  }
  private val s17Sql =
    s"""SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(COUNT(quality) AS BIGINT) AS n_with_quality,
       |  CAST(SUM(quality) AS BIGINT) AS sum_quality,
       |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars
       |FROM read_parquet(
       |  ['$fixRoot/s17_evolve/batch1/*.parquet',
       |   '$fixRoot/s17_evolve/batch2/*.parquet'], union_by_name=true)
       |GROUP BY lang ORDER BY lang""".stripMargin

  /** Steady-state bench form of j15: write the bucketed layout ONCE
    * per session (first rep), then measure the join that consumes it —
    * at fleet scale the layout is written once and read forever, and
    * re-dropping/re-writing both tables inside every timed rep would
    * measure the materialization, not the operator. Verify always runs
    * the full write+join form. */
  private val j15Steady: Q = (s, dir) => {
    if (!s.catalog.tableExists("graft_bkt_orders") ||
        !s.catalog.tableExists("graft_bkt_items")) j15(s, dir).count()
    s.table("graft_bkt_orders").hint("merge")
      .join(s.table("graft_bkt_items"),
        col("o_orderkey") === col("l_orderkey"))
      .filter(col("o_orderkey") % 100 === 0)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("n_items"), col("sum_qty"))
      .orderBy("o_orderkey")
  }

  val benchVariants: Map[String, Q] = Map(
    "j15_bucketed_join" -> j15Steady)

  // ------------------------------------------------------------ registry

  val queries: Map[String, Q] = Map(
    "io_s11_quarantine" -> s11,
    "io_s17_schema_evolution" -> s17,
    "mm_binary_simhash" -> mmSim,
    "j15_bucketed_join" -> j15,
    "io_s1_csv" -> s1,
    "io_s2_csv_forced_string" -> s2,
    "io_s3_tsv" -> s3,
    "io_s4_pipe_csv" -> s4,
    "io_s5_json_files" -> s5,
    "io_s6_jsonl" -> s6,
    "io_a11_jsonl_union" -> a11,
    "io_s7_delim_lines" -> s7,
    "io_s8_text_lines" -> s8,
    "io_s9_binary_tree" -> s9,
    "io_s14_partitioned" -> s14,
    "io_s15_orc" -> s15,
    "io_s16_jsonl_gz" -> s16,
    "mm_wav_probe" -> mmWav,
    "mm_audio_vad" -> mmVad,
    "mm_image_ahash" -> mmAhash,
    "mm_mp3_probe" -> mmMp3,
    "mm_mp3_decode" -> mmMp3Dec,
    "mm_bin_features" -> mmBin,
    "mm_image_probe" -> mmImage,
    "mm_image_resize" -> mmResize,
    "mm_frame_sample" -> mmFrames)

  val oracle: Map[String, String] = Map(
    "io_s11_quarantine" -> s11Sql,
    "io_s17_schema_evolution" -> s17Sql,
    "mm_binary_simhash" -> mmSimSql,
    "j15_bucketed_join" -> j15Sql,
    "io_s1_csv" -> s1Sql,
    "io_s2_csv_forced_string" -> s2Sql,
    "io_s3_tsv" -> s3Sql,
    "io_s4_pipe_csv" -> s4Sql,
    "io_s5_json_files" -> s5Sql,
    "io_s6_jsonl" -> s6Sql,
    "io_a11_jsonl_union" -> a11Sql,
    "io_s7_delim_lines" -> s7Sql,
    "io_s8_text_lines" -> s8Sql,
    "io_s9_binary_tree" -> s9Sql,
    "io_s14_partitioned" -> s14Sql,
    "io_s15_orc" -> s15Sql,
    "io_s16_jsonl_gz" -> s16Sql,
    "mm_wav_probe" -> mmWavSql,
    "mm_audio_vad" -> mmVadSql,
    "mm_image_ahash" -> mmAhashSql,
    "mm_mp3_probe" -> mmMp3Sql,
    "mm_mp3_decode" -> mmMp3DecSql,
    "mm_bin_features" -> mmBinSql,
    "mm_image_probe" -> mmImageSql,
    "mm_image_resize" -> mmResizeSql,
    "mm_frame_sample" -> mmFramesSql)
}
