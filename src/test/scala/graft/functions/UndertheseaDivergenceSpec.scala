package graft.functions

import java.text.Normalizer

import org.scalatest.funsuite.AnyFunSuite

/** Quantified divergence of the two underthesea approximations (SURVEY
  * §7.5): F10 sentence tokenization (naive [.!?] splitter vs underthesea
  * .sent_tokenize) and the F7 pipeline's underthesea.text_normalize step
  * (approximated by Unicode NFC).
  *
  * The golden outputs are AUTHORED, not machine-generated — this
  * container cannot run the Python underthesea — from its documented
  * behavior: sent_tokenize keeps abbreviations ("TP.", "GS.") and
  * decimal/grouped numbers ("3.5", "120.000") inside one sentence;
  * text_normalize repositions misplaced tone marks onto the canonical
  * vowel ("hoá" -> "hóa", "khoẻ" -> "khỏe"), maps eth "Ð" to "Đ", and
  * composes decomposed codepoints (its README example: "Ðảm baỏ chất
  * lựơng" -> "Đảm bảo chất lượng"). Each golden entry is one of those
  * documented rules applied once.
  *
  * The measured agreement (doc-level exact match) is the recorded bound
  * in ARCHITECTURE.md; these tests pin it FROM BELOW so a regression in
  * either approximation shows up as a number, not an anecdote. Current
  * measurement: sentence split 9/12 (75%) — misses are exactly the
  * abbreviation-dot and number-dot rules; NFC-vs-text_normalize 8/13
  * (~62%) on this rule-stressing mix, 100% on correctly-typed text (the
  * overwhelming case in a real corpus — misplaced tones are typos).
  */
class UndertheseaDivergenceSpec extends AnyFunSuite {

  private def ourSplit(text: String): Seq[String] =
    "[^.!?]+[.!?]?".r.findAllIn(text).map(_.trim).filter(_.nonEmpty).toSeq

  // (text, golden underthesea.sent_tokenize segments)
  private val sentenceGolden: Seq[(String, Seq[String])] = Seq(
    ("Trời hôm nay đẹp. Tôi đi dạo công viên.",
      Seq("Trời hôm nay đẹp.", "Tôi đi dạo công viên.")),
    ("Bạn khỏe không? Tôi khỏe!", Seq("Bạn khỏe không?", "Tôi khỏe!")),
    ("Hôm nay là thứ hai. Ngày mai là thứ ba. Ngày kia là thứ tư.",
      Seq("Hôm nay là thứ hai.", "Ngày mai là thứ ba.", "Ngày kia là thứ tư.")),
    ("Tôi có hai con mèo. Chúng rất dễ thương.",
      Seq("Tôi có hai con mèo.", "Chúng rất dễ thương.")),
    ("Anh ấy hỏi: bạn đi đâu? Tôi không trả lời.",
      Seq("Anh ấy hỏi: bạn đi đâu?", "Tôi không trả lời.")),
    ("Chị Lan nói rằng sẽ đến sớm", Seq("Chị Lan nói rằng sẽ đến sớm")),
    ("Em bé cười! Mọi người vui lắm.", Seq("Em bé cười!", "Mọi người vui lắm.")),
    ("Ông ta sống ở Hà Nội. Bà ta sống ở Huế.",
      Seq("Ông ta sống ở Hà Nội.", "Bà ta sống ở Huế.")),
    ("Mưa rơi suốt đêm. Sáng nay đường ướt.",
      Seq("Mưa rơi suốt đêm.", "Sáng nay đường ướt.")),
    // documented divergences: abbreviation dots and number dots
    ("TP. Hồ Chí Minh rất lớn.", Seq("TP. Hồ Chí Minh rất lớn.")),
    ("GS. Nguyễn Văn An giảng bài hôm nay.",
      Seq("GS. Nguyễn Văn An giảng bài hôm nay.")),
    ("Cuốn sách giá 120.000 đồng.", Seq("Cuốn sách giá 120.000 đồng.")))

  // (text, golden underthesea.text_normalize output)
  private val normalizeGolden: Seq[(String, String)] = Seq(
    // correctly-typed text: identity under both
    ("tiếng Việt rất hay", "tiếng Việt rất hay"),
    ("Hà Nội mùa thu", "Hà Nội mùa thu"),
    ("cà phê sữa đá", "cà phê sữa đá"),
    ("bánh mì thịt nướng", "bánh mì thịt nướng"),
    ("quyển sách hay", "quyển sách hay"),
    ("ngôi trường mới", "ngôi trường mới"),
    ("dòng sông xanh", "dòng sông xanh"),
    // decomposed codepoints: NFC fixes these, like underthesea
    ("thỏa thuận", "thỏa thuận"), // o + combining hook-above
    // misplaced tone marks / eth: underthesea fixes, NFC does not
    ("hoá học", "hóa học"),
    ("khoẻ mạnh", "khỏe mạnh"),
    ("thuỷ điện", "thủy điện"),
    ("Ðảm baỏ", "Đảm bảo"),
    ("chất lựơng", "chất lượng"))

  test("F10 sentence split: agreement with authored underthesea golden >= 75%") {
    val results = sentenceGolden.map { case (text, golden) =>
      ourSplit(text) == golden.map(_.trim)
    }
    val agree = results.count(identity)
    info(s"sentence-split agreement: $agree/${results.size}")
    assert(agree >= 9, s"agreement dropped: $agree/${results.size}")
    // the three documented misses are the abbreviation/number dot rules,
    // nothing else — a new miss class should fail loudly
    val missTexts = sentenceGolden.zip(results).collect { case ((t, _), false) => t }
    assert(missTexts.forall(t => t.contains("TP.") || t.contains("GS.") || t.contains("120.000")),
      s"unexpected sentence-split divergence: $missTexts")
  }

  test("F7 underthesea step (NFC approximation): agreement >= 8/13, perfect on well-typed text") {
    val results = normalizeGolden.map { case (text, golden) =>
      Normalizer.normalize(text, Normalizer.Form.NFC) == golden
    }
    val agree = results.count(identity)
    info(s"text_normalize agreement: $agree/${results.size}")
    assert(agree >= 8, s"agreement dropped: $agree/${results.size}")
    // well-typed + decomposed inputs must ALL agree (NFC covers them);
    // only the tone-reposition/eth rows may diverge
    val wellTyped = normalizeGolden.take(8)
    assert(wellTyped.forall { case (t, g) =>
      Normalizer.normalize(t, Normalizer.Form.NFC) == g
    }, "NFC must cover composition + identity cases")
  }
}
