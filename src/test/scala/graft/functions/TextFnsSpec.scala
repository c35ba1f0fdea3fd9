package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pure-JVM specs for the §2.8 scalar surface — the edge cases SURVEY
  * §5.2 flags as silent-bug risks. */
class TextFnsSpec extends AnyFunSuite {

  // ------------------------------------------------------------- F1
  test("convertDuration: H:MM:SS to hours, round 4") {
    assert(TextFns.convertDuration("1:30:00", "hour").contains(1.5))
    assert(TextFns.convertDuration("10:05:30", "second").contains(36330.0))
  }
  test("convertDuration: 2-part string is MM:SS, not H:MM") {
    // reference reads right-to-left with 60^idx weights
    assert(TextFns.convertDuration("1:30", "second").contains(90.0))
  }
  test("convertDuration: ';' separators cleaned to ':'") {
    assert(TextFns.convertDuration("1;30", "second").contains(90.0))
    assert(TextFns.convertDuration("1;;30", "second").contains(90.0))
  }
  test("convertDuration: empty components skipped") {
    assert(TextFns.convertDuration("1::30", "second").contains(90.0))
  }
  test("convertDuration: garbage and null -> None") {
    assert(TextFns.convertDuration("garbage", "hour").isEmpty)
    assert(TextFns.convertDuration(null, "hour").isEmpty)
    assert(TextFns.convertDuration("1:30", "fortnight").isEmpty)
  }

  // ------------------------------------------------------------- F2
  test("normalizeName: de-accents, strips punct except hyphen, lowers, space->hyphen") {
    assert(TextFns.normalizeName("Quốc Thịnh!") == "quoc-thinh")
    assert(TextFns.normalizeName("A  B") == "a--b") // no ws collapse: str.replace
    assert(TextFns.normalizeName("Kept-Hyphen") == "kept-hyphen")
  }
  test("normalizeName: đ survives NFD (reference parity)") {
    // NFD does not decompose đ, so the accent-strip keeps it
    assert(TextFns.normalizeName("Đặng") == "đang")
  }

  // ------------------------------------------------------------- F3
  test("viDigits: < 10 single word, >= 10 digit-by-digit") {
    assert(TextFns.viDigits(5) == "năm")
    assert(TextFns.viDigits(25) == "hai năm")
    assert(TextFns.viDigits(105) == "một không năm")
  }

  // ------------------------------------------------------------- F4
  test("normalizeNumberFormats: comma-thousands keeps dot decimal") {
    assert(TextFns.normalizeNumberFormats("gia 1,234.56 d") == "gia 1234.56 d")
  }
  test("normalizeNumberFormats: dot-thousands swaps to dot decimal") {
    assert(TextFns.normalizeNumberFormats("gia 1.234,56 d") == "gia 1234.56 d")
  }
  test("normalizeNumberFormats: single-separator numbers untouched") {
    assert(TextFns.normalizeNumberFormats("co 1,500 xu") == "co 1,500 xu")
  }

  // ------------------------------------------------------------- F5
  test("normalizeCurrency: reference's đ-before-vnđ order quirk") {
    // 'đ' replaced first, so 'vnđ' becomes 'vnVND' -> uppercased 'VNVND'
    assert(TextFns.normalizeCurrency("5000 vnđ") == "5000 VNVND")
    assert(TextFns.normalizeCurrency("5000đ") == "5000VND")
    assert(TextFns.normalizeCurrency("5000 VND") == "5000 VND")
  }

  // ------------------------------------------------------------- F6
  test("normalizeDates: 2-digit year pivot <=30 -> 20xx else 19xx") {
    assert(TextFns.normalizeDates("5/3/21")
      == "ngày năm tháng ba năm hai không hai một")
    assert(TextFns.normalizeDates("5/3/92")
      == "ngày năm tháng ba năm một chín chín hai")
  }
  test("normalizeDates: 2-digit day spoken digit-by-digit") {
    assert(TextFns.normalizeDates("25/12/2000")
      == "ngày hai năm tháng một hai năm hai không không không")
  }

  // ------------------------------------------------------------- F7
  test("normalizeText: full pipeline composes URL strip, date, digits, lower") {
    val out = TextFns.normalizeText("Xem http://a.b/c 5/3/21 có 25 quyển")
    assert(out == "xem ngày năm tháng ba năm hai không hai một có hai năm quyển")
  }
  test("normalizeText: null/empty -> empty string (reference parity)") {
    assert(TextFns.normalizeText(null) == "")
    assert(TextFns.normalizeText("") == "")
  }

  // ------------------------------------------------------------- F12
  test("pyLiteralToJson: dict with apostrophe inside double-quoted string") {
    assert(TextFns.pyLiteralToJson("""{'name': "O'Brien", 'age': 5}""")
      == """{"name":"O'Brien","age":5}""")
  }
  test("pyLiteralToJson: nested lists, tuples, booleans, None") {
    assert(TextFns.pyLiteralToJson("{'a': [1, 2], 'b': (3, 4), 'c': True, 'd': None}")
      == """{"a":[1,2],"b":[3,4],"c":true,"d":null}""")
  }
  test("pyLiteralToJson: escapes inside strings") {
    assert(TextFns.pyLiteralToJson("""{'s': 'a\'b"c'}""")
      == """{"s":"a'b\"c"}""")
  }
  // ------------------------------------------------------------- F20
  test("unicodeUnescape: \\n/\\t/\\uXXXX/\\xNN decoded, malformed left alone") {
    assert(TextFns.unicodeUnescape("a\\nb\\tc") == "a\nb\tc")
    assert(TextFns.unicodeUnescape("\\u0041\\x42") == "AB")
    assert(TextFns.unicodeUnescape("end\\") == "end\\")
    assert(TextFns.unicodeUnescape("\\uZZZZ") == "\\uZZZZ")
    assert(TextFns.unicodeUnescape("\\\\n") == "\\n")
    assert(TextFns.unicodeUnescape(null) == null)
  }

  test("pyLiteralToJson: trailing comma tolerated, garbage -> null") {
    assert(TextFns.pyLiteralToJson("[1, 2,]") == "[1,2]")
    assert(TextFns.pyLiteralToJson("{'unterminated': ") == null)
    assert(TextFns.pyLiteralToJson("not a literal") == null)
  }
}
