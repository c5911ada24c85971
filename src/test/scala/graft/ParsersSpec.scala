package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ingest.Parsers._

/** Unit tests of the pure parsing layer — no Spark. Cases mirror the
  * reference's tokenizer and coercion semantics (lib/parsers.js).
  * Property-style cases use seeded random generation (deterministic).
  */
class ParsersSpec extends AnyFunSuite {

  // ------------------------------------------------ tokenizer

  test("plain comma split with per-field trim") {
    assert(tokenizeCsv("a, b ,c").contains(Vector("a", "b", "c")))
  }

  test("double-quoted field keeps embedded comma") {
    assert(tokenizeCsv("""a,"b,c",d""").contains(Vector("a", "b,c", "d")))
  }

  test("single-quoted field keeps embedded comma (reference extension)") {
    assert(tokenizeCsv("a,'b,c',d").contains(Vector("a", "b,c", "d")))
  }

  test("backslash-escaped quote inside quoted field") {
    assert(tokenizeCsv("""a,"say \"hi\"",c""").contains(Vector("a", "say \"hi\"", "c")))
  }

  test("trailing comma yields trailing empty field (lib/parsers.js:170-171)") {
    assert(tokenizeCsv("a,b,").contains(Vector("a", "b", "")))
  }

  test("empty fields preserved") {
    assert(tokenizeCsv("a,,c").contains(Vector("a", "", "c")))
  }

  test("unquoted internal whitespace kept, outer trimmed") {
    assert(tokenizeCsv("  hello world , x").contains(Vector("hello world", "x")))
  }

  test("unbalanced quote is malformed") {
    assert(tokenizeCsv("""a,"bc""").isEmpty)
  }

  test("quote inside unquoted field is malformed (re_valid rejects)") {
    assert(tokenizeCsv("""a,b"c,d""").isEmpty)
  }

  // ------------------------------------------------ JS Number() semantics

  test("jsNumber: empty and whitespace coerce to 0 (JS quirk, documented)") {
    assert(jsNumber("").contains(0.0))
    assert(jsNumber("   ").contains(0.0))
  }

  test("jsNumber: decimals, exponents, signs, surrounding space") {
    assert(jsNumber("12.5").contains(12.5))
    assert(jsNumber(" -3e2 ").contains(-300.0))
    assert(jsNumber("+4").contains(4.0))
  }

  test("jsNumber: hex parses, trailing garbage and alpha suffixes do not") {
    assert(jsNumber("0x1A").contains(26.0))
    assert(jsNumber("12abc").isEmpty)
    assert(jsNumber("1.5d").isEmpty) // Java would accept, JS does not
    assert(jsNumber("Infinity").contains(Double.PositiveInfinity))
  }

  test("jsNumber: literal NaN and failed radix literals are errors like JS Number()") {
    assert(jsNumber("NaN").isEmpty)   // Java parseDouble would accept these
    assert(jsNumber("+NaN").isEmpty)
    assert(jsNumber("-NaN").isEmpty)
    assert(jsNumber("0x1.8p1").isEmpty) // Java hex-float; JS Number() => NaN
    assert(jsNumber("0xzz").isEmpty)
    assert(jsNumber("0b102").isEmpty)
    assert(jsNumber("0x").isEmpty)
    assert(jsNumber("-0x10").isEmpty) // JS: sign + radix prefix is NaN
  }

  // ------------------------------------------------ coercion

  test("boolean accepts only true/false any case (lib/parsers.js:118-127)") {
    assert(coerce("TRUE", "boolean", "parseCSV") == Right(BVal(true)))
    assert(coerce("false", "boolean", "parseCSV") == Right(BVal(false)))
    assert(coerce("1", "boolean", "parseCSV").isLeft)
    assert(coerce("yes", "boolean", "parseCSV").isLeft)
  }

  test("unknown declared type is a record error (lib/parsers.js:128-130)") {
    assert(coerce("x", "date", "parseCSV").isLeft)
  }

  // ------------------------------------------------ CSV record parse

  private val spec = CsvSpec(
    headers = Vector("k", "n", "b"),
    types = Some(Vector("string", "number", "boolean")))

  test("happy path parses all fields typed") {
    val r = parseCsvLine(spec)("x,42,true")
    assert(r.error.isEmpty)
    assert(r.fields == Vector(Some(SVal("x")), Some(NVal(42.0)), Some(BVal(true))))
  }

  test("stop-at-first-error: earlier fields kept, error field and later dropped") {
    val r = parseCsvLine(spec)("x,notnum,true")
    assert(r.error.exists(_.contains("did not match type 'number'")))
    assert(r.fields == Vector(Some(SVal("x")), None, None))
  }

  test("field/header count mismatch is a record error") {
    val r = parseCsvLine(spec)("x,1")
    assert(r.error.exists(_.contains("Mis-match between fieldCount")))
    assert(r.error.exists(_.endsWith(" Try setting options.ignoreExtraHeaders to true")),
      "fewer-fields mismatch carries the reference's hint suffix (lib/parsers.js:103)")
    val more = parseCsvLine(spec)("a,1,true,extra")
    assert(more.error.exists(e => e.contains("Mis-match") && !e.contains("Try setting")),
      "more-fields mismatch has no hint suffix")
  }

  test("empty line is zero tokens -> empty-json SUCCESS (lib/parsers.js:151,156)") {
    assert(tokenizeCsv("").contains(Vector.empty))
    assert(tokenizeCsv("   ").contains(Vector.empty))
    val r = parseCsvLine(spec)("")
    assert(r.error.isEmpty, "zero forEach iterations means zero errors")
    assert(r.fields.forall(_.isEmpty))
  }

  test("type errors report the original untrimmed token (lib/parsers.js:116)") {
    // only quoted fields can carry surrounding whitespace through tokenizing
    val r = parseCsvLine(spec)("""x," nope ",true""")
    assert(r.error.exists(_.contains("fieldValue ' nope '")),
      s"expected untrimmed token in ${r.error}")
  }

  test("ignoreExtraHeaders tolerates fewer fields than headers") {
    val s2 = spec.copy(ignoreExtraHeaders = true, ignoreExtraHeaderDataTypes = true)
    val r = parseCsvLine(s2)("x,1")
    assert(r.error.isEmpty)
    assert(r.fields == Vector(Some(SVal("x")), Some(NVal(1.0)), None))
  }

  test("non-comma delimiter is a plain split (no quoting)") {
    val s2 = CsvSpec(Vector("a", "b"), delimiter = "|")
    val r = parseCsvLine(s2)("""x"y|z""")
    assert(r.error.isEmpty)
    assert(r.fields == Vector(Some(SVal("x\"y")), Some(SVal("z"))))
  }

  test("config errors throw at spec construction (job-fatal, not per-record)") {
    assertThrows[IllegalArgumentException](CsvSpec(Vector.empty))
  }

  // ------------------------------------------------ fixed width

  private val fw = FwSpec(Vector(
    FwField("id", "number", 1, 4),
    FwField("name", "string", 5, 12),
    FwField("ok", "boolean", 13, 17)))

  test("fw happy path: 1-based inclusive positions, strings NOT trimmed") {
    val r = parseFwLine(fw)("0042abc     false")
    assert(r.error.isEmpty)
    assert(r.fields == Vector(Some(NVal(42.0)), Some(SVal("abc     ")), Some(BVal(false))))
  }

  test("fw length must equal last endPosition exactly (both directions error)") {
    assert(parseFwLine(fw)("0042abc     falseX").error.exists(_.contains("larger")))
    assert(parseFwLine(fw)("0042abc").error.exists(_.contains("smaller")))
  }

  test("fw boolean is NOT trimmed before match (reference: toLowerCase only)") {
    val r = parseFwLine(fw)("0042abc     fals ")
    assert(r.error.exists(_.contains("boolean")))
  }

  test("fw number field of spaces coerces to 0 (JS Number(' ') === 0)") {
    val r = parseFwLine(FwSpec(Vector(FwField("n", "number", 1, 3))))("   ")
    assert(r.fields == Vector(Some(NVal(0.0))))
  }

  // ------------------------------------------------ property-style: round trip

  test("property: unquoted fields round-trip through tokenizer (seeded)") {
    val rnd = new scala.util.Random(42)
    val chars = "abcXYZ019 #.".toCharArray
    (1 to 500).foreach { _ =>
      val fields = Vector.fill(1 + rnd.nextInt(6))(
        Vector.fill(rnd.nextInt(10))(chars(rnd.nextInt(chars.length))).mkString.trim)
      val line = fields.mkString(",")
      val parsed = tokenizeCsv(line)
      assert(parsed.isDefined, s"line <$line>")
      if (line.forall(_.isWhitespace)) assert(parsed.get == Vector.empty) // zero-token rule
      else assert(parsed.get == fields, s"line <$line>")
    }
  }

  test("property: double-quoted fields round-trip arbitrary comma content (seeded)") {
    val rnd = new scala.util.Random(43)
    val chars = "abc, XY9".toCharArray
    (1 to 500).foreach { _ =>
      val fields = Vector.fill(1 + rnd.nextInt(5))(
        Vector.fill(rnd.nextInt(12))(chars(rnd.nextInt(chars.length))).mkString)
      // quoted content is preserved verbatim (no trim inside quotes)
      val line = fields.map(f => "\"" + f + "\"").mkString(",")
      assert(tokenizeCsv(line).contains(fields), s"line <$line>")
    }
  }

  test("property: jsNumber round-trips doubles formatted by Java (seeded)") {
    val rnd = new scala.util.Random(44)
    (1 to 1000).foreach { _ =>
      val d = rnd.nextDouble() * math.pow(10, rnd.nextInt(12) - 6) * (if (rnd.nextBoolean()) 1 else -1)
      assert(jsNumber(d.toString).contains(d), s"d=$d")
    }
  }
}
