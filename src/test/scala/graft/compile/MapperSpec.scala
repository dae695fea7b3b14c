package graft.compile

import graft.SparkSpec
import graft.model.{MappingLoader, TableMapping}
import org.apache.spark.sql.Row

/** Ports the reference's `test/mapper_test.rb` expectations — the semantic
  * contract for the mapping DSL (M1-M21). */
class MapperSpec extends SparkSpec {

  /** Run one line through a columns-YAML mapping under a table-level klass,
    * returning (fields, rawtext). */
  private def mappedLine(cells: Seq[String], columnsYaml: String)
      : (Map[String, String], Map[String, String]) = {
    val mapping = TableMapping(klass = Some("K"),
                               columns = MappingLoader.loadColumns(columnsYaml))
    val compiler = MappingCompiler(mapping)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      Seq(Row(cells, 0L, "test")).asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "cells array<string>, lineno long, file string"))
    val out = compiler.records(df).collect()
    assert(out.length == 1, s"expected one record, got ${out.toSeq}")
    val r = out.head
    (r.getMap[String, String](1).toMap, r.getMap[String, String](2).toMap)
  }

  private def field(cells: Seq[String], yaml: String, name: String): Option[String] =
    mappedLine(cells, yaml)._1.get(name)

  // --- single-op semantics (mapped_value) ---------------------------------

  private def one(op: String, value: String): Option[String] =
    field(Seq(value), s"""
      |- column: c
      |  mappings:
      |  - field: f
      |$op""".stripMargin, "f")

  test("format parses dd/mm/yyyy and yyyymmdd; bad dates raise (mapper_test.rb:356-369)") {
    assert(one("    format: dd/mm/yyyy", "25/01/2011") == Some("2011-01-25"))
    assert(one("    format: yyyymmdd", "20110125") == Some("2011-01-25"))
    assert(one("    format: dd/mm/yyyy", "03/04/2011") == Some("2011-04-03")) // day-first
    // Unparseable non-blank → ArgumentError naming the value, like the
    // reference (`mapper.rb:206-211`); never silently nil.
    val ex = intercept[Exception](one("    format: dd/mm/yyyy", "03/25/2011"))
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).exists(_.contains("value \"03/25/2011\"")), msgs(ex).mkString(" | "))
    // blank stays nil, no raise
    assert(one("    format: dd/mm/yyyy", "") == None)
  }

  test("map: exact match maps, missing key passes through") {
    val yaml = "    map:\n      \"A\": \"1\""
    assert(one(yaml, "A") == Some("1"))
    assert(one(yaml, "B") == Some("B"))
  }

  test("replace: literal string patterns, in place, pre-mapping") {
    val yaml = "    replace:\n      \".0\": \"\""
    assert(one(yaml, "2.0") == Some("2"))
    assert(one(yaml, "2.1") == Some("2.1"))
  }

  test("replace: Ruby \\1 backrefs resolve; literal $ and \\ never crash") {
    // Ruby gsub replacement semantics (`mapper.rb:64`): \1 is a group ref
    val backref = "    replace:\n      ? !ruby/regexp /^id-(\\w+)$/\n      : 'got \\1'"
    assert(one(backref, "id-abc42") == Some("got abc42"))
    // literal $ in the replacement is NOT a Java group reference
    val dollar = "    replace:\n      \"USD\": \"$\""
    assert(one(dollar, "5 USD") == Some("5 $"))
    // dangling backslash stays a literal backslash
    val bslash = "    replace:\n      \"-\": '\\'"
    assert(one(bslash, "a-b") == Some("a\\b"))
    // interpreter path agrees on all three
    import graft.model.{FieldMapping, Replace}
    assert(RowMapper.mappedValue(null, FieldMapping("f")) == null)
    def interp(pat: String, repl: String, isRe: Boolean, v: String): String = {
      val fm = FieldMapping("f", replace = Seq(Replace(
        if (isRe) pat else java.util.regex.Pattern.quote(pat), repl, isRe)))
      val replaced = fm.replace.foldLeft(v)((s, r) =>
        s.replaceAll(graft.clean.RubyTranslate.regex(r.pattern),
                     graft.clean.RubyTranslate.replacement(r.replacement)))
      RowMapper.mappedValue(replaced, FieldMapping("f"))
    }
    assert(interp("^id-(\\w+)$", "got \\1", isRe = true, "id-abc42") == "got abc42")
    assert(interp("USD", "$", isRe = false, "5 USD") == "5 $")
    assert(interp("-", "\\", isRe = false, "a-b") == "a\\b")
  }

  test("replace recurses into Array cells (reference mapper_test.rb:414-418)") {
    // array cells travel as their JSON rendering; each element is replaced
    val yaml =
      """|- column: consultantcode
         |  mappings:
         |  - field: consultantcode
         |- column: hospital
         |  mappings:
         |  - field: hospital
         |    replace:
         |    - ? !ruby/regexp /Addenbrookes/
         |      : 'RGT01'""".stripMargin
    val (fields, _) = mappedLine(
      Seq("C9999998", "[\"Addenbrookes\",\"RGT01\"]"), yaml)
    assert(fields("hospital") == "[\"RGT01\",\"RGT01\"]")
    // interpreter twin agrees
    val cols = MappingLoader.loadColumns(yaml)
    val (f2, _) = RowMapper.mappedLine(
      Seq("C9999998", "[\"Addenbrookes\",\"RGT01\"]"), cols)
    assert(f2("hospital") == "[\"RGT01\",\"RGT01\"]")
  }

  test("over-wide rows raise even in the default non-strict mode") {
    val yaml = "- column: a\n  mappings:\n  - field: f"
    val ex = intercept[Exception] { mappedLine(Seq("1", "2"), yaml) }
    def messages(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + messages(t.getCause)
    assert(messages(ex).contains("too many columns"),
           s"unexpected error: ${messages(ex)}")
  }

  test("duplicate rawtext keys: last column wins (Ruby hash assignment)") {
    val yaml = "- column: a\n  rawtext_name: shared\n- column: b\n  rawtext_name: shared"
    val (_, raw) = mappedLine(Seq("first", "second"), yaml)
    assert(raw == Map("shared" -> "second"))
  }

  test("daysafter: integer strings offset the epoch; others pass through") {
    def da(v: String) = one("    daysafter: \"2012-05-16\"", v)
    assert(da("2") == Some("2012-05-18"))
    assert(da("-2") == Some("2012-05-14"))
    assert(da("0") == Some("2012-05-16"))
    assert(da("String") == Some("String"))
    assert(da("") == None) // blank field values are dropped
    assert(da("16535") == Some("2057-08-23"))
    assert(da("9379") == Some("2038-01-19"))
    // beyond-int day counts can't be a Spark date — pass through in BOTH
    // paths (compiler would otherwise cast-to-null, interpreter compute)
    assert(da("99999999999") == Some("99999999999"))
    assert(RowMapper.mappedValue("99999999999",
      graft.model.FieldMapping("f", daysafter = Some("2012-05-16"))) == "99999999999")
    assert(one("    daysafter: \"1900-02-01\"", "16900") == Some("1946-05-11"))
    assert(one("    daysafter: \"1967-12-31\"", "16900") == Some("2014-04-08"))
    assert(one("    daysafter: \"2000-01-01\"", "16900") == Some("2046-04-09"))
  }

  test("clean: blank cleaned value is dropped from fields, kept in rawtext") {
    val yaml = """
      |- column: primaryprocedures
      |  mappings:
      |  - field: primaryprocedures
      |    clean: :code_opcs""".stripMargin
    val (fields, rawtext) = mappedLine(Seq("98"), yaml)
    assert(fields.get("primaryprocedures").isEmpty)
    assert(rawtext("primaryprocedures") == "98")
  }

  // --- line-level semantics (mapped_line) ----------------------------------

  test("simple mapping: field + rawtext under downcased column name") {
    val yaml = """
      |- column: patient address
      |  mappings:
      |  - field: address""".stripMargin
    val (fields, rawtext) = mappedLine(Seq("1 test road, testtown"), yaml)
    assert(fields("address") == "1 test road, testtown")
    assert(rawtext("patient address") == "1 test road, testtown")
  }

  test("rawtext-only mapping captures nothing into fields") {
    val yaml = "- column: extra\n  rawtext_name: extra"
    val (fields, rawtext) = mappedLine(Seq("otherinfo"), yaml)
    assert(fields.isEmpty)
    assert(rawtext == Map("extra" -> "otherinfo"))
  }

  test("join: order + join with default compact") {
    val yaml = """
      |- column: forename1
      |  mappings:
      |  - field: forenames
      |    order: 1
      |    join: " "
      |- column: forename2
      |  mappings:
      |  - field: forenames
      |    order: 2""".stripMargin
    val (fields, rawtext) = mappedLine(Seq("Catherine", "Elizabeth"), yaml)
    assert(fields("forenames") == "Catherine Elizabeth")
    assert(rawtext("forename1") == "Catherine")
    assert(rawtext("forename2") == "Elizabeth")
    // compact drops blanks entirely
    assert(field(Seq("", "Elizabeth"), yaml, "forenames") == Some("Elizabeth"))
  }

  test("join: compact false keeps blanks (',CB3 0DS' behaviour)") {
    val yaml = """
      |- column: addr1
      |  mappings:
      |  - field: address
      |    order: 1
      |    join: ","
      |    compact: false
      |- column: postcode
      |  mappings:
      |  - field: address
      |    order: 2""".stripMargin
    assert(field(Seq("", "CB3 0DS"), yaml, "address") == Some(",CB3 0DS"))
  }

  test("zip: split_char + zip_order zip split arrays (JSON-rendered)") {
    val yaml = """
      |- column: zip_column1
      |  mappings:
      |  - field: zipped_field
      |    zip_order: 1
      |    split_char: ","
      |- column: zip_column2
      |  mappings:
      |  - field: zipped_field
      |    zip_order: 2
      |- column: zip_column3
      |  mappings:
      |  - field: zipped_field
      |    zip_order: 3""".stripMargin
    val (fields, rawtext) = mappedLine(
      Seq("hello1,hello2,hello3", "world1,world2,world3", "suffix1,suffix2,suffix3"), yaml)
    assert(fields("zipped_field") ==
      """[["hello1","world1","suffix1"],["hello2","world2","suffix2"],["hello3","world3","suffix3"]]""")
    assert(rawtext("zip_column1") == "hello1,hello2,hello3")
  }

  test("cross-populate: no-priority wins over priority-2 when present") {
    val yaml = """
      |- column: referringclinicianname
      |  mappings:
      |  - field: consultantname
      |  - field: consultantcode
      |    priority: 2
      |- column: referringcliniciancode
      |  mappings:
      |  - field: consultantcode""".stripMargin
    val (f1, _) = mappedLine(Seq("Bob Fossil", "C1234"), yaml)
    assert(f1("consultantname") == "Bob Fossil")
    assert(f1("consultantcode") == "C1234")
    val (f2, _) = mappedLine(Seq("Bob Fossil", ""), yaml)
    assert(f2("consultantcode") == "Bob Fossil")
  }

  test("cross-populate with regex replace on the priority value") {
    val yaml = """
      |- column: referringclinicianname
      |  mappings:
      |  - field: consultantname
      |  - field: consultantcode
      |    priority: 2
      |    replace:
      |      ? !ruby/regexp /^BOB FOSSIL$/i
      |      : "ROBERT FOSSIL"
      |- column: referringcliniciancode
      |  mappings:
      |  - field: consultantcode
      |    priority: 1""".stripMargin
    assert(field(Seq("Bob Fossil", "C1234"), yaml, "consultantcode") == Some("C1234"))
    assert(field(Seq("Bob Fossil", ""), yaml, "consultantcode") == Some("ROBERT FOSSIL"))
    assert(field(Seq("Bob Smith", ""), yaml, "consultantcode") == Some("Bob Smith"))
  }

  test("cross-populate with map; map-to-'' falls through to next priority") {
    val yaml = """
      |- column: referringclinicianname
      |  mappings:
      |  - field: consultantname
      |  - field: consultantcode
      |    priority: 1
      |    map:
      |      "Bob Fossil": "C5678"
      |      "Bolo": ""
      |- column: referringcliniciancode
      |  mappings:
      |  - field: consultantcode
      |    priority: 2""".stripMargin
    assert(field(Seq("Bob Fossil", "P2"), yaml, "consultantcode") == Some("C5678"))
    assert(field(Seq("Bolo", "P2"), yaml, "consultantcode") == Some("P2"))
    assert(field(Seq("something", "P2"), yaml, "consultantcode") == Some("something"))
  }

  test("priority ordering across many columns") {
    val yaml = """
      |- column: referringclinicianname
      |  mappings:
      |  - field: consultantname
      |  - field: consultantcode
      |    priority: 2
      |- column: referringcliniciancode
      |  mappings:
      |  - field: consultantcode
      |    priority: 1
      |- column: somecolumn
      |  mappings:
      |  - field: consultantcode
      |    priority: 5
      |- column: anothercolumn
      |  mappings:
      |  - field: consultantcode
      |    priority: 10""".stripMargin
    assert(field(Seq("Pass", "", "Fail", "Large Fail"), yaml, "consultantcode") == Some("Pass"))
  }

  test("no-priority mapping beats priority-5 (unshift semantics)") {
    val yaml = """
      |- column: columnoneraw
      |  mappings:
      |  - field: columnone
      |  - field: columntwo
      |- column: columntworaw
      |  mappings:
      |  - field: columntwo
      |    priority: 5""".stripMargin
    val (f, _) = mappedLine(Seq("Exists", "Not"), yaml)
    assert(f("columnone") == "Exists")
    assert(f("columntwo") == "Exists")
  }

  test("validates presence raises with the reference's message") {
    val yaml = """
      |- column: column_one
      |  mappings:
      |  - field: field_one
      |    validates:
      |      presence: true
      |- column: column_two
      |  mappings:
      |  - field: field_two""".stripMargin
    val e = intercept[Exception] { mappedLine(Seq("", "RGT01"), yaml) }
    assert(e.getMessage.contains("field_one can't be blank") ||
           e.getCause != null && e.getCause.getMessage.contains("field_one can't be blank"))
  }

  test("decode base64") {
    val yaml = """
      |- column: base64
      |  mappings:
      |  - field: decoded
      |$decode""".stripMargin.replace("$decode", "  decode:\n  - :base64")
    val (f, raw) = mappedLine(Seq("Q2FrZQ=="), yaml)
    assert(f("decoded") == "Cake")
    assert(raw("base64") == "Cake") // rawtext captures the decoded value (mapper.rb:111-122)
  }

  test("standard mapping merge: mappings append, scalars overwrite") {
    StandardMappings.reset()
    val yaml = """
      |- column: surname
      |  standard_mapping: surname
      |- column: sex
      |  standard_mapping: sex""".stripMargin
    val (f, raw) = mappedLine(Seq("o`Grady", "male"), yaml)
    assert(f("surname") == "O'GRADY")
    assert(f("sex") == "1")
    assert(raw("surname") == "o`Grady")
  }

  test("map_columname_to stores the column name as field and rawtext") {
    val yaml = """
      |- column: abc123
      |  map_columname_to: columnname_field
      |  mappings:
      |  - field: field_two""".stripMargin
    val (f, raw) = mappedLine(Seq("value1"), yaml)
    assert(f("columnname_field") == "abc123")
    assert(raw("columnname_field") == "abc123")
    assert(f("field_two") == "value1")
  }

  test("duplicate priorities fail at compile time") {
    val yaml = """
      |- column: a
      |  mappings:
      |  - field: f
      |    priority: 1
      |- column: b
      |  mappings:
      |  - field: f
      |    priority: 1""".stripMargin
    val e = intercept[RuntimeException] {
      MappingCompiler(TableMapping(klass = Some("K"),
                                   columns = MappingLoader.loadColumns(yaml)))
    }
    assert(e.getMessage == "Cannot have duplicate priorities")
  }

  test("unknown standard mapping fails at compile time") {
    val yaml = "- column: x\n  standard_mapping: nope"
    val e = intercept[RuntimeException] {
      MappingCompiler(TableMapping(klass = Some("K"),
                                   columns = MappingLoader.loadColumns(yaml))).records _
    }
    assert(e.getMessage.contains("\"nope\" does not exist"))
  }
}
