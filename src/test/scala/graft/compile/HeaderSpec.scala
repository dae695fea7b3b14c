package graft.compile

import graft.model.MappingLoader
import org.scalatest.funsuite.AnyFunSuite

/** T3 (header consume + validate, `table.rb:203-241`) and T4 (regexp
  * column mutation, `table.rb:84-90`). */
class HeaderSpec extends AnyFunSuite {

  private val mapping = MappingLoader.loadTable(
    """|klass: K
       |header_lines: 1
       |columns:
       |- column: surname
       |- column: forename
       |""".stripMargin)

  test("matching header validates (case-insensitive)") {
    val out = MappingCompiler.consumeHeader(mapping, Seq(Seq("SURNAME", "Forename")))
    assert(out.columns.flatMap(_.column) == Seq("surname", "forename"))
  }

  test("missing + unexpected columns named in the reference's message") {
    val e = intercept[RuntimeException] {
      MappingCompiler.consumeHeader(mapping, Seq(Seq("lastname", "forename")))
    }
    assert(e.getMessage.contains("Header is not valid!"))
    assert(e.getMessage.contains("missing: [\"surname\"]"))
    assert(e.getMessage.contains("unexpected: [\"lastname\"]"))
  }

  test("same names out of order reported as (out of order)") {
    val e = intercept[RuntimeException] {
      MappingCompiler.consumeHeader(mapping, Seq(Seq("forename", "surname")))
    }
    assert(e.getMessage.contains("(out of order)"))
  }

  test("regexp columns take the matching header cell's text (T4)") {
    val m = MappingLoader.loadTable(
      """|klass: K
         |header_lines: 1
         |columns:
         |- column: !ruby/regexp /\Asur/i
         |- column: forename
         |""".stripMargin)
    val out = MappingCompiler.consumeHeader(m, Seq(Seq("Surname", "forename")))
    assert(out.columns.head.column.contains("Surname"))
    assert(out.columns.head.columnRegex.isEmpty)
  }

  test("multi-line headers: any line may validate") {
    val m = mapping.copy(headerLines = 2)
    val out = MappingCompiler.consumeHeader(m,
      Seq(Seq("My Report", ""), Seq("surname", "forename")))
    assert(out.columns.flatMap(_.column) == Seq("surname", "forename"))
  }
}
