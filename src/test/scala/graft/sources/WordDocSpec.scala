package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Legacy .doc extraction vs the reference fixture (`test/file/word_test.rb`
  * expects exactly 'Hello world, this is a word document'). */
class WordDocSpec extends AnyFunSuite {
  private def fixture(name: String): Option[Array[Byte]] = {
    val p = Paths.get("/root/reference/test/resources", name)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  test("hello_world.doc extracts the reference's expected text") {
    assume(fixture("hello_world.doc").isDefined)
    assert(BinaryDecode.extractWordText(fixture("hello_world.doc").get) ==
      "Hello world, this is a word document")
  }
}
