package graft.model
import org.scalatest.funsuite.AnyFunSuite
import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor
class LoaderDebugSpec extends AnyFunSuite {
  test("snakeyaml direct") {
    val pre = "\n- column: a\n  mappings:\n  - field: c\n    replace:\n      ? \" re (?i)^BOB FOSSIL$\"\n      : \"ROBERT FOSSIL\"\n"
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions))
    val v = yaml.load[Object](pre)
    println("LOADED=" + v)
  }
}
