package graft.xml

import graft.model.MappingLoader
import graft.sources.XmlSource
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** The reference's biggest golden test (`test/xml/table_test.rb` 'complex
  * xml test'): a COSD BreastRecord through a 3,400-line production mapping,
  * compared against the committed expected-record YAML. Skipped when the
  * reference corpus is absent. */
class ComplexXmlGoldenSpec extends AnyFunSuite {

  private val res = "/root/reference/test/resources"
  private def read(name: String): Option[String] = {
    val p = Paths.get(res, name)
    if (Files.exists(p))
      Some(new String(Files.readAllBytes(p), "UTF-8").stripPrefix("﻿"))
    else None
  }

  test("complex_xml transforms to the committed golden records") {
    assume(read("complex_xml.xml").isDefined)
    val mapping = MappingLoader.loadTable(read("complex_xml_mapping.yml").get)
    assert(mapping.xmlRecordXpath.contains("BreastRecord"))

    val records = XmlSource.splitRecords(read("complex_xml.xml").get,
      "BreastRecord", patternMatch = false)
    assert(records.length == 1)

    val got = records.zipWithIndex.flatMap { case (xml, i) =>
      XmlTable.transformRecord(mapping, scala.xml.XML.loadString(xml), i.toLong)
    }

    // Expected: [ [ [klass, fields(+:rawtext), index], ... ] ] per record.
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(
        new org.yaml.snakeyaml.LoaderOptions))
    val root = yaml.load[java.util.List[Object]](read("complex_xml_transformed.yml").get)
    val expected = root.asScala.flatMap { recBatch =>
      recBatch.asInstanceOf[java.util.List[Object]].asScala.map { triple =>
        val t = triple.asInstanceOf[java.util.List[Object]].asScala
        val klass = String.valueOf(t(0))
        val all = t(1).asInstanceOf[java.util.Map[Object, Object]].asScala
          .map { case (k, v) => String.valueOf(k) -> v }
        val rawtext = all(":rawtext").asInstanceOf[java.util.Map[Object, Object]]
          .asScala.map { case (k, v) => String.valueOf(k) -> String.valueOf(v) }.toMap
        val fields = (all - ":rawtext")
          .map { case (k, v) => k -> String.valueOf(v) }.toMap
        val index = String.valueOf(t(2)).toLong
        (klass, fields, rawtext, index)
      }
    }.toSeq

    assert(got.length == expected.length,
      s"record count: got ${got.length}, expected ${expected.length}\n" +
        s"got klasses: ${got.map(_._1)}\nexp klasses: ${expected.map(_._1)}")

    got.zip(expected).zipWithIndex.foreach {
      case (((gk, gf, gr, gi), (ek, ef, er, ei)), n) =>
        assert(gk == ek, s"record $n klass")
        assert(gi == ei, s"record $n index")
        assert(gr == er, s"record $n ($gk) rawtext:\n" +
          s"only-got: ${gr.toSet.diff(er.toSet)}\nonly-exp: ${er.toSet.diff(gr.toSet)}")
        assert(gf == ef, s"record $n ($gk) fields:\n" +
          s"only-got: ${gf.toSet.diff(ef.toSet)}\nonly-exp: ${ef.toSet.diff(gf.toSet)}")
    }
  }

  test("complex_xml augmented xpaths match the committed golden list") {
    assume(read("complex_xml.xml").isDefined)
    val mapping = MappingLoader.loadTable(read("complex_xml_mapping.yml").get)
    val rec = scala.xml.XML.loadString(XmlSource.splitRecords(
      read("complex_xml.xml").get, "BreastRecord", patternMatch = false).head)
    val (_, augXpaths) = XmlTable.augment(mapping, rec)
    val yaml = new org.yaml.snakeyaml.Yaml(
      new org.yaml.snakeyaml.constructor.SafeConstructor(
        new org.yaml.snakeyaml.LoaderOptions))
    val expected = yaml.load[java.util.List[Object]](
      read("complex_xml_augmented_xpaths.yml").get)
      .asScala.map(String.valueOf(_)).toSeq
    assert(augXpaths.length == expected.length,
      s"xpath count got ${augXpaths.length} vs ${expected.length}\n" +
        s"only-got: ${augXpaths.toSet.diff(expected.toSet)}\n" +
        s"only-exp: ${expected.toSet.diff(augXpaths.toSet)}")
    assert(augXpaths == expected)
  }
}
