package graft

import graft.meta.Metadata
import graft.parse.HtmlParser
import org.scalatest.funsuite.AnyFunSuite

/** Data-driven golden suite mechanically ported from the reference's
  * tests/metadata_tests.py (AST-extracted (html, field, expected) triples in
  * metadata_golden.json — 78 single-arg extract_metadata assertions covering
  * authors, titles, urls, sitenames, licenses, images, descriptions).
  * Failures are aggregated so one miss doesn't hide the rest. */
class MetadataGoldenSpec extends AnyFunSuite {

  private case class Case(fn: String, field: String, html: String,
      kind: String, expected: Option[String])

  private def loadCases(): List[Case] = loadFrom("/metadata_golden.json")
  private def loadJsonLdCases(): List[Case] = loadFrom("/json_metadata_golden.json")

  private def loadFrom(res: String): List[Case] = {
    val raw = new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(
      getClass.getResource(res).toURI)),
      java.nio.charset.StandardCharsets.UTF_8)
    // minimal JSON array-of-objects parse via the kernel's JSON-LD parser
    graft.meta.JsonLd.parse(raw) match {
      case Some(items: List[_]) => items.collect {
        case m: Map[String @unchecked, Any @unchecked] =>
          def s(k: String): Option[String] = m.get(k).collect { case v: String => v }
          Case(s("fn").getOrElse(""), s("field").getOrElse(""), s("html").getOrElse(""),
            s("kind").getOrElse(""), s("expected"))
      }
      case _ => fail("could not parse metadata_golden.json")
    }
  }

  private def runCases(cases: List[Case]): Unit = {
    val failures = cases.flatMap { c =>
      val tree = HtmlParser.loadHtml(c.html)
      val meta = if (tree == null) graft.meta.DocMeta() else Metadata.extractMetadata(tree, null)
      val got: Option[String] = Option(c.field match {
        case "author" => meta.author
        case "title" => meta.title
        case "url" => meta.url
        case "sitename" => meta.sitename
        case "description" => meta.description
        case "license" => meta.license
        case "image" => meta.image
        case "pagetype" => meta.pagetype
        case other => fail(s"unknown field $other")
      })
      val want = if (c.kind == "null") None else c.expected
      if (got == want) None
      else Some(s"${c.fn}/${c.field}: got=$got want=$want html=${c.html.take(90)}")
    }
    assert(failures.isEmpty,
      s"${failures.length}/${cases.length} golden metadata cases fail:\n" +
        failures.take(25).mkString("\n"))
  }

  test("metadata golden cases from metadata_tests.py") {
    val cases = loadCases()
    assert(cases.length >= 70, s"expected >=70 cases, loaded ${cases.length}")
    runCases(cases)
  }

  test("JSON-LD metadata golden cases from json_metadata_tests.py") {
    val cases = loadJsonLdCases()
    assert(cases.length >= 10, s"expected >=10 cases, loaded ${cases.length}")
    runCases(cases)
  }
}
