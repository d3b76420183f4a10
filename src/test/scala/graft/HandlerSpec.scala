package graft

import graft.dom.{Dom, Node}
import graft.extract.{ExtractorOptions, Handlers, TrafConfig}
import graft.parse.HtmlParser
import org.scalatest.funsuite.AnyFunSuite

/** Function-level handler golden cases (unit_tests.py:735-1053) — the
  * reference asserts intermediate tree structures from handle_lists /
  * handle_table / process_node directly. Trees are built with the XML-like
  * parse (the reference uses etree.fromstring). */
class HandlerSpec extends AnyFunSuite {

  private val opts = ExtractorOptions(config = TrafConfig.Zero)
  private def parse(s: String): Node = HtmlParser.parseXmlLike(s)

  private def shape(n: Node): List[Any] =
    n.iterList(null).map(e => if (e.text != null && e.text.trim.nonEmpty) (e.tag, e.text) else e.tag)

  // ---- process_node tail promotion (unit_tests.py:683-698)

  test("process_node: empty p takes tail as text") {
    val node = parse("<div><p></p>tail</div>").children.head
    graft.extract.Handlers.processNode(node, opts)
    assert(node.text == "tail" && node.tail == null)
  }
  test("process_node: item takes tail") {
    val node = parse("<list><item></item>text in tail</list>").children.head
    Handlers.processNode(node, opts)
    assert(node.text == "text in tail" && node.tail == null)
  }
  test("process_node: lb keeps tail") {
    val node = parse("<p><lb/>tail</p>").children.head
    Handlers.processNode(node, opts)
    assert(node.text == null && node.tail == "tail")
  }
  test("process_node: p with text keeps tail") {
    val node = parse("<div><p>some text</p>tail</div>").children.head
    Handlers.processNode(node, opts)
    assert(node.text == "some text" && node.tail == "tail")
  }

  // ---- handle_lists (unit_tests.py:964-1053)

  test("malformed list with header text (unit_tests.py:967-969)") {
    val r = Handlers.handleLists(parse("<list>Description of the list:<item>List item 1</item><item>List item 2</item><item>List item 3</item></list>"), opts)
    val xml = Dom.toXml(r)
    assert(xml.split("List item").length - 1 == 3)
    assert(xml.contains("Description"))
  }
  test("list item with child (unit_tests.py:1013-1016)") {
    val r = Handlers.handleLists(parse("<list><item><p>text</p></item></list>"), opts)
    assert(shape(r) == List("list", "item", ("p", "text")))
  }
  test("list item with text and child (unit_tests.py:1017-1020)") {
    val r = Handlers.handleLists(parse("<list><item>text1<p>text2</p></item></list>"), opts)
    assert(shape(r) == List("list", ("item", "text1"), ("p", "text2")))
  }
  test("list item with lb (unit_tests.py:1021-1024)") {
    val r = Handlers.handleLists(parse("<list><item>text<lb/>more text</item></list>"), opts)
    assert(shape(r) == List("list", ("item", "text"), "lb"))
  }
  test("list with text outside item (unit_tests.py:1025-1028)") {
    val r = Handlers.handleLists(parse("<list>header<item>text</item></list>"), opts)
    assert(shape(r) == List("list", ("item", "header"), ("item", "text")))
  }
  test("empty list (unit_tests.py:1029-1031)") {
    val r = Handlers.handleLists(parse("<list>   <item>text</item></list>"), opts)
    assert(r.children.length == 1)
  }
  test("list item with tail (unit_tests.py:1032-1034)") {
    val r = Handlers.handleLists(parse("<list><item>text</item>tail</list>"), opts)
    assert(r.children.head.text == "text tail")
  }
  test("list item child and tail (unit_tests.py:1035-1044)") {
    val r1 = Handlers.handleLists(parse("<list><item><p>text</p></item>tail</list>"), opts)
    assert(r1.children.head.children.head.tail == "tail")
    val r2 = Handlers.handleLists(parse("<list><item><p>text</p>tail1</item>tail</list>"), opts)
    assert(r2.children.head.children.head.tail == "tail1 tail")
    val r3 = Handlers.handleLists(parse("<list><item><p>text</p>\n</item>tail</list>"), opts)
    assert(r3.children.head.children.head.tail == "tail")
  }
  test("nested list tail (unit_tests.py:1050-1053)") {
    val r = Handlers.handleLists(parse("<list><item><list><item>text</item></list></item>tail</list>"), opts)
    val target = r.iterList(Set("item")).head.children.find(_.tag == "list")
    assert(target.isDefined && target.get.tail == "tail")
  }

  // ---- handle_table (unit_tests.py:735-957)

  private val catalog = Handlers.TagCatalog

  test("simple cells (unit_tests.py:737-750)") {
    val t = parse("<table><tr><td>cell1</td><td>cell2</td></tr><tr><td>cell3</td><td>cell4</td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(shape(r) == List("table", "row", ("cell", "cell1"), ("cell", "cell2"),
      "row", ("cell", "cell3"), ("cell", "cell4")))
  }
  test("cell with p children (unit_tests.py:753-760)") {
    val t = parse("<table><tr><td><p>text</p><p>more text</p></td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(Dom.toXml(r) == "<table><row><cell><p>text</p><p>more text</p></cell></row></table>")
  }
  test("cell with text and child (unit_tests.py:784-793)") {
    val t = parse("<table><tr><td>text<lb/><p>more text</p></td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(Dom.toXml(r) == "<table><row><cell>text<p>more text</p></cell></row></table>")
  }
  test("th cells get role=head (unit_tests.py:800-823)") {
    val t = parse("<table><tr><th>Month</th><th>Days</th></tr><tr><td>January</td><td>31</td></tr><tr><td>February</td><td>28</td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(r.children.length == 3)
    val first = r.children.head
    assert(first.children.map(c => (c.tag, c.get("role"), c.text)).toList ==
      List(("cell", "head", "Month"), ("cell", "head", "Days")))
  }
  test("cell with hi (unit_tests.py:847-852)") {
    val t = parse("<table><tr><td><hi>highlighted text</hi></td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(Dom.toXml(r.iterList(Set("cell")).head) == "<cell><hi>highlighted text</hi></cell>")
  }
  test("nested table break (unit_tests.py:893-909)") {
    val t = parse("<table><tr><td><table><tr><td>1</td></tr></table></td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(shape(r) == List("table", "row", "cell", ("cell", "1")))
  }
  test("complex nested table (unit_tests.py:910-931)") {
    val t = parse("<table><tr><td><table><tr><td>1</td></tr></table></td><td>text1</td></tr><tr><td>text2</td></tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(shape(r) == List("table", "row", "cell", ("cell", "1"), ("cell", "text1"), "row", ("cell", "text2")))
  }
  test("table with list (unit_tests.py:932-949)") {
    val t = parse("<table><tr><td>\n<p>a list</p>\n<list>\n<item>one</item>\n<item>two</item>\n</list>\n</td>\n</tr></table>")
    val r = Handlers.handleTable(t, catalog, opts)
    assert(shape(r) == List("table", "row", "cell", ("p", "a list"), "list"))
  }
  test("broken table rows (unit_tests.py:950-957)") {
    val r1 = Handlers.handleTable(parse("<table><td>cell1</td><tr><td>cell2</td></tr></table>"), catalog, opts)
    assert(r1.iterList(null).map(_.tag) == List("table", "row", "cell", "row", "cell"))
    val r2 = Handlers.handleTable(parse("<table><tr><p>text</p></tr><tr><td>cell</td></tr></table>"), catalog, opts)
    assert(r2.iterList(null).map(_.tag) == List("table", "row", "cell"))
  }
  test("empty elements return null (unit_tests.py:183-184)") {
    assert(Handlers.handleQuotes(Dom.elem("quote"), opts) == null)
    assert(Handlers.handleTable(Dom.elem("table"), catalog, opts) == null)
  }
  test("p within p merge (unit_tests.py:186-192)") {
    val element = Dom.elem("p")
    val second = Dom.elem("p")
    element.text = "1st part."
    second.text = "2nd part."
    element.append(second)
    element.append(Dom.elem("lb"))
    val converted = Handlers.handleParagraphs(element, Set("p"), opts)
    assert(Dom.toXml(converted) == "<p>1st part. 2nd part.</p>")
  }
  test("formatting tail wrap (unit_tests.py:284-290)") {
    val element = Dom.elem("hi")
    element.text = "Here is the text."
    element.tail = "And a tail."
    val converted = Handlers.handleFormatting(element, opts)
    assert(Dom.toXml(converted) == "<p><hi>Here is the text.</hi>And a tail.</p>")
  }

  // ---- sanitize_tree (unit_tests.py:357-376)

  test("sanitize_tree removes unwanted, keeps table (unit_tests.py:361-367)") {
    val o = opts.copy(tables = true)
    val doc1 = parse("<html><body><footer>Test text</footer></body></html>")
    val (_, _, len1) = graft.extract.Fallbacks.sanitizeTree(doc1, o)
    assert(len1 == 0)
    val doc2 = parse("<html><body><table><th>Test text</th><tr><td>Test</td></tr></table></body></html>")
    val (_, _, len2) = graft.extract.Fallbacks.sanitizeTree(doc2, o)
    assert(len2 > 0)
  }
  test("sanitize_tree strips fancy tags; keeps graphic/ref when asked (unit_tests.py:369-376)") {
    val o = opts.copy(tables = true)
    val doc = parse("<html><body><p>Text here <fancy>Test text</fancy><a href=\"x\">with a link</a>.</p><img src=\"test.jpg\"/></body></html>")
    val (tree1, _, _) = graft.extract.Fallbacks.sanitizeTree(doc, o)
    assert(tree1.iterList(null).count(_.tag == "p") >= 1)
    val doc2 = parse("<html><body><p>Text here <fancy>Test text</fancy><a href=\"x\">with a link</a>.</p><img src=\"test.jpg\"/></body></html>")
    val o2 = o.copy(links = true, images = true)
    val (tree2, _, _) = graft.extract.Fallbacks.sanitizeTree(doc2, o2)
    val tags = tree2.iterList(null).map(_.tag).toSet
    assert(tags.contains("graphic") && tags.contains("ref"), tags)
  }

  // ---- image / link element-level (unit_tests.py:398-402, 424-425)

  test("handle_image attribute selection (unit_tests.py:398-402)") {
    assert(Handlers.handleImage(parse("<img src=\"test.jpg\"/>")) != null)
    assert(Handlers.handleImage(parse("<img data-src=\"test.jpg\" alt=\"text\" title=\"a title\"/>")) != null)
    assert(Handlers.handleImage(parse("<img other=\"test.jpg\"/>")) == null)
    assert(Handlers.handleTextelem(Dom.elem("graphic"), Set.empty, opts) == null)
  }
  test("empty ref handled (unit_tests.py:424-425)") {
    assert(Handlers.handleTextelem(Dom.elem("ref"), Set.empty, opts) == null)
    val a = parse("<a href=\"testlink.html\">Test link text.</a>")
    assert(Handlers.handleFormatting(a, opts) != null)
  }
}
