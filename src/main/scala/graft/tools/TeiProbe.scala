package graft.tools
import graft.dom.Dom
import graft.parse.HtmlParser
object TeiProbe {
  def run(xml: String): Unit = {
    val doc = HtmlParser.parseXmlLike(xml)
    val cleaned = graft.out.Tei.checkTei(doc, "fake_url")
    val div = cleaned.iterLazy(Set("div")).toList.headOption.orNull
    val tags = if (div == null) Nil else div.iterList(null).map(_.tag)
    val body = cleaned.iterLazy(Set("body")).toList.headOption.orNull
    println("TAGS " + tags.mkString(",") + " | BODY " + (if (body == null) "-" else Dom.toXml(body)))
  }
  def main(args: Array[String]): Unit = {
    run("<TEI><text><body><div><div><p>text1</p></div><p>text2</p></div></body></text></TEI>")
    run("<TEI><text><body><div><div/><list><item>text</item></list></div></body></text></TEI>")
    run("<TEI><text><body><div><p>text1</p><div/><div/><p>text2</p></div></body></text></TEI>")
    run("<TEI><text><body><div><div/><lb/>tail</div></body></text></TEI>")
  }
}
