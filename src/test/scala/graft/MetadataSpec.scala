package graft

import graft.meta.{JsonLd, Metadata}
import graft.parse.HtmlParser
import org.scalatest.funsuite.AnyFunSuite

/** Metadata golden cases ported from tests/metadata_tests.py (cited). */
class MetadataSpec extends AnyFunSuite {

  private def meta(html: String, defaultUrl: String = null,
      blacklist: Set[String] = Set.empty) =
    Metadata.extractMetadata(HtmlParser.loadHtml(html), defaultUrl, authorBlacklist = blacklist)

  // ---- titles (metadata_tests.py:24-51)

  test("title too short/empty rejected") {
    assert(meta("<html><body><h3 class=\"title\">T</h3><h3 id=\"title\"></h3></body></html>").title == null)
  }
  test("title tag") {
    assert(meta("<html><head><title>Test Title</title></head><body></body></html>").title == "Test Title")
  }
  test("two h1: first") {
    assert(meta("<html><body><h1>First</h1><h1>Second</h1></body></html>").title == "First")
  }
  test("post-title div") {
    assert(meta("<html><body><h1>   </h1><div class=\"post-title\">Test Title</div></body></html>").title == "Test Title")
  }
  test("article-title beats block-title") {
    assert(meta("<html><body><h2 class=\"block-title\">Main menu</h2><h1 class=\"article-title\">Test Title</h1></body></html>").title == "Test Title")
  }
  test("h1 singleton beats h2") {
    assert(meta("<html><body><h2>First</h2><h1>Second</h1></body></html>").title == "Second")
    assert(meta("<html><body><h2>First</h2><h2>Second</h2></body></html>").title == "First")
  }
  test("JSON-LD article name (metadata_tests.py:42-46)") {
    val h = """<html><body><script type="application/ld+json">{"@context":"https:\/\/schema.org","@type":"Article","name":"Semantic satiation","url":"https:\/\/en.wikipedia.org\/wiki\/Semantic_satiation","author":{"@type":"Organization","name":"Contributors to Wikimedia projects"},"publisher":{"@type":"Organization","name":"Wikimedia Foundation, Inc.","logo":{"@type":"ImageObject","url":"https:\/\/www.wikimedia.org\/static\/images\/wmf-hor-googpub.png"}},"datePublished":"2006-07-12T09:27:14Z","dateModified":"2020-08-31T23:55:26Z","headline":"psychological phenomenon in which repetition causes a word to temporarily lose meaning for the listener"}</script></body></html>"""
    assert(meta(h).title == "Semantic satiation")
  }
  test("title separators") {
    assert(meta("<html><head><title> - Home</title></head><body/></html>").title == "- Home")
    assert(meta("<html><head><title>My Title » My Website</title></head><body/></html>").title == "My Title")
  }

  // ---- authors (metadata_tests.py:53-158)

  test("normalize_authors basics") {
    assert(Metadata.normalizeAuthors(null, "abc") == "Abc")
    assert(Metadata.normalizeAuthors(null, "Steve Steve 123") == "Steve Steve")
    assert(Metadata.normalizeAuthors(null, "By Steve Steve") == "Steve Steve")
    assert(JsonLd.normalizeJson("Test \\nthis") == "Test this")
    assert(JsonLd.normalizeJson("Seán Federico O'Murchú") == "Seán Federico O'Murchú")
  }
  test("meta author variants") {
    assert(meta("<html><head><meta itemprop=\"author\" content=\"Jenny Smith\"/></head><body></body></html>").author == "Jenny Smith")
    assert(meta("<html><head><meta itemprop=\"author\" content=\"Jenny Smith\"/></head><body></body></html>",
      blacklist = Set("Jenny Smith")).author == null)
    assert(meta("<html><head><meta itemprop=\"author\" content=\"Jenny Smith\"/><meta itemprop=\"author\" content=\"John Smith\"/></head><body></body></html>").author == "Jenny Smith; John Smith")
    assert(meta("<html><head><meta itemprop=\"author\" content=\"Jenny Smith und John Smith\"/></head><body></body></html>").author == "Jenny Smith; John Smith")
    assert(meta("<html><head><meta name=\"author\" content=\"Jenny Smith and John Smith\"/></head><body></body></html>").author == "Jenny Smith; John Smith")
    assert(meta("<html><head><meta name=\"author\" content=\"Hank O&#39;Hop\"/></head><body></body></html>").author == "Hank O'Hop")
    assert(meta("<html><head><meta name=\"author\" content=\"Jenny Smith ❤️\"/></head><body></body></html>").author == "Jenny Smith")
    assert(meta("<html><head><meta name=\"citation_author\" content=\"Jenny Smith and John Smith\"/></head><body></body></html>").author == "Jenny Smith; John Smith")
    assert(meta("<html><head><meta property=\"author\" content=\"Jenny Smith\"/><meta property=\"author\" content=\"John Smith\"/></head><body></body></html>").author == "Jenny Smith; John Smith")
  }
  test("dom author variants") {
    assert(meta("<html><body><a href=\"\" rel=\"author\">Jenny Smith</a></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><a href=\"\" rel=\"author\">Jenny \"The Author\" Smith</a></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><span class=\"author\">Jenny Smith</span></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><h4 class=\"author\">Jenny Smith — Trafilatura</h4></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><span class=\"wrapper--detail__writer\">Jenny Smith</span></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><span id=\"author-name\">Jenny Smith</span></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><figure data-component=\"Figure\"><div class=\"author\">Jenny Smith</div></figure></body></html>").author == null)
    assert(meta("<html><body><div class=\"sidebar\"><div class=\"author\">Jenny Smith</div></div></body></html>").author == null)
    assert(meta("<html><body><div class=\"quote\"><p>My quote here</p><p class=\"quote-author\"><span>—</span> Jenny Smith</p></div></body></html>").author == null)
    assert(meta("<html><body><a class=\"author\">Jenny Smith</a></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><a class=\"author\">Jenny Smith from Trafilatura</a></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><a class=\"username\">Jenny Smith</a></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><div class=\"submitted-by\"><a>Jenny Smith</a></div></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><div class=\"byline-content\"><div class=\"byline\"><a>Jenny Smith</a></div><time>July 12, 2021 08:05</time></div></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><h3 itemprop=\"author\">Jenny Smith</h3></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><div data-component=\"Byline\">Jenny Smith</div></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><span id=\"author\">Jenny Smith – The Moon</span></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><span id=\"author\">Jenny_Smith</span></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><address class=\"author\">Jenny Smith</address></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><author>Jenny Smith</author></body></html>").author == "Jenny Smith")
  }
  test("multi-author itemprop list (metadata_tests.py:137-138)") {
    assert(meta("<html><body><span itemprop=\"author name\">Shannon Deery, Mitch Clarke, Susie O’Brien, Laura Placella, Kara Irving, Jordy Atkinson, Suzan Delibasic</span></body></html>").author ==
      "Shannon Deery; Mitch Clarke; Susie O’Brien; Laura Placella; Kara Irving; Jordy Atkinson; Suzan Delibasic")
  }
  test("og:author with escaped html (metadata_tests.py:143-144)") {
    val h = "<html><head><meta data-rh=\"true\" property=\"og:author\" content=\"By &lt;a href=&quot;/profiles/amir-vera&quot;&gt;Amir Vera&lt;/a&gt;, Seán Federico O&#x27;Murchú, &lt;a href=&quot;/profiles/tara-subramaniam&quot;&gt;Tara Subramaniam&lt;/a&gt; and Adam Renton, CNN\"/></head><body></body></html>"
    assert(meta(h).author == "Amir Vera; Seán Federico O'Murchú; Tara Subramaniam; Adam Renton; CNN")
  }
  test("author with twitter handle + time (metadata_tests.py:145-146)") {
    val h = "<html><body><div class=\"author\"><span class=\"profile__name\"> Jenny Smith </span> <a href=\"https://twitter.com/jenny_smith\" class=\"profile__social\" target=\"_blank\"> @jenny_smith </a> <span class=\"profile__extra lg:hidden\"> 11:57AM </span> </div></body></html>"
    assert(meta(h).author == "Jenny Smith")
  }
  test("byline with By prefix (metadata_tests.py:147-152)") {
    assert(meta("<html><body><p class=\"author-section byline-plain\">By <a class=\"author\" rel=\"nofollow\">Jenny Smith For Daily Mail Australia</a></p></body></html>").author == "Jenny Smith")
    assert(meta("<html><body><div class=\"o-Attribution__a-Author\"><span class=\"o-Attribution__a-Author--Label\">By:</span><span class=\"o-Attribution__a-Author--Prefix\"><span class=\"o-Attribution__a-Name\"><a href=\"//web.archive.org/web/20210707074846/https://www.discovery.com/profiles/ian-shive\">Ian Shive</a></span></span></div></body></html>").author == "Ian Shive")
    assert(meta("<html><body><div class=\"ArticlePage-authors\"><div class=\"ArticlePage-authorName\" itemprop=\"name\"><span class=\"ArticlePage-authorBy\">By&nbsp;</span><a aria-label=\"Ben Coxworth\" href=\"https://newatlas.com/author/ben-coxworth/\"><span>Ben Coxworth</span></a></div></div></body></html>").author == "Ben Coxworth")
  }
  test("check_authors blacklist (metadata_tests.py:154-157)") {
    assert(Metadata.checkAuthors("a; B; c; d", Set("A", "b")) == "c; d")
    assert(Metadata.checkAuthors("a;B;c;d", Set("A", "b")) == "c; d")
  }

  // ---- url (metadata_tests.py:160-173)

  test("url extraction variants") {
    assert(meta("<html><head><meta property=\"og:url\" content=\"https://example.org\"/></head><body></body></html>").url == "https://example.org")
    assert(meta("<html><head><link rel=\"canonical\" href=\"https://example.org\"/></head><body></body></html>").url == "https://example.org")
    assert(meta("<html><head><meta name=\"twitter:url\" content=\"https://example.org\"/></head><body></body></html>").url == "https://example.org")
    assert(meta("<html><head><link rel=\"alternate\" hreflang=\"x-default\" href=\"https://example.org\"/></head><body></body></html>").url == "https://example.org")
    assert(meta("<html><head><link rel=\"canonical\" href=\"/article/medical-record\"/></head><body></body></html>",
      defaultUrl = "https://example.org").url == "https://example.org")
    val tree = HtmlParser.loadHtml("<html><head><link rel=\"canonical\" href=\"/article/medical-record\"/><meta name=\"twitter:url\" content=\"https://example.org\"/></head><body></body></html>")
    assert(Metadata.extractUrl(tree, null) == "https://example.org/article/medical-record")
  }

  // ---- descriptions (metadata_tests.py:176-181)

  test("descriptions") {
    assert(meta("<html><head><meta itemprop=\"description\" content=\"Description\"/></head><body></body></html>").description == "Description")
    assert(meta("<html><head><meta property=\"og:description\" content=\"&amp;#13; A Northern Territory action plan, which includes plans to support development and employment on Aboriginal land, has received an update. &amp;#13...\" /></head><body></body></html>").description ==
      "A Northern Territory action plan, which includes plans to support development and employment on Aboriginal land, has received an update. ...")
  }

  // ---- dates (metadata_tests.py:184-191)

  test("dates from meta and url") {
    assert(meta("<html><head><meta property=\"og:published_time\" content=\"2017-09-01\"/></head><body></body></html>").date == "2017-09-01")
    assert(meta("<html><head><meta property=\"og:url\" content=\"https://example.org/2017/09/01/content.html\"/></head><body></body></html>").date == "2017-09-01")
  }

  // ---- sitename (metadata_tests.py:199-208)

  test("sitename") {
    assert(meta("<html><head><meta name=\"article:publisher\" content=\"@\"/></head><body/></html>").sitename == null)
    assert(meta("<html><head><meta name=\"article:publisher\" content=\"The Newspaper\"/></head><body/></html>").sitename == "The Newspaper")
    assert(meta("<html><head><meta property=\"article:publisher\" content=\"The Newspaper\"/></head><body/></html>").sitename == "The Newspaper")
    assert(meta("<html><head><title>sitemaps.org - Home</title></head><body/></html>").sitename == "sitemaps.org")
  }

  // ---- meta elements (metadata_tests.py:210-233)

  test("open graph full set") {
    val m = meta("<html><head><meta property=\"og:title\" content=\"Open Graph Title\"/><meta property=\"og:author\" content=\"Jenny Smith\"/><meta property=\"og:description\" content=\"This is an Open Graph description\"/><meta property=\"og:site_name\" content=\"My first site\"/><meta property=\"og:url\" content=\"https://example.org/test\"/><meta property=\"og:type\" content=\"Open Graph Type\"/></head><body><a rel=\"license\" href=\"https://creativecommons.org/\">Creative Commons</a></body></html>")
    assert(m.pagetype == "Open Graph Type")
    assert(m.title == "Open Graph Title")
    assert(m.author == "Jenny Smith")
    assert(m.description == "This is an Open Graph description")
    assert(m.sitename == "My first site")
    assert(m.url == "https://example.org/test")
    assert(m.license == "Creative Commons")
  }
  test("dublin core") {
    val m = meta("<html><head><meta name=\"dc.title\" content=\"Open Graph Title\"/><meta name=\"dc.creator\" content=\"Jenny Smith\"/><meta name=\"dc.description\" content=\"This is an Open Graph description\"/></head><body></body></html>")
    assert(m.title == "Open Graph Title")
    assert(m.author == "Jenny Smith")
    assert(m.description == "This is an Open Graph description")
  }
  test("itemprop headline") {
    assert(meta("<html><head><meta itemprop=\"headline\" content=\"Title\"/></head><body></body></html>").title == "Title")
  }
  test("title truncation (metadata_tests.py:230-231)") {
    val m = meta("<html><head><title>" + "AAA" * 10000 + "</title></head><body/></html>")
    assert(m.title != null && m.title.endsWith("…") && m.title.length == 10000)
  }

  // ---- categories and tags (metadata_tests.py:236-242)

  test("categories and tags") {
    assert(meta("<html><body><p class=\"entry-categories\"><a href=\"https://example.org/category/cat1/\">Cat1</a>, <a href=\"https://example.org/category/cat2/\">Cat2</a></p></body></html>").categories == List("Cat1", "Cat2"))
    assert(meta("<html><body><div class=\"postmeta\"><a href=\"https://example.org/category/cat1/\">Cat1</a></div></body></html>").categories == List("Cat1"))
    assert(meta("<html><body><p class=\"entry-tags\"><a href=\"https://example.org/tags/tag1/\">Tag1</a>, <a href=\"https://example.org/tags/tag2/\">Tag2</a></p></body></html>").tags == List("Tag1", "Tag2"))
  }

  test("extensive date search: free-text dates as the last-resort fallback") {
    import graft.parse.HtmlParser
    def dateOf(html: String): String =
      graft.meta.Metadata.extractMetadata(HtmlParser.loadHtml(html), null).date
    assert(dateOf("<html><body><p>Posted on January 12, 2023 by staff</p></body></html>") == "2023-01-12")
    assert(dateOf("<html><body><p>Veröffentlicht am 3. Oktober 2019</p></body></html>") == "2019-10-03")
    assert(dateOf("<html><body><p>Publié le 7 juillet 2021</p></body></html>") == "2021-07-07")
    assert(dateOf("<html><body><p>Updated 2020-11-05 10:33</p></body></html>") == "2020-11-05")
    assert(dateOf("<html><body><p>Stand: 24.12.2018</p></body></html>") == "2018-12-24")
    // meta date still wins over free text
    assert(dateOf("<html><head><meta property=\"article:published_time\" content=\"2017-06-01\"/></head><body><p>January 12, 2023</p></body></html>") == "2017-06-01")
    // script timestamps and implausible values are not dates
    assert(dateOf("<html><body><script>var t='2023/10/05';</script><p>no date here</p></body></html>") == null)
    assert(dateOf("<html><body><p>version 3.10.1988 of 99.99.2023</p></body></html>") == null)
    // slashed dates are ambiguous (EU D/M/Y vs US M/D/Y): accepted only when
    // exactly one reading is valid or the two agree (ADVICE r3)
    assert(dateOf("<html><body><p>Posted 15/04/2024</p></body></html>") == "2024-04-15")
    assert(dateOf("<html><body><p>Posted 04/15/2024</p></body></html>") == "2024-04-15")
    assert(dateOf("<html><body><p>Posted 03/04/2024</p></body></html>") == null)
    assert(dateOf("<html><body><p>Posted 05/05/2024</p></body></html>") == "2024-05-05")
    // dotted stays day-first (European convention, htmldate's reading)
    assert(dateOf("<html><body><p>Posted 03.04.2024</p></body></html>") == "2024-04-03")
    // the TAIL after a script/style is rendered document text and DOES scan
    // (only the machine-timestamp body is skipped)
    assert(dateOf("<html><body><script>var x=1;</script>Published 2021-05-04<p>article</p></body></html>") == "2021-05-04")
    // document order: an element's subtree precedes its tail
    assert(dateOf("<html><body><div><p>First on 2020-01-02</p></div>seen again 2019-03-04</body></html>") == "2020-01-02")
  }
}
