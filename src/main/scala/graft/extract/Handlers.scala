package graft.extract

import graft.clean.Cleaner
import graft.dom.{Dom, Node}
import graft.text.TextUtils

/** Per-element transform operators (htmlprocessing.py:310-359 +
  * core.py:76-480): rewrite cleaned+converted HTML into the pseudo-TEI
  * vocabulary. All functions build NEW nodes; originals are only retagged
  * (`done`), mirroring the reference's mutation discipline. */
object Handlers {
  private val TagItem = Set("item")

  val FormattingProtected = Set("cell", "head", "hi", "item", "p", "quote", "td")
  val PFormatting = Set("hi", "ref")
  val TableElems = Set("td", "th")
  val TableAll = Set("td", "th", "hi")
  val Formatting = Set("hi", "ref", "span")
  val CodesQuotes = Set("code", "quote")
  val NotAtTheEnd = Set("head", "ref")

  /** TAG_CATALOG (settings.py:75). */
  val TagCatalog = Set("blockquote", "code", "del", "head", "hi", "lb", "list", "p", "pre", "quote")

  /** textfilter (filters.py:117-121). */
  def textFilter(element: Node): Boolean = {
    val testtext = if (element.text == null) element.tail else element.text
    TextUtils.textFilterString(testtext)
  }

  /** handle_textnode (htmlprocessing.py:310-339). */
  def handleTextnode(element: Node, options: ExtractorOptions,
      commentsFix: Boolean = true, preserveSpaces: Boolean = false): Node = {
    if (element.text == null && element.tail == null) return null
    if (!commentsFix && element.tag == "lb") {
      element.tail = TextUtils.trim(element.tail)
      return element
    }
    if (element.text == null) {
      element.text = element.tail
      element.tail = ""
      if (commentsFix && element.tag == "lb") element.tag = "p"
    }
    if (!preserveSpaces) {
      element.text = TextUtils.trim(element.text)
      if (element.tail != null && element.tail.nonEmpty) element.tail = TextUtils.trim(element.tail)
    }
    if (element.text == null || element.text.isEmpty || textFilter(element)) return null
    if (options.dedupOn && Kernel.duplicateTest(element, options)) return null
    element
  }

  /** process_node (htmlprocessing.py:342-359). */
  def processNode(element: Node, options: ExtractorOptions): Node = {
    if (element.tag == "done") return null
    if (element.children.isEmpty && isEmptyStr(element.text) && isEmptyStr(element.tail)) return null
    element.text = TextUtils.trim(element.text)
    element.tail = TextUtils.trim(element.tail)
    if (element.tag != "lb" && isEmptyStr(element.text) && !isEmptyStr(element.tail)) {
      element.text = element.tail
      element.tail = null
    }
    if (!isEmptyStr(element.text) || !isEmptyStr(element.tail)) {
      if (textFilter(element)) return null
      if (options.dedupOn && Kernel.duplicateTest(element, options)) return null
    }
    element
  }

  @inline private def isEmptyStr(s: String): Boolean = s == null || s.isEmpty

  /** handle_titles (core.py:76-99). */
  def handleTitles(element: Node, options: ExtractorOptions): Node = {
    val title: Node =
      if (element.children.isEmpty) processNode(element, options)
      else {
        val t = element.deepCopy
        element.children.toList.foreach { child =>
          val processedChild = handleTextnode(child, options, commentsFix = false)
          if (processedChild != null) t.append(processedChild)
          child.tag = "done"
        }
        t
      }
    if (title != null && TextUtils.textCharsTest(title.itertext.mkString)) title else null
  }

  /** handle_formatting (core.py:102-147). */
  def handleFormatting(element: Node, options: ExtractorOptions): Node = {
    val formatting = processNode(element, options)
    if (element.children.isEmpty && formatting == null) return null
    var parent = element.getparent
    if (parent == null) parent = element.getprevious
    if (parent == null || !FormattingProtected.contains(parent.tag)) {
      val processedElement = Dom.elem("p")
      if (formatting != null) processedElement.insert(0, formatting)
      processedElement
    } else formatting
  }

  /** handle_lists (core.py:150-208). */
  def handleLists(element: Node, options: ExtractorOptions): Node = {
    val processedElement = Dom.elem(element.tag)
    if (element.text != null && element.text.trim.nonEmpty) {
      val newchildelem = Dom.subElement(processedElement, "item")
      newchildelem.text = element.text
    }
    element.iterLazy(TagItem).foreach { child =>
      val newchildelem = Dom.elem("item")
      if (child.children.isEmpty) {
        val processedChild = processNode(child, options)
        if (processedChild != null) {
          newchildelem.text = processedChild.text
          if (processedChild.tail != null && processedChild.tail.trim.nonEmpty)
            newchildelem.text = newchildelem.text + " " + processedChild.tail
          processedElement.append(newchildelem)
        }
      } else {
        newchildelem.text = child.text
        child.iterDescendantsLazy(null).foreach { subelem =>
          if (subelem.tag == "list") {
            val processedSubchild = handleLists(subelem, options)
            if (processedSubchild != null) newchildelem.append(processedSubchild)
          } else {
            val processedSubchild = handleTextnode(subelem, options, commentsFix = false)
            if (processedSubchild != null) {
              val subchildelem = Dom.subElement(newchildelem, processedSubchild.tag)
              subchildelem.text = processedSubchild.text
              subchildelem.tail = processedSubchild.tail
              if (subelem.hasAttrs) subelem.attrs.foreachKV { (k, v) => subchildelem.set(k, v) }
            }
          }
          subelem.tag = "done"
        }
        if (child.tail != null && child.tail.trim.nonEmpty) {
          val kids = newchildelem.children.filter(_.tag != "done")
          if (kids.nonEmpty) {
            val lastSubchild = kids.last
            if (lastSubchild.tail == null || lastSubchild.tail.trim.isEmpty)
              lastSubchild.tail = child.tail
            else lastSubchild.tail = lastSubchild.tail + " " + child.tail
          }
        }
      }
      if ((newchildelem.text != null && newchildelem.text.nonEmpty) || newchildelem.children.nonEmpty) {
        if (child.get("rend") != null) newchildelem.set("rend", child.get("rend"))
        // lxml append moves an already-attached element to the end (no dup)
        processedElement.append(newchildelem)
      }
      child.tag = "done"
    }
    element.tag = "done"
    if (processedElement.children.nonEmpty &&
      TextUtils.textCharsTest(processedElement.itertext.mkString)) {
      if (element.get("rend") != null) processedElement.set("rend", element.get("rend"))
      processedElement
    } else null
  }

  /** get_code_block_element (core.py:211-220). */
  def getCodeBlockElement(element: Node): Node = {
    val parent = element.getparent
    if (parent != null && parent.get("class", "").contains("highlight")) return element
    val code = element.children.find(_.tag == "code").orNull
    if (code != null && element.children.length == 1) return code
    null
  }

  /** handle_code_blocks (core.py:223-230). */
  def handleCodeBlocks(element: Node, code: Node): Node = {
    val processedElement = Dom.elem("code")
    element.iterLazy(null).foreach { child =>
      if (child.tag == "lb") child.text = "\n"
      child.tag = "done"
    }
    processedElement.text = code.itertext.mkString
    processedElement
  }

  /** handle_quotes (core.py:233-250). */
  def handleQuotes(element: Node, options: ExtractorOptions): Node = {
    val code = getCodeBlockElement(element)
    if (code != null) return handleCodeBlocks(element, code)
    val processedElement = Dom.elem(element.tag)
    element.iterLazy(null).foreach { child =>
      val processedChild = processNode(child, options)
      if (processedChild != null) {
        val newsub = Dom.subElement(processedElement, child.tag)
        newsub.text = processedChild.text
        newsub.tail = processedChild.tail
      }
      child.tag = "done"
    }
    if (processedElement.children.nonEmpty &&
      TextUtils.textCharsTest(processedElement.itertext.mkString)) {
      Dom.stripTags(processedElement, "quote")
      processedElement
    } else null
  }

  /** handle_other_elements (core.py:253-276). */
  def handleOtherElements(element: Node, potentialTags: Set[String], options: ExtractorOptions): Node = {
    if (element.tag == "div" && element.get("class", "").contains("w3-code"))
      return handleCodeBlocks(element, element)
    if (!potentialTags.contains(element.tag)) return null
    if (element.tag == "div") {
      val processedElement = handleTextnode(element, options, commentsFix = false)
      if (processedElement != null && TextUtils.textCharsTest(processedElement.text)) {
        processedElement.clearAttrs()
        if (processedElement.tag == "div") processedElement.tag = "p"
        return processedElement
      }
    }
    null
  }

  /** handle_paragraphs (core.py:279-357). */
  def handleParagraphs(element: Node, potentialTags: Set[String], options: ExtractorOptions): Node = {
    element.clearAttrs()
    if (element.children.isEmpty) {
      return processNode(element, options)
    }
    val processedElement = Dom.elem(element.tag)
    // element.iter('*') includes the element itself (core.py:292) — its own
    // text takes the "extra p within p" merge path below.
    element.iterLazy(null).foreach { child =>
      if (!potentialTags.contains(child.tag) && child.tag != "done") {
        // unexpected in p: skipped
      } else {
        val processedChild = handleTextnode(child, options, commentsFix = false, preserveSpaces = true)
        var merged = false
        if (processedChild != null) {
          if (processedChild.tag == "p") {
            // extra p within p (core.py:301-308); `continue` skips the done-mark
            if (processedElement.text != null && processedElement.text.nonEmpty)
              processedElement.text = processedElement.text + " " + processedChild.text
            else processedElement.text = processedChild.text
            merged = true
          } else {
            val newsub = Dom.elem(child.tag)
            if (PFormatting.contains(processedChild.tag)) {
              if (processedChild.children.nonEmpty) {
                processedChild.children.toList.foreach { item =>
                  if (TextUtils.textCharsTest(item.text)) item.text = " " + item.text
                  Dom.stripTags(processedChild, item.tag)
                }
              }
              if (child.tag == "hi") {
                if (child.get("rend") != null) newsub.set("rend", child.get("rend"))
              } else if (child.tag == "ref") {
                if (child.get("target") != null) newsub.set("target", child.get("target"))
              }
            }
            newsub.text = processedChild.text
            newsub.tail = processedChild.tail
            processedElement.append(newsub)
          }
        }
        if (!merged) child.tag = "done"
      }
    }
    if (processedElement.children.nonEmpty) {
      val lastChild = processedElement.children.last
      if (lastChild.tag == "lb" && lastChild.tail == null) processedElement.remove(lastChild)
      return processedElement
    }
    if (processedElement.text != null && processedElement.text.nonEmpty) return processedElement
    null
  }

  /** define_cell_type (core.py:360-366). */
  def defineCellType(element: Node): Node = {
    val cell = Dom.elem("cell")
    if (element.tag == "th") cell.set("role", "head")
    cell
  }

  /** handle_table (core.py:369-422). */
  def handleTable(tableElem: Node, potentialTags: Set[String], options: ExtractorOptions): Node = {
    val newtable = Dom.elem("table")
    var newrow = Dom.elem("row")
    Dom.stripTags(tableElem, "thead", "tbody", "tfoot")
    val it = tableElem.iterDescendantsLazy(null)
    var break = false
    while (!break && it.hasNext) {
      val subelement = it.next()
      if (subelement.tag == "tr") {
        if (newrow.children.nonEmpty) {
          newtable.append(newrow)
          newrow = Dom.elem("row")
        }
      } else if (TableElems.contains(subelement.tag)) {
        val newchildelem = defineCellType(subelement)
        if (subelement.children.isEmpty) {
          val processedCell = processNode(subelement, options)
          if (processedCell != null) {
            newchildelem.text = processedCell.text
            newchildelem.tail = processedCell.tail
          }
        } else {
          newchildelem.text = subelement.text
          newchildelem.tail = subelement.tail
          subelement.tag = "done"
          subelement.iterDescendantsLazy(null).foreach { child =>
            val processedSubchild: Node =
              if (TableAll.contains(child.tag)) {
                if (TableElems.contains(child.tag)) child.tag = "cell"
                handleTextnode(child, options, preserveSpaces = true, commentsFix = true)
              } else {
                handleTextelem(child, potentialTags + "div", options)
              }
            if (processedSubchild != null) {
              val subchildelem = Dom.subElement(newchildelem, processedSubchild.tag)
              subchildelem.text = processedSubchild.text
              subchildelem.tail = processedSubchild.tail
            }
            child.tag = "done"
          }
        }
        if ((newchildelem.text != null && newchildelem.text.nonEmpty) || newchildelem.children.nonEmpty)
          newrow.append(newchildelem)
        subelement.tag = "done"
      } else if (subelement.tag == "table") {
        break = true
      }
      if (!break) subelement.tag = "done"
    }
    if (newrow.children.nonEmpty) newtable.append(newrow)
    if (newtable.children.nonEmpty) newtable else null
  }

  /** handle_image (core.py:425-450). */
  def handleImage(element: Node): Node = {
    val processedElement = Dom.elem(element.tag)
    if (TextUtils.isImageFile(element.get("data-src"))) processedElement.set("src", element.get("data-src"))
    else if (TextUtils.isImageFile(element.get("src"))) processedElement.set("src", element.get("src"))
    else {
      (if (element.hasAttrs) element.attrs.keysList.find(a => a.startsWith("data-src") && TextUtils.isImageFile(element.get(a))) else None)
        .foreach(a => processedElement.set("src", element.get(a)))
    }
    if (element.get("alt") != null) processedElement.set("alt", element.get("alt"))
    if (element.get("title") != null) processedElement.set("title", element.get("title"))
    if (!processedElement.hasAttrs || processedElement.get("src") == null ||
      processedElement.get("src").isEmpty) return null
    val url = processedElement.get("src")
    processedElement.set("src", if (url.startsWith("//")) "http://" + url.substring(2) else url)
    processedElement
  }

  /** handle_textelem dispatcher (core.py:453-480). */
  def handleTextelem(element: Node, potentialTags: Set[String], options: ExtractorOptions): Node = {
    element.tag match {
      case "list" => handleLists(element, options)
      case t if CodesQuotes.contains(t) => handleQuotes(element, options)
      case "head" => handleTitles(element, options)
      case "p" => handleParagraphs(element, potentialTags, options)
      case "lb" =>
        if (TextUtils.textCharsTest(element.tail)) {
          val processed = processNode(element, options)
          if (processed != null) {
            val newElement = Dom.elem("p")
            newElement.text = processed.tail
            newElement
          } else null
        } else null
      case t if Formatting.contains(t) => handleFormatting(element, options)
      case "table" if potentialTags.contains("table") => handleTable(element, potentialTags, options)
      case "graphic" if potentialTags.contains("graphic") => handleImage(element)
      case _ => handleOtherElements(element, potentialTags, options)
    }
  }
}
