package graft.dom

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

/** Mutable per-document DOM node, modeled on the lxml element semantics the
  * reference engine relies on (text/tail strings, ordered attrs, live
  * sibling/parent links). Built and discarded inside a single Spark task —
  * never crosses a task boundary (see /root/reference docs: utils.py:184-224).
  *
  * Design note: a plain object graph (not int arrays) — documents are bounded
  * by MAX_FILE_SIZE (20 MB) so per-doc allocation is fine; the arena lives for
  * exactly one row of the mapPartitions kernel.
  */
final class Node(var tag: String) {
  var text: String = null
  var tail: String = null
  var parent: Node = null
  val children: ArrayBuffer[Node] = ArrayBuffer.empty
  // insertion-ordered attributes, like lxml's attrib — allocated lazily
  // (most nodes are attribute-less; an eager map table dominates GC churn)
  private var attrs0: mutable.LinkedHashMap[String, String] = null

  def attrs: mutable.LinkedHashMap[String, String] = {
    if (attrs0 == null) attrs0 = mutable.LinkedHashMap.empty
    attrs0
  }
  def get(name: String): String =
    if (attrs0 == null) null else attrs0.getOrElse(name, null)
  def get(name: String, default: String): String =
    if (attrs0 == null) default else attrs0.getOrElse(name, default)
  def set(name: String, value: String): Unit = attrs.put(name, value)
  def has(name: String): Boolean = attrs0 != null && attrs0.contains(name)
  def hasAttrs: Boolean = attrs0 != null && attrs0.nonEmpty
  def clearAttrs(): Unit = attrs0 = null

  /** Index within parent.children — maintained by every mutation so sibling
    * navigation is O(1) (indexOf would make wide-node iteration quadratic,
    * which breaks down on flat documents with 10k+ siblings). */
  var idx: Int = -1

  private def reindexFrom(from: Int): Unit = {
    var i = from
    while (i < children.length) { children(i).idx = i; i += 1 }
  }

  def append(child: Node): Unit = {
    if (child.parent != null) child.parent.remove(child)
    child.parent = this
    child.idx = children.length
    children += child
  }

  def insert(at: Int, child: Node): Unit = {
    if (child.parent != null) child.parent.remove(child)
    child.parent = this
    children.insert(at, child)
    reindexFrom(at)
  }

  /** lxml `parent.remove(child)`: detaches child INCLUDING its tail. */
  def remove(child: Node): Unit = {
    val i = child.idx
    if ((child.parent eq this) && i >= 0 && i < children.length && (children(i) eq child)) {
      children.remove(i)
      reindexFrom(i)
      child.parent = null
      child.idx = -1
    } else {
      val j = children.indexOf(child)
      if (j >= 0) { children.remove(j); reindexFrom(j); child.parent = null; child.idx = -1 }
    }
  }

  def getparent: Node = parent

  def getprevious: Node = {
    if (parent == null) return null
    if (idx > 0) parent.children(idx - 1) else null
  }

  def getnext: Node = {
    if (parent == null) return null
    if (idx >= 0 && idx < parent.children.length - 1) parent.children(idx + 1) else null
  }

  def len: Int = children.length
  def apply(i: Int): Node = children(i)
  def last: Node = children.last
  def nonEmptyChildren: Boolean = children.nonEmpty

  def isAncestorOf(n: Node): Boolean = {
    var p = n.parent
    while (p != null) { if (p eq this) return true; p = p.parent }
    false
  }

  /** True while this node is still attached under `root`. */
  def attachedTo(root: Node): Boolean = (this eq root) || root.isAncestorOf(this)

  // ---------------------------------------------------------------- iteration

  /** Lazy pre-order walk including self (lxml `iter`): the tag filter is
    * checked at visit time, so retagging during iteration (the reference's
    * `tag = 'done'` idiom, core.py:96,186,200…) skips nodes exactly like lxml.
    */
  def iterLazy(tags: Set[String] = null): Iterator[Node] = new Iterator[Node] {
    private var nextNode: Node = null
    private var cur: Node = Node.this
    private var started = false
    private def advanceFrom(n: Node): Node = {
      // next in document order restricted to the subtree rooted at Node.this
      if (n.children.nonEmpty) return n.children(0)
      var m = n
      while (m ne null) {
        if (m eq Node.this) return null
        val nx = m.getnext
        if (nx != null) return nx
        m = m.parent
      }
      null
    }
    private def seek(): Unit = {
      while (cur != null && tags != null && !tags.contains(cur.tag)) cur = advanceFrom(cur)
      nextNode = cur
    }
    override def hasNext: Boolean = {
      if (!started) { started = true; seek() }
      nextNode != null
    }
    override def next(): Node = {
      if (!hasNext) throw new NoSuchElementException
      val r = nextNode
      cur = advanceFrom(r)
      seek()
      r
    }
  }

  /** Lazy pre-order walk excluding self (lxml `iterdescendants`). */
  def iterDescendantsLazy(tags: Set[String] = null): Iterator[Node] =
    iterLazy(null).drop(1).filter(n => tags == null || tags.contains(n.tag))

  /** Snapshot pre-order list including self. */
  def iterList(tags: Set[String] = null): List[Node] = {
    val buf = ArrayBuffer.empty[Node]
    def walk(n: Node): Unit = { buf += n; n.children.foreach(walk) }
    walk(this)
    val l = buf.toList
    if (tags == null) l else l.filter(n => tags.contains(n.tag))
  }

  /** Snapshot of strict descendants (lxml descendant axis). */
  def descendants(tags: Set[String] = null): List[Node] = iterList(tags) match {
    case l if tags == null => l.tail
    case l                 => l.filterNot(_ eq this)
  }

  /** First strict descendant with the tag, document order (lxml `find('.//t')`). */
  def findDescendant(tag: String): Node = {
    val it = iterLazy(Set(tag))
    // iterLazy includes self; `find` searches descendants only
    while (it.hasNext) { val n = it.next(); if (n ne this) return n }
    null
  }

  // -------------------------------------------------------------------- text

  /** lxml `itertext()`: all text and tail strings in document order (root tail
    * excluded). */
  def itertext: List[String] = {
    val buf = ArrayBuffer.empty[String]
    def walk(n: Node): Unit = {
      if (n.text != null) buf += n.text
      n.children.foreach { c => walk(c); if (c.tail != null) buf += c.tail }
    }
    walk(this)
    buf.toList
  }

  /** lxml `text_content()`: concatenation of all text nodes. */
  def textContent: String = {
    val sb = new java.lang.StringBuilder
    def walk(n: Node): Unit = {
      if (n.text != null) sb.append(n.text)
      n.children.foreach { c => walk(c); if (c.tail != null) sb.append(c.tail) }
    }
    walk(this)
    sb.toString
  }

  // ------------------------------------------------------------------ copies

  def deepCopy: Node = {
    val n = new Node(tag)
    n.text = text; n.tail = tail
    if (attrs0 != null && attrs0.nonEmpty) n.attrs0 = mutable.LinkedHashMap(attrs0.toSeq: _*)
    children.foreach { c =>
      val cc = c.deepCopy; cc.parent = n; cc.idx = n.children.length; n.children += cc
    }
    n
  }

  override def toString: String = s"<$tag>"
}

object Dom {

  def elem(tag: String): Node = new Node(tag)

  def subElement(parent: Node, tag: String): Node = {
    val n = new Node(tag); parent.append(n); n
  }

  /** lxml.html `drop_tree()`: remove element + subtree, PRESERVING its tail by
    * joining it to the previous sibling's tail or the parent's text
    * (htmlprocessing.py:79-83 relies on this). */
  def dropTree(element: Node): Unit = {
    val parent = element.parent
    if (parent == null) return
    if (element.tail != null && element.tail.nonEmpty) {
      val prev = element.getprevious
      if (prev != null) prev.tail = if (prev.tail == null) element.tail else prev.tail + element.tail
      else parent.text = if (parent.text == null) element.tail else parent.text + element.tail
    }
    parent.remove(element)
  }

  /** lxml.etree `strip_elements(tree, *tags)` with default with_tail=True:
    * delete matching descendants entirely, tails included (core.py:601). */
  def stripElements(root: Node, tags: String*): Unit = {
    val tagSet = tags.toSet
    root.descendants(tagSet).foreach { n =>
      if (n.parent != null) n.parent.remove(n)
    }
  }

  /** lxml.etree `strip_tags(tree, *tags)`: delete matching descendant elements
    * but graft their children and text into the parent in place. Text joins
    * are direct concatenation (libxml2 merges adjacent text nodes).
    * Single-pass rebuild per parent with StringBuilder text sinks — naive
    * splicing is quadratic on wide nodes (60k stripped siblings -> minutes). */
  def stripTags(root: Node, tags: String*): Unit = {
    val tagSet = tags.toSet
    def process(n: Node): Unit = {
      // bottom-up so nested matching tags are already unwrapped
      n.children.foreach(process)
      if (!n.children.exists(c => tagSet.contains(c.tag))) return
      val newBuf = new ArrayBuffer[Node](n.children.length)
      // active text sink: parent text while newBuf empty, else last node tail
      var sb: java.lang.StringBuilder = null
      var sinkNode: Node = null // null -> parent text
      def openSink(): Unit = {
        if (sb == null) {
          sb = new java.lang.StringBuilder
          if (sinkNode == null) { if (n.text != null) sb.append(n.text) }
          else if (sinkNode.tail != null) sb.append(sinkNode.tail)
        }
      }
      def flushSink(): Unit = {
        if (sb != null) {
          val t = sb.toString
          val v = if (t.isEmpty) null else t
          if (sinkNode == null) n.text = v else sinkNode.tail = v
          sb = null
        }
      }
      def addNode(c: Node): Unit = {
        flushSink()
        newBuf += c
        c.parent = n
        sinkNode = c
      }
      def addText(t: String): Unit = {
        if (t != null && t.nonEmpty) { openSink(); sb.append(t) }
      }
      n.children.foreach { c =>
        if (tagSet.contains(c.tag)) {
          addText(c.text)
          c.children.foreach(addNode)
          c.children.clear()
          c.parent = null
          c.idx = -1
          addText(c.tail)
        } else addNode(c)
      }
      flushSink()
      n.children.clear()
      n.children ++= newBuf
      var i = 0
      while (i < n.children.length) { n.children(i).idx = i; i += 1 }
    }
    process(root)
  }

  /** Serialize a subtree to XML-ish markup (tests/debug; spans are the real
    * output surface). */
  def toXml(n: Node): String = {
    val sb = new StringBuilder
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    def walk(x: Node): Unit = {
      sb.append('<').append(x.tag)
      if (x.hasAttrs) x.attrs.foreach { case (k, v) => sb.append(' ').append(k).append("=\"").append(esc(v).replace("\"", "&quot;")).append('"') }
      if (x.text == null && x.children.isEmpty) sb.append("/>")
      else {
        sb.append('>')
        if (x.text != null) sb.append(esc(x.text))
        x.children.foreach { c => walk(c); if (c.tail != null) sb.append(esc(c.tail)) }
        sb.append("</").append(x.tag).append('>')
      }
    }
    walk(n)
    sb.toString
  }
}
