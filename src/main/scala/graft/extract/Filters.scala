package graft.extract

import graft.dom.Node
import graft.text.TextUtils

import java.util.regex.Pattern

/** Language filtering (filters.py:60-114). The reference delegates document
  * classification to py3langid when installed; our classifier is the same
  * stopword-profile heuristic exposed Spark-side in TextOps.langId, so the
  * behavior is deterministic and dependency-free. */
object Filters {

  private val ReHtmlLang = Pattern.compile("([a-z]{2})")

  /** check_html_lang (filters.py:60-83). */
  def checkHtmlLang(tree: Node, targetLanguage: String, strict: Boolean = false): Boolean = {
    def langMatch(content: String): Boolean =
      ReHtmlLang.split(content.toLowerCase, -1).contains(targetLanguage) ||
        splitKeep(content.toLowerCase).contains(targetLanguage)
    // meta http-equiv=content-language / og:locale
    val metas = tree.iterList(Set("meta"))
    val byEquiv = metas.filter(m => m.get("http-equiv") == "content-language" && m.get("content") != null)
    if (byEquiv.nonEmpty)
      return byEquiv.exists(m => langMatch(m.get("content")))
    val byOg = metas.filter(m => m.get("property") == "og:locale" && m.get("content") != null)
    if (byOg.nonEmpty)
      return byOg.exists(m => langMatch(m.get("content")))
    if (strict) {
      val htmlLang = if (tree.tag == "html") tree.get("lang")
        else tree.iterList(Set("html")).headOption.map(_.get("lang")).orNull
      if (htmlLang != null) return langMatch(htmlLang)
    }
    true
  }

  /** Python re.split keeps captured groups: the two-letter runs themselves. */
  private def splitKeep(s: String): List[String] = {
    val m = ReHtmlLang.matcher(s)
    val out = scala.collection.mutable.ListBuffer.empty[String]
    while (m.find()) out += m.group(1)
    out.toList
  }

  /** language_classifier (filters.py:86-97): the character-n-gram profile
    * classifier (graft.extract.LangId, the py3langid stand-in) decides;
    * the legacy stopword-profile heuristic remains as the fallback for
    * inputs the n-gram model abstains on (and as the SQL-expressible
    * Spark-side oracle in TextOps.langId). */
  def languageClassifier(tempText: String, tempComments: String): String = {
    val text = if (tempText.length > tempComments.length) tempText else tempComments
    val ngram = LangId.detect(text)
    if (ngram != null) return ngram
    stopwordClassifier(text)
  }

  /** Legacy stopword-profile heuristic (kept as LangId's abstain fallback). */
  def stopwordClassifier(text: String): String = {
    val words = text.toLowerCase.split("\\s+")
    def score(set: Set[String]) = words.count(set.contains)
    val scores = List(
      "en" -> score(LangEn), "de" -> score(LangDe), "es" -> score(LangEs),
      "fr" -> score(LangFr), "it" -> score(LangIt), "pl" -> score(LangPl))
    val best = scores.maxBy(_._2)
    if (best._2 > 0) best._1 else null
  }

  /** language_filter (filters.py:100-114): true = drop the document. */
  def languageFilter(tempText: String, tempComments: String, targetLanguage: String): (Boolean, String) = {
    if (targetLanguage == null) return (false, null)
    val detected = languageClassifier(tempText, if (tempComments == null) "" else tempComments)
    if (detected != null && detected != targetLanguage) (true, detected)
    else (false, detected)
  }

  private val LangEn = Set("the", "a", "an", "and", "of", "to", "in", "is", "it",
    "that", "this", "was", "for", "with", "are", "his", "her", "they", "have")
  private val LangDe = Set("der", "die", "das", "und", "ist", "von", "mit", "für",
    "auf", "ein", "eine", "nicht", "sich", "auch", "dass", "werden", "wurde", "bei")
  private val LangEs = Set("el", "la", "los", "las", "de", "que", "es", "en", "un",
    "una", "por", "con", "para", "su", "como", "más", "pero", "fue")
  private val LangFr = Set("le", "la", "les", "de", "des", "et", "est", "une", "dans",
    "que", "qui", "pour", "par", "sur", "avec", "pas", "plus", "sont")
  private val LangIt = Set("il", "lo", "la", "gli", "di", "che", "è", "un", "una",
    "per", "con", "del", "della", "sono", "come", "anche", "più", "nel")
  private val LangPl = Set("i", "w", "na", "z", "do", "się", "jest", "nie", "to",
    "że", "jak", "ale", "po", "od", "za", "tak", "który", "była")
}
