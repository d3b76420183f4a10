package graft

import graft.extract.{Filters, LangId}
import org.scalatest.funsuite.AnyFunSuite

/** Character-n-gram language identifier (LangId) + its wiring into the
  * kernel's language_filter contract. */
class LangIdSpec extends AnyFunSuite {

  private val samples = Seq(
    "en" -> "The committee said that it would publish the report in the coming weeks and that all of the findings were available to the public.",
    "de" -> "Der Ausschuss erklärte, dass der Bericht in den kommenden Wochen veröffentlicht wird und dass alle Ergebnisse für die Öffentlichkeit zugänglich sind.",
    "fr" -> "Le comité a déclaré que le rapport serait publié dans les prochaines semaines et que tous les résultats seraient accessibles au public.",
    "es" -> "El comité declaró que el informe se publicará en las próximas semanas y que todos los resultados estarán disponibles para el público.",
    "it" -> "Il comitato ha dichiarato che il rapporto sarà pubblicato nelle prossime settimane e che tutti i risultati saranno disponibili al pubblico.",
    "pt" -> "O comitê declarou que o relatório será publicado nas próximas semanas e que todos os resultados estarão disponíveis para o público.",
    "nl" -> "De commissie verklaarde dat het rapport in de komende weken zal worden gepubliceerd en dat alle resultaten voor het publiek beschikbaar zijn.",
    "pl" -> "Komisja oświadczyła, że raport zostanie opublikowany w nadchodzących tygodniach i że wszystkie wyniki będą dostępne dla społeczeństwa.",
    "cs" -> "Výbor prohlásil, že zpráva bude zveřejněna v nadcházejících týdnech a že všechny výsledky budou k dispozici veřejnosti.",
    "tr" -> "Komite, raporun önümüzdeki haftalarda yayınlanacağını ve tüm sonuçların kamuya açık olacağını açıkladı.",
    "hu" -> "A bizottság közölte, hogy a jelentést a következő hetekben teszik közzé, és hogy az összes eredmény elérhető lesz a nyilvánosság számára.",
    "sv" -> "Kommittén sade att rapporten kommer att publiceras under de kommande veckorna och att alla resultat kommer att vara tillgängliga för allmänheten.",
    "da" -> "Udvalget meddelte, at rapporten vil blive offentliggjort i de kommende uger, og at alle resultater vil være tilgængelige for offentligheden.",
    "nb" -> "Utvalget meddelte at rapporten vil bli offentliggjort i de kommende ukene, og at alle resultater vil være tilgjengelige for offentligheten.")

  test("Latin-script languages identified by trigram profiles") {
    samples.foreach { case (lang, text) =>
      assert(LangId.detect(text) == lang, s"expected $lang for: ${text.take(40)}")
    }
  }

  test("non-Latin scripts identified by code-point ranges") {
    assert(LangId.detect("Комитет заявил, что отчет будет опубликован в ближайшие недели.") == "ru")
    assert(LangId.detect("Η επιτροπή δήλωσε ότι η έκθεση θα δημοσιευθεί τις επόμενες εβδομάδες.") == "el")
    assert(LangId.detect("위원회는 보고서가 몇 주 안에 공개될 것이라고 밝혔다.") == "ko")
    assert(LangId.detect("委員会は報告書が数週間以内に公開されると述べました。") == "ja")
    assert(LangId.detect("委员会表示报告将在未来几周内公布所有结果都向公众开放。") == "zh")
    assert(LangId.detect("وقالت اللجنة إن التقرير سينشر في الأسابيع المقبلة.") == "ar")
  }

  test("margin gate abstains on unprofiled Latin-script languages") {
    // ro/fi are OUTSIDE the 14 profiles: they score moderately against
    // several near-neighbor profiles at once, so the runner-up margin gate
    // abstains instead of confidently mislabeling (ADVICE r3) — the
    // stopword fallback then gets the final say in languageClassifier
    assert(LangId.detect("Comitetul a declarat că raportul va fi publicat în săptămânile următoare și că toate rezultatele vor fi disponibile publicului.") == null)
    assert(LangId.detect("Komitea ilmoitti, että raportti julkaistaan tulevina viikkoina ja että kaikki tulokset ovat yleisön saatavilla.") == null)
  }

  test("da/nb dialect pair resolved by the disjoint-trigram tie-break") {
    // the shared function-word mass makes the margin unreachable for this
    // pair (and can rank the wrong member first); the contrastive second
    // pass decides on the orthographic discriminators (af/av, blev/ble,
    // op/opp, efter/etter, ud/ut, uger/uker)
    assert(LangId.detect("Han sagde, at han ikke kunne komme til byen i dag, fordi vejret var blevet meget værre op ad dagen, og at de andre også ville blive hjemme.") == "da")
    assert(LangId.detect("Han sa at han ikke kunne komme til byen i dag fordi været hadde blitt mye verre utover dagen, og at de andre også ville bli hjemme.") == "nb")
    assert(LangId.detect("Regeringen har besluttet at afsætte flere penge til de mindre skoler ude på landet, så børnene ikke skal rejse så langt hver dag.") == "da")
    assert(LangId.detect("Regjeringen har besluttet å sette av mer penger til de mindre skolene ute på landet, slik at barna ikke skal reise så langt hver dag.") == "nb")
  }

  test("abstains on empty / numeric input, falls back in languageClassifier") {
    assert(LangId.detect("") == null)
    assert(LangId.detect("12345 67890 ---") == null)
    // kernel contract: language_filter drops a doc whose detected language
    // differs from the target, keeps matching ones
    val (dropDe, detected) = Filters.languageFilter(samples.head._2, "", "de")
    assert(dropDe && detected == "en")
    val (keepEn, _) = Filters.languageFilter(samples.head._2, "", "en")
    assert(!keepEn)
  }
}
