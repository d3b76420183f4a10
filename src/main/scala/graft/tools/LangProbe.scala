package graft.tools

import graft.extract.LangId

/** Print detect() + top profile scores for a battery of sample sentences —
  * margin-gate tuning evidence (da/nb separation, ro/fi abstention). */
object LangProbe {
  def main(args: Array[String]): Unit = {
    val samples = Seq(
      "da" -> "Udvalget meddelte, at rapporten vil blive offentliggjort i de kommende uger, og at alle resultater vil være tilgængelige for offentligheden.",
      "nb" -> "Utvalget meddelte at rapporten vil bli offentliggjort i de kommende ukene, og at alle resultater vil være tilgjengelige for offentligheten.",
      "sv" -> "Kommittén sade att rapporten kommer att publiceras under de kommande veckorna och att alla resultat kommer att vara tillgängliga för allmänheten.",
      "ro" -> "Comitetul a declarat că raportul va fi publicat în săptămânile următoare și că toate rezultatele vor fi disponibile publicului.",
      "fi" -> "Komitea ilmoitti, että raportti julkaistaan tulevina viikkoina ja että kaikki tulokset ovat yleisön saatavilla.",
      "nl" -> "De commissie verklaarde dat het rapport in de komende weken zal worden gepubliceerd en dat alle resultaten voor het publiek beschikbaar zijn.",
      "de" -> "Der Ausschuss erklärte, dass der Bericht in den kommenden Wochen veröffentlicht wird und dass alle Ergebnisse für die Öffentlichkeit zugänglich sind.",
      "en" -> "The committee said that it would publish the report in the coming weeks and that all of the findings were available to the public.",
      "da" -> "Han sagde, at han ikke kunne komme til byen i dag, fordi vejret var blevet meget værre op ad dagen, og at de andre også ville blive hjemme.",
      "nb" -> "Han sa at han ikke kunne komme til byen i dag fordi været hadde blitt mye verre utover dagen, og at de andre også ville bli hjemme.",
      "da" -> "Regeringen har besluttet at afsætte flere penge til de mindre skoler ude på landet, så børnene ikke skal rejse så langt hver dag.",
      "nb" -> "Regjeringen har besluttet å sette av mer penger til de mindre skolene ute på landet, slik at barna ikke skal reise så langt hver dag.")
    samples.foreach { case (want, text) =>
      val got = LangId.detect(text)
      val top = LangId.profileScores(text).take(4)
        .map { case (l, s) => f"$l=$s%.3f" }.mkString(" ")
      println(f"LANGPROBE want=$want got=$got top: $top")
    }
  }
}
