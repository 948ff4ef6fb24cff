package graft

import org.scalatest.funsuite.AnyFunSuite

/** Whole-sentence analyzer conformance against the REFERENCE'S OWN published
  * stemmer outputs (surrealdb/core/src/idx/ft/analyzer/filter.rs test
  * module: one sentence per language through `TOKENIZERS blank,class
  * FILTERS snowball(<lang>)`, expected token list inline). Every implemented
  * language must reproduce the reference's rust_stemmers output token for
  * token — this pins eleven stemmers to ground truth the reference itself
  * ships. The reference also accepts ISO 639 aliases (en/eng, fr/fra, …),
  * checked per language. */
class SnowballConformanceSpec extends AnyFunSuite {

  private def analyze(lang: String, input: String): Vector[String] = {
    val in = new graft.surql.Interp
    in.run(graft.surql.Parser.parse(
      s"DEFINE ANALYZER t_$lang TOKENIZERS blank,class FILTERS snowball($lang);"))
    val r = in.run(graft.surql.Parser.parse(
      s"RETURN search::analyze('t_$lang', '$input');"))
    r.last match {
      case graft.surql.QOk(graft.surql.VArr(xs)) =>
        xs.collect { case graft.surql.VStr(s) => s }
      case other => fail(s"analyze($lang) failed: $other")
    }
  }

  private def check(lang: String, alias: String, input: String,
      expected: Seq[String]): Unit = {
    assertResult(expected.toVector, s"snowball($lang)")(analyze(lang, input))
    assertResult(expected.toVector, s"snowball($alias) alias")(analyze(alias, input))
  }

  test("danish matches the reference's published analyzer output") {
    check("danish", "da",
      "Hunde elsker at løbe i parken, men min lille hund foretrækker at sove i sin kurv frem for at løbe.",
      Seq("hund", "elsk", "at", "løb", "i", "park", ",", "men", "min", "lil",
        "hund", "foretræk", "at", "sov", "i", "sin", "kurv", "frem", "for",
        "at", "løb", "."))
  }

  test("dutch matches the reference's published analyzer output") {
    check("dutch", "nl",
      "Honden houden ervan om in het park te rennen, maar mijn kleine hond slaapt liever in zijn mand dan te rennen.",
      Seq("hond", "houd", "ervan", "om", "in", "het", "park", "te", "renn",
        ",", "mar", "mijn", "klein", "hond", "slaapt", "liever", "in", "zijn",
        "mand", "dan", "te", "renn", "."))
  }

  test("english matches the reference's published analyzer output") {
    check("english", "en",
      "Teachers are often teaching, but my favorite teacher prefers reading in her spare time rather than teaching.",
      Seq("teacher", "are", "often", "teach", ",", "but", "my", "favorit",
        "teacher", "prefer", "read", "in", "her", "spare", "time", "rather",
        "than", "teach", "."))
  }

  test("finnish matches the reference's published analyzer output") {
    check("finnish", "fi",
      "työ tekijäänsä kiittää",
      Seq("työ", "tekij", "kiit"))
  }

  test("french matches the reference's published analyzer output") {
    check("french", "fr",
      "Les chiens adorent courir dans le parc, mais mon petit chien aime plutôt se blottir sur le canapé que de courir",
      Seq("le", "chien", "adorent", "cour", "dan", "le", "parc", ",", "mais",
        "mon", "pet", "chien", "aim", "plutôt", "se", "blott", "sur", "le",
        "canap", "que", "de", "cour"))
  }

  test("german matches the reference's published analyzer output") {
    check("german", "de",
      "Hunde lieben es, im Park zu laufen, aber mein kleiner Hund zieht es vor, auf dem Sofa zu schlafen, statt zu laufen.",
      Seq("hund", "lieb", "es", ",", "im", "park", "zu", "lauf", ",", "aber",
        "mein", "klein", "hund", "zieht", "es", "vor", ",", "auf", "dem",
        "sofa", "zu", "schlaf", ",", "statt", "zu", "lauf", "."))
  }

  test("italian matches the reference's published analyzer output") {
    check("italian", "it",
      "I cani amano correre nel parco, ma il mio piccolo cane preferisce dormire nel suo cesto piuttosto che correre.",
      Seq("i", "can", "aman", "corr", "nel", "parc", ",", "ma", "il", "mio",
        "piccol", "can", "prefer", "dorm", "nel", "suo", "cest", "piuttost",
        "che", "corr", "."))
  }

  test("norwegian matches the reference's published analyzer output") {
    check("norwegian", "no",
      "Hunder elsker å løpe i parken, men min lille hund foretrekker å sove i sengen sin heller enn å løpe.",
      Seq("hund", "elsk", "å", "løp", "i", "park", ",", "men", "min", "lill",
        "hund", "foretrekk", "å", "sov", "i", "seng", "sin", "hell", "enn",
        "å", "løp", "."))
  }

  test("portuguese matches the reference's published analyzer output") {
    check("portuguese", "pt",
      "Os cães adoram correr no parque, mas o meu pequeno cão prefere dormir na sua cama em vez de correr.",
      Seq("os", "cã", "ador", "corr", "no", "parqu", ",", "mas", "o", "meu",
        "pequen", "cã", "prefer", "dorm", "na", "sua", "cam", "em", "vez",
        "de", "corr", "."))
  }

  test("romanian matches the reference's published analyzer output") {
    check("romanian", "ro",
      "Câinii adoră să alerge în parc, dar cățelul meu preferă să doarmă în coșul lui decât să alerge.",
      Seq("câin", "ador", "să", "alerg", "în", "parc", ",", "dar", "cățel",
        "meu", "prefer", "să", "doarm", "în", "coș", "lui", "decât", "să",
        "alerg", "."))
  }

  test("hungarian matches the reference's published analyzer output") {
    check("hungarian", "hu",
      "A kutyák szeretnek futni a parkban, de az én kicsi kutyám inkább alszik a kosarában, mintsem fut.",
      Seq("a", "kutya", "szeret", "futn", "a", "par", ",", "de", "az", "én",
        "kics", "kutya", "inkább", "alsz", "a", "kosar", ",", "mints", "fu",
        "."))
  }

  test("russian matches the reference's published analyzer output") {
    check("russian", "ru",
      "Собаки любят бегать в парке, но моя маленькая собака предпочитает спать в своей корзине, а не бегать.",
      Seq("собак", "люб", "бега", "в", "парк", ",", "но", "мо", "маленьк",
        "собак", "предпочита", "спат", "в", "сво", "корзин", ",", "а", "не",
        "бега", "."))
  }

  test("spanish matches the reference's published analyzer output") {
    check("spanish", "es",
      "Los perros aman correr en el parque, pero mi pequeño perro prefiere dormir en su cama en lugar de correr.",
      Seq("los", "perr", "aman", "corr", "en", "el", "parqu", ",", "per",
        "mi", "pequeñ", "perr", "prefier", "dorm", "en", "su", "cam", "en",
        "lug", "de", "corr", "."))
  }

  test("swedish matches the reference's published analyzer output") {
    check("swedish", "sv",
      "Hundar älskar att springa i parken, men min lilla hund föredrar att sova i sin säng istället för att springa.",
      Seq("hund", "älsk", "att", "spring", "i", "park", ",", "men", "min",
        "lill", "hund", "föredr", "att", "sov", "i", "sin", "säng",
        "istället", "för", "att", "spring", "."))
  }

  test("turkish matches the reference's published analyzer output") {
    check("turkish", "tr",
      "Köpekler parkta koşmayı sever, ama benim küçük köpeğim koşmaktansa yatağında uyumayı tercih eder.",
      Seq("köpek", "park", "koşma", "sever", ",", "am", "be", "küçük",
        "köpek", "koşmak", "yatak", "uyuma", "tercih", "eder", "."))
    // the second ISO alias the reference registers (filter.rs)
    check("turkish", "tur",
      "Köpekler parkta koşmayı sever.",
      Seq("köpek", "park", "koşma", "sever", "."))
  }

  test("greek matches the reference's published analyzer output") {
    check("greek", "el",
      "Τα σκυλιά αγαπούν να τρέχουν στο πάρκο, αλλά ο μικρός μου σκύλος προτιμά να κοιμάται στο κρεβάτι του αντί να τρέχει.",
      Seq("τα", "σκυλ", "αγαπ", "να", "τρεχ", "στ", "παρκ", ",", "αλλ",
        "ο", "μικρ", "μ", "σκυλ", "προτιμ", "να", "κοιμ", "στ", "κρεβατ",
        "τ", "αντ", "να", "τρεχ", "."))
    check("greek", "ell",
      "Τα σκυλιά αγαπούν να τρέχουν.",
      Seq("τα", "σκυλ", "αγαπ", "να", "τρεχ", "."))
  }

  test("arabic matches the reference's published analyzer output") {
    check("arabic", "ar",
      "الكلاب تحب الجري في الحديقة، لكن كلبي الصغير يفضل النوم في سريره بدلاً من الجري",
      Seq("كلاب", "تحب", "الجر", "في", "حديق", "لكن", "كلب", "صغير",
        "يفضل", "نوم", "في", "سرير", "بدل", "من", "الجر"))
    check("arabic", "ara",
      "الكلاب تحب الجري",
      Seq("كلاب", "تحب", "الجر"))
  }

  test("tamil matches the reference's published analyzer output") {
    check("tamil", "ta",
      "நாய்கள் பூங்காவில் ஓடுவதை விரும்புகின்றன, ஆனால் என் சிறிய நாய் அதன் படுகையில் தூங்குவதை விரும்புகின்றது, ஓட இல்லை.",
      Seq("ந\u0BBEய", "கள", "பூங", "க\u0BBEவில", "ஓடுவதை", "விரும",
        "புகி", "றன", ",", "ஆன\u0BBEல", "என", "சிறி", "ந\u0BBEய",
        "அதன", "படுகையில", "தூங", "குவதை", "விரும", "புகி", "றது", ",",
        "ஓட", "இல", "லை", "."))
    check("tamil", "tam",
      "நாய்கள் ஓட",
      Seq("ந\u0BBEய", "கள", "ஓட"))
  }
}
