package graft.surql

/** Snowball stemmers for the FTS analyzer filter chain (reference:
  * idx/ft/analyzer/filter.rs:36-53 maps `FILTERS snowball(<language>)` to
  * rust_stemmers, which embeds the generated Snowball algorithms; the
  * algorithms themselves are published at snowballstem.org and implemented
  * here from the public specification, not ported from generated code).
  *
  * English is the full Porter2 algorithm; German and Spanish implement
  * their published region/suffix-step algorithms (umlaut / accent
  * postludes included); the Scandinavian family (Swedish/Norwegian/
  * Danish) follows the published suffix-table algorithms. Languages
  * without an implementation fall back to identity — documented, not
  * silent: [[supported]] lists the real ones.
  */
object Snowball {

  val supported: Set[String] =
    Set("english", "swedish", "norwegian", "danish", "german", "spanish")

  def stem(language: String, word: String): String =
    language.toLowerCase match {
      case "english"   => english(word)
      case "swedish"   => swedish(word)
      case "norwegian" => norwegian(word)
      case "danish"    => danish(word)
      case "german"    => german(word)
      case "spanish"   => spanish(word)
      case _           => word
    }

  // ======================= English (Porter2) ==============================

  private val enVowels = "aeiouy".toSet
  private val enDoubles = Set("bb", "dd", "ff", "gg", "mm", "nn", "pp", "rr", "tt")
  private val liEnding = "cdeghkmnrt".toSet

  private val enExceptions1: Map[String, String] = Map(
    "skis" -> "ski", "skies" -> "sky", "dying" -> "die", "lying" -> "lie",
    "tying" -> "tie", "idly" -> "idl", "gently" -> "gentl", "ugly" -> "ugli",
    "early" -> "earli", "only" -> "onli", "singly" -> "singl",
    "sky" -> "sky", "news" -> "news", "howe" -> "howe", "atlas" -> "atlas",
    "cosmos" -> "cosmos", "bias" -> "bias", "andes" -> "andes")

  private val enExceptions2: Set[String] = Set(
    "inning", "outing", "canning", "herring", "earring",
    "proceed", "exceed", "succeed")

  private def isVowel(c: Char): Boolean = enVowels.contains(c)

  /** R1/R2 start indexes. R1 = after the first non-vowel following a vowel
    * (special-cased for gener-/commun-/arsen-); R2 = the same within R1. */
  private def regions(w: String): (Int, Int) = {
    def regionAfter(from: Int): Int = {
      var i = from
      while (i < w.length && !isVowel(w(i))) i += 1
      while (i < w.length && isVowel(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    }
    val r1 =
      if (w.startsWith("gener") || w.startsWith("arsen")) 5
      else if (w.startsWith("commun")) 6
      else regionAfter(0)
    val r2 = regionAfter(r1)
    (r1, r2)
  }

  /** A short syllable: (vowel, non-vowel other than w/x/Y, preceded by a
    * non-vowel) or (vowel at position 0 followed by a non-vowel). */
  private def endsShortSyllable(w: String): Boolean = {
    val n = w.length
    if (n == 2) isVowel(w(0)) && !isVowel(w(1))
    else if (n >= 3) {
      val c = w(n - 1); val v = w(n - 2); val p = w(n - 3)
      isVowel(v) && !isVowel(c) && c != 'w' && c != 'x' && c != 'Y' && !isVowel(p)
    } else false
  }

  def english(word0: String): String = {
    var w = word0.toLowerCase
    if (w.startsWith("'")) w = w.substring(1)
    if (w.length <= 2) return w
    enExceptions1.get(w) match {
      case Some(s) => return s
      case scala.None =>
    }
    // mark consonant-y
    val sb = new StringBuilder(w)
    if (sb.nonEmpty && sb(0) == 'y') sb(0) = 'Y'
    var i = 1
    while (i < sb.length) {
      if (sb(i) == 'y' && isVowel(sb(i - 1))) sb(i) = 'Y'
      i += 1
    }
    w = sb.toString
    val (r1, r2) = regions(w)
    def inR1(suffLen: Int): Boolean = w.length - suffLen >= r1
    def inR2(suffLen: Int): Boolean = w.length - suffLen >= r2

    // ---- step 0: 's'' / 's / '
    if (w.endsWith("'s'")) w = w.dropRight(3)
    else if (w.endsWith("'s")) w = w.dropRight(2)
    else if (w.endsWith("'")) w = w.dropRight(1)

    // ---- step 1a
    if (w.endsWith("sses")) w = w.dropRight(2)
    else if (w.endsWith("ied") || w.endsWith("ies"))
      w = if (w.length > 4) w.dropRight(2) else w.dropRight(1)
    else if (w.endsWith("us") || w.endsWith("ss")) ()
    else if (w.endsWith("s")) {
      // delete if the preceding part contains a vowel not immediately
      // before the s
      val stem = w.dropRight(1)
      if (stem.length >= 2 && stem.dropRight(1).exists(isVowel))
        w = stem
    }
    if (enExceptions2.contains(w)) return w.replace('Y', 'y')

    // ---- step 1b
    def afterDeletion(): Unit = {
      if (w.endsWith("at") || w.endsWith("bl") || w.endsWith("iz")) w += "e"
      else if (enDoubles.exists(w.endsWith)) w = w.dropRight(1)
      // short word: ends in a short syllable AND R1 is null
      else if (w.length <= r1 && endsShortSyllable(w)) w += "e"
    }
    if (w.endsWith("eedly")) { if (inR1(5)) w = w.dropRight(3) }
    else if (w.endsWith("eed")) { if (inR1(3)) w = w.dropRight(1) }
    else {
      val suff = Seq("ingly", "edly", "ing", "ed").find(w.endsWith)
      suff.foreach { s =>
        val stem = w.dropRight(s.length)
        if (stem.exists(isVowel)) { w = stem; afterDeletion() }
      }
    }

    // ---- step 1c: y/Y -> i when preceded by a non-vowel that is not the
    // first letter
    if (w.length > 2 && (w.endsWith("y") || w.endsWith("Y")) &&
        !isVowel(w(w.length - 2)))
      w = w.dropRight(1) + "i"

    // ---- step 2 (longest suffix, in R1)
    val step2: Seq[(String, String)] = Seq(
      "ization" -> "ize", "ational" -> "ate", "fulness" -> "ful",
      "ousness" -> "ous", "iveness" -> "ive", "tional" -> "tion",
      "biliti" -> "ble", "lessli" -> "less", "entli" -> "ent",
      "ation" -> "ate", "alism" -> "al", "aliti" -> "al", "ousli" -> "ous",
      "iviti" -> "ive", "fulli" -> "ful", "enci" -> "ence", "anci" -> "ance",
      "abli" -> "able", "izer" -> "ize", "ator" -> "ate", "alli" -> "al",
      "bli" -> "ble", "ogi" -> "og", "li" -> "")
    step2.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ogi") {
          if (w.length > 3 && w(w.length - 4) == 'l') w = w.dropRight(3) + r
        } else if (s == "li") {
          if (w.length > 2 && liEnding.contains(w(w.length - 3)))
            w = w.dropRight(2)
        } else w = w.dropRight(s.length) + r
      }
    }

    // ---- step 3 (longest suffix, in R1)
    val step3: Seq[(String, String)] = Seq(
      "ational" -> "ate", "tional" -> "tion", "alize" -> "al",
      "icate" -> "ic", "iciti" -> "ic", "ative" -> "", "ical" -> "ic",
      "ness" -> "", "ful" -> "")
    step3.find { case (s, _) => w.endsWith(s) }.foreach { case (s, r) =>
      if (inR1(s.length)) {
        if (s == "ative") { if (inR2(5)) w = w.dropRight(5) }
        else w = w.dropRight(s.length) + r
      }
    }

    // ---- step 4 (longest suffix, in R2)
    val step4 = Seq("ement", "ance", "ence", "able", "ible", "ment",
      "ant", "ent", "ism", "ate", "iti", "ous", "ive", "ize", "ion",
      "al", "er", "ic")
    step4.find(w.endsWith).foreach { s =>
      if (inR2(s.length)) {
        if (s == "ion") {
          if (w.length > 3 && (w(w.length - 4) == 's' || w(w.length - 4) == 't'))
            w = w.dropRight(3)
        } else w = w.dropRight(s.length)
      }
    }

    // ---- step 5
    if (w.endsWith("e")) {
      if (inR2(1)) w = w.dropRight(1)
      else if (inR1(1) && !endsShortSyllable(w.dropRight(1))) w = w.dropRight(1)
    } else if (w.endsWith("l")) {
      if (inR2(1) && w.length > 1 && w(w.length - 2) == 'l') w = w.dropRight(1)
    }

    w.replace('Y', 'y')
  }

  // ======================== German ========================================
  // snowballstem.org German stemmer: ß→ss prelude, u/y between vowels marked
  // consonant, R1 (min 3 letters before) / R2 regions, three suffix steps,
  // umlaut removal postlude.

  private val deVowels = "aeiouyäöü".toSet
  private val deSEnding = "bdfghklmnrt".toSet
  private val deStEnding = "bdfghklmnt".toSet

  def german(word0: String): String = {
    var w = word0.toLowerCase.replace("ß", "ss")
    if (w.length < 2) return w
    // mark u/y between vowels as consonants (U/Y)
    val sb = new StringBuilder(w)
    var i = 1
    while (i < sb.length - 1) {
      if ((sb(i) == 'u' || sb(i) == 'y') &&
          deVowels.contains(sb(i - 1)) && deVowels.contains(sb(i + 1)))
        sb(i) = sb(i).toUpper
      i += 1
    }
    w = sb.toString
    val r1 = scandR1(w, deVowels) // same min-3 adjustment as the spec
    val r2 = {
      // Same vowel set as the R1 scan: u/y marked as consonants (U/Y) by the
      // prelude must stay consonants here too (no .toLower).
      var j = r1
      while (j < w.length && !deVowels.contains(w(j))) j += 1
      while (j < w.length && deVowels.contains(w(j))) j += 1
      if (j < w.length) j + 1 else w.length
    }
    def inR1(n: Int) = w.length - n >= r1
    def inR2(n: Int) = w.length - n >= r2

    // ---- step 1
    val s1a = Seq("ern", "em", "er").find(s => w.endsWith(s) && inR1(s.length))
    val s1b = Seq("en", "es", "e").find(s => w.endsWith(s) && inR1(s.length))
    if (s1a.isDefined) w = w.dropRight(s1a.get.length)
    else if (s1b.isDefined) {
      w = w.dropRight(s1b.get.length)
      if (w.endsWith("niss")) w = w.dropRight(1)
    } else if (w.endsWith("s") && inR1(1) && w.length >= 2 &&
        deSEnding.contains(w(w.length - 2)))
      w = w.dropRight(1)

    // ---- step 2
    val s2 = Seq("est", "en", "er").find(s => w.endsWith(s) && inR1(s.length))
    if (s2.isDefined) w = w.dropRight(s2.get.length)
    else if (w.endsWith("st") && inR1(2) && w.length >= 6 &&
        deStEnding.contains(w(w.length - 3)))
      w = w.dropRight(2)

    // ---- step 3 (d-suffixes, in R2)
    if ((w.endsWith("end") || w.endsWith("ung")) && inR2(3)) {
      w = w.dropRight(3)
      if (w.endsWith("ig") && inR2(2) && // note: R2 of the SHORTENED word
          !(w.length >= 3 && w(w.length - 3) == 'e'))
        w = w.dropRight(2)
    } else if ((w.endsWith("isch") && inR2(4) &&
        !(w.length >= 5 && w(w.length - 5) == 'e'))) {
      w = w.dropRight(4)
    } else if ((w.endsWith("ig") || w.endsWith("ik")) && inR2(2) &&
        !(w.length >= 3 && w(w.length - 3) == 'e')) {
      w = w.dropRight(2)
    } else if ((w.endsWith("lich") || w.endsWith("heit")) && inR2(4)) {
      w = w.dropRight(4)
      if ((w.endsWith("er") || w.endsWith("en")) && inR1(2))
        w = w.dropRight(2)
    } else if (w.endsWith("keit") && inR2(4)) {
      w = w.dropRight(4)
      if (w.endsWith("lich") && inR2(4)) w = w.dropRight(4)
      else if (w.endsWith("ig") && inR2(2)) w = w.dropRight(2)
    }

    // postlude: unmark U/Y, strip umlauts
    w.map {
      case 'U' => 'u'; case 'Y' => 'y'
      case 'ä' => 'a'; case 'ö' => 'o'; case 'ü' => 'u'
      case c => c
    }
  }

  // ======================== Spanish =======================================
  // snowballstem.org Spanish stemmer: RV region, attached-pronoun step,
  // standard suffixes, y-verbs, verb suffixes, residual step, accent
  // removal postlude.

  private val esVowels = "aeiouáéíóúü".toSet

  private def esRV(w: String): Int = {
    // RV: if the second letter is a consonant, RV is after the next vowel;
    // if the first two letters are vowels, after the next consonant;
    // otherwise (consonant-vowel) after the third letter; default end.
    val n = w.length
    if (n < 3) return n
    def v(i: Int) = esVowels.contains(w(i))
    if (!v(1)) {
      var i = 2
      while (i < n && !v(i)) i += 1
      if (i < n) i + 1 else n
    } else if (v(0) && v(1)) {
      var i = 2
      while (i < n && v(i)) i += 1
      if (i < n) i + 1 else n
    } else 3
  }

  private def esR1R2(w: String): (Int, Int) = {
    def after(from: Int): Int = {
      var i = from
      while (i < w.length && !esVowels.contains(w(i))) i += 1
      while (i < w.length && esVowels.contains(w(i))) i += 1
      if (i < w.length) i + 1 else w.length
    }
    val r1 = after(0)
    (r1, after(r1))
  }

  private def esDeaccent(c: Char): Char = c match {
    case 'á' => 'a'; case 'é' => 'e'; case 'í' => 'i'
    case 'ó' => 'o'; case 'ú' => 'u'; case c0 => c0
  }

  def spanish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.length < 3) return w.map(esDeaccent)
    val rvStart = esRV(w)
    val (r1, r2) = esR1R2(w)
    def inRV(n: Int) = w.length - n >= rvStart
    def inR1(n: Int) = w.length - n >= r1
    def inR2(n: Int) = w.length - n >= r2

    // ---- step 0: attached pronouns after a gerund/infinitive base in RV
    val pronouns = Seq("selas", "selos", "sela", "selo", "las", "les",
      "los", "nos", "me", "se", "la", "le", "lo")
    pronouns.find(w.endsWith).foreach { p =>
      val stem = w.dropRight(p.length)
      def baseInRV(b: String): Boolean =
        stem.endsWith(b) && (stem.length - b.length) >= rvStart
      val accented = Seq("ándo", "iéndo", "ár", "ér", "ír")
      val plain = Seq("ando", "iendo", "ar", "er", "ir")
      // Only the accent IN the matched suffix is removed (spec: "in which case
      // the accent is removed"); accents earlier in the word must survive so
      // later steps can still match accented suffixes like -ación.
      accented.find(baseInRV) match {
        case Some(b) => w = stem.dropRight(b.length) + b.map(esDeaccent)
        case None =>
          if (plain.exists(baseInRV) ||
              (stem.endsWith("uyendo") && (stem.length - 5) >= rvStart)) w = stem
      }
    }

    val n0 = w.length
    // ---- step 1: standard suffix removal (longest match wins; the groups
    // below are mutually exclusive by their endings)
    def drop(k: Int): Unit = w = w.dropRight(k)
    var did1 = true
    if (w.endsWith("amientos") && inR2(8)) drop(8)
    else if (w.endsWith("imientos") && inR2(8)) drop(8)
    else if (w.endsWith("amiento") && inR2(7)) drop(7)
    else if (w.endsWith("imiento") && inR2(7)) drop(7)
    else if (w.endsWith("log\u00edas") && inR2(6)) w = w.dropRight(6) + "log"
    else if (w.endsWith("log\u00eda") && inR2(5)) w = w.dropRight(5) + "log"
    else if (w.endsWith("uciones") && inR2(7)) w = w.dropRight(7) + "u"
    else if (w.endsWith("uci\u00f3n") && inR2(5)) w = w.dropRight(5) + "u"
    else if (w.endsWith("encias") && inR2(6)) drop(6)
    else if (w.endsWith("encia") && inR2(5)) drop(5)
    else if (w.endsWith("amente") && inR1(6)) {
      drop(6)
      // preceded by iv (delete, then at), or by os/ic/ad
      if (w.endsWith("iv") && inR2(2 + 6)) {
        drop(2)
        if (w.endsWith("at") && inR2(2 + 2 + 6)) drop(2)
      } else Seq("os", "ic", "ad")
        .find(x => w.endsWith(x) && inR2(2 + 6)).foreach(_ => drop(2))
    }
    else if (w.endsWith("mente") && inR2(5)) {
      drop(5)
      Seq("ante", "able", "ible")
        .find(x => w.endsWith(x) && inR2(4 + 5)).foreach(_ => drop(4))
    }
    else if (w.endsWith("idades") && inR2(6)) {
      drop(6)
      Seq("abil", "ic", "iv")
        .find(x => w.endsWith(x) && inR2(x.length + 6)).foreach(x => drop(x.length))
    }
    else if (w.endsWith("idad") && inR2(4)) {
      drop(4)
      Seq("abil", "ic", "iv")
        .find(x => w.endsWith(x) && inR2(x.length + 4)).foreach(x => drop(x.length))
    }
    else if (Seq("ivas", "ivos").exists(s => w.endsWith(s) && inR2(4))) {
      drop(4)
      if (w.endsWith("at") && inR2(2 + 4)) drop(2)
    }
    else if (Seq("iva", "ivo").exists(s => w.endsWith(s) && inR2(3))) {
      drop(3)
      if (w.endsWith("at") && inR2(2 + 3)) drop(2)
    }
    else {
      val grpIc = Seq("aciones", "adoras", "adores", "ancias", "adora",
        "aci\u00f3n", "antes", "ancia", "ador", "ante", "anza", "anzas")
      val grpPlain = Seq("ibles", "istas", "ables", "ismos", "anzas",
        "ible", "ista", "able", "ismo", "osas", "osos", "osa", "oso",
        "\u00edas")
      grpIc.sortBy(-_.length).find(s => w.endsWith(s) && inR2(s.length)) match {
        case Some(s) =>
          drop(s.length)
          if (w.endsWith("ic") && inR2(2 + s.length)) drop(2)
        case scala.None =>
          grpPlain.sortBy(-_.length).find(s => w.endsWith(s) && inR2(s.length)) match {
            case Some(s) => drop(s.length)
            case scala.None => did1 = false
          }
      }
    }

    // ---- step 2 (only when step 1 removed nothing)
    if (!did1 || w.length == n0) {
      // 2a: y-verb suffixes in RV preceded by u
      val ySuf = Seq("yeron", "yendo", "yamos", "yais", "yan", "yen",
        "yas", "yes", "ya", "ye", "yo", "y\u00f3").sortBy(-_.length)
      val did2a = ySuf.exists { s =>
        if (w.endsWith(s) && inRV(s.length) &&
            w.length > s.length && w(w.length - s.length - 1) == 'u') {
          drop(s.length); true
        } else false
      }
      if (!did2a) {
        // 2b: verb suffixes in RV; en/es/\u00e9is/emos additionally strip a
        // preceding gu's u
        val guGroup = Set("en", "es", "\u00e9is", "emos")
        val verbs = Seq("ar\u00edamos", "er\u00edamos", "ir\u00edamos",
          "i\u00e9ramos", "i\u00e9semos", "ar\u00edais", "aremos",
          "er\u00edais", "eremos", "ir\u00edais", "iremos", "ierais",
          "ieseis", "asteis", "isteis", "\u00e1bamos", "\u00e1ramos",
          "\u00e1semos", "ar\u00edan", "ar\u00edas", "ar\u00e9is",
          "er\u00edan", "er\u00edas", "er\u00e9is", "ir\u00edan",
          "ir\u00edas", "ir\u00e9is", "ieran", "iesen", "ieron", "iendo",
          "ieras", "ieses", "abais", "arais", "aseis", "\u00edamos",
          "emos", "ar\u00e1n", "ar\u00e1s", "ar\u00eda", "er\u00e1n",
          "er\u00e1s", "er\u00eda", "ir\u00e1n", "ir\u00e1s",
          "ir\u00eda", "iera", "iese", "aste", "iste", "aban", "aran",
          "asen", "aron", "ando", "abas", "adas", "idas", "aras", "ases",
          "\u00edais", "ados", "idos", "amos", "imos", "ar\u00e1",
          "ar\u00e9", "er\u00e1", "er\u00e9", "ir\u00e1", "ir\u00e9",
          "aba", "ada", "ida", "ara", "ase", "\u00edan", "ado", "ido",
          "\u00edas", "\u00e1is", "\u00e9is", "\u00eda", "ad", "ed",
          "id", "an", "i\u00f3", "ar", "er", "ir", "as", "\u00eds",
          "\u00e1s", "en", "es").sortBy(-_.length)
        verbs.find(s => w.endsWith(s) && inRV(s.length)).foreach { s =>
          drop(s.length)
          if (guGroup(s) && w.endsWith("gu")) drop(1)
        }
      }
    }

    // ---- step 3: residual suffix in RV
    Seq("os", "a", "o", "\u00e1", "\u00ed", "\u00f3")
      .find(s => w.endsWith(s) && inRV(s.length)) match {
      case Some(s) => drop(s.length)
      case scala.None =>
        if ((w.endsWith("e") || w.endsWith("\u00e9")) && inRV(1)) {
          drop(1)
          // a 'u' after 'g' also drops when the u is in RV (gui\u00e9 -> gui)
          if (w.endsWith("gu") && w.length - 1 >= rvStart) drop(1)
        }
    }

    w.map(esDeaccent)
  }


  // ================== Scandinavian family ==================================
  // Shared shape (snowballstem.org): R1 after the first non-vowel following
  // a vowel, adjusted so at least 3 letters precede it; step 1 strips the
  // longest listed suffix in R1 (or s after a valid s-ending); step 2 trims
  // one letter after a listed consonant pair; step 3 is per-language.

  private def scandR1(w: String, vowels: Set[Char]): Int = {
    var i = 0
    while (i < w.length && !vowels.contains(w(i))) i += 1
    while (i < w.length && vowels.contains(w(i))) i += 1
    val r = if (i < w.length) i + 1 else w.length
    Math.max(r, Math.min(3, w.length))
  }

  private def longestIn(w: String, r1: Int, suffixes: Seq[String]): Option[String] =
    suffixes.sortBy(-_.length).find(s => w.endsWith(s) && w.length - s.length >= r1)

  // ---- Swedish ----
  private val svVowels = "aeiouyäåö".toSet
  private val svStep1 = Seq("heterna", "hetens", "arnas", "ernas", "ornas",
    "anden", "heten", "heter", "arens", "andes", "arna", "erna", "orna",
    "ande", "arne", "aste", "aren", "ades", "erns", "ade", "are", "ern",
    "ens", "het", "ast", "andet", "ad", "en", "ar", "er", "or", "as",
    "es", "at", "a", "e")
  private val svSEnding = "bcdfghjklmnoprtvy".toSet

  def swedish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.length < 3) return w
    val r1 = scandR1(w, svVowels)
    longestIn(w, r1, svStep1) match {
      case Some(s) => w = w.dropRight(s.length)
      case scala.None =>
        if (w.endsWith("s") && w.length - 1 >= r1 &&
            w.length >= 2 && svSEnding.contains(w(w.length - 2)))
          w = w.dropRight(1)
    }
    // step 2: dd gd nn dt gt kt tt → drop last letter (pair in R1)
    if (Seq("dd", "gd", "nn", "dt", "gt", "kt", "tt")
        .exists(p => w.endsWith(p) && w.length - 2 >= r1))
      w = w.dropRight(1)
    // step 3 (in R1): lig/ig/els delete; fullt → full; löst → lös
    if (w.endsWith("fullt") && w.length - 5 >= r1) w = w.dropRight(1)
    else if (w.endsWith("löst") && w.length - 4 >= r1) w = w.dropRight(1)
    else longestIn(w, r1, Seq("lig", "els", "ig")).foreach(s => w = w.dropRight(s.length))
    w
  }

  // ---- Norwegian ----
  private val noVowels = "aeiouyæåø".toSet
  private val noStep1 = Seq("hetenes", "hetene", "hetens", "heten", "heter",
    "endes", "edes", "enes", "erte", "ande", "ende", "ene", "ane",
    "ets", "het", "ast", "ens", "ers", "ede", "ert", "en", "ar", "er",
    "as", "es", "et", "a", "e")

  def norwegian(word0: String): String = {
    var w = word0.toLowerCase
    if (w.length < 3) return w
    val r1 = scandR1(w, noVowels)
    longestIn(w, r1, noStep1) match {
      case Some(s) =>
        // ert/erte → er
        if (s == "erte" || s == "ert") w = w.dropRight(s.length) + "er"
        else w = w.dropRight(s.length)
      case scala.None =>
        // s: valid s-ending b c d f g h j l m n o p r t v y z, or k not
        // after a vowel
        if (w.endsWith("s") && w.length - 1 >= r1 && w.length >= 2) {
          val prev = w(w.length - 2)
          val ok = "bcdfghjlmnoprtvyz".contains(prev) ||
            (prev == 'k' && w.length >= 3 && !noVowels.contains(w(w.length - 3)))
          if (ok) w = w.dropRight(1)
        }
    }
    // step 2: dt vt → drop t (pair in R1)
    if ((w.endsWith("dt") || w.endsWith("vt")) && w.length - 2 >= r1)
      w = w.dropRight(1)
    // step 3 (in R1): delete
    longestIn(w, r1, Seq("hetslov", "eleg", "elov", "slov", "elig", "leg",
      "eig", "lig", "els", "lov", "ig")).foreach(s => w = w.dropRight(s.length))
    w
  }

  // ---- Danish ----
  private val daVowels = "aeiouyæåø".toSet
  private val daStep1 = Seq("erendes", "erende", "hedens", "ethed", "erede",
    "heden", "heder", "erets", "erens", "endes", "ernes", "eren", "erer",
    "heds", "enes", "eres", "erne", "ende", "ered", "eret", "ene", "ere",
    "ens", "ers", "ets", "hed", "en", "er", "es", "et", "e")
  private val daSEnding = "abcdfghjklmnoprtvyzå".toSet

  def danish(word0: String): String = {
    var w = word0.toLowerCase
    if (w.length < 3) return w
    val r1 = scandR1(w, daVowels)
    longestIn(w, r1, daStep1) match {
      case Some(s) => w = w.dropRight(s.length)
      case scala.None =>
        if (w.endsWith("s") && w.length - 1 >= r1 && w.length >= 2 &&
            daSEnding.contains(w(w.length - 2)))
          w = w.dropRight(1)
    }
    // step 2: gd dt gt kt → drop last letter (pair in R1)
    def undoubleT(): Unit =
      if (Seq("gd", "dt", "gt", "kt")
          .exists(p => w.endsWith(p) && w.length - 2 >= r1))
        w = w.dropRight(1)
    undoubleT()
    // step 3: igst → drop st; lig/ig/els/elig → delete (in R1) then repeat
    // step 2; løst → løs
    if (w.endsWith("igst")) w = w.dropRight(2)
    longestIn(w, r1, Seq("elig", "lig", "els", "ig")) match {
      case Some(s) => w = w.dropRight(s.length); undoubleT()
      case scala.None => if (w.endsWith("løst")) w = w.dropRight(1)
    }
    // step 4 (undouble): a double non-vowel at the end in R1 drops one letter
    if (w.length >= 2 && w.length - 2 >= r1) {
      val c = w(w.length - 1)
      if (c == w(w.length - 2) && !daVowels.contains(c)) w = w.dropRight(1)
    }
    w
  }
}
