package graft.surql

import scala.collection.mutable

/** diff-match-patch (Neil Fraser's public algorithm) — the text-diff engine
  * behind `value::diff`'s string `change` operations (val/value/diff.rs:70
  * `dmp.patch_make1(a, b)` + `patch_to_text`; the reference's `dmp` crate is
  * a straight port of the canonical library).
  *
  * This replaces the r13 single-hunk prefix/suffix approximation: real dmp
  * splits a patch at any equality ≥ 2×margin chars, so two distant edits in
  * one string yield TWO `@@` hunks; it also runs semantic + efficiency
  * cleanup over the raw Myers diff, which merges ransom-note char churn
  * into word-level delete/insert pairs. Both are user-visible in the patch
  * text that change feeds and `RETURN DIFF` emit.
  *
  * Deviation from canonical, pinned by the reference's own goldens
  * (language/statements/update/update_output.surql: `@@ -1,1 +1,1 @@`):
  * the crate prints coordinates as `start,len` even when len == 1, where
  * canonical dmp prints the bare start. Parameters: Patch_Margin = 4,
  * Match_MaxBits = 32, Diff_EditCost = 4, no timeout (deterministic). */
object Dmp {

  final val EQUAL = 0
  final val DELETE = -1
  final val INSERT = 1

  final case class Diff(var op: Int, var text: String)

  final class Patch {
    val diffs = mutable.Buffer[Diff]()
    var start1 = 0
    var start2 = 0
    var length1 = 0
    var length2 = 0
  }

  private final val PatchMargin = 4
  private final val MatchMaxBits = 32
  private final val EditCost = 4

  // ---- public surface ------------------------------------------------

  /** patch_make1 + patch_to_text: the `change` op's value. */
  def patchText(a: String, b: String): String = patchToText(patchMake(a, b))

  def patchMake(text1: String, text2: String): Seq[Patch] = {
    val diffs = diffMain(text1, text2, checklines = true)
    if (diffs.length > 2) {
      cleanupSemantic(diffs)
      cleanupEfficiency(diffs)
    }
    patchMakeFromDiffs(text1, diffs)
  }

  // ---- diff_main -------------------------------------------------------

  def diffMain(text1: String, text2: String, checklines: Boolean): mutable.Buffer[Diff] = {
    if (text1 == text2) {
      val out = mutable.Buffer[Diff]()
      if (text1.nonEmpty) out += Diff(EQUAL, text1)
      return out
    }
    val p = commonPrefix(text1, text2)
    val prefix = text1.substring(0, p)
    var t1 = text1.substring(p)
    var t2 = text2.substring(p)
    val s = commonSuffix(t1, t2)
    val suffix = t1.substring(t1.length - s)
    t1 = t1.substring(0, t1.length - s)
    t2 = t2.substring(0, t2.length - s)
    val diffs = diffCompute(t1, t2, checklines)
    if (prefix.nonEmpty) Diff(EQUAL, prefix) +=: diffs
    if (suffix.nonEmpty) diffs += Diff(EQUAL, suffix)
    cleanupMerge(diffs)
    diffs
  }

  private def diffCompute(text1: String, text2: String,
      checklines: Boolean): mutable.Buffer[Diff] = {
    val diffs = mutable.Buffer[Diff]()
    if (text1.isEmpty) { diffs += Diff(INSERT, text2); return diffs }
    if (text2.isEmpty) { diffs += Diff(DELETE, text1); return diffs }
    val (longt, shortt) =
      if (text1.length > text2.length) (text1, text2) else (text2, text1)
    val i = longt.indexOf(shortt)
    if (i != -1) {
      val op = if (text1.length > text2.length) DELETE else INSERT
      diffs += Diff(op, longt.substring(0, i))
      diffs += Diff(EQUAL, shortt)
      diffs += Diff(op, longt.substring(i + shortt.length))
      return diffs
    }
    if (shortt.length == 1) {
      diffs += Diff(DELETE, text1)
      diffs += Diff(INSERT, text2)
      return diffs
    }
    halfMatch(text1, text2) match {
      case Some((t1a, t1b, t2a, t2b, mid)) =>
        val d1 = diffMain(t1a, t2a, checklines)
        val d2 = diffMain(t1b, t2b, checklines)
        d1 += Diff(EQUAL, mid)
        d1 ++= d2
        return d1
      case None => ()
    }
    if (checklines && text1.length > 100 && text2.length > 100)
      return diffLineMode(text1, text2)
    diffBisect(text1, text2)
  }

  /** Do the two texts share a substring ≥ half the longer text's length?
    * (canonical diff_halfMatch — enabled because the library's default
    * Diff_Timeout is nonzero). */
  private def halfMatch(text1: String,
      text2: String): Option[(String, String, String, String, String)] = {
    val (longt, shortt) =
      if (text1.length > text2.length) (text1, text2) else (text2, text1)
    if (longt.length < 4 || shortt.length * 2 < longt.length) return None

    def halfMatchI(l: String, s: String, i: Int):
        Option[(String, String, String, String, String)] = {
      val seed = l.substring(i, i + l.length / 4)
      var j = s.indexOf(seed)
      var best: Option[(String, String, String, String, String)] = None
      var bestLen = 0
      while (j != -1) {
        val pre = commonPrefix(l.substring(i), s.substring(j))
        val suf = commonSuffix(l.substring(0, i), s.substring(0, j))
        if (bestLen < suf + pre) {
          bestLen = suf + pre
          best = Some((l.substring(0, i - suf), l.substring(i + pre),
            s.substring(0, j - suf), s.substring(j + pre),
            s.substring(j - suf, j) + s.substring(j, j + pre)))
        }
        j = s.indexOf(seed, j + 1)
      }
      if (bestLen * 2 >= l.length) best else None
    }

    val hm1 = halfMatchI(longt, shortt, (longt.length + 3) / 4)
    val hm2 = halfMatchI(longt, shortt, (longt.length + 1) / 2)
    val hm = (hm1, hm2) match {
      case (None, None) => return None
      case (Some(x), None) => x
      case (None, Some(y)) => y
      case (Some(x), Some(y)) => if (x._5.length > y._5.length) x else y
    }
    if (text1.length > text2.length) Some(hm)
    else Some((hm._3, hm._4, hm._1, hm._2, hm._5))
  }

  /** Line-mode speedup for big texts: hash lines to chars, char-diff, then
    * re-diff the replacement blocks char-by-char. */
  private def diffLineMode(text1: String, text2: String): mutable.Buffer[Diff] = {
    val lineArray = mutable.Buffer[String]("")
    val lineHash = mutable.HashMap[String, Int]()
    def toChars(text: String): String = {
      val sb = new StringBuilder
      var start = 0
      while (start < text.length) {
        var end = text.indexOf('\n', start)
        if (end == -1) end = text.length - 1
        val line = text.substring(start, end + 1)
        val id = lineHash.getOrElseUpdate(line, { lineArray += line; lineArray.length - 1 })
        sb.append(id.toChar)
        start = end + 1
      }
      sb.toString
    }
    val chars1 = toChars(text1)
    val chars2 = toChars(text2)
    val diffs = diffMain(chars1, chars2, checklines = false)
    // re-expand chars back to lines
    diffs.foreach { d =>
      val sb = new StringBuilder
      d.text.foreach(c => sb.append(lineArray(c.toInt)))
      d.text = sb.toString
    }
    cleanupSemantic(diffs)
    // re-diff replacement blocks character-by-character
    diffs += Diff(EQUAL, "")
    var pointer = 0
    var countDelete = 0
    var countInsert = 0
    var textDelete = ""
    var textInsert = ""
    while (pointer < diffs.length) {
      diffs(pointer).op match {
        case INSERT =>
          countInsert += 1; textInsert += diffs(pointer).text; pointer += 1
        case DELETE =>
          countDelete += 1; textDelete += diffs(pointer).text; pointer += 1
        case EQUAL =>
          if (countDelete >= 1 && countInsert >= 1) {
            val sub = diffMain(textDelete, textInsert, checklines = false)
            diffs.remove(pointer - countDelete - countInsert,
              countDelete + countInsert)
            var at = pointer - countDelete - countInsert
            sub.foreach { d => diffs.insert(at, d); at += 1 }
            pointer = at
          }
          countDelete = 0; countInsert = 0; textDelete = ""; textInsert = ""
          pointer += 1
      }
    }
    diffs.remove(diffs.length - 1) // the sentinel EQUAL("")
    diffs
  }

  /** Myers O(ND) bisect: find the middle snake, split, recurse. */
  private def diffBisect(text1: String, text2: String): mutable.Buffer[Diff] = {
    val len1 = text1.length
    val len2 = text2.length
    val maxD = (len1 + len2 + 1) / 2
    val vOffset = maxD
    val vLength = 2 * maxD
    val v1 = Array.fill(vLength)(-1)
    val v2 = Array.fill(vLength)(-1)
    v1(vOffset + 1) = 0
    v2(vOffset + 1) = 0
    val delta = len1 - len2
    val front = (delta % 2 != 0)
    var k1start = 0; var k1end = 0
    var k2start = 0; var k2end = 0
    var d = 0
    while (d < maxD) {
      // forward path
      var k1 = -d + k1start
      while (k1 <= d - k1end) {
        val k1Offset = vOffset + k1
        var x1 =
          if (k1 == -d || (k1 != d && v1(k1Offset - 1) < v1(k1Offset + 1)))
            v1(k1Offset + 1)
          else v1(k1Offset - 1) + 1
        var y1 = x1 - k1
        while (x1 < len1 && y1 < len2 && text1.charAt(x1) == text2.charAt(y1)) {
          x1 += 1; y1 += 1
        }
        v1(k1Offset) = x1
        if (x1 > len1) k1end += 2
        else if (y1 > len2) k1start += 2
        else if (front) {
          val k2Offset = vOffset + delta - k1
          if (k2Offset >= 0 && k2Offset < vLength && v2(k2Offset) != -1) {
            val x2 = len1 - v2(k2Offset)
            if (x1 >= x2) return bisectSplit(text1, text2, x1, y1)
          }
        }
        k1 += 2
      }
      // reverse path
      var k2 = -d + k2start
      while (k2 <= d - k2end) {
        val k2Offset = vOffset + k2
        var x2 =
          if (k2 == -d || (k2 != d && v2(k2Offset - 1) < v2(k2Offset + 1)))
            v2(k2Offset + 1)
          else v2(k2Offset - 1) + 1
        var y2 = x2 - k2
        while (x2 < len1 && y2 < len2 &&
            text1.charAt(len1 - x2 - 1) == text2.charAt(len2 - y2 - 1)) {
          x2 += 1; y2 += 1
        }
        v2(k2Offset) = x2
        if (x2 > len1) k2end += 2
        else if (y2 > len2) k2start += 2
        else if (!front) {
          val k1Offset = vOffset + delta - k2
          if (k1Offset >= 0 && k1Offset < vLength && v1(k1Offset) != -1) {
            val x1 = v1(k1Offset)
            val y1 = vOffset + x1 - k1Offset
            val x2m = len1 - x2
            if (x1 >= x2m) return bisectSplit(text1, text2, x1, y1)
          }
        }
        k2 += 2
      }
      d += 1
    }
    // no commonality at all
    mutable.Buffer(Diff(DELETE, text1), Diff(INSERT, text2))
  }

  private def bisectSplit(text1: String, text2: String,
      x: Int, y: Int): mutable.Buffer[Diff] = {
    val d1 = diffMain(text1.substring(0, x), text2.substring(0, y), checklines = false)
    val d2 = diffMain(text1.substring(x), text2.substring(y), checklines = false)
    d1 ++= d2
    d1
  }

  // ---- cleanup ---------------------------------------------------------

  def cleanupMerge(diffs: mutable.Buffer[Diff]): Unit = {
    var changed = true
    while (changed) {
      changed = false
      diffs += Diff(EQUAL, "")
      var pointer = 0
      var countDelete = 0
      var countInsert = 0
      var textDelete = ""
      var textInsert = ""
      while (pointer < diffs.length) {
        diffs(pointer).op match {
          case INSERT =>
            countInsert += 1; textInsert += diffs(pointer).text; pointer += 1
          case DELETE =>
            countDelete += 1; textDelete += diffs(pointer).text; pointer += 1
          case EQUAL =>
            if (countDelete + countInsert > 1) {
              if (countDelete != 0 && countInsert != 0) {
                // factor out common prefix
                val cp = commonPrefix(textInsert, textDelete)
                if (cp != 0) {
                  val at = pointer - countDelete - countInsert
                  if (at > 0 && diffs(at - 1).op == EQUAL)
                    diffs(at - 1).text += textInsert.substring(0, cp)
                  else {
                    diffs.insert(0, Diff(EQUAL, textInsert.substring(0, cp)))
                    pointer += 1
                  }
                  textInsert = textInsert.substring(cp)
                  textDelete = textDelete.substring(cp)
                }
                // factor out common suffix
                val cs = commonSuffix(textInsert, textDelete)
                if (cs != 0) {
                  diffs(pointer).text =
                    textInsert.substring(textInsert.length - cs) + diffs(pointer).text
                  textInsert = textInsert.substring(0, textInsert.length - cs)
                  textDelete = textDelete.substring(0, textDelete.length - cs)
                }
              }
              // delete the offending records, reinsert merged
              val at = pointer - countDelete - countInsert
              diffs.remove(at, countDelete + countInsert)
              var ins = at
              if (textDelete.nonEmpty) { diffs.insert(ins, Diff(DELETE, textDelete)); ins += 1 }
              if (textInsert.nonEmpty) { diffs.insert(ins, Diff(INSERT, textInsert)); ins += 1 }
              pointer = ins + 1
            } else if (pointer != 0 && diffs(pointer - 1).op == EQUAL) {
              diffs(pointer - 1).text += diffs(pointer).text
              diffs.remove(pointer)
            } else pointer += 1
            countInsert = 0; countDelete = 0; textDelete = ""; textInsert = ""
        }
      }
      if (diffs.last.text.isEmpty) diffs.remove(diffs.length - 1)
      // single edits surrounded on both sides by equalities can be shifted
      // sideways to eliminate an equality: A<ins>BA</ins>C → <ins>AB</ins>AC
      var pointer2 = 1
      while (pointer2 < diffs.length - 1) {
        if (diffs(pointer2 - 1).op == EQUAL && diffs(pointer2 + 1).op == EQUAL) {
          if (diffs(pointer2).text.endsWith(diffs(pointer2 - 1).text)) {
            diffs(pointer2).text = diffs(pointer2 - 1).text +
              diffs(pointer2).text.substring(0,
                diffs(pointer2).text.length - diffs(pointer2 - 1).text.length)
            diffs(pointer2 + 1).text = diffs(pointer2 - 1).text + diffs(pointer2 + 1).text
            diffs.remove(pointer2 - 1)
            changed = true
          } else if (diffs(pointer2).text.startsWith(diffs(pointer2 + 1).text)) {
            diffs(pointer2 - 1).text += diffs(pointer2 + 1).text
            diffs(pointer2).text = diffs(pointer2).text.substring(diffs(pointer2 + 1).text.length) +
              diffs(pointer2 + 1).text
            diffs.remove(pointer2 + 1)
            changed = true
          }
        }
        pointer2 += 1
      }
    }
  }

  def cleanupSemantic(diffs: mutable.Buffer[Diff]): Unit = {
    var changes = false
    val equalities = mutable.Stack[Int]()
    var lastEquality: String = null
    var pointer = 0
    var lengthInsertions1 = 0; var lengthDeletions1 = 0
    var lengthInsertions2 = 0; var lengthDeletions2 = 0
    while (pointer < diffs.length) {
      if (diffs(pointer).op == EQUAL) {
        equalities.push(pointer)
        lengthInsertions1 = lengthInsertions2
        lengthDeletions1 = lengthDeletions2
        lengthInsertions2 = 0
        lengthDeletions2 = 0
        lastEquality = diffs(pointer).text
      } else {
        if (diffs(pointer).op == INSERT) lengthInsertions2 += diffs(pointer).text.length
        else lengthDeletions2 += diffs(pointer).text.length
        if (lastEquality != null &&
            lastEquality.length <= math.max(lengthInsertions1, lengthDeletions1) &&
            lastEquality.length <= math.max(lengthInsertions2, lengthDeletions2)) {
          val eq = equalities.top
          diffs.insert(eq, Diff(DELETE, lastEquality))
          diffs(eq + 1).op = INSERT
          equalities.pop()
          if (equalities.nonEmpty) equalities.pop()
          pointer = if (equalities.nonEmpty) equalities.top else -1
          lengthInsertions1 = 0; lengthDeletions1 = 0
          lengthInsertions2 = 0; lengthDeletions2 = 0
          lastEquality = null
          changes = true
        }
      }
      pointer += 1
    }
    if (changes) cleanupMerge(diffs)
    cleanupSemanticLossless(diffs)
    // find overlaps between deletions and insertions
    var p = 1
    while (p < diffs.length) {
      if (diffs(p - 1).op == DELETE && diffs(p).op == INSERT) {
        val deletion = diffs(p - 1).text
        val insertion = diffs(p).text
        val overlap1 = commonOverlap(deletion, insertion)
        val overlap2 = commonOverlap(insertion, deletion)
        if (overlap1 >= overlap2) {
          if (overlap1 >= deletion.length / 2.0 || overlap1 >= insertion.length / 2.0) {
            diffs.insert(p, Diff(EQUAL, insertion.substring(0, overlap1)))
            diffs(p - 1).text = deletion.substring(0, deletion.length - overlap1)
            diffs(p + 1).text = insertion.substring(overlap1)
            p += 1
          }
        } else {
          if (overlap2 >= deletion.length / 2.0 || overlap2 >= insertion.length / 2.0) {
            diffs.insert(p, Diff(EQUAL, deletion.substring(0, overlap2)))
            diffs(p - 1).op = INSERT
            diffs(p - 1).text = insertion.substring(0, insertion.length - overlap2)
            diffs(p + 1).op = DELETE
            diffs(p + 1).text = deletion.substring(overlap2)
            p += 1
          }
        }
        p += 1
      }
      p += 1
    }
  }

  /** Shift edit boundaries to word/line boundaries where lossless. */
  def cleanupSemanticLossless(diffs: mutable.Buffer[Diff]): Unit = {
    var pointer = 1
    while (pointer < diffs.length - 1) {
      if (diffs(pointer - 1).op == EQUAL && diffs(pointer + 1).op == EQUAL) {
        var equality1 = diffs(pointer - 1).text
        var edit = diffs(pointer).text
        var equality2 = diffs(pointer + 1).text
        val commonOffset = commonSuffix(equality1, edit)
        if (commonOffset != 0) {
          val commonString = edit.substring(edit.length - commonOffset)
          equality1 = equality1.substring(0, equality1.length - commonOffset)
          edit = commonString + edit.substring(0, edit.length - commonOffset)
          equality2 = commonString + equality2
        }
        var bestEquality1 = equality1
        var bestEdit = edit
        var bestEquality2 = equality2
        var bestScore = semanticScore(equality1, edit) + semanticScore(edit, equality2)
        while (edit.nonEmpty && equality2.nonEmpty && edit.charAt(0) == equality2.charAt(0)) {
          equality1 += edit.charAt(0)
          edit = edit.substring(1) + equality2.charAt(0)
          equality2 = equality2.substring(1)
          val score = semanticScore(equality1, edit) + semanticScore(edit, equality2)
          if (score >= bestScore) {
            bestScore = score
            bestEquality1 = equality1
            bestEdit = edit
            bestEquality2 = equality2
          }
        }
        if (diffs(pointer - 1).text != bestEquality1) {
          if (bestEquality1.nonEmpty) diffs(pointer - 1).text = bestEquality1
          else { diffs.remove(pointer - 1); pointer -= 1 }
          diffs(pointer).text = bestEdit
          if (bestEquality2.nonEmpty) diffs(pointer + 1).text = bestEquality2
          else { diffs.remove(pointer + 1); pointer -= 1 }
        }
      }
      pointer += 1
    }
  }

  private val BlankLineEnd = java.util.regex.Pattern.compile("\\n\\r?\\n\\Z", java.util.regex.Pattern.DOTALL)
  private val BlankLineStart = java.util.regex.Pattern.compile("\\A\\r?\\n\\r?\\n", java.util.regex.Pattern.DOTALL)

  private def semanticScore(one: String, two: String): Int = {
    if (one.isEmpty || two.isEmpty) return 6
    val char1 = one.charAt(one.length - 1)
    val char2 = two.charAt(0)
    val nonAlphaNumeric1 = !Character.isLetterOrDigit(char1)
    val nonAlphaNumeric2 = !Character.isLetterOrDigit(char2)
    val whitespace1 = nonAlphaNumeric1 && Character.isWhitespace(char1)
    val whitespace2 = nonAlphaNumeric2 && Character.isWhitespace(char2)
    val lineBreak1 = whitespace1 && (char1 == '\n' || char1 == '\r')
    val lineBreak2 = whitespace2 && (char2 == '\n' || char2 == '\r')
    val blankLine1 = lineBreak1 && BlankLineEnd.matcher(one).find()
    val blankLine2 = lineBreak2 && BlankLineStart.matcher(two).find()
    if (blankLine1 || blankLine2) 5
    else if (lineBreak1 || lineBreak2) 4
    else if (nonAlphaNumeric1 && !whitespace1 && whitespace2) 3
    else if (whitespace1 || whitespace2) 2
    else if (nonAlphaNumeric1 || nonAlphaNumeric2) 1
    else 0
  }

  def cleanupEfficiency(diffs: mutable.Buffer[Diff]): Unit = {
    var changes = false
    val equalities = mutable.Stack[Int]()
    var lastEquality: String = null
    var pointer = 0
    var preIns = false
    var preDel = false
    var postIns = false
    var postDel = false
    var safeDiff = 0 // the last diff that is known to be unsplittable
    while (pointer < diffs.length) {
      if (diffs(pointer).op == EQUAL) {
        if (diffs(pointer).text.length < EditCost && (postIns || postDel)) {
          equalities.push(pointer)
          preIns = postIns
          preDel = postDel
          lastEquality = diffs(pointer).text
        } else {
          equalities.clear()
          lastEquality = null
          safeDiff = pointer
        }
        postIns = false; postDel = false
      } else {
        if (diffs(pointer).op == DELETE) postDel = true else postIns = true
        /* Five types to be split:
           <ins>A</ins><del>B</del>XY<ins>C</ins><del>D</del>
           <ins>A</ins>X<ins>C</ins><del>D</del>
           <ins>A</ins><del>B</del>X<ins>C</ins>
           <ins>A</del>X<ins>C</ins><del>D</del>
           <ins>A</ins><del>B</del>X<del>C</del> */
        if (lastEquality != null &&
            ((preIns && preDel && postIns && postDel) ||
             ((lastEquality.length < EditCost / 2) &&
              Seq(preIns, preDel, postIns, postDel).count(identity) == 3))) {
          val eq = equalities.top
          diffs.insert(eq, Diff(DELETE, lastEquality))
          diffs(eq + 1).op = INSERT
          equalities.pop()
          lastEquality = null
          if (preIns && preDel) {
            postIns = true; postDel = true
            equalities.clear()
            safeDiff = pointer
          } else {
            if (equalities.nonEmpty) equalities.pop()
            pointer = if (equalities.nonEmpty) equalities.top else safeDiff
            postIns = false; postDel = false
          }
          changes = true
        }
      }
      pointer += 1
    }
    if (changes) cleanupMerge(diffs)
  }

  // ---- patch construction ----------------------------------------------

  private def patchMakeFromDiffs(text1: String,
      diffs: mutable.Buffer[Diff]): Seq[Patch] = {
    val patches = mutable.Buffer[Patch]()
    if (diffs.isEmpty) return patches.toSeq
    var patch = new Patch
    var charCount1 = 0
    var charCount2 = 0
    // `prepatchText` tracks text1 as already-emitted patches would have
    // changed it — context is computed against that state
    var prepatchText = text1
    var postpatchText = text1
    diffs.zipWithIndex.foreach { case (d, idx) =>
      if (patch.diffs.isEmpty && d.op != EQUAL) {
        patch.start1 = charCount1
        patch.start2 = charCount2
      }
      d.op match {
        case INSERT =>
          patch.diffs += Diff(d.op, d.text)
          patch.length2 += d.text.length
          postpatchText = postpatchText.substring(0, charCount2) + d.text +
            postpatchText.substring(charCount2)
        case DELETE =>
          patch.length1 += d.text.length
          patch.diffs += Diff(d.op, d.text)
          postpatchText = postpatchText.substring(0, charCount2) +
            postpatchText.substring(charCount2 + d.text.length)
        case EQUAL =>
          if (d.text.length <= 2 * PatchMargin && patch.diffs.nonEmpty &&
              idx != diffs.length - 1) {
            patch.diffs += Diff(d.op, d.text)
            patch.length1 += d.text.length
            patch.length2 += d.text.length
          }
          if (d.text.length >= 2 * PatchMargin && patch.diffs.nonEmpty) {
            addContext(patch, prepatchText)
            patches += patch
            patch = new Patch
            prepatchText = postpatchText
            charCount1 = charCount2
          }
      }
      if (d.op != INSERT) charCount1 += d.text.length
      if (d.op != DELETE) charCount2 += d.text.length
    }
    if (patch.diffs.nonEmpty) {
      addContext(patch, prepatchText)
      patches += patch
    }
    patches.toSeq
  }

  private def addContext(patch: Patch, text: String): Unit = {
    if (text.isEmpty) return
    var pattern = text.substring(patch.start2,
      math.min(text.length, patch.start2 + patch.length1))
    var padding = 0
    while (text.indexOf(pattern) != text.lastIndexOf(pattern) &&
        pattern.length < MatchMaxBits - 2 * PatchMargin) {
      padding += PatchMargin
      pattern = text.substring(math.max(0, patch.start2 - padding),
        math.min(text.length, patch.start2 + patch.length1 + padding))
    }
    padding += PatchMargin
    val prefix = text.substring(math.max(0, patch.start2 - padding), patch.start2)
    val suffix = text.substring(
      math.min(text.length, patch.start2 + patch.length1),
      math.min(text.length, patch.start2 + patch.length1 + padding))
    if (prefix.nonEmpty) Diff(EQUAL, prefix) +=: patch.diffs
    if (suffix.nonEmpty) patch.diffs += Diff(EQUAL, suffix)
    patch.start1 -= prefix.length
    patch.start2 -= prefix.length
    patch.length1 += prefix.length + suffix.length
    patch.length2 += prefix.length + suffix.length
  }

  def patchToText(patches: Seq[Patch]): String = {
    val sb = new StringBuilder
    patches.foreach { p =>
      // crate deviation from canonical: len == 1 still prints ",1"
      // (goldens: `@@ -1,1 +1,1 @@`); len == 0 prints the 0-based start
      def coords(start: Int, len: Int): String =
        if (len == 0) s"$start,0" else s"${start + 1},$len"
      sb.append("@@ -").append(coords(p.start1, p.length1))
        .append(" +").append(coords(p.start2, p.length2)).append(" @@\n")
      p.diffs.foreach { d =>
        sb.append(d.op match {
          case INSERT => '+'
          case DELETE => '-'
          case EQUAL  => ' '
        })
        sb.append(uriEncode(d.text)).append('\n')
      }
    }
    sb.toString
  }

  /** JS-`encodeURI`-shaped escaping over UTF-8 bytes (keeps
    * `;,/?:@&=+$-_.!~*'()#` and alphanumerics, escapes the rest as %XX). */
  def uriEncode(t: String): String = {
    val keep = "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789;,/?:@&=+$-_.!~*'()#"
    val sb = new StringBuilder
    t.getBytes("UTF-8").foreach { byte =>
      val c = (byte & 0xff).toChar
      if (c < 128 && keep.indexOf(c) >= 0) sb.append(c)
      else sb.append(f"%%${byte & 0xff}%02X")
    }
    sb.toString
  }

  // ---- low-level helpers -------------------------------------------------

  def commonPrefix(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(i) == b.charAt(i)) i += 1
    i
  }

  def commonSuffix(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n && a.charAt(a.length - 1 - i) == b.charAt(b.length - 1 - i)) i += 1
    i
  }

  /** Length of the longest suffix of `text1` that is a prefix of `text2`
    * (canonical diff_commonOverlap, KMP-ish doubling probe). */
  def commonOverlap(text1: String, text2: String): Int = {
    var t1 = text1
    var t2 = text2
    val len1 = t1.length
    val len2 = t2.length
    if (len1 == 0 || len2 == 0) return 0
    if (len1 > len2) t1 = t1.substring(len1 - len2)
    else if (len1 < len2) t2 = t2.substring(0, len1)
    val textLength = math.min(len1, len2)
    if (t1 == t2) return textLength
    var best = 0
    var length = 1
    while (true) {
      val pattern = t1.substring(textLength - length)
      val found = t2.indexOf(pattern)
      if (found == -1) return best
      length += found
      if (found == 0 || t1.substring(textLength - length) == t2.substring(0, length)) {
        best = length
        length += 1
      }
    }
    best
  }
}
