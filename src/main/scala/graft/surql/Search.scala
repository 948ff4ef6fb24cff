package graft.surql

import graft.surql.ast._
import scala.collection.immutable.TreeMap
import scala.collection.mutable

/** Full-text analysis, BM25 scoring and KNN support for the interpreter —
  * the semantics mirror the reference's analyzer pipeline
  * (idx/ft/analyzer/tokenizer.rs state machine, filter.rs term rewrites,
  * FilteringStage querying-vs-indexing split) and its BM25 scorer
  * (idx/ft/fulltext.rs:855-960: idf = ln((N−n+0.5)/(n+0.5)) clamped ≥ 0,
  * tf′ = 1 + ln(tf), f64 math cast to f32). */
object Search {

  /** A term derived from a source token: `term` is the (filtered) text,
    * [start,end) the char span of the ORIGINAL token in the source string
    * (highlights/offsets report source spans, not derived-term spans). */
  final case class Tok(term: String, start: Int, end: Int,
      pStart: Int = -1, pEnd: Int = -1) {
    /** Partial (derived-term) span: where THIS term sits in the source —
      * differs from the token span only for ngram/edgengram sub-terms
      * (search::highlight/offsets partial=true mode). */
    def pSpan: (Int, Int) = if (pStart >= 0) (pStart, pEnd) else (start, end)
  }

  final case class AnalyzerDef(
      name: String,
      function: Option[String],
      tokenizers: Seq[String],
      filters: Seq[(String, Seq[String])])

  // ---- analyzer definition lookup ---------------------------------------

  /** Parse the canonical `DEFINE ANALYZER` render stored in the catalog. */
  def parseAnalyzer(name: String, render: String): AnalyzerDef = {
    def grab(kw: String): Option[String] = {
      val i = render.indexOf(" " + kw + " ")
      if (i < 0) scala.None
      else {
        val s = i + kw.length + 2
        // segment runs to the next top-level keyword
        val stops = Seq(" FUNCTION ", " TOKENIZERS ", " FILTERS ", " COMMENT ")
          .map(k => render.indexOf(k, s)).filter(_ >= 0)
        val e = if (stops.isEmpty) render.length else stops.min
        Some(render.substring(s, e).trim)
      }
    }
    val fn = grab("FUNCTION")
    val toks = grab("TOKENIZERS").map(_.split(",").map(_.trim.toLowerCase).toSeq).getOrElse(Nil)
    val filters = grab("FILTERS").map { txt =>
      // split on commas NOT inside parens: "lowercase, ngram(1,3)"
      val out = mutable.ArrayBuffer[String]()
      var depth = 0; val sb = new StringBuilder
      txt.foreach {
        case '(' => depth += 1; sb.append('(')
        case ')' => depth -= 1; sb.append(')')
        case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
        case c => sb.append(c)
      }
      if (sb.nonEmpty) out += sb.toString.trim
      out.toSeq.filter(_.nonEmpty).map { f =>
        val p = f.indexOf('(')
        if (p < 0) (f.toLowerCase, Nil: Seq[String])
        else (f.substring(0, p).toLowerCase,
          f.substring(p + 1, f.lastIndexOf(')')).split(",").map(_.trim).toSeq)
      }
    }.getOrElse(Nil)
    AnalyzerDef(name, fn, toks, filters)
  }

  def analyzerOf(in: Interp, name: String): AnalyzerDef = {
    val d = in.analyzers.getOrElse(name,
      throw SqlError(s"The analyzer '$name' does not exist"))
    parseAnalyzer(name, d.render)
  }

  // ---- tokenizers (tokenizer.rs state machine) ---------------------------

  private final val ClUnknown = 0
  private final val ClWhitespace = 1
  private final val ClAlphaLower = 2
  private final val ClAlphaUpper = 3
  private final val ClNumeric = 4
  private final val ClPunct = 5
  private final val ClOther = 6

  /** The reference's tokenizer classifies on Rust `char::is_alphabetic`
    * (tokenizer.rs CharacterClass::from) — the Unicode `Alphabetic`
    * property: Lu/Ll/Lt/Lm/Lo, Nl, plus `Other_Alphabetic` marks
    * (Tamil/Devanagari vowel signs, Arabic harakat). Java's
    * `Character.isAlphabetic` implements the SAME UCD-derived property, so
    * it is the exact predicate: viramas/killers, Thai tone marks, Hebrew
    * cantillation, and bare combining diacriticals all fall out as
    * non-alphabetic from real property data — no hand-kept mark lists. The
    * reference's Tamil vectors pin the split-at-virama behavior this
    * produces (filter.rs test_tamil_stemmer). */
  private def classOf(c: Char): Int =
    if (Character.isAlphabetic(c.toInt)) { if (c.isUpper) ClAlphaUpper else ClAlphaLower }
    else if (Character.isDigit(c) || c.isDigit) ClNumeric
    else if (c.isWhitespace) ClWhitespace
    else if (c < 128 && !c.isLetterOrDigit && !c.isWhitespace && c > ' ') ClPunct
    else ClOther

  private def isAlpha(cl: Int) = cl == ClAlphaLower || cl == ClAlphaUpper

  // character roles
  private final val RPart = 0
  private final val RNew = 1
  private final val RIsolated = 2
  private final val RNotTok = 3

  private final class Splitter(t: String) {
    private var state = ClUnknown
    def role(cl: Int): Int = t match {
      case "blank" => if (cl == ClWhitespace) RNotTok else RPart
      case "class" =>
        val r =
          if ((isAlpha(cl) && isAlpha(state)) ||
              (cl == ClNumeric && state == ClNumeric) ||
              (cl == ClPunct && state == ClPunct)) RPart
          else if (cl == ClOther || cl == ClWhitespace || cl == ClUnknown) RNotTok
          else RNew
        state = cl; r
      case "punct" =>
        if (cl == ClWhitespace || isAlpha(cl) || cl == ClNumeric) RPart
        else if (cl == ClPunct) RIsolated
        else RNotTok
      case "camel" =>
        val r =
          if (isAlpha(cl)) {
            if (isAlpha(state)) { if (cl == ClAlphaUpper && state == ClAlphaLower) RNew else RPart }
            else RNew
          }
          else if (cl == ClNumeric || cl == ClPunct) RPart
          else RNotTok
        state = cl; r
      case _ => RPart
    }
  }

  /** Tokenize per the reference's multi-splitter state machine. With no
    * tokenizers the whole input is a single token. */
  def tokenize(tokenizers: Seq[String], input: String): Vector[Tok] = {
    if (tokenizers.isEmpty)
      return if (input.isEmpty) Vector.empty else Vector(Tok(input, 0, input.length))
    val splitters = tokenizers.map(new Splitter(_))
    val out = mutable.ArrayBuffer[Tok]()
    var last = 0
    var cur = 0
    var prevRole = RPart
    def role(c: Char): Int = {
      val cl = classOf(c)
      if (cl == ClOther && !c.isLetterOrDigit) return RNotTok
      var r = RPart
      var i = 0
      while (i < splitters.length) {
        splitters(i).role(cl) match {
          case RIsolated => return RIsolated
          case RNew      => r = RNew
          case RNotTok   => return RNotTok
          case _         => ()
        }
        i += 1
      }
      r
    }
    input.foreach { c =>
      val cr = role(c)
      if (cr != RPart || prevRole == RIsolated) {
        if (last < cur) out += Tok(input.substring(last, cur), last, cur)
        last = cur
        if (cr == RNotTok) last += 1
      }
      prevRole = cr
      cur += 1
    }
    if (cur != last) out += Tok(input.substring(last, cur), last, cur)
    out.toVector
  }

  // ---- filters (filter.rs) ----------------------------------------------

  /** Apply one filter to one token; may drop, keep, or expand into several
    * derived terms (all keeping the source span). */
  /** Lemmatization tables for mapper('<path>') filters, cached per path.
    * File format (idx/ft/analyzer/mapper.rs add_line_tree): one
    * "lemma<TAB>form" pair per line; the FORM is the key; a BOM and \r are
    * tolerated; a missing tab or an extra tab errors like the reference. */
  private val mapperCache =
    scala.collection.concurrent.TrieMap[String, Map[String, String]]()

  def mapperTable(path0: String): Map[String, String] =
    mapperCache.getOrElseUpdate(path0, {
      // the filter arg may arrive as the raw quoted literal
      val path = path0.stripPrefix("'").stripSuffix("'")
        .stripPrefix("\"").stripSuffix("\"")
      val p0 = java.nio.file.Paths.get(path)
      // relative paths resolve like the reference test layout (the corpus
      // defines mapper('../tests/data/…') relative to language-tests/)
      val p =
        if (p0.isAbsolute || java.nio.file.Files.exists(p0)) p0
        else java.nio.file.Paths.get("/root/reference/language-tests")
          .resolve(path).normalize()
      if (!java.nio.file.Files.exists(p))
        throw SqlError(s"Analyzer error: mapper file not found: $path")
      val out = scala.collection.mutable.HashMap[String, String]()
      val src = scala.io.Source.fromFile(p.toFile, "UTF-8")
      try src.getLines().zipWithIndex.foreach { case (line0, n) =>
        val line = (if (n == 0) line0.stripPrefix("﻿") else line0)
          .stripSuffix("\r")
        if (line.nonEmpty) line.split('\t') match {
          case Array(lemma, form) => out(form.trim) = lemma.trim
          case _ => throw SqlError(
            s"Analyzer error: expected two tab-separated terms at line $n: $line")
        }
      } finally src.close()
      out.toMap
    })

  private def applyFilter(t: Tok, name: String, args: Seq[String]): Vector[Tok] = name match {
    case "lowercase" => Vector(t.copy(term = t.term.toLowerCase))
    case "uppercase" => Vector(t.copy(term = t.term.toUpperCase))
    case "ascii" =>
      val norm = java.text.Normalizer.normalize(t.term, java.text.Normalizer.Form.NFD)
        .replaceAll("\\p{M}", "")
      Vector(t.copy(term = norm))
    case "ngram" =>
      val min = args.headOption.map(_.toInt).getOrElse(1)
      val max = args.lift(1).map(_.toInt).getOrElse(min)
      val cs = t.term
      val l = cs.length
      if (l < min) Vector.empty
      else {
        val out = mutable.ArrayBuffer[Tok]()
        var s = 0
        while (s <= l - min) {
          var p = s + min
          val e = Math.min(s + max, l)
          while (p <= e) {
            out += t.copy(term = cs.substring(s, p),
              pStart = t.start + s, pEnd = t.start + p)
            p += 1
          }
          s += 1
        }
        out.toVector
      }
    case "edgengram" =>
      val min = args.headOption.map(_.toInt).getOrElse(1)
      val maxArg = args.lift(1).map(_.toInt).getOrElse(min)
      val l = t.term.length
      if (l < min) Vector.empty
      else {
        val max = Math.min(maxArg, l)
        (min to max).map(p => t.copy(term = t.term.substring(0, p),
          pStart = t.start, pEnd = t.start + p)).toVector
      }
    // snowball(<language>): real stemming (reference idx/ft/analyzer/
    // filter.rs:36-53 → rust_stemmers; implemented from the published
    // algorithms in graft.surql.Snowball). Unimplemented languages pass
    // through unchanged — see Snowball.supported.
    case "snowball" =>
      Vector(t.copy(term = Snowball.stem(args.headOption.getOrElse("english"), t.term)))
    // mapper('<path>'): file-backed lemmatization (idx/ft/analyzer/
    // mapper.rs — lines of "lemma<TAB>form"; the form is the lookup key,
    // later duplicate forms overwrite like the reference's tree insert).
    // Loaded lazily at first analyze and cached per path, so DEFINE alone
    // never touches the filesystem.
    case "mapper" =>
      args.headOption match {
        case Some(path) =>
          Search.mapperTable(path).get(t.term) match {
            case Some(lemma) => Vector(t.copy(term = lemma))
            case scala.None  => Vector(t)
          }
        case scala.None => Vector(t)
      }
    case _ => Vector(t)
  }

  private def queryStage(name: String): Boolean =
    name != "ngram" && name != "edgengram"

  def applyFilters(toks: Vector[Tok], filters: Seq[(String, Seq[String])],
      querying: Boolean): Vector[Tok] =
    filters.foldLeft(toks) { case (acc, (name, args)) =>
      if (querying && !queryStage(name)) acc
      else acc.flatMap(applyFilter(_, name, args))
    }

  /** Full analysis of one string. `querying` skips ngram/edgengram
    * (FilteringStage::Querying). */
  def analyzeText(in: Interp, env: Env, a: AnalyzerDef, text: String,
      querying: Boolean): Vector[Tok] = {
    val input = a.function match {
      case Some(fnName) =>
        val fq = if (fnName.startsWith("fn::")) fnName else "fn::" + fnName
        val r = Functions.call(fq, Seq(Lit(VStr(text))).map(identity), env)
        r match {
          case VStr(s) => s
          case _ =>
            val bare = fq.stripPrefix("fn::")
            throw SqlError(s"There was a problem running the $bare() function. The function should return a string.")
        }
      case scala.None => text
    }
    applyFilters(tokenize(a.tokenizers, input), a.filters, querying)
  }

  // ---- FTS index resolution ---------------------------------------------

  final case class FtsIndex(name: String, table: String, fields: Seq[String],
      analyzer: String, k1: Double, b: Double, highlights: Boolean)

  /** The FULLTEXT/SEARCH index covering `field` on `table`, if any. */
  def ftsIndexFor(in: Interp, table: String, field: String): Option[FtsIndex] =
    in.indexDefs.collectFirst {
      case ((t, n), d) if t == table && d.fields.contains(field) &&
          (d.tail.toUpperCase.startsWith("FULLTEXT") || d.tail.toUpperCase.startsWith("SEARCH")) =>
        val m = "(?i)ANALYZER\\s+(\\w+)".r.findFirstMatchIn(d.tail)
        val bm = "(?i)BM25\\s*\\(\\s*([0-9.]+)\\s*,\\s*([0-9.]+)\\s*\\)".r.findFirstMatchIn(d.tail)
        FtsIndex(n, t, d.fields, m.map(_.group(1)).getOrElse(""),
          bm.map(_.group(1).toDouble).getOrElse(1.2),
          bm.map(_.group(2).toDouble).getOrElse(0.75),
          d.tail.toUpperCase.contains("HIGHLIGHTS"))
    }

  // ---- corpus stats (BM25) ----------------------------------------------

  /** Per-(table, index) corpus stats: term → doc-count, per-doc term freq,
    * per-doc length. Cached against the interp's write-history length. */
  final class Corpus(val docCount: Long, val totalLen: Long,
      val termDocs: Map[String, Int],
      val docTerms: Map[V, Map[String, Int]],
      val docLen: Map[V, Long])

  /** Corpus cache scoped per Interp instance (weak keys — entries die with
    * the interp, so parallel golden runs can't cross-pollinate and memory is
    * reclaimed). Within an interp, the key carries the full index + analyzer
    * definitions and the interp's monotonic write generation — NOT the
    * history length, which is non-monotonic (transaction rollback truncates
    * it, so a later state could alias a rolled-back one). writeGen bumps on
    * every append AND every snapshot restore, so it can't ABA. */
  private val corpusCache =
    new java.util.WeakHashMap[Interp, mutable.HashMap[(FtsIndex, String, Long), Corpus]]()

  private def strValues(v: V): Vector[String] = v match {
    case VStr(s)     => Vector(s)
    case VArr(items) => items.flatMap(strValues)
    // object values index/highlight their nested strings in key order
    // (ft/highlighter.rs walks the value tree; VObj is key-sorted)
    case VObj(fs)    => fs.values.toVector.flatMap(strValues)
    case _           => Vector.empty
  }

  def corpusFor(in: Interp, env: Env, idx: FtsIndex): Corpus = {
    val perInterp = corpusCache.synchronized {
      var m = corpusCache.get(in)
      if (m == null) { m = mutable.HashMap[(FtsIndex, String, Long), Corpus](); corpusCache.put(in, m) }
      m
    }
    val anaDef = in.analyzers.get(idx.analyzer).map(_.render).getOrElse("")
    val key = (idx, anaDef, in.writeGen)
    // The inner map is shared by all FTS queries against this interp — hold
    // its lock across the eviction scan and the compute-if-absent so
    // concurrent queries can't corrupt it or race the build.
    perInterp.synchronized {
      // Drop stale generations of this index (older write gens / defs).
      perInterp.keysIterator
        .filter(k => k._1.table == idx.table && k._1.name == idx.name && k != key)
        .toList.foreach(perInterp.remove)
      perInterp.getOrElseUpdate(key, {
      val a = analyzerOf(in, idx.analyzer)
      val termDocs = mutable.HashMap[String, Int]()
      val docTerms = mutable.HashMap[V, Map[String, Int]]()
      val docLen = mutable.HashMap[V, Long]()
      var total = 0L
      var n = 0L
      in.tables.get(idx.table).foreach { tb =>
        tb.foreach { case (k, doc) =>
          val toks = idx.fields.flatMap { f =>
            strValues(doc.fields.getOrElse(f, VNone))
              .flatMap(s => analyzeText(in, env, a, s, querying = false))
          }
          val freq = toks.groupBy(_.term).map { case (t, xs) => t -> xs.length }
          docTerms(k) = freq
          docLen(k) = toks.length.toLong
          total += toks.length
          n += 1
          freq.keys.foreach(t => termDocs(t) = termDocs.getOrElse(t, 0) + 1)
        }
      }
      new Corpus(n, total, termDocs.toMap, docTerms.toMap, docLen.toMap)
      })
    }
  }

  /** BM25 as the reference computes it (f64 math, result cast to f32). */
  def bm25Score(c: Corpus, idx: FtsIndex, docKey: V, queryTerms: Seq[String]): Double = {
    if (c.docCount == 0) return 0.0
    val avg = c.totalLen.toDouble / c.docCount.toDouble
    val dl = c.docLen.getOrElse(docKey, 0L).toDouble
    val freqs = c.docTerms.getOrElse(docKey, Map.empty)
    var sc = 0.0
    queryTerms.distinct.foreach { t =>
      val n = c.termDocs.getOrElse(t, 0)
      val tf = freqs.getOrElse(t, 0)
      if (tf > 0 && n > 0) {
        val idf = Math.max(0.0, Math.log((c.docCount - n + 0.5) / (n + 0.5)))
        if (idf != 0.0) {
          val tfPrime = 1.0 + Math.log(tf.toDouble)
          val lengthNorm = (1.0 - idx.b) + idx.b / avg * dl
          sc += idf * (idx.k1 + 1.0) * tfPrime / (tfPrime + idx.k1 * lengthNorm)
        }
      }
    }
    sc.toFloat.toDouble
  }

  // ---- match evaluation --------------------------------------------------

  /** Decoded `@ref,OP@` operator suffix. */
  final case class MatchOp(ref: Option[Int], or: Boolean)

  def parseMatchOp(op: String): MatchOp = {
    // op is "MATCHES" or "MATCHES:<ref>:<AND|OR>" with either part empty
    val parts = op.split(":", -1)
    val ref = if (parts.length > 1 && parts(1).nonEmpty) Some(parts(1).toInt) else scala.None
    val or = parts.length > 2 && parts(2) == "OR"
    MatchOp(ref, or)
  }

  /** Per-statement registry of match refs (field path, query expr) — bound
    * into Env as a hidden param so score/highlight/offsets can find them. */
  final case class RefInfo(field: String, query: Expr)

  /** Evaluate `lhs @…@ rhs` for the current doc. */
  def evalMatches(op: String, lhs: Expr, rhs: Expr, env: Env): V = {
    val mo = parseMatchOp(op)
    val qv = Eval.eval(rhs, env)
    val queryStr = qv match {
      case VStr(s) => s
      case other   => other.renderRaw
    }
    val ctx = for {
      in <- env.interp
      doc <- env.doc
      rid <- doc.fields.get("id").collect { case r: VRid => r }
      field <- lhs match {
        case Idiom(parts) => fieldPathOf(parts)
        case _            => scala.None
      }
      idx <- ftsIndexFor(in, rid.table, field)
    } yield (in, doc, rid, field, idx)
    ctx match {
      case Some((in, doc, rid, field, idx)) =>
        val a = analyzerOf(in, idx.analyzer)
        val qTerms = analyzeText(in, env, a, queryStr, querying = true).map(_.term).distinct
        if (qTerms.isEmpty) return VBool(false)
        val docTerms: Set[String] = strValues(doc.fields.getOrElse(field, VNone))
          .flatMap(s => analyzeText(in, env, a, s, querying = false)).map(_.term).toSet
        VBool(if (mo.or) qTerms.exists(docTerms.contains) else qTerms.forall(docTerms.contains))
      case scala.None =>
        // no FTS index — plain whitespace term matching (legacy behavior)
        val l = Eval.eval(lhs, env)
        (l, qv) match {
          case (VStr(s), VStr(q)) =>
            val terms = q.toLowerCase.split("\\s+").filter(_.nonEmpty)
            val toks = s.toLowerCase.split("\\s+").toSet
            VBool(if (mo.or) terms.exists(toks.contains) else terms.forall(toks.contains))
          case _ => VBool(false)
        }
    }
  }

  def fieldPathOf(parts: Seq[Part]): Option[String] = {
    val names = parts.collect { case PField(n) => n }
    if (names.length == parts.length && names.nonEmpty) Some(names.mkString("."))
    else scala.None
  }

  /** Walk a statement's expressions for `@N@` refs → ref → RefInfo. */
  def collectRefs(s: SelectStmt): Map[Int, RefInfo] = {
    val out = mutable.HashMap[Int, RefInfo]()
    def walk(e: Expr): Unit = e match {
      case Binary(op, l, r) =>
        if (op.startsWith("MATCHES")) {
          val mo = parseMatchOp(op)
          for (ref <- mo.ref; f <- (l match {
            case Idiom(parts) => fieldPathOf(parts)
            case _            => scala.None
          })) out(ref) = RefInfo(f, r)
        }
        walk(l); walk(r)
      case Prefix(_, x)    => walk(x)
      case FnCall(_, as)   => as.foreach(walk)
      case Idiom(parts)    => parts.foreach {
        case PStart(x)  => walk(x)
        case PWhere(x)  => walk(x)
        case PIndex(x)  => walk(x)
        case _          => ()
      }
      case Subquery(st)    => st match {
        case sel: SelectStmt =>
          sel.where.foreach(walk); sel.fields.foreach(f => walk(f.expr))
        case _ => ()
      }
      case IfExpr(bs, o)   => bs.foreach { case (c, v) => walk(c); walk(v) }; o.foreach(walk)
      case ArrLit(items)   => items.foreach(walk)
      case ObjLit(fs)      => fs.foreach { case (_, v) => walk(v) }
      case _               => ()
    }
    s.where.foreach(walk)
    s.fields.foreach(f => walk(f.expr))
    s.order.foreach(k => walk(k.expr))
    out.toMap
  }

  /** Env carrier for the per-statement ref registry. */
  val RefsParam = "__match_refs__"

  def encodeRefs(refs: Map[Int, RefInfo], env: Env): V =
    VObj(TreeMap(refs.toSeq.map { case (k, ri) =>
      val q = Eval.eval(ri.query, env) match {
        case VStr(s) => s
        case other   => other.renderRaw
      }
      k.toString -> (V.obj("field" -> VStr(ri.field), "query" -> VStr(q)): V)
    }: _*))

  private def refInfo(env: Env, ref: Int): Option[(String, String)] =
    env.params.get(RefsParam).flatMap {
      case VObj(fs) => fs.get(ref.toString).collect {
        case VObj(ri) =>
          (ri.get("field"), ri.get("query")) match {
            case (Some(VStr(f)), Some(VStr(q))) => (f, q)
            case _ => ("", "")
          }
      }.filter(_._1.nonEmpty)
      case _ => scala.None
    }

  /** search::score(ref): BM25 for the current doc; NONE when it doesn't
    * match the ref's condition. */
  def score(env: Env, ref: Int): V = {
    val r = for {
      in <- env.interp
      doc <- env.doc
      rid <- doc.fields.get("id").collect { case x: VRid => x }
      (field, query) <- refInfo(env, ref)
      idx <- ftsIndexFor(in, rid.table, field)
    } yield {
      val a = analyzerOf(in, idx.analyzer)
      val qTerms = analyzeText(in, env, a, query, querying = true).map(_.term).distinct
      val c = corpusFor(in, env, idx)
      val docTerms = c.docTerms.getOrElse(rid.key, Map.empty)
      if (qTerms.isEmpty || !qTerms.exists(docTerms.contains)) VFloat(0.0)
      else VFloat(bm25Score(c, idx, rid.key, qTerms))
    }
    // a resolvable match-ref scores 0 on unmatched/unindexed docs; only an
    // unknown ref yields NONE (fnc/search.rs score)
    r.getOrElse(if (refInfo(env, ref).isDefined) VFloat(0.0) else VNone)
  }

  /** Matched source spans per value-index of the ref's field for the
    * current doc. */
  private def matchSpans(env: Env, ref: Int,
      partial: Boolean): Option[(Vector[String], Map[Int, Vector[(Int, Int)]])] =
    for {
      in <- env.interp
      doc <- env.doc
      rid <- doc.fields.get("id").collect { case x: VRid => x }
      (field, query) <- refInfo(env, ref)
      idx <- ftsIndexFor(in, rid.table, field)
    } yield {
      val a = analyzerOf(in, idx.analyzer)
      val qTerms = analyzeText(in, env, a, query, querying = true).map(_.term).toSet
      val values = strValues(doc.fields.getOrElse(field, VNone))
      val spans = values.zipWithIndex.flatMap { case (s, i) =>
        val toks = analyzeText(in, env, a, s, querying = false)
        val hit = toks.filter(t => qTerms.contains(t.term))
          .map(t => if (partial) t.pSpan else (t.start, t.end)).distinct.sorted
        if (hit.isEmpty) scala.None else Some(i -> hit)
      }.toMap
      (values, spans)
    }

  /** search::highlight(pre, post, ref, [partial]): wrap matched source
    * spans — whole enclosing tokens by default, the matched ngram sub-spans
    * with partial=true (fnc/search.rs highlight partial flag). */
  def highlight(env: Env, pre: String, post: String, ref: Int,
      partial: Boolean = false): V = {
    matchSpans(env, ref, partial) match {
      case Some((values, spans)) if spans.nonEmpty =>
        val out = values.zipWithIndex.map { case (s, i) =>
          spans.get(i) match {
            case Some(hs) =>
              val sb = new StringBuilder
              var p = 0
              // merge adjacent/overlapping spans
              val merged = hs.foldLeft(Vector.empty[(Int, Int)]) { case (acc, (st, e)) =>
                acc.lastOption match {
                  case Some((ls, le)) if st <= le => acc.init :+ ((ls, Math.max(le, e)))
                  case _ => acc :+ ((st, e))
                }
              }
              merged.foreach { case (st, e) =>
                // a FUNCTION analyzer can LENGTHEN the text: spans past the
                // original value error, as the reference's highlighter does
                // (highlighter.rs:92-95, err "A value can't be highlighted")
                if (e > s.length)
                  throw SqlError(
                    s"A value can't be highlighted: position overflow: $e - len: ${s.length}")
                sb.append(s.substring(p, st)).append(pre)
                  .append(s.substring(st, e)).append(post)
                p = e
              }
              sb.append(s.substring(p))
              sb.toString
            case scala.None => s
          }
        }
        if (out.length == 1) VStr(out.head) else VArr(out.map(VStr(_)))
      case Some((values, _)) =>
        if (values.length == 1) VStr(values.head) else VArr(values.map(VStr(_)))
      case scala.None => VNone
    }
  }

  /** search::offsets(ref, [partial]): { "<valueIndex>": [{s,e}…] }. */
  def offsets(env: Env, ref: Int, partial: Boolean = false): V = {
    matchSpans(env, ref, partial) match {
      case Some((_, spans)) if spans.nonEmpty =>
        VObj(TreeMap(spans.toSeq.sortBy(_._1).map { case (i, hs) =>
          i.toString -> (VArr(hs.map { case (s, e) =>
            V.obj("e" -> VInt(e.toLong), "s" -> VInt(s.toLong)): V
          }): V)
        }: _*))
      case _ => VNone
    }
  }

  // ---- search::analyze ---------------------------------------------------

  def analyzeFn(env: Env, name: String, text: String): V = {
    val in = env.interp.getOrElse(throw SqlError(s"The analyzer '$name' does not exist"))
    val a = analyzerOf(in, name)
    VArr(analyzeText(in, env, a, text, querying = false).map(t => VStr(t.term): V))
  }

  // ---- KNN ---------------------------------------------------------------

  /** Decoded `<|k…|>` operator: "KNN:<k>:<arg>" where arg is an ef int, a
    * metric name, or empty. */
  final case class KnnOp(k: Int, metric: Option[String])

  def parseKnnOp(op: String): KnnOp = {
    val parts = op.split(":", -1)
    val k = parts(1).toInt
    val arg = if (parts.length > 2) parts(2) else ""
    val metric =
      if (arg.isEmpty || arg.forall(_.isDigit)) scala.None // ef search param — metric from index
      else Some(arg.toUpperCase)
    KnnOp(k, metric)
  }

  def vecOf(v: V): Option[Vector[Double]] = v match {
    case VArr(items) =>
      val ds = items.flatMap {
        case n: VNum => Some(n.toDouble)
        case _       => scala.None
      }
      if (ds.length == items.length && ds.nonEmpty) Some(ds) else scala.None
    case _ => scala.None
  }

  /** Index-served distance over f32-stored vectors: components quantized to
    * f32, products ACCUMULATED in f32, final sqrt/divide in f64 — the exact
    * arithmetic of the reference's F32 SharedVector (idx/trees/vector.rs),
    * verified bit-for-bit against the search-linear/rrf goldens. */
  def distanceF32(metric: String, a0: Vector[Double], b0: Vector[Double]): Double = {
    val a = a0.map(_.toFloat)
    val b = b0.map(_.toFloat)
    val m = Math.min(a.length, b.length)
    metric match {
      case "COSINE" =>
        var d = 0.0f; var na = 0.0f; var nb = 0.0f; var i = 0
        while (i < m) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        1.0 - d.toDouble / (Math.sqrt(na.toDouble) * Math.sqrt(nb.toDouble))
      case "MANHATTAN" =>
        var s = 0.0f; var i = 0
        while (i < m) { s += Math.abs(a(i) - b(i)); i += 1 }
        s.toDouble
      case "CHEBYSHEV" =>
        var s = 0.0f; var i = 0
        while (i < m) { s = Math.max(s, Math.abs(a(i) - b(i))); i += 1 }
        s.toDouble
      case "HAMMING" =>
        var s = 0.0; var i = 0
        while (i < m) { if (a(i) != b(i)) s += 1; i += 1 }
        s
      case _ => // EUCLIDEAN
        var s = 0.0f; var i = 0
        while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
        Math.sqrt(s.toDouble)
    }
  }

  def distance(metric: String, a: Vector[Double], b: Vector[Double]): Double = {
    val m = Math.min(a.length, b.length)
    metric match {
      case "COSINE" =>
        var dot = 0.0; var na = 0.0; var nb = 0.0
        var i = 0
        while (i < m) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
        1.0 - dot / (Math.sqrt(na) * Math.sqrt(nb))
      case "MANHATTAN" =>
        var s = 0.0; var i = 0
        while (i < m) { s += Math.abs(a(i) - b(i)); i += 1 }
        s
      case "CHEBYSHEV" =>
        var s = 0.0; var i = 0
        while (i < m) { s = Math.max(s, Math.abs(a(i) - b(i))); i += 1 }
        s
      case "HAMMING" =>
        var s = 0.0; var i = 0
        while (i < m) { if (a(i) != b(i)) s += 1; i += 1 }
        s
      case _ => // EUCLIDEAN
        var s = 0.0; var i = 0
        while (i < m) { val d = a(i) - b(i); s += d * d; i += 1 }
        Math.sqrt(s)
    }
  }

  /** Vector element type of the HNSW/MTREE index on (table, field): the
    * DEFAULT is F32 (catalog/providers vector index), so index-served KNN
    * distances are computed over f32-quantized components. */
  def knnQuantF32(in: Interp, table: String, field: String): Boolean =
    in.indexDefs.exists { case ((t, _), d) =>
      t == table && d.fields.contains(field) &&
        (d.tail.toUpperCase.contains("HNSW") || d.tail.toUpperCase.contains("MTREE")) &&
        !"(?i)TYPE\\s+F64".r.findFirstIn(d.tail).isDefined
    }

  /** Metric for a KNN op over (table, field): explicit metric wins, else the
    * HNSW/MTREE index's DIST clause, else euclidean. */
  def knnMetric(in: Interp, table: String, field: String, explicit: Option[String]): String =
    explicit.getOrElse {
      in.indexDefs.collectFirst {
        case ((t, _), d) if t == table && d.fields.contains(field) &&
            (d.tail.toUpperCase.contains("HNSW") || d.tail.toUpperCase.contains("MTREE")) =>
          "(?i)DIST\\s+(\\w+)".r.findFirstMatchIn(d.tail).map(_.group(1).toUpperCase)
            .getOrElse("EUCLIDEAN")
      }.getOrElse("EUCLIDEAN")
    }

  /** Env param carrying the per-statement KNN distances (doc key → dist). */
  val KnnParam = "__knn_dists__"

  /** Pre-pass over a SELECT's WHERE: each `<|k|>` node is a CROSS-ROW
    * top-k (not a per-row predicate), so compute the k nearest over the
    * candidate rows up front, rewrite the node to a membership test, and
    * bind the distances for `vector::distance::knn()`. */
  def prepareKnn(cond: Expr, rows: Vector[V], env: Env, in: Interp): (Expr, Env) = {
    val dists = mutable.LinkedHashMap[String, V]()
    def rewrite(e: Expr): Expr = e match {
      case Binary(op, l, r) if op.startsWith("KNN:") =>
        val ko = parseKnnOp(op)
        val fieldOpt = l match { case Idiom(p) => fieldPathOf(p); case _ => scala.None }
        val q = vecOf(Eval.eval(r, env)).getOrElse(
          throw SqlError("Incorrect vector value for the KNN operator"))
        val scored = rows.flatMap {
          case d: VObj =>
            for {
              rid <- d.fields.get("id").collect { case x: VRid => x }
              f <- fieldOpt
              v <- vecOf(d.fields.getOrElse(f, VNone))
            } yield {
              val metric = knnMetric(in, rid.table, f, ko.metric)
              // the `<|k,ef|>` index form reads f32-stored vectors and
              // accumulates in f32 — match the reference bit-for-bit
              val indexed = ko.metric.isEmpty && knnQuantF32(in, rid.table, f)
              (rid, if (indexed) distanceF32(metric, v, q) else distance(metric, v, q))
            }
          case _ => scala.None
        }
        val top = scored.sortBy(_._2).take(ko.k)
        val allowed: Set[V] = top.map(t => (t._1: V)).toSet
        top.foreach { case (rid, dd) => dists(rid.render) = VFloat(dd) }
        NativeExpr { e2 =>
          val ok = for { d <- e2.doc; rid <- d.fields.get("id") } yield allowed.contains(rid)
          VBool(ok.getOrElse(false))
        }
      case Binary(op, l, r) => Binary(op, rewrite(l), rewrite(r))
      case Prefix(op, x)    => Prefix(op, rewrite(x))
      case other            => other
    }
    val c2 = rewrite(cond)
    val env2 =
      if (dists.nonEmpty) env.bind(KnnParam, VObj(TreeMap(dists.toSeq: _*))) else env
    (c2, env2)
  }

  /** True if any `<|k|>` node appears in the expression. */
  def hasKnn(e: Expr): Boolean = e match {
    case Binary(op, _, _) if op.startsWith("KNN:") => true
    case Binary(_, l, r) => hasKnn(l) || hasKnn(r)
    case Prefix(_, x)    => hasKnn(x)
    case _               => false
  }

  // ---- hybrid rank fusion (fnc/search.rs rrf/linear) ---------------------

  private def asLists(v: V): Vector[Vector[VObj]] = v match {
    case VArr(lists) => lists.map {
      case VArr(docs) => docs.collect { case o: VObj => o }
      case _          => Vector.empty
    }
    case _ => Vector.empty
  }

  def rrf(results: V, limit: Long, kOpt: Option[Long]): V = {
    if (limit < 1)
      throw SqlError("Incorrect arguments for function search::rrf(). limit must be at least 1")
    val k = kOpt.getOrElse(60L)
    if (k < 0)
      throw SqlError("Incorrect arguments for function search::rrf(). RRF constant must be at least 0")
    val docs = mutable.LinkedHashMap[V, (Double, mutable.ArrayBuffer[VObj])]()
    asLists(results).foreach { list =>
      list.zipWithIndex.foreach { case (o, rank) =>
        o.fields.get("id").foreach { id =>
          val contrib = 1.0 / (k.toDouble + (rank + 1).toDouble)
          val rest = VObj(o.fields - "id")
          docs.get(id) match {
            case Some((sc, objs)) => objs += rest; docs(id) = (sc + contrib, objs)
            case scala.None       => docs(id) = (contrib, mutable.ArrayBuffer(rest))
          }
        }
      }
    }
    finish(docs, limit, "rrf_score")
  }

  def linear(results: V, weights: V, limit: Long, norm: String): V = {
    if (limit < 1)
      throw SqlError("Incorrect arguments for function search::linear(). Limit must be at least 1")
    val lists = asLists(results)
    val ws: Vector[V] = weights match {
      case VArr(items) => items
      case _           => Vector.empty
    }
    if (ws.length != lists.length)
      throw SqlError("Incorrect arguments for function search::linear(). The results and the weights array should have the same length")
    ws.zipWithIndex.foreach {
      case (_: VNum, _) => ()
      case (_, i) =>
        throw SqlError(s"Incorrect arguments for function search::linear(). Weight at index $i must be a number")
    }
    if (norm != "minmax" && norm != "zscore")
      throw SqlError("Incorrect arguments for function search::linear(). Norm must be 'minmax' or 'zscore'")
    // raw scores per doc per list: distance inverted 1/(1+d), else
    // ft_score/score fields, else rank fallback
    val docs = mutable.LinkedHashMap[V, (Array[Double], mutable.ArrayBuffer[VObj])]()
    var count = 0
    lists.zipWithIndex.foreach { case (list, li) =>
      list.foreach { o =>
        o.fields.get("id").foreach { id =>
          val score = o.fields.get("distance") match {
            case Some(n: VNum) => 1.0 / (1.0 + n.toDouble)
            case _ => o.fields.get("ft_score") match {
              case Some(n: VNum) => n.toDouble
              case _ => o.fields.get("score") match {
                case Some(n: VNum) => n.toDouble
                case _             => 1.0 / (1.0 + count.toDouble)
              }
            }
          }
          val rest = VObj(o.fields - "id")
          docs.get(id) match {
            case Some((scores, objs)) => scores(li) = score; objs += rest
            case scala.None =>
              val scores = Array.fill(lists.length)(0.0)
              scores(li) = score
              docs(id) = (scores, mutable.ArrayBuffer(rest))
          }
        }
        count += 1
      }
    }
    // normalization params per list over scores > 0
    val params = (0 until lists.length).map { li =>
      val xs = docs.values.map(_._1(li)).filter(_ > 0.0).toVector
      if (xs.isEmpty) (0.0, 1.0)
      else if (norm == "minmax") {
        val mn = xs.min; val mx = xs.max
        (mn, if (mx - mn > 0.0) mx - mn else 1.0)
      } else {
        val mean = xs.sum / xs.length
        val sd = Math.sqrt(xs.map(x => (x - mean) * (x - mean)).sum / xs.length)
        (mean, if (sd > 0.0) sd else 1.0)
      }
    }
    val combined = mutable.LinkedHashMap[V, (Double, mutable.ArrayBuffer[VObj])]()
    docs.foreach { case (id, (scores, objs)) =>
      var sc = 0.0
      scores.zipWithIndex.foreach { case (s0, li) =>
        if (s0 > 0.0) {
          val w = ws(li) match { case n: VNum => n.toDouble; case _ => 1.0 }
          val (p1, p2) = params(li)
          sc += w * ((s0 - p1) / p2)
        }
      }
      combined(id) = (sc, objs)
    }
    finish(combined, limit, "linear_score")
  }

  private def finish(docs: mutable.LinkedHashMap[V, (Double, mutable.ArrayBuffer[VObj])],
      limit: Long, scoreField: String): V = {
    val sorted = docs.toVector.sortBy { case (id, (sc, _)) => (-sc, id) }(
      Ordering.Tuple2(Ordering.Double.TotalOrdering, V.ordering)).take(limit.toInt)
    VArr(sorted.map { case (id, (sc, objs)) =>
      var m = TreeMap.empty[String, V]
      objs.foreach(o => m = m ++ o.fields)
      m += "id" -> id
      m += scoreField -> VFloat(sc)
      VObj(m): V
    })
  }

  def knnDistance(env: Env): V = {
    val r = for {
      doc <- env.doc
      rid <- doc.fields.get("id").collect { case x: VRid => x }
      dists <- env.params.get(KnnParam).collect { case o: VObj => o }
      d <- dists.fields.get(rid.render)
    } yield d
    r.getOrElse(VNone)
  }
}
