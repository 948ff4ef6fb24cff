package graft.surql

import graft.surql.ast._
import scala.collection.immutable.TreeMap
import scala.collection.mutable.ArrayBuffer

/** DEFINE API machinery: path parsing/matching (api/path.rs), request/
  * response canonicalization (api/request.rs, api/response.rs), the
  * middleware chain (api/invocation.rs), and the built-in middleware set
  * (api/middleware/, fnc/api/mod.rs). Invoked through `api::invoke`. */
object Api {

  /** API-layer error: exposed with its status by response conversion even in
    * the security-sensitive initial-middleware position (api/err.rs). */
  final case class ApiErr(msg: String, status: Int = 500) extends Exception(msg)

  sealed trait Seg
  final case class SFixed(s: String) extends Seg
  final case class SDyn(name: String, kind: Option[Kind], kindRaw: Option[String]) extends Seg
  final case class SRest(name: String) extends Seg

  /** Runtime API definition: parsed path + FOR clauses. `fallback` is the
    * `FOR any` clause (route-level config), `actions` the method clauses. */
  final case class RtDef(pathSql: String, segs: Seq[Seg],
      actions: Seq[ApiClause], fallback: Option[ApiClause],
      comment: Option[String]) {
    def specificity: Int = segs.map {
      case _: SFixed => 3
      case _: SDyn   => 2
      case _: SRest  => 1
    }.sum
  }

  private def invalid(reason: String): Nothing =
    throw SqlError(s"The string could not be parsed into a path: $reason")

  /** api/path.rs FromStr — error messages are part of the contract. */
  def parsePath(s: String): Seq[Seg] = {
    if (s.isEmpty) invalid("Path cannot be empty")
    if (!s.startsWith("/")) invalid("Segment should start with /")
    val out = ArrayBuffer[Seg]()
    val parts = s.split('/').toSeq.drop(1).filter(_.nonEmpty)
    var done = false
    parts.foreach { raw =>
      if (!done) {
        if (raw.startsWith(":")) {
          var body = raw.drop(1)
          if (body.isEmpty) invalid("Expected a name or content for this segment")
          var kind: Option[Kind] = scala.None
          var kindRaw: Option[String] = scala.None
          val lt = body.indexOf('<')
          if (lt >= 0) {
            if (lt == 0) invalid("Encountered a type, but expected a name or content for this segment first")
            val inner = body.substring(lt + 1)
            if (!inner.endsWith(">")) invalid("Kind segment did not close")
            val kTxt = inner.dropRight(1)
            kind = Some(try Parser.parseKind(kTxt)
              catch { case e: Exception => invalid(String.valueOf(e.getMessage)) })
            kindRaw = Some(kTxt)
            body = body.substring(0, lt)
          }
          out += SDyn(body, kind, kindRaw)
        } else if (raw.startsWith("*")) {
          val body = raw.drop(1)
          if (body.isEmpty) invalid("Expected a name or content for this segment")
          out += SRest(body)
          done = true
        } else if (raw.startsWith("\\")) {
          out += SFixed(raw.drop(1))
        } else out += SFixed(raw)
      }
    }
    if (out.length > 85) invalid("Path cannot have more than 85 segments")
    out.toSeq
  }

  def pathSql(segs: Seq[Seg]): String =
    "/" + segs.map {
      case SFixed(s)           => s
      case SDyn(n, _, kindRaw) => ":" + n + kindRaw.map(k => s"<$k>").getOrElse("")
      case SRest(n)            => "*" + n
    }.mkString("/")

  /** Path fit (api/path.rs Path::fit): returns extracted params or None. */
  def fit(segs: Seq[Seg], parts: Seq[String]): Option[TreeMap[String, V]] = {
    val hasRest = segs.lastOption.exists(_.isInstanceOf[SRest])
    if (parts.length < segs.length && !hasRest) return scala.None
    var m = TreeMap[String, V]()
    var i = 0
    while (i < segs.length) {
      if (i >= parts.length) return scala.None
      segs(i) match {
        case SFixed(x) => if (x != parts(i)) return scala.None
        case SDyn(n, k, _) =>
          val raw = VStr(parts(i))
          k match {
            case scala.None => m += n -> raw
            case Some(kk) =>
              try m += n -> Coerce.cast(kk, raw)
              catch { case _: Exception => return scala.None }
          }
        case SRest(n) =>
          m += n -> VArr(parts.drop(i).map(p => VStr(p): V).toVector)
          return Some(m)
      }
      i += 1
    }
    if (parts.length == segs.length) Some(m) else scala.None
  }

  // ---- request / response canonicalization -----------------------------

  private def objOf(v: V): TreeMap[String, V] = v match {
    case VObj(fs) => fs
    case _        => TreeMap.empty
  }

  private def lowerKeys(fs: TreeMap[String, V]): TreeMap[String, V] =
    TreeMap(fs.toSeq.map { case (k, v) => k.toLowerCase -> v }: _*)

  /** Canonical ApiRequest object (api/request.rs): body/headers/params/
    * method/query/context. Header names lowercase (HeaderMap semantics). */
  def normalizeRequest(v: V, defaults: Boolean = false): VObj = {
    val fs = objOf(v)
    var headers = lowerKeys(objOf(fs.getOrElse("headers", VObj(TreeMap.empty))))
    if (defaults) {
      if (!headers.contains("content-type"))
        headers += "content-type" -> VStr("application/vnd.surrealdb.native")
      if (!headers.contains("accept"))
        headers += "accept" -> VStr("application/vnd.surrealdb.native;q=0.9, */*;q=0.8")
    }
    val method = fs.get("method") match {
      case Some(VStr(m)) => m.toLowerCase
      case _             => "get"
    }
    VObj(TreeMap(
      "body" -> fs.getOrElse("body", VNone),
      "headers" -> (VObj(headers): V),
      "params" -> (VObj(objOf(fs.getOrElse("params", VObj(TreeMap.empty)))): V),
      "method" -> (VStr(method): V),
      "query" -> (VObj(objOf(fs.getOrElse("query", VObj(TreeMap.empty)))): V),
      "context" -> (VObj(objOf(fs.getOrElse("context", VObj(TreeMap.empty)))): V)))
  }

  /** ApiResponse::try_from — status (validated int, default 200), body,
    * headers (lowercased), context. Unknown fields are dropped. */
  def toResponse(v: V): VObj = v match {
    case VObj(fs) =>
      val status = fs.get("status") match {
        case Some(VInt(n)) =>
          if (n < 100 || n > 999)
            throw ApiErr(s"Invalid HTTP status code: $n. Must be between 100 and 599", 400)
          n
        case Some(other) if other != VNone =>
          throw ApiErr(s"Invalid HTTP status code: ${other.render}. Must be between 100 and 599", 400)
        case _ => 200L
      }
      VObj(TreeMap(
        "status" -> (VInt(status): V),
        "body" -> fs.getOrElse("body", VNone),
        "headers" -> (VObj(lowerKeys(objOf(fs.getOrElse("headers", VObj(TreeMap.empty))))): V),
        "context" -> (VObj(objOf(fs.getOrElse("context", VObj(TreeMap.empty)))): V)))
    case other =>
      throw SqlError(s"Failed to convert public value to ApiResponse: found ${other.render}")
  }

  private def errResponse(msg: V, status: Long): VObj =
    VObj(TreeMap(
      "status" -> (VInt(status): V),
      "body" -> msg,
      "headers" -> (VObj(TreeMap.empty): V),
      "context" -> (VObj(TreeMap.empty): V)))

  /** from_error: API errors expose status+message; internal errors are 500
    * with the raw message. */
  private def fromError(e: Throwable): VObj = e match {
    case ApiErr(m, st) => errResponse(VStr(m), st)
    case SqlError(m)   => errResponse(VStr(m), 500)
    case other         => errResponse(VStr(String.valueOf(other.getMessage)), 500)
  }

  /** from_error_secure (initial middleware): API errors expose; internal
    * errors are masked to body NONE. */
  private def fromErrorSecure(e: Throwable): VObj = e match {
    case ApiErr(m, st) => errResponse(VStr(m), st)
    case _             => errResponse(VNone, 500)
  }

  private def notFound: VObj = errResponse(VStr("Not found"), 404)
  private def permissionDenied: VObj =
    errResponse(VStr("Permission denied: You are not allowed to access this resource"), 403)

  // ---- invocation ------------------------------------------------------

  /** api::invoke(path[, request]) — find the matching definition by
    * specificity, run the permission checks and middleware chain
    * (fnc/api/mod.rs invoke + api/invocation.rs). */
  def invoke(path: String, reqOpt: Option[V], env: Env): V = {
    val interp = env.interp.getOrElse(throw SqlError("api::invoke() requires a database context"))
    if (!path.startsWith("/")) invalid("Segment should start with /")
    val parts = path.split('/').toSeq.filter(_.nonEmpty)

    val req0 = normalizeRequest(reqOpt.getOrElse(VObj(TreeMap.empty)), defaults = true)
    val method = req0.fields("method") match { case VStr(m) => m; case _ => "get" }

    var best: Option[(RtDef, TreeMap[String, V])] = scala.None
    var bestSpec = 0
    interp.apiDefs.values.foreach { d =>
      fit(d.segs, parts) match {
        case Some(params)
            if d.fallback.exists(_.action.isDefined) ||
              d.actions.exists(c => c.action.isDefined && c.methods.contains(method)) =>
          if (d.specificity > bestSpec) { bestSpec = d.specificity; best = Some((d, params)) }
        case _ => ()
      }
    }

    best match {
      case scala.None => finish(notFound)
      case Some((d, params)) =>
        val methodClause = d.actions.find(c => c.action.isDefined && c.methods.contains(method))
        val clause = methodClause.orElse(d.fallback.filter(_.action.isDefined))
        clause match {
          case scala.None => finish(notFound)
          case Some(c) =>
            // permission stack: method-level, route-level (FOR any), global
            // config — only enforced for record-level auth (check_perms)
            if (interp.recordAuth) {
              val perms = methodClause.flatMap(_.permsRaw).toSeq ++
                d.fallback.flatMap(_.permsRaw).toSeq ++ interp.apiGlobalPerms.toSeq
              perms.foreach { p =>
                val ok = p match {
                  case "FULL" => true
                  case "NONE" => false
                  case w if w.startsWith("WHERE ") =>
                    try Eval.eval(Parser.parseExpr(w.stripPrefix("WHERE ")), env).truthy
                    catch { case _: Exception => false }
                  case _ => true
                }
                if (!ok) return finish(permissionDenied)
              }
            }
            val req1 = req0.copy(fields = req0.fields
              .updated("params", VObj(params): V))
            val mws: Seq[(String, Seq[Expr], String)] =
              interp.apiGlobalMw ++
                d.fallback.map(_.middleware).getOrElse(Nil) ++
                methodClause.map(_.middleware).getOrElse(Nil)

            // final action: binds $request, converts result / errors
            def finalAction(reqV: V): VObj = {
              val reqN = normalizeRequest(reqV)
              val env2 = env.bind("request", reqN)
              try toResponse(Eval.eval(c.action.get, env2))
              catch {
                case ReturnSignal(v) => toResponse(v)
                case e: Exception    => fromError(e)
              }
            }

            // build chain back-to-front; index 0 in execution order is the
            // "initial" (security-masking) middleware
            var next: V => VObj = finalAction
            mws.zipWithIndex.reverse.foreach { case ((name, argEs, _), idx) =>
              val inner = next
              val isInitial = idx == 0
              next = (reqV: V) => runMiddleware(name, argEs, reqV, inner, isInitial, env)
            }
            finish(next(req1))
        }
    }
  }

  /** Final response: context is internal state (fnc/api invoke strips it). */
  private def finish(res: VObj): V = VObj(res.fields - "context")

  private def runMiddleware(name: String, argEs: Seq[Expr], reqV: V,
      next: V => VObj, isInitial: Boolean, env: Env): VObj = {
    try {
      val args = argEs.map(Eval.eval(_, env))
      name match {
        case "api::timeout"       => mwTimeout(args, reqV, next, env)
        case "api::req::body"     => next(mwReqBody(args, reqV))
        case "api::req::max_body" => next(mwReqMaxBody(args, reqV))
        case "api::req::raw_body" => next(reqV)
        case "api::res::body"     => mwResBody(args, reqV, next)
        case "api::res::raw_body" => next(reqV)
        case "api::res::status" =>
          val res = next(reqV)
          args.headOption match {
            case Some(VInt(n)) if n >= 100 && n <= 999 =>
              // the http crate accepts 100..999 even though validation
              // reports the standard range (api/errors/validation.surql)
              res.copy(fields = res.fields.updated("status", VInt(n): V))
            case Some(other) =>
              throw ApiErr(s"Invalid HTTP status code: ${other.renderRaw}. Must be between 100 and 599", 400)
            case scala.None => res
          }
        case "api::res::header" =>
          (args.lift(0), args.lift(1)) match {
            case (Some(VStr(k)), Some(v)) =>
              validateHeader(k, v)
              val res = next(reqV)
              val hs = res.fields("headers") match { case VObj(fs) => fs; case _ => TreeMap.empty[String, V] }
              val nhs = if (v == VNone) hs - k.toLowerCase else hs.updated(k.toLowerCase, v)
              res.copy(fields = res.fields.updated("headers", VObj(nhs): V))
            case _ => next(reqV)
          }
        case "api::res::headers" =>
          args.headOption match {
            case Some(VObj(add)) =>
              add.foreach { case (k, v) => validateHeader(k, v) }
              val res = next(reqV)
              val hs = res.fields("headers") match { case VObj(fs) => fs; case _ => TreeMap.empty[String, V] }
              res.copy(fields = res.fields.updated("headers",
                VObj(add.foldLeft(hs) { case (acc, (k, v)) =>
                  if (v == VNone) acc - k.toLowerCase else acc.updated(k.toLowerCase, v)
                }): V))
            case _ => next(reqV)
          }
        case custom if custom.startsWith("fn::") =>
          val interp = env.interp.get
          interp.customFns.get(custom.stripPrefix("fn::")) match {
            case scala.None => throw SqlError(s"Unknown function $custom()")
            case Some(cl) =>
              val nextClosure: V = VClosure(Seq(("__req", scala.None)),
                NativeExpr(e => next(e.params.getOrElse("__req", VNone))), scala.None, Map.empty)
              val out = Functions.callClosure(cl, (normalizeRequest(reqV): V) +: nextClosure +: args, env)
              toResponse(out)
          }
        case other => throw SqlError(s"Failed to resolve middleware function: $other")
      }
    } catch {
      case e: Exception => if (isInitial) fromErrorSecure(e) else fromError(e)
    }
  }

  // ---- built-in middleware ---------------------------------------------

  /** api::timeout(d): a deadline scoped to the inner chain
    * (fnc/api/mod.rs timeout → ctx.add_timeout). SLEEP reports the elapsed
    * deadline; statements that start past the deadline report the
    * statement-level timeout (api/errors/timeout.surql contract). */
  private def mwTimeout(args: Seq[V], reqV: V, next: V => VObj, env: Env): VObj = {
    val dur = args.headOption match {
      case Some(d: VDur) => d
      case _             => throw ApiErr("Expected a duration")
    }
    val interp = env.interp.getOrElse(throw ApiErr("Expected a database context"))
    val totalNanos = math.min(dur.secs * 1000000000L + dur.nanos, 3600L * 1000000000L)
    val prev = interp.apiDeadline
    interp.apiDeadline = Some((java.time.Instant.now().plusNanos(totalNanos), Render.sql(dur)))
    try next(reqV) finally interp.apiDeadline = prev
  }

  private def reqWithBody(reqV: V, body: V): V = {
    val fs = objOf(reqV)
    VObj(fs.updated("body", body))
  }

  private def headerOf(reqV: V, name: String): Option[String] =
    objOf(reqV).get("headers").flatMap {
      case VObj(hs) => hs.get(name).collect { case VStr(s) => s }
      case _        => scala.None
    }

  /** api::req::body(strategy) — parse a bytes body (api/middleware/req.rs).
    * Strategies: json / cbor / plain / bytes; "auto"/none dispatches on
    * Content-Type. */
  private def mwReqBody(args: Seq[V], reqV: V): V = {
    val strategy = args.headOption match {
      case Some(VStr(s)) => s.toLowerCase
      case _             => "auto"
    }
    val ct = headerOf(reqV, "content-type").map(_.takeWhile(_ != ';').trim)
    def assertMime(m: String): Unit =
      if (!ct.contains(m)) throw ApiErr(s"Expected Content-Type to be $m", 400)
    lazy val bytes = objOf(reqV).getOrElse("body", VNone) match {
      case VBytes(bs) => bs
      case _          => throw ApiErr("Request body must be binary data", 400)
    }
    val eff = strategy match {
      case "auto" =>
        ct match {
          case scala.None => throw ApiErr("Missing required Content-Type header", 400)
          case Some("application/json")         => "json"
          case Some("application/cbor")         => "cbor"
          case Some("application/vnd.surrealdb.flatbuffers") => "flatbuffers"
          case Some("text/plain")               => "plain"
          case Some("application/octet-stream") => "bytes"
          case Some("application/vnd.surrealdb.native") => "native"
          case Some(other) => throw ApiErr(s"Unsupported Content-Type: $other", 415)
        }
      case s => s
    }
    def decodeFail: Nothing = throw ApiErr("Failed to decode the request body", 400)
    val parsed = eff match {
      case "json" =>
        if (strategy != "auto") assertMime("application/json")
        val bs = bytes
        try Json.decode(new String(bs.toArray, java.nio.charset.StandardCharsets.UTF_8))
        catch { case _: Exception => decodeFail }
      case "cbor" =>
        if (strategy != "auto") assertMime("application/cbor")
        val bs = bytes
        try Cbor.decode(bs.toArray)
        catch { case _: Exception => decodeFail }
      case "flatbuffers" =>
        if (strategy != "auto") assertMime("application/vnd.surrealdb.flatbuffers")
        val bs = bytes
        if (bs.length < 4 || bs.take(4) != FbMagic) decodeFail
        try Cbor.decode(bs.drop(4).toArray)
        catch { case _: Exception => decodeFail }
      case "plain" =>
        if (strategy != "auto") assertMime("text/plain")
        VStr(new String(bytes.toArray, java.nio.charset.StandardCharsets.UTF_8))
      case "bytes"  => VBytes(bytes)
      case "native" => objOf(reqV).getOrElse("body", VNone) // passthrough, any value
      case _        => VBytes(bytes)
    }
    reqWithBody(reqV, parsed)
  }

  /** api::req::max_body('3mb') — reject oversized bodies. */
  private def mwReqMaxBody(args: Seq[V], reqV: V): V = {
    val limit = args.headOption match {
      case Some(VStr(s)) => parseBytesize(s)
      case Some(VInt(n)) => n
      case _             => Long.MaxValue
    }
    objOf(reqV).getOrElse("body", VNone) match {
      case VBytes(bs) if bs.length > limit =>
        throw ApiErr(s"Invalid request body: The body exceeded the max payload size of ${args.head.renderRaw}", 413)
      case VStr(s) if s.length > limit =>
        throw ApiErr(s"Invalid request body: The body exceeded the max payload size of ${args.head.renderRaw}", 413)
      case _ => reqV
    }
  }

  def parseBytesize(s: String): Long = {
    val t = s.trim.toLowerCase
    val num = t.takeWhile(c => c.isDigit || c == '.')
    val unit = t.drop(num.length).trim
    val n = try num.toDouble catch { case _: Exception => return Long.MaxValue }
    val mult = unit match {
      case "" | "b" => 1L
      case "kb" | "k" => 1024L
      case "mb" | "m" => 1024L * 1024
      case "gb" | "g" => 1024L * 1024 * 1024
      case _ => 1L
    }
    (n * mult).toLong
  }

  /** Faux flatbuffers framing: a 4-byte magic + CBOR payload — gives the
    * format a real encode/decode round-trip without the actual schema
    * compiler (declared stand-in; the Spark-side plumbing is what matters). */
  private val FbMagic: Vector[Byte] = Vector('S'.toByte, 'D'.toByte, 'B'.toByte, 'F'.toByte)

  private val StrategyMime: Map[String, String] = Map(
    "json" -> "application/json",
    "cbor" -> "application/cbor",
    "flatbuffers" -> "application/vnd.surrealdb.flatbuffers",
    "plain" -> "text/plain",
    "bytes" -> "application/octet-stream",
    "native" -> "application/vnd.surrealdb.native")

  private val AutoOrder = Seq("json", "cbor", "flatbuffers", "plain", "bytes", "native")

  /** HTTP token validation for header names; CR/LF/NUL rejection for values
    * (api/errors/validation.surql contract). */
  private def validateHeader(name: String, value: V): Unit = {
    val tokenExtra = "!#$%&'*+-.^_`|~"
    if (name.isEmpty || !name.forall(c => c.isLetterOrDigit && c < 128 || tokenExtra.contains(c)))
      throw ApiErr(s"Invalid header name: $name: invalid HTTP header name", 400)
    value match {
      case VStr(s) if s.exists(c => c == '\r' || c == '\n' || c == '\u0000') =>
        throw ApiErr(s"Invalid header value for ${name.toLowerCase}: $s: failed to parse header value", 400)
      case _ => ()
    }
  }

  /** Accept-header negotiation (api/middleware/res.rs output_body_strategy):
    * ranges sorted by q factor, first supported strategy wins; an Accept
    * header with no possible match is a 406. */
  private def negotiate(strategy: String, accept: Option[String]): String = {
    val supported: Seq[String] = if (strategy == "auto") AutoOrder else Seq(strategy)
    accept match {
      case scala.None => supported.head
      case Some(a) =>
        val ranges = a.split(',').toSeq.map(_.trim).filter(_.nonEmpty).map { part =>
          val segs = part.split(';').map(_.trim)
          val mime = segs.head
          val q = segs.tail.collectFirst {
            case s if s.startsWith("q=") =>
              try s.drop(2).toDouble catch { case _: Exception => 1.0 }
          }.getOrElse(1.0)
          (mime, q)
        }.sortBy(-_._2) // stable: ties keep listed order
        if (ranges.isEmpty) throw ApiErr("No output strategy was possible for this API request", 406)
        def matches(range: String, mime: String): Boolean =
          range == "*/*" || range == mime ||
            (range.endsWith("/*") && mime.startsWith(range.dropRight(1)))
        ranges.collectFirst {
          case (r, _) if supported.exists(s => matches(r, StrategyMime(s))) =>
            supported.find(s => matches(r, StrategyMime(s))).get
        }.getOrElse(throw ApiErr("No output strategy was possible for this API request", 406))
    }
  }

  /** api::res::body(strategy) — negotiate the output format against the
    * request Accept header, then serialize (api/middleware/res.rs). */
  private def mwResBody(args: Seq[V], reqV: V, next: V => VObj): VObj = {
    val strategy = args.headOption match {
      case Some(VStr(s)) => s.toLowerCase
      case _             => "auto"
    }
    val eff = negotiate(strategy, headerOf(reqV, "accept"))
    val res = next(reqV)
    val body = res.fields.getOrElse("body", VNone)
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val (newBody: V, ctype) = eff match {
      case "json"  => (VBytes(Json.encode(body).getBytes(utf8).toVector), "application/json")
      case "cbor"  => (VBytes(Cbor.encode(body).toVector), "application/cbor")
      case "flatbuffers" =>
        (VBytes(FbMagic ++ Cbor.encode(body).toVector), "application/vnd.surrealdb.flatbuffers")
      case "plain" =>
        val s = body match { case VStr(x) => x; case other => other.renderRaw }
        (VBytes(s.getBytes(utf8).toVector), "text/plain")
      case "native" => (body, "application/vnd.surrealdb.native")
      case _ =>
        body match {
          case VBytes(bs) => (VBytes(bs), "application/octet-stream")
          case other      => (VBytes(other.renderRaw.getBytes(utf8).toVector), "application/octet-stream")
        }
    }
    val hs = res.fields("headers") match { case VObj(fs) => fs; case _ => TreeMap.empty[String, V] }
    res.copy(fields = res.fields
      .updated("body", newBody)
      .updated("headers", VObj(hs.updated("content-type", VStr(ctype): V)): V))
  }

  // ---- rendering -------------------------------------------------------

  /** Canonical DEFINE API text (sql/statements/define/api.rs fmt_sql):
    * the `FOR any` section (route config + optional fallback THEN) always
    * renders, followed by each method action and the comment. */
  def render(d: RtDef): String = {
    val sb = new StringBuilder("DEFINE API ").append(Render.sql(VStr(d.pathSql)))
    def blockTxt(raw: String): String =
      Defs.normRaw(raw).replace("; }", " }").replace(", }", " }")
    sb.append(" FOR any")
    d.fallback.map(_.middleware).filter(_.nonEmpty).foreach { mws =>
      sb.append(" MIDDLEWARE ").append(mws.map(_._3).mkString(", "))
    }
    sb.append(" PERMISSIONS ").append(d.fallback.flatMap(_.permsRaw).getOrElse("FULL"))
    d.fallback.filter(_.action.isDefined).foreach(c => sb.append(" THEN ").append(blockTxt(c.actionRaw)))
    d.actions.foreach { c =>
      sb.append(" FOR ").append(c.methods.mkString(", "))
      if (c.middleware.nonEmpty)
        sb.append(" MIDDLEWARE ").append(c.middleware.map(_._3).mkString(", "))
      sb.append(" PERMISSIONS ").append(c.permsRaw.getOrElse("FULL"))
      if (c.action.isDefined) sb.append(" THEN ").append(blockTxt(c.actionRaw))
    }
    d.comment.foreach(c => sb.append(" COMMENT ").append(Render.sql(VStr(c))))
    sb.toString
  }

  /** Canonical API config text: `API [MIDDLEWARE …] PERMISSIONS <p>`. */
  def renderConfig(mw: Seq[(String, Seq[Expr], String)], permsRaw: Option[String]): String = {
    val sb = new StringBuilder("API")
    if (mw.nonEmpty) sb.append(" MIDDLEWARE ").append(mw.map(_._3).mkString(", "))
    sb.append(" PERMISSIONS ").append(permsRaw.getOrElse("FULL"))
    sb.toString
  }
}
