package graft.surql

import scala.collection.immutable.TreeMap

/** JSON-Patch engine — value::patch / UPDATE … PATCH — with the
  * reference's EXACT semantics (val/value/patch.rs, expr/operation.rs,
  * and the pick/put/cut/inc quartet in val/value/), including its
  * quirks, all r19-sweep verified:
  *
  *  - paths split on BOTH '.' and '/' after trimming leading slashes,
  *    and empty segments are kept (`value_to_jsonpath`);
  *  - operations all parse BEFORE any applies — a malformed op anywhere
  *    means nothing applies and the reference's InvalidPatch error text
  *    surfaces (value_to_operations), including its misreported
  *    "Key 'from' missing" for a missing `value`;
  *  - add with a numeric terminal segment inserts into an array (or
  *    appends past the end); `-` appends; otherwise adding onto an
  *    existing ARRAY target concatenates/pushes via `inc` semantics
  *    (array+array concats — inc.rs);
  *  - remove parses numeric segments at ANY depth as array indices
  *    (`to_parts`), but replace/copy/move/change/test use FIELD parts
  *    only, so on arrays those map over elements (put.rs/pick.rs
  *    fall-through) instead of indexing;
  *  - move cuts its source with FIELD parts too, so moving from an
  *    array index copies without removing (patch.rs:141);
  *  - put on NONE/NULL auto-vivifies an object; put through a scalar is
  *    ignored;
  *  - change requires both patch text and target to be strings, silently
  *    skips otherwise, but ERRORS on malformed patch text;
  *  - patch operates on ANY value, not just objects.
  */
object JsonPatch {

  sealed trait Part
  final case class Field(name: String) extends Part
  /** Only `remove` produces Index parts (patch.rs to_parts). Negative
    * indices parse (i64) but never match (as_old_index casts through
    * usize), so they no-op — reference-exact. */
  final case class Index(i: Long) extends Part

  private def parseErr(msg: String): Nothing =
    throw SqlError("The JSON Patch contains invalid operations. " +
      s"Failed to parse JSON patch structure: $msg")

  /** operation.rs value_to_jsonpath: raw string, trim ALL leading '/',
    * split on '.' or '/', KEEP empty segments ("" → [""]). */
  private[surql] def jsonPath(v: V): List[String] =
    v.renderRaw.dropWhile(_ == '/').split("[./]", -1).toList

  // ---- the pick/put/cut/inc quartet on V ---------------------------------

  def pick(v: V, path: List[Part]): V = path match {
    case Nil => v
    case p :: rest => v match {
      case VObj(fs) => p match {
        case Field(f) => fs.get(f).map(pick(_, rest)).getOrElse(VNone)
        case Index(i) => fs.get(i.toString).map(pick(_, rest)).getOrElse(VNone)
      }
      case VArr(items) => p match {
        case Index(i) if i >= 0 && i < items.length =>
          pick(items(i.toInt), rest)
        case Index(_) => VNone
        // Field part on an array: map the FULL path over elements
        case Field(_) => VArr(items.map(pick(_, path)))
      }
      case _ => VNone
    }
  }

  def put(v: V, path: List[Part], value: V): V = path match {
    case Nil => value
    case p :: rest => v match {
      case VObj(fs) => p match {
        case Field(f) =>
          VObj(fs.updated(f, put(fs.getOrElse(f, V.obj()), rest, value)))
        case Index(i) =>
          val k = i.toString
          VObj(fs.updated(k, put(fs.getOrElse(k, V.obj()), rest, value)))
      }
      case VArr(items) => p match {
        case Index(i) if i >= 0 && i < items.length =>
          VArr(items.updated(i.toInt, put(items(i.toInt), rest, value)))
        case Index(_) => v
        // Field part on an array: put the FULL path into each element
        case Field(_) => VArr(items.map(put(_, path, value)))
      }
      case VNull | VNone => put(V.obj(), path, value) // auto-vivify
      case _ => v // put through a scalar is ignored (put.rs catch-all)
    }
  }

  def cut(v: V, path: List[Part]): V = path match {
    case Nil => v
    case p :: rest => v match {
      case VObj(fs) => p match {
        case Field(f) =>
          if (rest.isEmpty) VObj(fs - f)
          else fs.get(f).map(c => VObj(fs.updated(f, cut(c, rest)))).getOrElse(v)
        case Index(i) =>
          val k = i.toString
          if (rest.isEmpty) VObj(fs - k)
          else fs.get(k).map(c => VObj(fs.updated(k, cut(c, rest)))).getOrElse(v)
      }
      case VArr(items) => p match {
        case Index(i) if i >= 0 && i < items.length =>
          if (rest.isEmpty) VArr(items.patch(i.toInt, Nil, 1))
          else VArr(items.updated(i.toInt, cut(items(i.toInt), rest)))
        case Index(_) => v
        case Field(_) => VArr(items.map(cut(_, path)))
      }
      case _ => v
    }
  }

  /** inc.rs: `add` onto an existing target — arrays concat/push, NONE
    * seeds, anything else arithmetic-adds (same errors as `+`). */
  def inc(v: V, path: List[Part], value: V): V = pick(v, path) match {
    case VArr(items) => value match {
      case VArr(xs) => put(v, path, VArr(items ++ xs))
      case x        => put(v, path, VArr(items :+ x))
    }
    case VNone => value match {
      case n @ (_: VInt | _: VFloat | _: VDec) => put(v, path, Ops.add(VInt(0), n))
      case arr: VArr => put(v, path, arr)
      case x         => put(v, path, VArr(Vector(x)))
    }
    case cur => put(v, path, Ops.add(cur, value))
  }

  // ---- operations ---------------------------------------------------------

  private sealed trait Op
  private final case class Add(path: List[String], value: V) extends Op
  private final case class Remove(path: List[String]) extends Op
  private final case class Replace(path: List[String], value: V) extends Op
  private final case class Change(path: List[String], value: V) extends Op
  private final case class Copy(path: List[String], from: List[String]) extends Op
  private final case class Move(path: List[String], from: List[String]) extends Op
  private final case class Test(path: List[String], value: V) extends Op

  /** operation_from_object — error texts verbatim, including the
    * reference's "Key 'from' missing" for a missing VALUE. */
  private def parseOp(o: VObj): Op = {
    val op = o.fields.get("op") match {
      case Some(VStr(s)) => s
      case Some(_)       => parseErr("Key 'op' not a string")
      case scala.None    => parseErr("Key 'op' missing")
    }
    val path = o.fields.get("path") match {
      case Some(p)    => jsonPath(p)
      case scala.None => parseErr("Key 'path' missing")
    }
    def from = o.fields.get("from") match {
      case Some(f)    => jsonPath(f)
      case scala.None => parseErr("Key 'from' missing")
    }
    def value = o.fields.getOrElse("value", parseErr("Key 'from' missing"))
    op match {
      case "add"     => Add(path, value)
      case "remove"  => Remove(path)
      case "replace" => Replace(path, value)
      case "change"  => Change(path, value)
      case "copy"    => Copy(path, from)
      case "move"    => Move(path, from)
      case "test"    => Test(path, value)
      case x         => parseErr(s"Invalid operation '$x'")
    }
  }

  /** `p.parse::<usize>()` — digits only; values past Long range still
    * "parse" in Rust's u64 and then always take the append arm. */
  private def usizeOf(s: String): Option[Long] =
    if (s.nonEmpty && s.length <= 20 && s.forall(_.isDigit)) {
      val b = BigInt(s)
      Some(if (b > Long.MaxValue) Long.MaxValue else b.toLong)
    } else scala.None

  private def fields(path: List[String]): List[Part] = path.map(Field(_))

  /** patch.rs to_parts: i64-parsing segments become indices at any
    * depth — used by `remove` only. */
  private def toParts(path: List[String]): List[Part] = path.map { p =>
    p.toLongOption match {
      case Some(i) => Index(i)
      case scala.None => Field(p)
    }
  }

  /** Value::patch — the whole engine. Parses every op first; errors roll
    * back everything (the caller sees the exception, no partial doc). */
  def patch(doc0: V, opsV: V): V = {
    val ops: Vector[Op] = opsV match {
      case VArr(items) => items.map {
        case o: VObj => parseOp(o)
        case _ => parseErr("Patch operations should be an array of objects")
      }
      case _ => parseErr("Patch operations should be an array of objects")
    }
    ops.foldLeft(doc0) { (doc, op) => op match {
      case Add(path, value) =>
        path.splitAt(path.length - 1) match {
          case (left, List(last)) if usizeOf(last).isDefined =>
            val x = usizeOf(last).get
            pick(doc, fields(left)) match {
              case VArr(items) =>
                val nv =
                  if (items.length > x) items.patch(x.toInt, Seq(value), 0)
                  else items :+ value
                put(doc, fields(left), VArr(nv))
              case _ => put(doc, fields(left), value)
            }
          case (left, List("-")) =>
            pick(doc, fields(left)) match {
              case VArr(items) => put(doc, fields(left), VArr(items :+ value))
              case _           => put(doc, fields(left), value)
            }
          case _ =>
            pick(doc, fields(path)) match {
              case _: VArr => inc(doc, fields(path), value)
              case _       => put(doc, fields(path), value)
            }
        }
      case Remove(path)         => cut(doc, toParts(path))
      case Replace(path, value) => put(doc, fields(path), value)
      case Change(path, value) =>
        (value, pick(doc, fields(path))) match {
          case (VStr(pt), VStr(orig)) =>
            put(doc, fields(path), VStr(Interp.dmpPatchApply(pt, orig)))
          case _ => doc // non-string patch or target: skipped (patch.rs:102)
        }
      case Copy(path, from) => put(doc, fields(path), pick(doc, fields(from)))
      case Move(path, from) =>
        cut(put(doc, fields(path), pick(doc, fields(from))), fields(from))
      case Test(path, value) =>
        val got = pick(doc, fields(path))
        if (!V.looseEq(got, value)) throw SqlError(
          "Given test operation failed for JSON Patch. " +
            s"Expected `${Render.sql(value)}`, but got `${Render.sql(got)}` instead.")
        doc
    }}
  }
}
