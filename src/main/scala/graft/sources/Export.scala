package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}

import graft.surql.{Render, V, VArr, VBool, VDt, VFloat, VInt, VNone, VObj, VRid, VStr}

/** SurrealQL export — the engine's rendering of the reference's
  * `surreal export` surface (cli/export.rs emits an executable .surql
  * script of the database contents). Each row renders as one
  * `CREATE table:key CONTENT { … };` statement in the reference's own
  * literal syntax (via [[graft.surql.Render]], the byte-exact value
  * renderer the golden corpus pins), so the output re-ingests through ANY
  * SurrealQL engine — including our own interpreter, which the round-trip
  * spec exercises.
  *
  * Rendering runs DISTRIBUTED (`mapPartitions` over the rows, one text
  * line each); `df.write.text` on the result is the 100 TB export job —
  * no driver-side loop, output splittable per partition. */
object Export {

  /** One Spark value → the SurrealQL value it renders as. */
  def toV(x: Any): V = x match {
    case null                    => VNone
    case b: Boolean              => VBool(b)
    case i: Int                  => VInt(i)
    case l: Long                 => VInt(l)
    case s: Short                => VInt(s)
    case f: Float                => VFloat(f)
    case d: Double               => VFloat(d)
    case d: java.math.BigDecimal => VFloat(d.doubleValue)
    case s: String               => VStr(s)
    case t: java.sql.Timestamp   => VDt(t.toInstant)
    case a: scala.collection.Seq[_] => VArr(a.map(toV).toVector)
    case r: Row => VObj(scala.collection.immutable.TreeMap(
      r.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n -> toV(r.get(i)) }.toIndexedSeq: _*))
    case other => VStr(String.valueOf(other))
  }

  /** Render every row as an executable CREATE statement; absent (NULL)
    * fields are omitted, matching the document model. */
  def surqlLines(df: DataFrame, table: String, key: String): Dataset[String] = {
    val cols = df.schema.fieldNames
    val keyIdx = df.schema.fieldIndex(key)
    df.mapPartitions { rows =>
      rows.map { r =>
        val rid = VRid(table, toV(r.get(keyIdx)))
        val fields = cols.zipWithIndex.collect {
          case (n, i) if n != key && !r.isNullAt(i) =>
            n -> toV(r.get(i))
        }
        val body = VObj(scala.collection.immutable.TreeMap(fields.toIndexedSeq: _*))
        s"CREATE ${Render.sql(rid)} CONTENT ${Render.sql(body)};"
      }
    }(Encoders.STRING)
  }
}
