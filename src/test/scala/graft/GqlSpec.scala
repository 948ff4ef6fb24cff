package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.gql.Gql
import graft.surql.{Interp, Parser, Render}

/** GraphQL front-end: document parsing, SurrealQL translation, and
  * end-to-end execution against the semantics engine. */
class GqlSpec extends AnyFunSuite {

  private def freshDb(): Interp = {
    val in = new Interp
    in.run(Parser.parse("""
      CREATE person:1 SET name = 'Alice', age = 30, city = 'Oslo';
      CREATE person:2 SET name = 'Bob', age = 25, city = 'Paris';
      CREATE person:3 SET name = 'Carol', age = 35, city = 'Oslo';
      CREATE person:4 SET name = 'Dave', age = 20, city = 'Rome';
    """))
    in
  }

  test("filter/order/limit/start translate to one SELECT") {
    val (out, sql) = Gql.toSurqlAll("""
      query {
        person(filter: {age: {gte: 25}, city: {ne: "Rome"}},
               order: {desc: age, then: {asc: name}}, limit: 2, start: 0) {
          name age
        }
      }""").head
    assert(out == "person")
    assert(sql == "SELECT name, age FROM person WHERE ((age >= 25) AND (city != 'Rome')) " +
      "ORDER BY age DESC, name ASC LIMIT 2 START 0")
  }

  test("executes against the engine with GraphQL response shaping") {
    val in = freshDb()
    val res = Gql.execute("""
      { person(filter: {city: {eq: "Oslo"}}, order: {asc: age}) { name age } }""", in)
    assert(Render.sql(res) ==
      "{ data: { person: [{ age: 30, name: 'Alice' }, { age: 35, name: 'Carol' }] } }")
  }

  test("and/or/not aggregation and string operator functions") {
    val in = freshDb()
    val res = Gql.execute("""
      { person(filter: {or: [{name: {startsWith: "A"}}, {not: {age: {lt: 35}}}]},
               order: {asc: name}) { name } }""", in)
    assert(Render.sql(res) ==
      "{ data: { person: [{ name: 'Alice' }, { name: 'Carol' }] } }")
  }

  test("in-list filters and aliases") {
    val in = freshDb()
    val res = Gql.execute("""
      { folks: person(filter: {city: {in: ["Paris", "Rome"]}}, order: {asc: age}) { name } }""", in)
    assert(Render.sql(res) ==
      "{ data: { folks: [{ name: 'Dave' }, { name: 'Bob' }] } }")
  }

  test("_get_ point lookup returns the single record") {
    val in = freshDb()
    val res = Gql.execute("""{ _get_person(id: "person:2") { name city } }""", in)
    assert(Render.sql(res) == "{ data: { _get_person: { city: 'Paris', name: 'Bob' } } }")
  }

  test("nested selection on a record link resolves in one statement") {
    val in = freshDb()
    in.run(Parser.parse("CREATE pet:1 SET name = 'Rex', owner = person:1;"))
    val res = Gql.execute("""{ pet { name owner { name city } } }""", in)
    assert(Render.sql(res) ==
      "{ data: { pet: [{ name: 'Rex', owner: { city: 'Oslo', name: 'Alice' } }] } }")
  }

  test("multiple root fields run in order; subscriptions are rejected") {
    val in = freshDb()
    val res = Gql.execute("""
      { a: person(limit: 1, order: {asc: age}) { name }
        b: person(filter: {age: {gt: 30}}) { name } }""", in)
    assert(Render.sql(res) ==
      "{ data: { a: [{ name: 'Dave' }], b: [{ name: 'Carol' }] } }")
    val e = intercept[Gql.GqlError](Gql.parse("subscription { person { id } }"))
    assert(e.msg.contains("subscriptions are out of scope"))
  }

  test("mutations: create/update/upsert/delete translate and execute") {
    val in = freshDb()
    val created = Gql.execute("""
      mutation { createPerson(data: {id: "9", name: "Eve", age: 28, city: "Bonn"}) {
        name age } }""", in)
    assert(Render.sql(created) == "{ data: { createPerson: { age: 28, name: 'Eve' } } }")
    val updated = Gql.execute("""
      mutation { updatePerson(id: "person:9", data: {age: 29}) { name age } }""", in)
    assert(Render.sql(updated) == "{ data: { updatePerson: { age: 29, name: 'Eve' } } }")
    val upserted = Gql.execute("""
      mutation { upsertPerson(data: {id: "10", name: "Fay", age: 41, city: "Kyiv"}) { name } }""", in)
    assert(Render.sql(upserted) == "{ data: { upsertPerson: { name: 'Fay' } } }")
    val deleted = Gql.execute("""mutation { deletePerson(id: "9") }""", in)
    assert(Render.sql(deleted) == "{ data: { deletePerson: true } }")
    val after = Gql.execute(
      """{ person(filter: {age: {gt: 27}}, order: {asc: name}) { name } }""", in)
    assert(Render.sql(after) ==
      "{ data: { person: [{ name: 'Alice' }, { name: 'Carol' }, { name: 'Fay' }] } }")
  }

  test("variables: substitution, defaults, non-null enforcement") {
    val in = freshDb()
    val res = Gql.execute("""
      query Q($min: Int!, $town: String = "Oslo") {
        person(filter: {age: {gte: $min}, city: {eq: $town}},
               order: {asc: name}) { name age }
      }""", in, Gql.parseVariables("{min: 30}"))
    assert(Render.sql(res) ==
      "{ data: { person: [{ age: 30, name: 'Alice' }, { age: 35, name: 'Carol' }] } }")
    // missing non-null variable errors like the reference's coercion step
    val err = intercept[Gql.GqlError] {
      Gql.execute("""query($min: Int!) { person(filter: {age: {gte: $min}}) { name } }""", in)
    }
    assert(err.msg.contains("has no value"))
    // undefined variable reference errors
    val err2 = intercept[Gql.GqlError] {
      Gql.execute("""{ person(filter: {age: {gte: $nope}}) { name } }""", in)
    }
    assert(err2.msg.contains("Undefined variable"))
  }

  test("fragments: named spreads, inline spreads, cycles error") {
    val in = freshDb()
    val res = Gql.execute("""
      fragment basics on person { name age }
      query {
        person(filter: {city: {eq: "Oslo"}}, order: {asc: age}) {
          ...basics
          ... on person { city }
        }
      }""", in)
    assert(Render.sql(res) ==
      "{ data: { person: [{ age: 30, city: 'Oslo', name: 'Alice' }, " +
        "{ age: 35, city: 'Oslo', name: 'Carol' }] } }")
    // fragment defined after the operation works too
    val res2 = Gql.execute("""
      { person(filter: {age: {lt: 21}}) { ...nm } }
      fragment nm on person { name }""", in)
    assert(Render.sql(res2) == "{ data: { person: [{ name: 'Dave' }] } }")
    val cyc = intercept[Gql.GqlError] {
      Gql.execute("""
        fragment a on person { ...b }
        fragment b on person { ...a }
        { person { ...a } }""", in)
    }
    assert(cyc.msg.contains("cycle"))
    val unknown = intercept[Gql.GqlError] {
      Gql.execute("{ person { ...ghost } }", in)
    }
    assert(unknown.msg.contains("Unknown fragment"))
  }

  test("variables + fragments compose on the Spark path") {
    val spark = TestSpark.session
    val df = Gql.query(spark, "/root/testdata/sf0.001", """
      fragment keyPrice on orders { o_orderkey o_totalprice }
      query($min: Float!, $st: String!) {
        orders(filter: {and: [{o_orderstatus: {eq: $st}},
                              {o_totalprice: {gt: $min}}]},
               order: {desc: o_totalprice}, limit: 5) { ...keyPrice }
      }""", Gql.parseVariables("""{min: 150000.0, st: "F"}"""))
    val rows = df.collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getDouble(rows.head.fieldIndex("o_totalprice")) > 150000.0))
  }

  test("@skip/@include directives gate fields via variables") {
    val spark = TestSpark.session
    val df = Gql.query(spark, "/root/testdata/sf0.001", """
      query($noPrice: Boolean!, $withStatus: Boolean!) {
        orders(limit: 3, order: {asc: o_orderkey}) {
          o_orderkey
          o_totalprice @skip(if: $noPrice)
          o_orderstatus @include(if: $withStatus)
        }
      }""", Gql.parseVariables("{noPrice: true, withStatus: false}"))
    assert(df.columns.toSeq == Seq("o_orderkey"),
      s"directives did not prune fields: ${df.columns.toSeq}")
    // and the opposite polarity keeps them
    val df2 = Gql.query(spark, "/root/testdata/sf0.001", """
      query($noPrice: Boolean!, $withStatus: Boolean!) {
        orders(limit: 3) {
          o_orderkey
          o_totalprice @skip(if: $noPrice)
          o_orderstatus @include(if: $withStatus)
        }
      }""", Gql.parseVariables("{noPrice: false, withStatus: true}"))
    assert(df2.columns.toSet == Set("o_orderkey", "o_totalprice", "o_orderstatus"))
    // unknown directive errors (schema.rs unknown-directive behavior)
    intercept[Throwable] {
      Gql.query(spark, "/root/testdata/sf0.001",
        "query { orders(limit: 1) { o_orderkey @frobnicate(if: true) } }",
        Map.empty)
    }
  }
}
