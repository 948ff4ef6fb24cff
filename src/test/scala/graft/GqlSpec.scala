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
}
