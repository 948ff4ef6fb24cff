package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.surql.Snowball

/** Oracle-generated stemmer vectors (r18): ~1000 (language, word, stem)
  * triples produced by running real inflected words through PostgreSQL's
  * snowball dictionaries — the same upstream algorithms the reference's
  * rust_stemmers embeds. This net is independent of the reference's own
  * (small) per-language analyzer vectors and caught eight real
  * divergences when first run: romanian's comma-below normalization and
  * among-commit, spanish encia→ente, portuguese's phantom âncias row,
  * finnish case fallback + the tidy setlimit depth, greek's
  * ιδια/ολογια/ακια families, arabic's وال/فال
  * article rows, and the full Tamil reconstruction. Exclusions where the
  * PG snowball version demonstrably differs from rust-stemmers 1.2 are
  * documented in the resource header. */
class SnowballOracleSpec extends AnyFunSuite {

  private lazy val vectors: Seq[(String, String, String)] =
    scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/snowball_oracle_vectors.tsv"), "UTF-8")
      .getLines()
      .filterNot(l => l.startsWith("#") || l.isEmpty)
      .map { l => val Array(lang, w, s) = l.split('\t'); (lang, w, s) }
      .toSeq

  test("every oracle vector stems exactly (~1000 words, 17 languages)") {
    val miss = vectors.flatMap { case (lang, w, want) =>
      val got = Snowball.stem(lang, w)
      if (got == want) scala.None else Some(s"$lang($w): got $got want $want")
    }
    assert(miss.isEmpty, s"${miss.size} misses:\n${miss.take(20).mkString("\n")}")
  }
}
