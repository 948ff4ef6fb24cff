package graft

import org.scalatest.funsuite.AnyFunSuite

/** Completion-marker protocol for persisted index warms: a build runs once,
  * a completed dir is reused as-is, and a partial (crashed) dir is rebuilt
  * rather than served. */
class CacheDirSpec extends AnyFunSuite {

  private def freshBase(tag: String): String =
    CacheDir.path(s"spec-$tag", s"corpus-${System.nanoTime()}")

  test("ensure builds once and reuses the completed directory") {
    var builds = 0
    val base = freshBase("reuse")
    def run() = CacheDir.ensure(base) { p =>
      builds += 1
      val f = new java.io.File(p); f.mkdirs()
      java.nio.file.Files.write(new java.io.File(f, "data").toPath,
        "x".getBytes("UTF-8"))
    }
    assert(run() == base && builds == 1)
    assert(run() == base && builds == 1) // marker present → skip
    assert(CacheDir.ready(base))
    assert(new java.io.File(base, "data").exists())
  }

  test("a partial directory without the marker is rebuilt") {
    val base = freshBase("partial")
    // simulate a crashed build: data present, no marker
    new java.io.File(base).mkdirs()
    java.nio.file.Files.write(new java.io.File(base, "stale").toPath,
      "junk".getBytes("UTF-8"))
    assert(!CacheDir.ready(base))
    CacheDir.ensure(base) { p =>
      val f = new java.io.File(p); f.mkdirs()
      java.nio.file.Files.write(new java.io.File(f, "good").toPath,
        "y".getBytes("UTF-8"))
    }
    assert(CacheDir.ready(base))
    assert(new java.io.File(base, "good").exists())
    assert(!new java.io.File(base, "stale").exists()) // stale copy replaced
  }

  test("strong keys separate corpora that a 32-bit hash could collide") {
    val a = CacheDir.path("kind-v1", "/data/corpus-a")
    val b = CacheDir.path("kind-v1", "/data/corpus-b")
    val c = CacheDir.path("kind-v2", "/data/corpus-a")
    assert(Set(a, b, c).size == 3)
  }

  test("sidecars round-trip inside a cache dir") {
    val base = freshBase("sidecar")
    CacheDir.ensure(base) { p =>
      new java.io.File(p).mkdirs()
      CacheDir.writeSidecar(p, "meta.tsv", "k\t1\n")
    }
    assert(CacheDir.readSidecar(base, "meta.tsv") == "k\t1\n")
  }
}
