package graft.surql
object Scratch {
  def main(args: Array[String]): Unit = {
    Seq(
      "LET $vs = SELECT id, vector::distance::knn() as distance FROM test WHERE embedding <|2,100|> $qvec;",
      "LET $ft = SELECT id, search::score(1) as ft_score FROM test WHERE text @1@ 'graph' ORDER BY ft_score DESC LIMIT 2;",
      "DEFINE INDEX idx_embedding ON TABLE test FIELDS embedding HNSW DIMENSION 3 DIST COSINE HASHED_VECTOR;"
    ).foreach { c =>
      try { Parser.parse(c); println("OK   " + c.take(60)) }
      catch { case e: Throwable => println("FAIL " + c.take(60) + "  => " + e.getMessage.take(50)) }
    }
  }
}
