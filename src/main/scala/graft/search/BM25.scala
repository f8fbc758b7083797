package graft.search

/** BM25 scoring (north rule: exact BM25 replaces the reference's
  * TF-IDF-cosine — reference scoring inventoried at SURVEY.md §2.3 A5/A6/A10).
  *
  * idf = ln((N - df + 0.5)/(df + 0.5) + 1)        [Robertson-Sparck Jones +1]
  * w(t,d) = idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl))
  * score(q,d) = sum over query tokens (with multiplicity qtf) of w(t,d)
  *
  * All math in IEEE double with a pinned operation order so the distributed
  * engine, the single-node oracle, and the posting-block maxScore metadata
  * agree bit-for-bit (SURVEY.md §7.6.1).
  */
final case class BM25Params(k1: Double = 1.2, b: Double = 0.75)

object BM25 {
  val default: BM25Params = BM25Params()

  @inline def idf(n: Double, df: Double): Double =
    math.log((n - df + 0.5) / (df + 0.5) + 1.0)

  @inline def weight(tf: Double, dl: Double, avgdl: Double, idf: Double, p: BM25Params): Double =
    idf * (tf * (p.k1 + 1.0)) / (tf + p.k1 * (1.0 - p.b + p.b * dl / avgdl))
}
