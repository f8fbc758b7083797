package graft.search

import org.scalatest.funsuite.AnyFunSuite

import graft.index.{BlockRow, Codec}

/** WAND == exhaustive top-k on randomized posting lists (SURVEY.md §5
  * item 6), pure JVM — no Spark session. Exercises multi-block lists, block
  * skipping, tie-breaking, and the >= 3-cursor pivot/advance paths.
  */
class WandSpec extends AnyFunSuite {

  private def mkBlocks(term: String, postings: Seq[(Long, Double)],
                       blockSize: Int): Seq[BlockRow] = {
    postings.sortBy(_._1).grouped(blockSize).zipWithIndex.map { case (grp, i) =>
      val docs = grp.map(_._1).toArray
      val wts = grp.map(_._2).toArray
      BlockRow(0, 0, term, i.toLong, grp.size, docs.last, wts.max,
        Codec.encodeDocIds(docs), Codec.encodeDoubles(wts),
        Codec.encodeVarLongs(Array.fill(grp.size)(1L)))
    }.toSeq
  }

  private def exhaustive(lists: Map[String, Seq[(Long, Double)]],
                         qtf: Map[String, Double], k: Int): Seq[(Long, Double)] = {
    val terms = lists.keys.toSeq.sorted
    val byDoc = scala.collection.mutable.HashMap.empty[Long, Double]
    terms.foreach { t =>
      // NB: per-doc accumulation in lexicographic term order (pinned)
      lists(t).foreach { case (d, w) =>
        byDoc(d) = byDoc.getOrElse(d, 0.0) + qtf(t) * w
      }
    }
    byDoc.toSeq.sortBy { case (d, s) => (-s, d) }.take(k)
  }

  test("WAND == exhaustive over 200 random corpora") {
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { trial =>
      val nTerms = 1 + rnd.nextInt(5)
      val nDocs = 1 + rnd.nextInt(200)
      val blockSize = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(12)
      val lists: Map[String, Seq[(Long, Double)]] = (0 until nTerms).map { t =>
        val term = s"t$t"
        // span NEGATIVE ids: docIds are hash-valued in production and the
        // leapfrog target init once silently skipped the negative half
        val docs = (0 until nDocs).filter(_ => rnd.nextDouble() < 0.4)
          .map(_.toLong * (1 + rnd.nextInt(3)) - nDocs)
          .distinct
        // small weight set on purpose: forces score ties -> docId tie-break
        term -> docs.map(d => (d, (1 + rnd.nextInt(4)) * 0.25)).toSeq
      }.toMap.filter(_._2.nonEmpty)
      if (lists.nonEmpty) {
        val qtf = lists.keys.map(t => t -> (1 + rnd.nextInt(2)).toDouble).toMap
        val blocks = lists.toSeq.flatMap { case (t, ps) => mkBlocks(t, ps, blockSize) }
        val got = Wand.topK(blocks.iterator, qtf, k).toSeq
          .sortBy { case (d, s) => (-s, d) }
        val want = exhaustive(lists, qtf, k)
        assert(got == want, s"trial=$trial k=$k lists=$lists")
      }
    }
  }

  test("conjunctive == brute-force intersection over 200 random corpora") {
    val rnd = new scala.util.Random(23)
    (1 to 200).foreach { trial =>
      val nTerms = 1 + rnd.nextInt(4)
      val nDocs = 1 + rnd.nextInt(150)
      val blockSize = 1 + rnd.nextInt(8)
      val k = 1 + rnd.nextInt(8)
      val lists: Map[String, Seq[(Long, Double)]] = (0 until nTerms).map { t =>
        val docs = (0 until nDocs).filter(_ => rnd.nextDouble() < 0.5)
          .map(_.toLong - nDocs / 2) // negative-id half included
        s"t$t" -> docs.map(d => (d, (1 + rnd.nextInt(4)) * 0.25)).toSeq
      }.toMap.filter(_._2.nonEmpty)
      if (lists.size == nTerms) { // all terms present (else shard has no AND match)
        val qtf = lists.keys.map(t => t -> 1.0).toMap
        val blocks = lists.toSeq.flatMap { case (t, ps) => mkBlocks(t, ps, blockSize) }
        val got = Wand.topKConjunctive(blocks.iterator, qtf, k).toSeq
          .sortBy { case (d, s) => (-s, d) }
        // brute force: docs present in every list
        val common = lists.values.map(_.map(_._1).toSet).reduce(_ intersect _)
        val want = common.toSeq.map { d =>
          val score = lists.keys.toSeq.sorted
            .map(t => qtf(t) * lists(t).find(_._1 == d).get._2).sum
          (d, score)
        }.sortBy { case (d, s) => (-s, d) }.take(k)
        assert(got == want, s"trial=$trial")
      }
    }
  }

  test("WAND with random exclusion sets == filtered exhaustive (200 corpora)") {
    // the tombstone overlay inside the DAAT loops: excluded docs must never
    // take a top-k slot, survivors keep exact scores, and the block-max
    // pruning/heap-threshold interaction stays exact under exclusions —
    // covers disjunctive, single-term fast path (nTerms=1 draws), and
    // conjunctive, across random block sizes
    val rnd = new scala.util.Random(31)
    (1 to 200).foreach { trial =>
      val nTerms = 1 + rnd.nextInt(5)
      val nDocs = 1 + rnd.nextInt(200)
      val blockSize = 1 + rnd.nextInt(16)
      val k = 1 + rnd.nextInt(12)
      val lists: Map[String, Seq[(Long, Double)]] = (0 until nTerms).map { t =>
        // span NEGATIVE ids: docIds are hash-valued in production and the
        // leapfrog target init once silently skipped the negative half
        val docs = (0 until nDocs).filter(_ => rnd.nextDouble() < 0.4)
          .map(_.toLong * (1 + rnd.nextInt(3)) - nDocs)
          .distinct
        s"t$t" -> docs.map(d => (d, (1 + rnd.nextInt(4)) * 0.25)).toSeq
      }.toMap.filter(_._2.nonEmpty)
      if (lists.nonEmpty) {
        val qtf = lists.keys.map(t => t -> (1 + rnd.nextInt(2)).toDouble).toMap
        val allDocs = lists.values.flatMap(_.map(_._1)).toSet
        // exclusion rates from none to nearly-everything (the k > survivors
        // edge included)
        val exRate = rnd.nextDouble()
        val excluded = allDocs.filter(_ => rnd.nextDouble() < exRate)
        val ex: Long => Boolean = excluded.contains
        val blocks = lists.toSeq.flatMap { case (t, ps) => mkBlocks(t, ps, blockSize) }
        val got = Wand.topK(blocks.iterator, qtf, k, ex).toSeq
          .sortBy { case (d, s) => (-s, d) }
        val want = exhaustive(lists, qtf, Int.MaxValue)
          .filterNot { case (d, _) => excluded(d) }.take(k)
        assert(got == want, s"trial=$trial k=$k ex=${excluded.size}/${allDocs.size}")
        // conjunctive with the same overlay
        if (lists.size == nTerms) {
          val common = lists.values.map(_.map(_._1).toSet).reduce(_ intersect _)
          val wantAnd = common.toSeq.map { d =>
            (d, lists.keys.toSeq.sorted
              .map(t => qtf(t) * lists(t).find(_._1 == d).get._2).sum)
          }.filterNot { case (d, _) => excluded(d) }
            .sortBy { case (d, s) => (-s, d) }.take(k)
          val gotAnd = Wand.topKConjunctive(blocks.iterator, qtf, k, ex).toSeq
            .sortBy { case (d, s) => (-s, d) }
          assert(gotAnd == wantAnd, s"trial=$trial AND")
        }
      }
    }
  }

  test("conjunctiveAll == full brute-force intersection over 200 random corpora") {
    // the phrase evaluator's candidate source: EVERY aligned doc, no k-cut,
    // exclusion overlay honored, negative ids included
    val rnd = new scala.util.Random(47)
    (1 to 200).foreach { trial =>
      val nTerms = 1 + rnd.nextInt(4)
      val nDocs = 1 + rnd.nextInt(150)
      val blockSize = 1 + rnd.nextInt(8)
      val lists: Map[String, Seq[(Long, Double)]] = (0 until nTerms).map { t =>
        val docs = (0 until nDocs).filter(_ => rnd.nextDouble() < 0.5)
          .map(_.toLong - nDocs / 2)
        s"t$t" -> docs.map(d => (d, (1 + rnd.nextInt(4)) * 0.25)).toSeq
      }.toMap.filter(_._2.nonEmpty)
      if (lists.size == nTerms) {
        val qtf = lists.keys.map(t => t -> (1 + rnd.nextInt(2)).toDouble).toMap
        val allDocs = lists.values.flatMap(_.map(_._1)).toSet
        val excluded = allDocs.filter(_ => rnd.nextDouble() < 0.3)
        val ex: Long => Boolean = if (excluded.isEmpty) null else excluded.contains
        val blocks = lists.toSeq.flatMap { case (t, ps) => mkBlocks(t, ps, blockSize) }
        val got = Wand.conjunctiveAll(blocks.iterator, qtf, ex).toSeq
          .sortBy { case (d, s) => (-s, d) }
        val common = lists.values.map(_.map(_._1).toSet).reduce(_ intersect _)
        val want = common.toSeq.map { d =>
          (d, lists.keys.toSeq.sorted
            .map(t => qtf(t) * lists(t).find(_._1 == d).get._2).sum)
        }.filterNot { case (d, _) => excluded(d) }
          .sortBy { case (d, s) => (-s, d) }
        assert(got == want, s"trial=$trial")
      }
    }
  }

  test("single exhausted-path regression: 3 cursors, one at pivot") {
    // shape that hangs if the advance step may pick a cursor already at pivot
    val lists = Map(
      "a" -> Seq((1L, 0.5), (100L, 0.5)),
      "b" -> Seq((50L, 2.0), (100L, 2.0)),
      "c" -> Seq((50L, 3.0), (60L, 3.0)))
    val qtf = Map("a" -> 1.0, "b" -> 1.0, "c" -> 1.0)
    val blocks = lists.toSeq.flatMap { case (t, ps) => mkBlocks(t, ps, 1) }
    val got = Wand.topK(blocks.iterator, qtf, 2).toSeq.sortBy { case (d, s) => (-s, d) }
    assert(got == exhaustive(lists, qtf, 2))
  }
}
