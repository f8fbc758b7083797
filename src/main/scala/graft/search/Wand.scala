package graft.search

import scala.collection.mutable

import graft.index.{BlockRow, Codec}

/** Per-shard top-k scorer: document-at-a-time traversal with WAND
  * upper-bound pruning and block-level seek skipping (SURVEY.md §4 items
  * O2/O3 upgraded — the reference walks full posting rows score-at-a-time
  * with a dense accumulator, search.rs:54-78; we prune by score and skip
  * whole compressed blocks by max_doc without decoding them).
  *
  * Exactness contract (north rule rank-identity, SURVEY.md §7.6.1):
  *  - disjunctive (OR) semantics, as the reference (search.rs:58-69);
  *  - a fully-evaluated doc's score sums cursor contributions in
  *    lexicographic term order (cursor array is term-sorted);
  *  - pruning is tie-safe: a doc is skipped only when its upper bound is
  *    *strictly* below the current threshold, so equal-score candidates are
  *    always evaluated and the (score desc, doc_id asc) order is exact;
  *  - heap eviction uses the same total order.
  */
object Wand {

  private final val Exhausted = Long.MaxValue

  /** Cursor over one term's block sequence within one shard. Blocks are
    * docId-ordered (build guarantees block_id order = docId order); decode
    * is lazy — seek() skips whole blocks via max_doc metadata.
    */
  private final class Cursor(val term: String, val qtf: Double,
                             blocks: Array[BlockRow]) {
    val ub: Double = {
      var m = Double.NegativeInfinity
      var i = 0
      while (i < blocks.length) { if (blocks(i).max_w > m) m = blocks(i).max_w; i += 1 }
      qtf * m
    }
    private var bi = -1
    private var pi = 0
    private var docs: Array[Long] = null
    private var wts: Array[Double] = null
    var curDoc: Long = _
    nextBlock()

    private def nextBlock(): Unit = {
      bi += 1
      if (bi >= blocks.length) { curDoc = Exhausted; docs = null }
      else {
        val blk = blocks(bi)
        docs = Codec.decodeDocIds(blk.docs_bin, blk.n)
        wts = Codec.decodeDoubles(blk.wts_bin)
        pi = 0
        curDoc = docs(0)
      }
    }

    def contribution: Double = qtf * wts(pi)

    def next(): Unit = {
      pi += 1
      if (docs != null && pi < docs.length) curDoc = docs(pi) else nextBlock()
    }

    /** Advance to the first posting with docId >= target. */
    def seek(target: Long): Unit = {
      if (curDoc >= target) return
      // skip undecoded blocks entirely by max_doc
      while (bi < blocks.length && blocks(bi).max_doc < target) bi += 1
      bi -= 1 // nextBlock() increments
      nextBlock()
      if (curDoc == Exhausted) return
      // binary search within the block
      var lo = 0
      var hi = docs.length - 1
      if (docs(hi) < target) { curDoc = Exhausted; return } // cannot happen (max_doc guard)
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (docs(mid) < target) lo = mid + 1 else hi = mid
      }
      pi = lo
      curDoc = docs(pi)
    }
  }

  private final case class Hit(doc: Long, score: Double)

  /** worst-first ordering: lower score first; equal scores -> larger docId
    * first (so the evicted element is the one (score desc, doc asc) ranks
    * last).
    */
  private val worstFirst: Ordering[Hit] = (a: Hit, b: Hit) => {
    val c = java.lang.Double.compare(a.score, b.score)
    if (c != 0) c else java.lang.Long.compare(b.doc, a.doc)
  }

  /** Optional tombstone overlay: a predicate over docIds; `null` means no
    * exclusions (kept non-Option so the DAAT hot loops stay allocation-free).
    * An excluded doc is skipped at CANDIDATE time — it never occupies a
    * top-k slot — while the block-max upper bounds stay valid bounds, so
    * WAND pruning remains exact for the surviving docs.
    */
  /** `afterScore`/`afterDoc` (optional) are a deep-pagination cursor in
    * the PUBLIC result space — the 4-dp-ROUNDED (score desc, doc_id asc)
    * total order every gate compares on: only candidates ranking strictly
    * after the cursor may take a heap slot, so page N+1 asks for the top-k
    * after page N's last row instead of top-((N+1)·k) re-fetched. The
    * default cursor (+∞) admits everything. Pruning stays exact: the
    * upper-bound threshold still bounds every admissible candidate's
    * score from above.
    */
  def topK(rows: Iterator[BlockRow], qtf: Map[String, Double], k: Int,
           excluded: Long => Boolean = null,
           afterScore: Double = Double.PositiveInfinity,
           afterDoc: Long = Long.MinValue): Iterator[(Long, Double)] = {
    // group blocks by term; sort each term's blocks by block_id (=docId order)
    val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[BlockRow]]
    rows.foreach(r => byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) += r)
    if (byTerm.isEmpty) return Iterator.empty
    if (byTerm.size == 1) {
      val (t, bs) = byTerm.head
      return singleTermTopK(bs, qtf(t), k, excluded, afterScore, afterDoc)
    }
    val cursors: Array[Cursor] = byTerm.toArray.sortBy(_._1).map { case (t, bs) =>
      new Cursor(t, qtf(t), bs.sortBy(_.block_id).toArray)
    }
    val heap = new java.util.PriorityQueue[Hit](k, worstFirst.asInstanceOf[java.util.Comparator[Hit]])

    @inline def threshold: Double =
      if (heap.size < k) Double.NegativeInfinity else heap.peek().score

    @inline def offer(doc: Long, score: Double): Unit = {
      // cursor check in the rounded public order (see scaladoc)
      val r = math.rint(score * 1e4) / 1e4
      if (r > afterScore || (r == afterScore && doc <= afterDoc)) return
      if (heap.size < k) heap.add(Hit(doc, score))
      else {
        val w = heap.peek()
        if (score > w.score || (score == w.score && doc < w.doc)) {
          heap.poll(); heap.add(Hit(doc, score))
        }
      }
    }

    // by-curDoc view, re-sorted each round (|q| is tiny)
    val order = cursors.clone()

    var done = false
    while (!done) {
      java.util.Arrays.sort(order, (a: Cursor, b: Cursor) =>
        java.lang.Long.compare(a.curDoc, b.curDoc))
      // pivot: first index where prefix UB sum could beat the threshold
      val th = threshold
      var acc = 0.0
      var p = 0
      var found = false
      while (p < order.length && !found) {
        acc += order(p).ub
        // tie-safe: only a strictly-smaller bound can be pruned
        if (acc >= th || th == Double.NegativeInfinity) found = true else p += 1
      }
      if (!found || order(p).curDoc == Exhausted) done = true
      else {
        val pivotDoc = order(p).curDoc
        if (order(0).curDoc == pivotDoc) {
          // fully evaluate pivotDoc: cursors[] is term-sorted -> pinned sum order
          // (tombstoned docs skip the scoring loop entirely and just advance)
          if (excluded == null || !excluded(pivotDoc)) {
            var score = 0.0
            var i = 0
            while (i < cursors.length) {
              if (cursors(i).curDoc == pivotDoc) score += cursors(i).contribution
              i += 1
            }
            offer(pivotDoc, score)
          }
          var i = 0
          while (i < cursors.length) {
            if (cursors(i).curDoc == pivotDoc) cursors(i).next()
            i += 1
          }
        } else {
          // advance the highest-UB cursor strictly BEFORE the pivot (classic
          // WAND pick; a cursor already at pivotDoc must not be chosen or the
          // loop stops making progress)
          var sel = 0
          var i = 1
          while (i < p) {
            if (order(i).curDoc < pivotDoc && order(i).ub > order(sel).ub) sel = i
            i += 1
          }
          order(sel).seek(pivotDoc)
        }
      }
    }
    val out = new Array[(Long, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { val h = heap.poll(); out(i) = (h.doc, h.score); i -= 1 }
    out.iterator
  }

  /** Conjunctive (AND) top-k: posting-list intersection via leapfrog DAAT —
    * cursors seek to the max current docId (whole undecoded blocks skipped
    * by max_doc); a doc is scored only when every cursor lands on it.
    * Contribution sum in lexicographic term order (cursor construction
    * order), same tie-safe heap as the disjunctive path. Beyond the
    * reference (search.rs is OR-only); completes the north rule's
    * "posting-list intersection" wording.
    */
  def topKConjunctive(rows: Iterator[BlockRow], qtf: Map[String, Double],
                      k: Int, excluded: Long => Boolean = null): Iterator[(Long, Double)] = {
    val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[BlockRow]]
    rows.foreach(r => byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) += r)
    // a shard missing any query term has no conjunctive match at all
    if (byTerm.isEmpty || byTerm.size < qtf.size) return Iterator.empty
    val cursors: Array[Cursor] = byTerm.toArray.sortBy(_._1).map { case (t, bs) =>
      new Cursor(t, qtf(t), bs.sortBy(_.block_id).toArray)
    }
    val heap = new java.util.PriorityQueue[Hit](k, worstFirst)
    var totalUb = 0.0
    cursors.foreach(c => totalUb += c.ub)
    var done = false
    while (!done) {
      // static-bound early exit (tie-safe: strict <)
      if (heap.size == k && totalUb < heap.peek().score) done = true
      // leapfrog: everyone seeks to the current maximum
      var target = Long.MinValue // docIds are hash-valued: negative half the time
      var i = 0
      while (i < cursors.length) {
        if (cursors(i).curDoc > target) target = cursors(i).curDoc
        i += 1
      }
      if (done) ()
      else if (target == Exhausted) done = true
      else {
        var aligned = true
        i = 0
        while (i < cursors.length && aligned) {
          cursors(i).seek(target)
          if (cursors(i).curDoc != target) aligned = false
          i += 1
        }
        if (aligned && cursors.forall(_.curDoc == target)) {
          if (excluded == null || !excluded(target)) {
            var score = 0.0
            i = 0
            while (i < cursors.length) { score += cursors(i).contribution; i += 1 }
            if (heap.size < k) heap.add(Hit(target, score))
            else {
              val w = heap.peek()
              if (score > w.score || (score == w.score && target < w.doc)) {
                heap.poll(); heap.add(Hit(target, score))
              }
            }
          }
          i = 0
          while (i < cursors.length) { cursors(i).next(); i += 1 }
        }
      }
    }
    val out = new Array[(Long, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { val h = heap.poll(); out(i) = (h.doc, h.score); i -= 1 }
    out.iterator
  }

  /** Boolean (must / should / must-not) top-k over one shard — the Lucene
    * BooleanQuery surface, single-pass index-native: `posQtf` carries the
    * qtf weights of every POSITIVE (must ∪ should) term, `mustTerms` the
    * subset a document must contain ALL of, `notTerms` the terms a
    * document must contain NONE of. Matching: all-must ∧ no-not when must
    * is non-empty; ≥1-should ∧ no-not otherwise. Scoring: the sum of
    * EVERY positive term's contribution present in the doc (a should term
    * adds score to a must-driven match, Lucene-style), in lexicographic
    * term order (the shared exactness contract).
    *
    * Scale shape: must-driven matching is leapfrog DAAT (the conjunctive
    * machinery); should-only matching is classic WAND (no single-term
    * impact-order fast path — see below). Must-not exclusion rides the
    * SAME shard pass as forward-only cursors probed at evaluation points:
    * every posting of a doc lives in the doc's shard, evaluation targets
    * are non-decreasing in both branches, so exclusion costs O(1) memory
    * regardless of the must-not terms' document frequency — no broadcast
    * set, no extra shuffle, no decode of skipped not-blocks (max_doc
    * seek). This is why the impact-ordered single-term path is NOT taken:
    * it evaluates docs out of order, which would break the forward-only
    * not-cursors.
    */
  def topKBoolean(rows: Iterator[BlockRow], posQtf: Map[String, Double],
                  mustTerms: Set[String], notTerms: Set[String], k: Int,
                  excluded: Long => Boolean = null): Iterator[(Long, Double)] = {
    val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[BlockRow]]
    rows.foreach(r => byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) += r)
    // every posting of a doc lives in the doc's shard: a shard missing any
    // must term has no boolean match at all
    if (mustTerms.exists(t => !byTerm.contains(t))) return Iterator.empty
    val pos: Array[Cursor] = byTerm.toArray.filter(p => posQtf.contains(p._1))
      .sortBy(_._1).map { case (t, bs) =>
        new Cursor(t, posQtf(t), bs.sortBy(_.block_id).toArray) }
    if (pos.isEmpty) return Iterator.empty
    val nots: Array[Cursor] = byTerm.toArray.filter(p => notTerms.contains(p._1))
      .sortBy(_._1).map { case (t, bs) =>
        new Cursor(t, 0.0, bs.sortBy(_.block_id).toArray) }
    @inline def dropped(doc: Long): Boolean = {
      if (excluded != null && excluded(doc)) return true
      var i = 0
      while (i < nots.length) {
        val c = nots(i)
        if (c.curDoc < doc) c.seek(doc)
        if (c.curDoc == doc) return true
        i += 1
      }
      false
    }
    val heap = new java.util.PriorityQueue[Hit](k, worstFirst)
    @inline def offer(doc: Long, score: Double): Unit = {
      if (heap.size < k) heap.add(Hit(doc, score))
      else {
        val w = heap.peek()
        if (score > w.score || (score == w.score && doc < w.doc)) {
          heap.poll(); heap.add(Hit(doc, score))
        }
      }
    }
    // non-driver cursors seek forward to the evaluation point; summation
    // over `pos` is term-sorted (the shared exactness contract)
    @inline def scoreAt(doc: Long): Double = {
      var s = 0.0
      var i = 0
      while (i < pos.length) {
        val c = pos(i)
        if (c.curDoc < doc) c.seek(doc)
        if (c.curDoc == doc) s += c.contribution
        i += 1
      }
      s
    }
    if (mustTerms.nonEmpty) {
      // leapfrog DAAT over the must subset; should cursors only probed at
      // aligned targets (targets non-decreasing -> forward-only)
      val must = pos.filter(c => mustTerms.contains(c.term))
      var totalUb = 0.0
      pos.foreach(c => totalUb += c.ub)
      var done = false
      while (!done) {
        // static-bound early exit (tie-safe: strict <)
        if (heap.size == k && totalUb < heap.peek().score) done = true
        var target = Long.MinValue // docIds are hash-valued: negative half the time
        var i = 0
        while (i < must.length) {
          if (must(i).curDoc > target) target = must(i).curDoc
          i += 1
        }
        if (done) ()
        else if (target == Exhausted) done = true
        else {
          var aligned = true
          i = 0
          while (i < must.length && aligned) {
            must(i).seek(target)
            if (must(i).curDoc != target) aligned = false
            i += 1
          }
          if (aligned && must.forall(_.curDoc == target)) {
            if (!dropped(target)) offer(target, scoreAt(target))
            i = 0
            while (i < must.length) { must(i).next(); i += 1 }
          }
        }
      }
    } else {
      // pure should (+ not): classic WAND over the positive cursors, same
      // tie-safe pruning as topK; pivot evaluations are non-decreasing
      val order = pos.clone()
      var done = false
      while (!done) {
        java.util.Arrays.sort(order, (a: Cursor, b: Cursor) =>
          java.lang.Long.compare(a.curDoc, b.curDoc))
        val th = if (heap.size < k) Double.NegativeInfinity else heap.peek().score
        var acc = 0.0
        var p = 0
        var found = false
        while (p < order.length && !found) {
          acc += order(p).ub
          if (acc >= th || th == Double.NegativeInfinity) found = true else p += 1
        }
        if (!found || order(p).curDoc == Exhausted) done = true
        else {
          val pivotDoc = order(p).curDoc
          if (order(0).curDoc == pivotDoc) {
            if (!dropped(pivotDoc)) offer(pivotDoc, scoreAt(pivotDoc))
            var i = 0
            while (i < pos.length) {
              if (pos(i).curDoc == pivotDoc) pos(i).next()
              i += 1
            }
          } else {
            var sel = 0
            var i = 1
            while (i < p) {
              if (order(i).curDoc < pivotDoc && order(i).ub > order(sel).ub) sel = i
              i += 1
            }
            order(sel).seek(pivotDoc)
          }
        }
      }
    }
    val out = new Array[(Long, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { val h = heap.poll(); out(i) = (h.doc, h.score); i -= 1 }
    out.iterator
  }

  /** Every conjunctive match (no top-k cut): the same leapfrog DAAT as
    * [[topKConjunctive]] minus the heap and the bound-based early exit —
    * the phrase evaluator needs EVERY doc containing all terms, because a
    * downstream boolean filter (adjacency) decides which survive and a
    * premature k-cut could starve it. Scores sum cursor contributions in
    * lexicographic term order (same exactness contract as topK). Emission
    * is docId-ascending within the shard; output size is the conjunctive
    * selectivity, not k-bounded — callers own the downstream limit.
    */
  def conjunctiveAll(rows: Iterator[BlockRow], qtf: Map[String, Double],
                     excluded: Long => Boolean = null): Iterator[(Long, Double)] = {
    val byTerm = mutable.HashMap.empty[String, mutable.ArrayBuffer[BlockRow]]
    rows.foreach(r => byTerm.getOrElseUpdate(r.term, mutable.ArrayBuffer.empty) += r)
    if (byTerm.isEmpty || byTerm.size < qtf.size) return Iterator.empty
    val cursors: Array[Cursor] = byTerm.toArray.sortBy(_._1).map { case (t, bs) =>
      new Cursor(t, qtf(t), bs.sortBy(_.block_id).toArray)
    }
    val out = mutable.ArrayBuffer.empty[(Long, Double)]
    var done = false
    while (!done) {
      var target = Long.MinValue // docIds are hash-valued: negative half the time
      var i = 0
      while (i < cursors.length) {
        if (cursors(i).curDoc > target) target = cursors(i).curDoc
        i += 1
      }
      if (target == Exhausted) done = true
      else {
        var aligned = true
        i = 0
        while (i < cursors.length && aligned) {
          cursors(i).seek(target)
          if (cursors(i).curDoc != target) aligned = false
          i += 1
        }
        if (aligned && cursors.forall(_.curDoc == target)) {
          if (excluded == null || !excluded(target)) {
            var score = 0.0
            i = 0
            while (i < cursors.length) { score += cursors(i).contribution; i += 1 }
            out += ((target, score))
          }
          i = 0
          while (i < cursors.length) { cursors(i).next(); i += 1 }
        }
      }
    }
    out.iterator
  }

  /** Single-term fast path: impact-ordered block traversal — process blocks
    * by descending max_w and stop once the heap is full and the next
    * block's bound is *strictly* below the threshold (every posting in it
    * scores <= bound < θ, so none can enter; bound == θ must still be
    * scanned for the docId tie-break). Exact, and the cure for the hot-term
    * (df ~ N) query whose docId-ordered traversal would decode every block.
    */
  private def singleTermTopK(blocks: mutable.ArrayBuffer[BlockRow], qtf: Double,
                             k: Int, excluded: Long => Boolean = null,
                             afterScore: Double = Double.PositiveInfinity,
                             afterDoc: Long = Long.MinValue): Iterator[(Long, Double)] = {
    val heap = new java.util.PriorityQueue[Hit](k, worstFirst)
    val sorted = blocks.sortBy(-_.max_w)
    var bi = 0
    var done = false
    while (bi < sorted.length && !done) {
      val blk = sorted(bi)
      if (heap.size == k && qtf * blk.max_w < heap.peek().score) done = true
      else {
        val docs = graft.index.Codec.decodeDocIds(blk.docs_bin, blk.n)
        val wts = graft.index.Codec.decodeDoubles(blk.wts_bin)
        var i = 0
        while (i < blk.n) {
          if (excluded == null || !excluded(docs(i))) {
            val score = qtf * wts(i)
            // cursor check in the rounded public order (see topK scaladoc)
            val r = math.rint(score * 1e4) / 1e4
            if (r > afterScore || (r == afterScore && docs(i) <= afterDoc)) ()
            else if (heap.size < k) heap.add(Hit(docs(i), score))
            else {
              val w = heap.peek()
              if (score > w.score || (score == w.score && docs(i) < w.doc)) {
                heap.poll(); heap.add(Hit(docs(i), score))
              }
            }
          }
          i += 1
        }
      }
      bi += 1
    }
    val out = new Array[(Long, Double)](heap.size)
    var i = out.length - 1
    while (i >= 0) { val h = heap.poll(); out(i) = (h.doc, h.score); i -= 1 }
    out.iterator
  }
}
