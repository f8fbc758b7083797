package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over a near-duplicate pair graph — the step that
  * turns pairwise dedup output (exact/Jaccard/MinHash/SimHash pairs) into
  * KEEP/DROP decisions: every document in a component except its canonical
  * representative (min doc_id) is a duplicate, including transitive chains
  * A~B~C where the A–C pair was never emitted.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — the
  * production-scale choice: O(log n) rounds independent of component
  * diameter, each round key-partitioned aggregations + a co-partitioned
  * join (Catalyst reuses the groupBy exchange for the join on the same
  * key), no driver-side graph state. Label propagation would need
  * O(diameter) rounds; at web scale a single chained-crawl component can
  * have diameter in the thousands.
  *
  * Reference scope note: the reference engine (mcjwsn/Search-Engine) has no
  * dedup stage; this operator is part of the training-data pipeline suite
  * layered on top of the same corpus tables.
  */
object Components {

  /** Rounds the last [[connectedComponents]] call took — test hook for the
    * jobs-per-round budget (2: materialize + fused convergence check).
    */
  @volatile private[ops] var lastRounds: Int = 0

  /** (node, comp) for every node present in `edges` (first two columns —
    * any numeric type; self-loops and duplicate edges tolerated).
    * comp = min node id of the connected component.
    *
    * Each round materializes the shrinking edge set (lineage otherwise
    * doubles per round — the classic iterative-Spark trap):
    *
    *  - default: `localCheckpoint` (executor-local blocks, nothing pulled
    *    to the driver, no extra write job). NOT fault-tolerant: on a real
    *    cluster an executor loss mid-loop loses its checkpointed partitions
    *    and fails the job (recoverable only by restarting the whole CC).
    *  - `reliableCheckpointDir = Some(path)`: reliable `checkpoint()` into
    *    that directory (HDFS/S3 in production) — each round pays a write
    *    job, but executor loss only recomputes from the last round's files.
    *    The right trade for a 100-TB run where a round costs minutes and
    *    an executor loss over a multi-hour loop is near-certain.
    */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25,
                          reliableCheckpointDir: Option[String] = None): DataFrame = {
    val aCol = edges.columns(0)
    val bCol = edges.columns(1)
    val sc = edges.sparkSession.sparkContext
    // setCheckpointDir is SparkContext-global: save the caller's dir and
    // restore it in the finally below, confining both the redirect and the
    // subdir GC to this run — another checkpoint() user in the same app
    // never writes into (or gets GC'd out of) the CC subdir.
    // read through the internals shim: getCheckpointDir's value is the
    // RESOLVED dir (with Spark's appended UUID), and feeding it back into
    // setCheckpointDir would nest another UUID level per CC run — the shim
    // restores the var byte-for-byte, including the unset state.
    val prevCheckpointDir: Option[Option[String]] =
      if (reliableCheckpointDir.isDefined)
        Some(org.apache.spark.GraftCheckpointAccess.get(sc))
      else None
    val materialize: DataFrame => DataFrame = reliableCheckpointDir match {
      case Some(d) =>
        // unique per-run SUBdirectory: concurrent CC runs cannot collide,
        // and the GC below cannot touch another computation's checkpoints.
        val sub = s"$d/graft-cc-${java.util.UUID.randomUUID().toString.take(8)}"
        sc.setCheckpointDir(sub)
        val subPath = new org.apache.hadoop.fs.Path(sub)
        val fs = subPath.getFileSystem(sc.hadoopConfiguration)
        df => {
          val out = df.checkpoint() // eager, reliable storage
          // GC every checkpoint but the newest: a round only reads the
          // PREVIOUS round's files while computing, so once `out` is
          // materialized the older rounds are dead weight — a ~25-round
          // 100-TB run would otherwise hold ~25 edge-set copies in the
          // checkpoint bucket (Spark's cleanCheckpoints is off by default)
          try {
            if (fs.exists(subPath)) {
              val rdds = scala.collection.mutable.ArrayBuffer
                .empty[(Long, org.apache.hadoop.fs.Path)]
              fs.listStatus(subPath).foreach { ctx =>
                if (ctx.isDirectory) fs.listStatus(ctx.getPath).foreach { r =>
                  val n = r.getPath.getName
                  if (n.startsWith("rdd-"))
                    rdds += ((n.stripPrefix("rdd-").toLong, r.getPath))
                }
              }
              if (rdds.nonEmpty) {
                val keep = rdds.maxBy(_._1)._1
                rdds.filter(_._1 != keep).foreach(p => fs.delete(p._2, true))
              }
            }
          } catch { case _: java.io.IOException => () } // GC is best-effort
          out
        }
      case None => df => df.localCheckpoint(true)
    }
    // canonical undirected edge (big, small), self-loops dropped.
    // MATERIALIZED before the loop: round 1 references the edge set four
    // times (sym's two union legs, each feeding both the groupBy and the
    // join); without this the whole upstream derivation — e.g. the n-gram
    // Jaccard pair pipeline, seconds of work — re-executes per reference.
    var e: DataFrame = null
    var converged = false
    var it = 0
    try {
    e = materialize(edges
      .select(greatest(col(aCol), col(bCol)).cast("long").as("u"),
        least(col(aCol), col(bCol)).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .distinct())
    while (!converged && it < maxIter) {
      // LARGE-STAR: per node n over SYMMETRIZED edges, link every strictly
      // larger neighbor to m = min(N(n) ∪ {n}).
      val sym = e.select(col("u").as("n"), col("v").as("nb"))
        .union(e.select(col("v").as("n"), col("u").as("nb")))
      val lsMins = sym.groupBy("n").agg(least(min("nb"), min("n")).as("m"))
      val ls = sym.join(lsMins, "n")
        .filter(col("nb") > col("n"))
        .select(col("nb").as("u"), col("m").as("v"))
        .distinct()
      // SMALL-STAR: ls edges point big -> small (u > v); per larger
      // endpoint n, link every smaller neighbor AND n itself to
      // m = min(N(n) ∪ {n}) (= min(v) here since all v < n).
      val ssMins = ls.groupBy(col("u").as("n")).agg(min("v").as("m"))
      val ss = ls.select(col("u").as("n"), col("v").as("nb"))
        .join(ssMins, "n")
        .select(col("nb").as("u"), col("m").as("v"))
        .union(ssMins.select(col("n").as("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
      val mat = materialize(ss)
      // Converged iff the edge set is a star forest: no parent is also a
      // child, and each child has one distinct parent. Star forests are
      // fixed points of both operations, and since every round preserves
      // connectivity and parents are always the smaller endpoint, the
      // star centers at convergence are the component minima.
      //
      // ONE Spark action for both tests (round 2 ran two jobs per round;
      // at many-component scale per-job driver latency dominated round
      // time): tag each endpoint role, group by node — a node with both
      // roles is a parent-that-is-also-a-child (chain), a node with >1
      // child-role rows has multiple parents (mat rows are distinct, so
      // the row count IS the distinct parent count).
      val conv = mat.select(col("u").as("n"), lit(1).as("c"))
        .union(mat.select(col("v").as("n"), lit(0).as("c")))
        .groupBy("n").agg(sum("c").as("np"), max("c").as("mx"), min("c").as("mn"))
        .agg(
          coalesce(sum(when(col("mx") === 1 && col("mn") === 0, 1L)
            .otherwise(0L)), lit(0L)).as("chains"),
          coalesce(sum(when(col("np") > 1, 1L).otherwise(0L)), lit(0L)).as("multi"))
        .first()
      converged = conv.getLong(0) == 0L && conv.getLong(1) == 0L
      e = mat
      it += 1
    }
    } finally {
      // exact restore (set or unset) — see the shim's scaladoc for why the
      // public setCheckpointDir cannot do this
      prevCheckpointDir.foreach(
        org.apache.spark.GraftCheckpointAccess.set(sc, _))
    }
    lastRounds = it
    require(converged, s"connectedComponents did not converge in $maxIter rounds")
    // star edges (child -> root) + the roots themselves
    e.select(col("u").as("node"), col("v").as("comp"))
      .union(e.select(col("v").as("node"), col("v").as("comp")))
      .distinct()
  }

  /** Query surface: every document labelled with its duplicate-component
    * id and size. Documents with no near-dup pair form singleton
    * components (comp = own id). Edges come from [[Dedup.ngramJaccard]],
    * so chains created by ~τ-similar neighbours collapse transitively.
    */
  def dedupComponents(docs: DataFrame, n: Int = 3, minJaccard: Double = 0.5,
                      idCol: String = "doc_id"): DataFrame = {
    val pairs = Dedup.ngramJaccard(docs, n, minJaccard, idCol = idCol)
      .select("id_a", "id_b")
    label(docs, connectedComponents(pairs), idCol)
  }

  /** MinHash-LSH dedup clustering WITHOUT pair materialization — the
    * 100-TB form. [[Dedup.minhashLsh]] emits every pair inside a band
    * bucket: a boilerplate document repeated m times makes one bucket of
    * size m and m²/2 join rows (m=10⁶ → 5·10¹¹ rows from a single
    * template page). Here each bucket instead emits m-1 STAR EDGES to its
    * min member — linear in bucket size — and connected components
    * restores exactly the connectivity the pairwise join would have
    * produced (two docs sharing a bucket are linked through its root, and
    * CC is closed under that relinking), so cluster labels are identical.
    * Precision is LSH-candidate level (no Jaccard verification — at this
    * scale verification runs per CLUSTER on the representatives, not per
    * candidate pair).
    */
  def minhashClusters(docs: DataFrame, shingle: Int = 3, bands: Int = 16,
                      rowsPerBand: Int = 4, seed: Long = 42L,
                      textCol: String = "text",
                      idCol: String = "doc_id"): DataFrame = {
    val buckets =
      Dedup.bandBuckets(docs, shingle, bands, rowsPerBand, seed, textCol, idCol)
    val roots = buckets.groupBy("band", "bucket")
      .agg(min("doc_id").as("root"))
    val star = buckets.join(roots, Seq("band", "bucket"))
      .filter(col("doc_id") =!= col("root"))
      .select(col("doc_id").as("id_a"), col("root").as("id_b"))
      .distinct()
    label(docs, connectedComponents(star), idCol)
  }

  /** Canonical-document selection over the MinHash dedup clusters: the
    * curation stage AFTER clustering — each near-dup component keeps ONE
    * representative (the longest document by `n_chars`, ties to the
    * smallest doc_id — the "keep the superset page" heuristic), everything
    * else in the component is dropped by the downstream filter. Returns
    * (doc_id, comp_id, canonical_id, is_canonical) for every document.
    *
    * Scale shape: [[minhashClusters]]' linear star-edge plan, then ONE
    * window shuffle on comp_id (first_value over (n_chars desc, doc_id
    * asc)) — no join-back of a representatives table, no driver state.
    * Window partitions are component-sized, and components are bounded by
    * the same argument as the star edges (a bucket of m copies is one
    * component of m docs, never m² rows).
    */
  def canonicalDocs(docs: DataFrame, shingle: Int = 3, bands: Int = 16,
                    rowsPerBand: Int = 4, seed: Long = 42L,
                    textCol: String = "text", idCol: String = "doc_id",
                    lenCol: String = "n_chars"): DataFrame = {
    val lab = minhashClusters(docs, shingle, bands, rowsPerBand, seed,
      textCol, idCol)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("comp_id")
      .orderBy(col(lenCol).desc, col("doc_id").asc)
    lab.join(docs.select(col(idCol).cast("long").as("doc_id"),
        col(lenCol).cast("long").as(lenCol)), Seq("doc_id"))
      .withColumn("canonical_id", first_value(col("doc_id")).over(w))
      .select(col("doc_id"), col("comp_id"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).cast("int").as("is_canonical"))
      .orderBy("doc_id")
  }

  /** (doc_id, comp_id, comp_size, is_dup) for every document; docs absent
    * from the component edges are singletons.
    */
  private def label(docs: DataFrame, cc: DataFrame, idCol: String): DataFrame = {
    // comp sizes from the CC edges alone (cc carries root->root rows, so
    // node count per comp is the size); docs absent from cc are singletons
    // (size 1 via the coalesce). This references the docs scan ONCE —
    // deriving sizes from the labelled frame re-executed the docs join.
    val sizes = cc.groupBy(col("comp").as("comp_id"))
      .agg(count(lit(1)).as("cc_size"))
    docs.select(col(idCol).cast("long").as("doc_id"))
      .join(cc, col("doc_id") === col("node"), "left")
      .select(col("doc_id"),
        coalesce(col("comp"), col("doc_id")).as("comp_id"))
      .join(sizes, Seq("comp_id"), "left")
      .select(col("doc_id"), col("comp_id"),
        coalesce(col("cc_size"), lit(1L)).as("comp_size"),
        (col("doc_id") =!= col("comp_id")).cast("int").as("is_dup"))
      .orderBy("doc_id")
  }

  /** Duplicate-CLUSTER-SIZE histogram over the MinHash components — the
    * one-page dedup report a pipeline owner reads before choosing a
    * keep-one-per-cluster policy ("is the corpus 1% exact mirrors or one
    * 10^6-doc template family?"): per cluster size, how many clusters,
    * how many documents they hold, and the corpus fraction. Singletons
    * (size 1) are the non-duplicated mass.
    *
    * Plan shape at 100 TB: the cluster chain is [[minhashClusters]]
    * (banded star edges -> O(log n) CC — the established scale path);
    * everything after runs on the (comp_id, size) DISTINCT table and then
    * the size histogram (tens of rows), localCheckpointed because it
    * feeds both the histogram rows and the total (no subtree sharing).
    * Output (comp_size, n_clusters, n_docs, doc_frac) ordered by size.
    */
  def clusterSizeHistogram(docs: DataFrame, shingle: Int = 3,
                           bands: Int = 16, rowsPerBand: Int = 4,
                           seed: Long = 42L): DataFrame = {
    val lab = minhashClusters(docs, shingle, bands, rowsPerBand, seed)
    val hist = lab.select("comp_id", "comp_size").distinct()
      .groupBy("comp_size").agg(count(lit(1)).as("n_clusters"))
      .withColumn("n_docs", col("comp_size") * col("n_clusters"))
      .localCheckpoint()
    val tot = hist.agg(sum("n_docs").as("total"))
    hist.crossJoin(broadcast(tot))
      .select(col("comp_size"), col("n_clusters"), col("n_docs"),
        round(col("n_docs").cast("double") /
          col("total").cast("double"), 6).as("doc_frac"))
  }
}
