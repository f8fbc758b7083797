package graft.ops

/** DuckDB twins for the hash-based dedup operators ([[Dedup.simhashPairs]],
  * [[Dedup.minhashLsh]]) — an INDEPENDENT re-implementation of the same
  * pinned hash arithmetic in SQL, so the driver's gate can verify the
  * distributed plans value-exactly (these shipped round 1 as weaker
  * rows-only checks because "SQL can't stem/hash" — but FNV-1a and the
  * universal-hash lanes ARE expressible with HUGEINT modular arithmetic).
  *
  * Exactness notes:
  *  - fnv1a64 runs in UBIGINT with the multiply lifted to HUGEINT and
  *    reduced mod 2^64 per step (DuckDB integer overflow throws; Scala
  *    wraps) — bit-identical to [[Dedup.fnv1a64]] for ASCII/UTF-16-BMP
  *    text (unicode(c) == charAt semantics on the synthetic corpora).
  *  - the minhash lane update a*x+b needs a 64x64->64 wrapping multiply;
  *    HUGEINT is SIGNED 128-bit and a*x can reach 2^128, so the multiply
  *    is split into 32-bit halves (a_lo*x + ((a_hi*x) mod 2^32) << 32).
  *  - lane minima compare SIGNED (Scala Long order): the UBIGINT value is
  *    re-centered to [-2^63, 2^63) in HUGEINT before min().
  *  - the band bucket hashes the SIGNED decimal rendering of the 4-lane
  *    slice joined with "," — exactly `slice.mkString(",")`.
  */
object DedupOracleSql {

  private[ops] val alnum =
    "list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'), x -> length(x) > 2)"

  /** SQL twin of [[Dedup.ngramJaccard]]'s derived hot-shingle cap
    * (max(1000, nDocs/100), integer division in both engines): `ngk` is the
    * `ng` relation with >cap shingles dropped, mirroring the Spark side's
    * broadcast left-anti guard. Every Jaccard oracle must size and join on
    * `ngk`, not `ng` — otherwise the gate diverges on any corpus where a
    * shingle exceeds the cap.
    */
  val ngramCapCtes: String =
    """hot AS (SELECT ngram FROM ng GROUP BY ngram
  HAVING count(*) > greatest(1000, (SELECT count(*) FROM documents) // 100)),
ngk AS (SELECT * FROM ng WHERE ngram NOT IN (SELECT ngram FROM hot))"""

  private val M64 = "18446744073709551616" // 2^64

  /** FNV-1a 64 over the characters of SQL string expression `s`. */
  private[ops] def fnvSql(s: String): String =
    s"""list_reduce(
  list_prepend(CAST(14695981039346656037 AS UBIGINT),
    list_transform(string_split($s, ''), c -> CAST(unicode(c) AS UBIGINT))),
  (h, c) -> CAST((CAST(xor(h, c) AS HUGEINT) * 1099511628211) % $M64 AS UBIGINT))"""

  /** Brute-force SimHash oracle: per-doc 64-bit simhash from tf-weighted
    * FNV term hashes, then ALL pairs with Hamming <= maxHamming. The Spark
    * side's pigeonhole banding is exact (any pair within the radius shares
    * one exact slice), so brute force over the same hashes is a fair,
    * plan-independent oracle.
    */
  def simhashSql(maxHamming: Int = 3): String =
    s"""WITH toks AS (
  SELECT doc_id, unnest(list_transform($alnum, x -> lower(x))) AS tok FROM documents),
tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
th AS (SELECT doc_id, c, ${fnvSql("tok")} AS h FROM tc),
bits AS (
  SELECT doc_id, bb.b,
         sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN c ELSE -c END) AS acc
  FROM th CROSS JOIN (SELECT unnest(range(64)) AS b) bb GROUP BY 1, 2),
shx AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN acc > 0 THEN CAST(CAST(1 AS UBIGINT) << CAST(b AS INTEGER) AS HUGEINT) ELSE 0 END) AS UBIGINT) AS sh
  FROM bits GROUP BY doc_id),
sh AS (SELECT d.doc_id, coalesce(s.sh, 0) AS sh FROM documents d LEFT JOIN shx s USING (doc_id))
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS INTEGER) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= $maxHamming
ORDER BY id_a, id_b"""

  /** Shared CTE chain (no leading WITH) from the raw documents to the
    * `bandkeys` relation (doc_id, band, bucket) — the SQL twin of
    * [[Dedup.bandBuckets]], used by both minhash oracles.
    */
  private def bandkeysCtes(shingle: Int, bands: Int, rowsPerBand: Int,
                           seed: Long): String = {
    val (as, bs) = Dedup.minhashCoeffs(bands * rowsPerBand, seed)
    val lanesRows = as.indices.map { i =>
      s"  ($i, CAST(${java.lang.Long.toUnsignedString(as(i))} AS UBIGINT), " +
        s"CAST(${java.lang.Long.toUnsignedString(bs(i))} AS UBIGINT))"
    }.mkString(",\n")
    // wrapping 64x64->64 multiply via 32-bit split (see class doc)
    val mulmod =
      s"""CAST((
    CAST(a_lo AS HUGEINT) * CAST(x AS HUGEINT)
    + (CAST((CAST(a_hi AS HUGEINT) * CAST(x % 4294967296 AS HUGEINT)) % 4294967296 AS HUGEINT)) * 4294967296
  ) % $M64 AS UBIGINT)"""
    val ngramConcat = (0 until shingle).map(j =>
      if (j == 0) "arr[i]" else s"arr[i+$j]").mkString(" || ' ' || ")
    s"""lanes(lane, a, b) AS (VALUES
$lanesRows),
lane2 AS (SELECT lane, a, b, a % 4294967296 AS a_lo, a // 4294967296 AS a_hi FROM lanes),
toks AS (SELECT doc_id, list_transform($alnum, x -> lower(x)) AS arr FROM documents),
ng AS (SELECT DISTINCT doc_id, $ngramConcat AS ngram
  FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM toks)
  WHERE i <= len(arr) - ${shingle - 1}),
ngh AS (SELECT doc_id, ${fnvSql("ngram")} AS x FROM ng),
lv AS (
  SELECT doc_id, lane,
         min(CASE WHEN v >= 9223372036854775808 THEN CAST(v AS HUGEINT) - $M64
                  ELSE CAST(v AS HUGEINT) END) AS vmin
  FROM (
    SELECT doc_id, lane,
           CAST((CAST($mulmod AS HUGEINT) + b) % $M64 AS UBIGINT) AS v
    FROM ngh CROSS JOIN lane2) GROUP BY 1, 2),
sig AS (SELECT doc_id, list(CAST(vmin AS BIGINT) ORDER BY lane) AS sig FROM lv GROUP BY doc_id),
bandkeys AS (
  SELECT doc_id, bb.band,
         ${fnvSql(s"array_to_string(sig[bb.band*$rowsPerBand+1 : bb.band*$rowsPerBand+$rowsPerBand], ',')")} AS bucket
  FROM sig CROSS JOIN (SELECT unnest(range($bands)) AS band) bb)"""
  }

  /** MinHash+LSH oracle: 64 universal-hash lanes with THE SAME coefficients
    * as the Spark UDF (same seeded generator), banded 16x4, candidates from
    * the band-bucket equi-join, verified at n-gram Jaccard >= tau.
    */
  def minhashLshSql(shingle: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                    seed: Long = 42L, tau: Double = 0.5): String =
    s"""WITH ${bandkeysCtes(shingle, bands, rowsPerBand, seed)},
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bandkeys a JOIN bandkeys b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
$ngramCapCtes,
szj AS (SELECT doc_id, count(*) AS sz FROM ngk GROUP BY doc_id),
prj AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       FROM ngk a JOIN ngk b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
       GROUP BY 1, 2),
jac AS (
  SELECT id_a, id_b,
         round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
  FROM prj JOIN szj sa ON sa.doc_id = id_a JOIN szj sb ON sb.doc_id = id_b
  WHERE round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= $tau)
SELECT c.id_a AS id_a, c.id_b AS id_b, j.jaccard AS jaccard
FROM cand c JOIN jac j ON c.id_a = j.id_a AND c.id_b = j.id_b
ORDER BY c.id_a, c.id_b"""

  /** Oracle for [[Components.minhashClusters]]: star edges to each band
    * bucket's min member, transitive closure by recursive CTE, component
    * label = min reachable doc_id; every document labelled (absent from
    * banding -> singleton).
    */
  /** The shared cluster-label CTE chain (band buckets -> star edges ->
    * recursive closure -> `lab(doc_id, comp_id)`), reused by
    * [[minhashClustersSql]] and [[canonicalSql]].
    */
  private def clusterCtes(shingle: Int, bands: Int, rowsPerBand: Int,
                          seed: Long): String =
    s"""${bandkeysCtes(shingle, bands, rowsPerBand, seed)},
roots AS (SELECT band, bucket, min(doc_id) AS root FROM bandkeys GROUP BY 1, 2),
star AS (SELECT DISTINCT bk.doc_id AS a, r.root AS b
         FROM bandkeys bk JOIN roots r USING (band, bucket)
         WHERE bk.doc_id <> r.root),
sym AS (SELECT a, b FROM star UNION SELECT b, a FROM star),
reach(n, m) AS (SELECT a, b FROM sym
  UNION SELECT r.n, s.b FROM reach r JOIN sym s ON r.m = s.a WHERE s.b <> r.n),
comp AS (SELECT n, least(min(m), n) AS comp_id FROM reach GROUP BY n),
lab AS (SELECT d.doc_id, coalesce(c.comp_id, d.doc_id) AS comp_id
        FROM documents d LEFT JOIN comp c ON c.n = d.doc_id)"""

  def minhashClustersSql(shingle: Int = 3, bands: Int = 16,
                         rowsPerBand: Int = 4, seed: Long = 42L): String =
    s"""WITH RECURSIVE ${clusterCtes(shingle, bands, rowsPerBand, seed)},
szc AS (SELECT comp_id, count(*) AS comp_size FROM lab GROUP BY comp_id)
SELECT lab.doc_id, lab.comp_id, szc.comp_size,
       CASE WHEN lab.doc_id <> lab.comp_id THEN 1 ELSE 0 END AS is_dup
FROM lab JOIN szc USING (comp_id) ORDER BY doc_id"""

  /** Oracle for [[Components.clusterSizeHistogram]] — same cluster CTEs,
    * rolled up to the size histogram.
    */
  def clusterHistogramSql(shingle: Int = 3, bands: Int = 16,
                          rowsPerBand: Int = 4, seed: Long = 42L): String =
    s"""WITH RECURSIVE ${clusterCtes(shingle, bands, rowsPerBand, seed)},
szc AS (SELECT comp_id, count(*) AS comp_size FROM lab GROUP BY comp_id),
hist AS (SELECT comp_size, count(*) AS n_clusters,
  CAST(comp_size * count(*) AS BIGINT) AS n_docs
  FROM szc GROUP BY comp_size),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM hist)
SELECT CAST(comp_size AS BIGINT) AS comp_size,
  CAST(n_clusters AS BIGINT) AS n_clusters, n_docs,
  round(CAST(n_docs AS DOUBLE) / total, 6) AS doc_frac
FROM hist, tot ORDER BY comp_size"""

  /** Oracle for [[Components.canonicalDocs]]: the cluster labels plus a
    * per-component first_value window over (n_chars desc, doc_id asc).
    */
  /** DuckDB twin of [[Dedup.ngramNovelty]]: the same tokenizer, shingle
    * concatenation, FNV-1a64 hash, distinct-(doc,hash) base, df count,
    * and per-doc rollup.
    */
  /** SQL twin of [[Dedup.ppjoinJaccard]]: brute-force ALL-pairs exact
    * Jaccard with NO cap over the SAME FNV-hashed distinct shingle sets
    * the engine uses (the [[ngramNoveltySql]] hash CTE) — the
    * prefix-filtered plan must reproduce it exactly. The filter compares
    * the UNROUNDED ratio (the engine's prefix-lemma threshold); the
    * emitted column is the usual 6-dp rounding.
    */
  def ppjoinSql(n: Int = 3, minJaccard: Double = 0.5): String = {
    val ngramConcat = (0 until n).map(j =>
      if (j == 0) "arr[i]" else s"arr[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, list_transform($alnum, x -> lower(x)) AS arr
  FROM documents),
ng AS (SELECT DISTINCT doc_id, $ngramConcat AS ngram
  FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM toks)
  WHERE i <= len(arr) - ${n - 1}),
ngh AS (SELECT DISTINCT doc_id, ${fnvSql("ngram")} AS h FROM ng),
sz AS (SELECT doc_id, count(*) AS sz FROM ngh GROUP BY doc_id),
pr AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS common
       FROM ngh a JOIN ngh b ON a.h = b.h AND a.doc_id < b.doc_id
       GROUP BY 1, 2)
SELECT id_a, id_b,
       round(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
FROM pr JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE CAST(common AS DOUBLE) / (sa.sz + sb.sz - common) >= $minJaccard
ORDER BY id_a, id_b"""
  }

  def ngramNoveltySql(n: Int = 3): String = {
    val ngramConcat = (0 until n).map(j =>
      if (j == 0) "arr[i]" else s"arr[i+$j]").mkString(" || ' ' || ")
    s"""WITH toks AS (SELECT doc_id, list_transform($alnum, x -> lower(x)) AS arr
  FROM documents),
ng AS (SELECT DISTINCT doc_id, $ngramConcat AS ngram
  FROM (SELECT doc_id, arr, generate_subscripts(arr, 1) AS i FROM toks)
  WHERE i <= len(arr) - ${n - 1}),
ngh AS (SELECT DISTINCT doc_id, ${fnvSql("ngram")} AS h FROM ng),
dfc AS (SELECT h, count(*) AS df FROM ngh GROUP BY h),
per AS (SELECT doc_id, count(*) AS n_shingles,
  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM ngh JOIN dfc USING (h) GROUP BY doc_id)
SELECT d.doc_id,
  CAST(coalesce(per.n_shingles, 0) AS BIGINT) AS n_shingles,
  CAST(coalesce(per.n_novel, 0) AS BIGINT) AS n_novel,
  round(CAST(per.n_novel AS DOUBLE) / CAST(per.n_shingles AS DOUBLE), 6)
    AS novelty
FROM documents d LEFT JOIN per USING (doc_id) ORDER BY d.doc_id"""
  }

  def canonicalSql(shingle: Int = 3, bands: Int = 16,
                   rowsPerBand: Int = 4, seed: Long = 42L): String =
    s"""WITH RECURSIVE ${clusterCtes(shingle, bands, rowsPerBand, seed)}
SELECT lab.doc_id, lab.comp_id,
       first_value(lab.doc_id) OVER (PARTITION BY lab.comp_id
         ORDER BY d.n_chars DESC, lab.doc_id ASC) AS canonical_id,
       CASE WHEN lab.doc_id = first_value(lab.doc_id) OVER (
         PARTITION BY lab.comp_id ORDER BY d.n_chars DESC, lab.doc_id ASC)
         THEN 1 ELSE 0 END AS is_canonical
FROM lab JOIN documents d USING (doc_id) ORDER BY lab.doc_id"""
}
