package graft.index

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Per-partition commit records (SURVEY.md §7.5): one small JSON file per
  * committed (tb, shard) postings partition, named so resume needs only a
  * directory listing (no JSON parse on the hot path). Counters (terms,
  * postings, bytes) fulfill the north rule's per-stage metrics requirement;
  * buildId ties every record to the globals.json lineage.
  *
  * File-per-partition (not an append log) because file creation is the
  * atomic primitive every filesystem/object store gives us.
  */
object Manifest {

  private def mdir(dir: String) = Paths.get(dir, "manifest")

  private val Name = """tb-(\d+)-shard-(\d+)\.json""".r

  def committed(dir: String): Set[(Int, Int)] = {
    val d = mdir(dir)
    if (!Files.exists(d)) return Set.empty
    Files.list(d).iterator().asScala.flatMap { p =>
      p.getFileName.toString match {
        case Name(t, s) => Some((t.toInt, s.toInt))
        case _ => None
      }
    }.toSet
  }

  def commit(dir: String, tb: Int, shard: Int, docs: Long, terms: Long,
             postings: Long, bytes: Long, buildId: String): Unit = {
    val d = mdir(dir)
    Files.createDirectories(d)
    val tmp = d.resolve(s".tmp-tb-$tb-shard-$shard.json")
    Files.writeString(tmp,
      s"""{"tb":$tb,"shard":$shard,"docs":$docs,"terms":$terms,""" +
        s""""postings":$postings,"bytes":$bytes,"buildId":"$buildId"}""")
    Files.move(tmp, d.resolve(s"tb-$tb-shard-$shard.json"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** Aggregate counters across all committed partitions (the /stats-style
    * surface: SURVEY.md §2.1 S8, A9).
    */
  def totals(dir: String): (Long, Long, Long) = {
    val (_, t, p, b) = totals4(dir)
    (t, p, b)
  }

  /** (docs-across-partitions [shard-overlapping], terms, postings, bytes). */
  def totals4(dir: String): (Long, Long, Long, Long) = {
    val d = mdir(dir)
    if (!Files.exists(d)) return (0L, 0L, 0L, 0L)
    val Num = """"(docs|terms|postings|bytes)":(\d+)""".r
    var docs = 0L; var terms = 0L; var posts = 0L; var bytes = 0L
    Files.list(d).iterator().asScala.foreach { p =>
      if (Name.pattern.matcher(p.getFileName.toString).matches()) {
        val txt = Files.readString(p)
        Num.findAllMatchIn(txt).foreach { m =>
          m.group(1) match {
            case "docs" => docs += m.group(2).toLong
            case "terms" => terms += m.group(2).toLong
            case "postings" => posts += m.group(2).toLong
            case "bytes" => bytes += m.group(2).toLong
          }
        }
      }
    }
    (docs, terms, posts, bytes)
  }
}
