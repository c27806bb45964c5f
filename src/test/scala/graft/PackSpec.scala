package graft

import org.apache.spark.sql.functions._

import graft.operators.SequencePack

/** Training-sequence packing: layout correctness against a local
  * reference fold, policy edges, and shard determinism. */
class PackSpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (String, Seq[Int])*) =
    rows.toSeq.toDF("doc_id", "tokens")

  /** Driver-side reference: concat in doc order + boundary, chunk. */
  private def reference(
      rows: Seq[(String, Seq[Int])], seqLen: Int,
      pad: Option[Int]): Seq[(Long, Seq[Int])] = {
    val tape = rows.sortBy(_._1).flatMap { case (_, t) =>
      t :+ SequencePack.BoundaryToken
    }
    val full = tape.grouped(seqLen).toSeq.zipWithIndex
    full.flatMap { case (chunk, i) =>
      if (chunk.size == seqLen) Some(i.toLong -> chunk)
      else pad.map(p => i.toLong -> (chunk ++ Seq.fill(seqLen - chunk.size)(p)))
    }
  }

  private def collect(df: org.apache.spark.sql.DataFrame): Seq[(Long, Seq[Int])] =
    df.orderBy("seq_id").collect().map { r =>
      (r.getAs[Long]("seq_id"),
        r.getAs[scala.collection.Seq[Int]]("tokens").toSeq)
    }.toSeq

  test("packing matches the reference fold; docs split across chunk boundaries") {
    val rows = Seq(
      "a" -> (1 to 7).toSeq,   // 7 + boundary = 8
      "b" -> (10 to 21).toSeq, // 12 + boundary: spans the 16-boundary
      "c" -> (30 to 34).toSeq,
      "d" -> (40 to 49).toSeq)
    val got = collect(SequencePack.pack(docs(rows: _*), seqLen = 16))
    assert(got == reference(rows, 16, None), s"got: $got")
    // the tape really interleaves docs: chunk 0 must contain the
    // boundary token mid-sequence followed by doc b's opening tokens
    assert(got.head._2.containsSlice(Seq(SequencePack.BoundaryToken, 10, 11)))
  }

  test("tail-drop vs pad policy") {
    val rows = Seq("a" -> (1 to 10).toSeq) // 11 positions, seqLen 8 → tail 3
    val dropped = collect(SequencePack.pack(docs(rows: _*), seqLen = 8))
    assert(dropped == reference(rows, 8, None) && dropped.size == 1)
    val padded = collect(
      SequencePack.pack(docs(rows: _*), seqLen = 8, padToken = Some(0)))
    assert(padded == reference(rows, 8, Some(0)) && padded.size == 2)
    // tail chunk = [9, 10, boundary] + five pads
    assert(padded.last._2.takeRight(6) == Seq(SequencePack.BoundaryToken, 0, 0, 0, 0, 0))
  }

  test("two-level prefix sum is exact across many range partitions") {
    // enough docs that the range exchange genuinely fans out, with
    // varying lengths so any partition-offset slip shifts every token
    val rows = (0 until 400).map(i => (f"doc$i%04d", (0 to (i % 13) + 2).toSeq))
    val got = collect(
      SequencePack.pack(docs(rows: _*), seqLen = 32, rangePartitions = 16))
    assert(got == reference(rows, 32, None))
  }

  test("same input → byte-identical shards") {
    val rows = (0 until 120).map(i => (f"d$i%03d", (0 to (i % 7) + 2).toSeq))
    def checksums(dir: String): Seq[(String, String)] = {
      SequencePack.writeShards(
        SequencePack.pack(docs(rows: _*), seqLen = 24), dir, numShards = 4)
      // key shards by their PART INDEX — Spark embeds a per-run job
      // UUID in file names, so the name itself can't be the identity
      graft.table.Fs.walkDir(java.nio.file.Paths.get(dir))
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map { p =>
          val part = "part-\\d+".r.findFirstIn(p.getFileName.toString).get
          val bytes = java.nio.file.Files.readAllBytes(p)
          val md = java.security.MessageDigest.getInstance("SHA-256").digest(bytes)
          (part, md.map("%02x".format(_)).mkString)
        }
        .sortBy(_._1)
    }
    val a = checksums(tmpDir("pack-a"))
    val b = checksums(tmpDir("pack-b"))
    assert(a.nonEmpty && a == b, s"shards differ:\n$a\n$b")
  }
}
