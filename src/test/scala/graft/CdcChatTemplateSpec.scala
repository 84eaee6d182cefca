package graft

import graft.operators.{ChatTemplate, Chunking}

class CdcChatTemplateSpec extends SparkSpec {
  import spark.implicits._

  /** Independent re-implementation of the boundary rule (JDK MessageDigest,
    * not Spark expressions) so the spec is an oracle, not an echo. */
  private def isBoundary(tok: String, modulus: Int): Boolean = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(tok.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(8), 16) % modulus == 0
  }

  /** Words partitioned by the modulus-4 boundary rule, discovered by brute
    * force so the fixture stays valid if the vocabulary changes. */
  private val (boundaryWords, plainWords) = {
    val cand = Seq("alpha", "bravo", "charlie", "delta", "echo", "foxtrot",
      "golf", "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
      "oscar", "papa", "quebec", "romeo", "sierra", "tango")
    cand.partition(isBoundary(_, 4))
  }

  test("cdcChunks: boundary token starts its chunk; prefix before first boundary is chunk 0") {
    assert(boundaryWords.size >= 2 && plainWords.size >= 3,
      s"fixture vocabulary too lopsided: $boundaryWords / $plainWords")
    val b0 = boundaryWords(0); val b1 = boundaryWords(1)
    val Seq(p0, p1, p2) = plainWords.take(3)
    // p0 p1 | b0 p2 | b1  ->  chunks 0:[p0 p1] 1:[b0 p2] 2:[b1]
    val d = Seq((1L, s"$p0 $p1 $b0 $p2 $b1")).toDF("doc_id", "text")
    val out = Chunking.cdcChunks(d, "doc_id", "text", modulus = 4)
      .as[(Long, Long, Long, String)].collect().sortBy(_._2)
    assert(out.map(r => (r._2, r._3, r._4)).toSeq ==
      Seq((0L, 2L, s"$p0 $p1"), (1L, 2L, s"$b0 $p2"), (2L, 1L, b1)))
  }

  test("cdcChunks: insertion rewrites only its own chunk (the CDC resync property)") {
    val b0 = boundaryWords(0); val b1 = boundaryWords(1)
    val Seq(p0, p1, p2) = plainWords.take(3)
    val before = Seq((1L, s"$b0 $p0 $b1 $p1")).toDF("doc_id", "text")
    val after = Seq((1L, s"$b0 $p0 $p2 $b1 $p1")).toDF("doc_id", "text")
    def texts(df: org.apache.spark.sql.DataFrame) =
      Chunking.cdcChunks(df, "doc_id", "text", modulus = 4)
        .select("chunk_text").as[String].collect().toSet
    // The [b1 p1] chunk survives the upstream insertion untouched — a fixed
    // 2-token stride would have shifted every later window.
    assert(texts(before).intersect(texts(after)) == Set(s"$b1 $p1"))
  }

  test("cdcDedup: replica collapses to empty text, original keeps all chunks; shared chunk kept once") {
    val b0 = boundaryWords(0)
    val Seq(p0, p1, p2) = plainWords.take(3)
    val d = Seq(
      (1L, s"$p0 $p1 $b0 $p2"), // chunks: [p0 p1], [b0 p2]
      (2L, s"$p0 $p1 $b0 $p2"), // exact replica — both chunks already seen
      (3L, s"$p2 $b0 $p2")      // [p2] fresh, [b0 p2] seen in doc 1
    ).toDF("doc_id", "text")
    val out = Chunking.cdcDedup(d, "doc_id", "text", modulus = 4)
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out(1L) == ((2L, 2L, s"$p0 $p1 $b0 $p2")))
    assert(out(2L) == ((2L, 0L, "")))
    assert(out(3L) == ((2L, 1L, p2)))
  }

  test("sliceExamples: hand-laid stream slices exactly; straddling doc continues; partial tail dropped") {
    // Stream (L=4): a b c <eod> | d e <eod> f | <eod>   ← last position is a
    // partial example (1 token) and must be dropped.
    val d = Seq((1L, "a b c"), (2L, "d e"), (3L, "f")).toDF("doc_id", "text")
    val out = graft.operators.Packing.sliceExamples(d, "doc_id", "text", exampleLen = 4)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out == Map(
      0L -> ((1L, 4L, "a b c <|eod|>")),
      1L -> ((2L, 4L, "d e <|eod|> f"))))
  }

  test("sliceExamples: every example is exactly L tokens and the stream is a clean reassembly") {
    val d = Seq.tabulate(40)(i => (i.toLong, (0 to i % 7).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "text")
    val out = graft.operators.Packing.sliceExamples(d, "doc_id", "text", exampleLen = 10)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out.forall(r => r._3 == 10L && r._4.split(" ").length == 10))
    // Example ids are contiguous from 0 and concatenating them reproduces
    // the id-ordered stream prefix.
    assert(out.map(_._1).toSeq == out.indices.map(_.toLong))
    val stream = (0L until 40L).flatMap(i =>
      (0 to i.toInt % 7).map(j => s"w${i}_$j") :+ "<|eod|>")
    assert(out.flatMap(_._4.split(" ")).toSeq == stream.take(out.length * 10))
  }

  test("lossSpans: offsets are exact, marker excluded, conversation hash matches an independent render") {
    val turns = Seq(
      (1L, 1L, "user", "hi"),
      (1L, 2L, "assistant", "hello"),
      (1L, 3L, "user", "ok"),
      (1L, 4L, "assistant", "bye"),
      (2L, 1L, "assistant", "solo")
    ).toDF("conv_id", "turn_idx", "role", "content")
    val out = ChatTemplate.lossSpans(turns, "conv_id", "turn_idx", "role", "content")
      .as[(Long, Long, Long, Long, Long, String)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap

    val conv1 = "<|user|>hi" + "<|assistant|>hello" + "<|user|>ok" + "<|assistant|>bye"
    val conv2 = "<|assistant|>solo"
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

    // conv 1, turn 2: starts at 10, marker is 13 chars, content 5.
    assert(out((1L, 2L)) == ((23L, 28L, conv1.length.toLong, md5hex(conv1))))
    // conv 1, turn 4: previous turns total 28 + 10 chars, marker 13, content 3.
    assert(out((1L, 4L)) == ((51L, 54L, conv1.length.toLong, md5hex(conv1))))
    assert(out((2L, 1L)) == ((13L, 17L, conv2.length.toLong, md5hex(conv2))))
    // Every span slices exactly its content out of the rendered conversation.
    assert(conv1.substring(23, 28) == "hello" && conv1.substring(51, 54) == "bye")
    // User turns never get a span row.
    assert(!out.contains((1L, 1L)) && !out.contains((1L, 3L)))
  }

  test("preferencePairs: shared prefix, spans slice exactly the responses") {
    val d = Seq((7L, "why?", "because", "no")).toDF("pid", "prompt", "chosen", "rejected")
    val r = ChatTemplate.preferencePairs(d, "pid", "prompt", "chosen", "rejected")
      .as[(Long, String, String, Long, Long, Long)].collect().head
    val (pid, ct, rt, s0, ce, re) = r
    assert(pid == 7L)
    assert(ct == "<|user|>why?<|assistant|>because" && rt == "<|user|>why?<|assistant|>no")
    // Both sequences share the prefix byte-for-byte up to span_start.
    assert(ct.substring(0, s0.toInt) == rt.substring(0, s0.toInt))
    assert(ct.substring(s0.toInt, ce.toInt) == "because")
    assert(rt.substring(s0.toInt, re.toInt) == "no")
    assert(ce == ct.length.toLong && re == rt.length.toLong)
  }
}
