package graft

import org.apache.spark.sql.functions._
import graft.operators.Chunking

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  // --- C4 packSentences: the SURVEY §5 properties, checked over a
  // fixed-seed random corpus (scalatestplus isn't in the offline cache,
  // so plain seeded generation instead of forAll) -----------------------
  private val rnd = new scala.util.Random(42)
  private def randomSentence(): String =
    Seq.fill(1 + rnd.nextInt(12))(rnd.alphanumeric.filter(_.isLetter).take(1 + rnd.nextInt(8)).mkString).mkString(" ") + "."
  private def randomText(): String =
    Seq.fill(1 + rnd.nextInt(10))(randomSentence()).mkString(" ")

  test("C4 packing never exceeds maxChars unless a single sentence does") {
    for (_ <- 1 to 200) {
      val text = randomText(); val maxChars = 20 + rnd.nextInt(180)
      val subs = Chunking.packSentences(text, maxChars)
      subs.foreach { s =>
        val singleSentence = s.split("(?<=[.!?])\\s+").length <= 1
        assert(s.length <= maxChars || singleSentence, s"'$s' len=${s.length} max=$maxChars")
      }
    }
  }

  test("C4 packing preserves the concatenated text modulo whitespace") {
    for (_ <- 1 to 200) {
      val text = randomText()
      val subs = Chunking.packSentences(text, 50)
      assert(subs.mkString(" ").split("\\s+").toSeq === text.split("\\s+").toSeq)
    }
  }

  test("C5 combineSmall merges adjacent small chunks and keeps order") {
    val out = Chunking.combineSmall(Seq("aa", "bb", "a large enough chunk here", "cc"), 10)
    assert(out === Seq("aa\n\nbb", "a large enough chunk here", "cc"))
    // big chunk flushes a pending small merge
    val out2 = Chunking.combineSmall(Seq("aa", "this chunk is big enough", "bb"), 10)
    assert(out2 === Seq("aa", "this chunk is big enough", "bb"))
  }

  test("C5 never loses content") {
    for (_ <- 1 to 200) {
      val chunks = Seq.fill(rnd.nextInt(8))(
        rnd.alphanumeric.filter(_.isLetter).take(1 + rnd.nextInt(30)).mkString)
      val out = Chunking.combineSmall(chunks, 25)
      assert(out.flatMap(_.split("\n\n")).toSeq === chunks)
    }
  }

  // --- C2 paragraphs ----------------------------------------------------
  test("C2 splits on blank lines, trims, drops short paragraphs") {
    val docs = Seq((1L, "short\n\n" + "x" * 60 + "\n\n\n" + "y" * 55)).toDF("doc_id", "text")
    val out = Chunking.paragraphChunks(docs, minChars = 50).collect()
    assert(out.map(_.getAs[String]("content")).toSeq === Seq("x" * 60, "y" * 55))
    assert(out.map(_.getAs[String]("chunk_id")).toSeq === Seq("1_p0_para1", "1_p0_para2"))
  }

  // --- C3 table→text ----------------------------------------------------
  test("C3 renders headers then pipe-joined non-empty rows") {
    val df = Seq(1).toDF("id").select(
      Chunking.tableToText(
        array(lit("h1"), lit("h2")),
        array(array(lit("a"), lit("b")), array(lit(" "), lit("")), array(lit("c"), lit("d"))))
        .as("t"))
    assert(df.head.getString(0) === "h1 | h2\na | b\nc | d")
  }

  // --- C9 title prefix --------------------------------------------------
  test("C9 prefixes the title only when content doesn't contain it") {
    val df = Seq(("T", "body"), ("T", "has T inside"), (null, "body")).toDF("t", "c")
      .select(Chunking.withTitlePrefix(col("t"), col("c")).as("e"))
    assert(df.as[String].collect().toSeq === Seq("T\n\nbody", "has T inside", "body"))
  }

  // --- CDC content-defined chunking --------------------------------------
  test("CDC chunks cover the token stream exactly, in order") {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    val out = Chunking.cdcChunks(Seq((1L, text)).toDF("doc_id", "text"), modulus = 8)
      .orderBy("cdc_idx").collect()
    assert(out.length > 1, "expect several boundaries at modulus 8 over 200 tokens")
    assert(out.map(_.getAs[String]("content")).mkString(" ") === text)
    assert(out.map(_.getAs[Int]("n_tokens")).sum === 200)
  }

  test("CDC boundaries are content-defined: a prefix insertion shifts one region") {
    val base = (1 to 100).map(i => s"w$i").mkString(" ")
    val chunks = (t: String) =>
      Chunking.cdcChunks(Seq((1L, t)).toDF("doc_id", "text"), modulus = 8)
        .orderBy("cdc_idx").collect().map(_.getAs[String]("content")).toSeq
    val a = chunks(base)
    val b = chunks("inserted " + base)
    // all chunks after the first boundary following the insertion are
    // byte-identical — fixed-size chunking would shift every one
    assert(a.toSet.intersect(b.toSet).size >= a.size - 2,
      s"expected later chunks stable, got a=$a b=$b")
  }

  // --- C6 sliding windows ----------------------------------------------
  test("C6 windows of meaningful words with the configured step") {
    val words = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, words)).toDF("doc_id", "text")
    val out = Chunking.slidingWindowChunks(docs, windowSize = 10, overlap = 2)
      .orderBy("win_idx").collect()
    assert(out.length === 3) // starts 0, 8, 16 (n=30, window=10 → last start 20? seq to 20 step 8 → 0,8,16)
    assert(out.head.getAs[String]("content") === (1 to 10).map(i => s"w$i").mkString(" "))
    assert(out(1).getAs[String]("content") === (9 to 18).map(i => s"w$i").mkString(" "))
  }

  test("C6 rejects a non-advancing window at entry, not as a codegen error") {
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Chunking.slidingWindowChunks(docs, windowSize = 10, overlap = 10)
    }
    assert(e.getMessage.contains("overlap"), "the error must name the bad parameter")
    intercept[IllegalArgumentException] {
      Chunking.slidingWindowChunks(docs, windowSize = 0, overlap = 0)
    }
  }

  test("C6 output is identical under repartitioning (ComputeOnce is a plan barrier only)") {
    val docs = Seq.tabulate(40)(i =>
      (i.toLong, (1 to 25).map(j => s"t${i}x$j").mkString(" "))).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      Chunking.slidingWindowChunks(df, windowSize = 10, overlap = 2)
        .orderBy("document_id", "win_idx").collect()
        .map(r => (r.getString(0), r.getAs[String]("content"))).toSeq
    assert(run(docs) === run(docs.repartition(7)))
  }
}
