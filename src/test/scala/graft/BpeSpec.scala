package graft

import graft.operators.Bpe
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  /** Pure-Scala reference for the padded-replace-to-fixpoint merge
    * semantics (java String.replace is leftmost non-overlapping, same as
    * the engine's). */
  private def refApply(seq: String, l: String, r: String): String = {
    var s = s" $seq "
    var prev = ""
    while (s != prev) { prev = s; s = s.replace(s" $l $r ", s" $l$r ") }
    s.trim
  }

  test("wordVocab: frequencies over [a-z]+ runs, seq is space-joined chars") {
    val v = Bpe.wordVocab(docs("Key agg key", "agg agg 42 x-ray"))
      .orderBy("word").collect()
    assert(v.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq === Seq(
      ("agg", 3L, "a g g"), ("key", 2L, "k e y"), ("ray", 1L, "r a y"), ("x", 1L, "x")))
  }

  test("pairCounts: adjacent pairs weighted by word freq; 1-symbol words drop") {
    val v = Seq(("aa", 3L, "a a"), ("ab", 2L, "a b"), ("a", 9L, "a"))
      .toDF("word", "freq", "seq")
    val p = Bpe.pairCounts(v).orderBy("lhs", "rhs").collect()
    assert(p.map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq ===
      Seq(("a", "a", 3L), ("a", "b", 2L)))
  }

  test("applyMerge matches the pure-Scala fixpoint reference on hostile chains") {
    // "aaaaa" exercises the consumed-delimiter alternation; "babab" the
    // symbol-boundary hazard a naive unpadded replace would hit
    val rows = Seq("a a a a a", "b a b a b", "a b a b a b a b", "x", "a b")
      .toDF("seq")
    val out = rows.select(col("seq"), Bpe.applyMerge(col("seq"), "a", "b").as("m"))
      .collect()
    out.foreach { r =>
      assert(r.getString(1) === refApply(r.getString(0), "a", "b"), s"seq='${r.getString(0)}'")
    }
    // self-pair, the other overlap family
    val out2 = rows.select(col("seq"), Bpe.applyMerge(col("seq"), "a", "a").as("m")).collect()
    out2.foreach { r =>
      assert(r.getString(1) === refApply(r.getString(0), "a", "a"), s"seq='${r.getString(0)}'")
    }
  }

  test("MergePasses is past fixpoint for the real corpus vocabulary") {
    val d = graft.io.Tables.documents(spark, "/root/testdata/sf0.001")
    val vocab = Bpe.wordVocab(d)
    val (merges, _) = Bpe.learnMerges(d, numMerges = 6)
    // replay the whole merge chain at P and P+1 passes; identical at every step
    var vP = vocab
    var vP1 = vocab
    merges.foreach { m =>
      vP = vP.withColumn("seq", Bpe.applyMerge(col("seq"), m.lhs, m.rhs)).localCheckpoint()
      vP1 = vP1.withColumn("seq",
        Bpe.applyMerge(col("seq"), m.lhs, m.rhs, passes = Bpe.MergePasses + 1)).localCheckpoint()
    }
    val diff = vP.as("a").join(vP1.as("b"), "word")
      .filter(col("a.seq") =!= col("b.seq")).count()
    assert(diff === 0L)
  }

  test("learnMerges: hand-computed merge sequence and exhaustion") {
    // vocab: aa(freq 2, 'a a'), ab(1, 'a b') → merge1 (a,a,2), merge2 (a,b,1), then dry
    val (merges, finalVocab) = Bpe.learnMerges(docs("aa ab aa"), numMerges = 5)
    assert(merges === Seq(
      Bpe.Merge(1, "a", "a", "aa", 2L), Bpe.Merge(2, "a", "b", "ab", 1L)))
    val fv = finalVocab.orderBy("word").collect()
    assert(fv.map(r => (r.getString(0), r.getString(2))).toSeq ===
      Seq(("aa", "aa"), ("ab", "ab")))
  }

  test("learnMerges tie-break is (freq desc, lhs asc, rhs asc)") {
    // pairs (b,a) and (a,c) both freq 1 → (a,c) wins on lhs
    val (merges, _) = Bpe.learnMerges(docs("ba ac"), numMerges = 1)
    assert(merges.head === Bpe.Merge(1, "a", "c", "ac", 1L))
  }

  test("tokenCounts: per-doc word and token totals under the trained vocab") {
    val corpus = docs("aa ab", "aa aa b")
    val (merges, fv) = Bpe.learnMerges(corpus, numMerges = 1)
    assert(merges.head.merged === "aa")
    val tc = Bpe.tokenCounts(corpus, fv).orderBy("doc_id").collect()
    // after (a,a): aa→1 token, ab→'aa'? no — ab is 'a b', untouched → 2; b→1
    assert(tc.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((0L, 2L, 3L), (1L, 3L, 3L)))
  }
}
