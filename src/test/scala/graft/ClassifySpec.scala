package graft

import org.apache.spark.sql.functions._
import graft.operators.Classify

/** Trained NB classifier: hand-computed llr on a tiny corpus, the
  * unseen-token smoothing path, partitioning invariance of the
  * fixed-point score, and the artifact roundtrip. */
class ClassifySpec extends SparkSpec {

  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "lang", "text")

  /** The engine's fixed-point discipline, reimplemented independently:
    * round ln to 6 decimals, scale to micro-nats. */
  private def micro(x: Double): Long =
    (BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP) * BigDecimal(1000000)).toLongExact

  test("hand-computed llr and pred on a two-class corpus") {
    val d = docs(
      (1L, "en", "good good text"),
      (2L, "en", "good text"),
      (3L, "de", "schlecht text"),
      (4L, "de", "schlecht schlecht"))
    // counts: good (3,0), text (2,1), schlecht (0,3); pos_tot=5 neg_tot=4 V=3
    // prior = ln(2/2) = 0
    val model = Classify.nbTrain(d)
    val m = model.orderBy("term").select("term", "pos_cnt", "neg_cnt")
      .as[(String, Long, Long)].collect().toSeq
    assert(m == Seq(("good", 3L, 0L), ("schlecht", 0L, 3L), ("text", 2L, 1L)))

    def llr(pos: Long, neg: Long): Long =
      micro(math.log(((pos + 1.0) * (4 + 3)) / ((neg + 1.0) * (5 + 3))))
    val good = llr(3, 0); val text = llr(2, 1); val schlecht = llr(0, 3)
    val scored = Classify.nbScore(d, model)
      .orderBy("doc_id").as[(Long, Long, Double, Int)].collect()
    val expected = Seq(
      (1L, 3L, 2 * good + text),
      (2L, 2L, good + text),
      (3L, 2L, schlecht + text),
      (4L, 2L, 2 * schlecht))
    expected.zip(scored).foreach { case ((id, n, s6), (gid, gn, gllr, gpred)) =>
      assert(gid == id && gn == n)
      assert(gllr == s6.toDouble / 1e6, s"doc $id")
      assert(gpred == (if (s6 > 0) 1 else 0), s"doc $id")
    }
  }

  test("unseen tokens take the smoothed zero-count llr") {
    val train = docs((1L, "en", "alpha beta"), (2L, "fr", "gamma delta"))
    val model = Classify.nbTrain(train)
    val fresh = Seq((9L, "zz", "omega omega")).toDF("doc_id", "lang", "text")
    val out = Classify.nbScore(fresh, model).as[(Long, Long, Double, Int)].collect()
    // counts all (1,0)/(0,1); pos_tot=neg_tot=2, V=4; unseen llr = ln(6/6)=0
    assert(out.toSeq == Seq((9L, 2L, 0.0, 0)))
  }

  test("score is partitioning-invariant (order-free long sums)") {
    val d = docs((1L, "en", "x y z x"), (2L, "de", "x q q"), (3L, "en", "z z q y"))
    val model = Classify.nbTrain(d)
    val a = Classify.nbScore(d, model).orderBy("doc_id").collect().toSeq
    val b = Classify.nbScore(d.repartition(7), model.repartition(5))
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("artifact roundtrip: save → load → score equals in-memory score") {
    val d = docs((1L, "en", "alpha beta beta"), (2L, "es", "beta gamma"),
      (3L, "en", "alpha alpha"))
    val model = Classify.nbTrain(d)
    val dir = java.nio.file.Files.createTempDirectory("nb-model").toString + "/m"
    Classify.saveNb(model, dir)
    val loaded = Classify.loadNb(spark, dir)
    assert(Classify.nbScore(d, loaded).orderBy("doc_id").collect().toSeq ==
      Classify.nbScore(d, model).orderBy("doc_id").collect().toSeq)
  }

  test("loadNb rejects a wrong-shaped artifact with the column list") {
    val dir = java.nio.file.Files.createTempDirectory("nb-bad").toString + "/m"
    Seq((1L, "x")).toDF("a", "b").write.parquet(dir)
    val e = intercept[IllegalArgumentException](Classify.loadNb(spark, dir))
    assert(e.getMessage.contains("pos_cnt"))
  }

  test("nbScore refuses a single-class model descriptively") {
    val d = docs((1L, "en", "only positive here"), (2L, "en", "more positive"))
    val e = intercept[IllegalArgumentException](
      Classify.nbScore(d, Classify.nbTrain(d)).collect())
    assert(e.getMessage.contains("both classes"))
  }
}
