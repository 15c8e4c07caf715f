package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class EvaluationSpec extends AnyFunSuite with SparkTestSession {

  import spark.implicits._

  test("classificationReport golden values incl. never-predicted and never-true classes") {
    // truth:     a a a b b c
    // predicted: a a b b b d   (c never predicted; d never true)
    val d = Seq(("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "b"), ("c", "d"))
      .toDF("y", "yhat")
    val r = Evaluation.classificationReport(d, "y", "yhat")
      .collect().map(row => row.getString(0) -> row).toMap
    assert(r.keySet == Set("a", "b", "c", "d"))

    val a = r("a")
    assert(a.getAs[Long]("n_actual") == 3 && a.getAs[Long]("n_pred") == 2 && a.getAs[Long]("tp") == 2)
    assert(a.getAs[Double]("precision") == 1.0)
    assert(a.getAs[Double]("recall") == 0.666667)
    assert(a.getAs[Double]("f1") == 0.8)

    val b = r("b")
    assert(b.getAs[Long]("tp") == 2 && b.getAs[Long]("n_pred") == 3)
    assert(b.getAs[Double]("precision") == 0.666667 && b.getAs[Double]("recall") == 1.0)

    val c = r("c") // true but never predicted: precision undefined, recall 0
    assert(c.getAs[Long]("n_pred") == 0 && c.isNullAt(c.fieldIndex("precision")))
    assert(c.getAs[Double]("recall") == 0.0)
    assert(c.isNullAt(c.fieldIndex("f1"))) // p undefined -> f1 undefined

    val dd = r("d") // predicted but never true: recall undefined
    assert(dd.getAs[Long]("n_actual") == 0 && dd.isNullAt(dd.fieldIndex("recall")))
    assert(dd.getAs[Double]("precision") == 0.0)
  }

  test("NULL classes merge into one report row (abstaining classifier + missing labels)") {
    val d = Seq(
      (Some("a"), Option.empty[String]), // model abstains on a true 'a'
      (Option.empty[String], Some("a")), // missing truth, predicted 'a'
      (Option.empty[String], Option.empty[String]), // both null: a NULL true positive
      (Some("a"), Some("a")))
      .toDF("y", "yhat")
    val rows = Evaluation.classificationReport(d, "y", "yhat").collect()
    val nullRows = rows.filter(_.isNullAt(0))
    assert(nullRows.length == 1, s"NULL class must be ONE row, got ${nullRows.length}")
    val n = nullRows.head
    assert(n.getAs[Long]("n_actual") == 2 && n.getAs[Long]("n_pred") == 2 && n.getAs[Long]("tp") == 1)
    val a = rows.find(r => !r.isNullAt(0) && r.getString(0) == "a").get
    assert(a.getAs[Long]("n_actual") == 2 && a.getAs[Long]("n_pred") == 2 && a.getAs[Long]("tp") == 1)
  }

  test("a perfect classifier scores 1.0 across the board") {
    val d = Seq(("x", "x"), ("y", "y"), ("y", "y")).toDF("y", "yhat")
    Evaluation.classificationReport(d, "y", "yhat").collect().foreach { row =>
      assert(row.getAs[Double]("precision") == 1.0)
      assert(row.getAs[Double]("recall") == 1.0)
      assert(row.getAs[Double]("f1") == 1.0)
    }
  }
}
