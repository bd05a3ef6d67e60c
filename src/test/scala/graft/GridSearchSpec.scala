package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.GridSearch

/** GridSearch semantics not covered by the q_grid_search value oracle:
  * the first-best tie rule, the trial matrix shape, and the refusal
  * paths. (The numeric fit/score values are oracled end-to-end by
  * q_grid_search in CORRECTNESS.) */
class GridSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def panel: DataFrame =
    (0 until 200).map(i => (s"e${i % 10}", i.toDouble, i * 2.0 + 1.0))
      .toDF("era", "x", "y")

  private def fitMean(p: String, train: DataFrame): Double =
    train.agg(avg(col("y"))).first().getDouble(0)

  test("trial matrix is grid x folds; winner maximizes the mean score; " +
    "refit sees the FULL frame") {
    var refitRows = -1L
    val res = GridSearch.search(panel, "era", k = 3, embargo = 0,
      grid = Seq("low", "high"),
      fit = (p: String, train: DataFrame) => {
        refitRows = train.count(); p
      },
      score = (m: String, test: DataFrame) =>
        if (m == "high") 1.0 else 0.0)
    assert(res.trials.size == 6) // 2 candidates x 3 usable folds
    assert(res.best == "high")
    assert(res.meanScores.toMap == Map("low" -> 0.0, "high" -> 1.0))
    // the last fit call is the refit over the full frame
    assert(refitRows == 200L)
    val _ = fitMean("", panel) // keep the helper exercised
  }

  test("ties on the mean break to the EARLIEST grid position " +
    "(sklearn's first-best rule)") {
    val res = GridSearch.search(panel, "era", k = 3, embargo = 0,
      grid = Seq("b", "a", "c"),
      fit = (p: String, _: DataFrame) => p,
      score = (_: String, _: DataFrame) => 7.0)
    assert(res.best == "b", "all-equal means must pick grid head")
  }

  test("an empty grid and an embargo that swallows every split are " +
    "refused with explanatory errors") {
    intercept[IllegalArgumentException] {
      GridSearch.search(panel, "era", 3, 0, Seq.empty[String],
        (p: String, _: DataFrame) => p, (_: String, _: DataFrame) => 0.0)
    }
    val e = intercept[IllegalArgumentException] {
      // 10 eras, k=3, embargo=10: every era is purged in every fold
      GridSearch.search(panel, "era", 3, 10, Seq("x"),
        (p: String, _: DataFrame) => p, (_: String, _: DataFrame) => 0.0)
    }
    assert(e.getMessage.contains("empty train or test"))
  }
}
