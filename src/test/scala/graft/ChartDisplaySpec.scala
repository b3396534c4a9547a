package graft

import graft.analytics.ChartDisplay
import graft.sources.CsvCompat
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The chart/search display layer (views.py:282-320) against hand-computed
  * fixtures: the JSON document shape, the URL template, the top-20 forum
  * cap, and the pandas-regex keyword-frequency semantics. */
class ChartDisplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("chartDataJson matches the hand-computed endpoint document") {
    import spark.implicits._
    val dir = TestSpark.tmpDir("chart-bundle")
    val summary = Seq(
      ("first summary", "100", "200"),
      ("quoted, \"inner\"", "101", "201"))
      .toDF("summary", "post_id", "reply_id")
    val keywords = Seq(("spark", 5L), ("data", 3L)).toDF("keyword", "cnt")
    val sentiments = Seq(("positive", 2L), ("negative", 1L), ("neutral", 4L))
      .toDF("label", "cnt")
    val stats = Seq(("replies_count", "7")).toDF("key", "value")
    CsvCompat.writeAnalysisBundle(dir, summary, keywords, sentiments, stats)
    // 22 forums: top-20 cap must drop the two smallest
    val counts = (1 to 22).map(i => (s"forum$i", i)).toDF("tieba", "cnt")
    CsvCompat.writeTiebaCount(counts, s"$dir/tieba_count.csv")

    val got = ChartDisplay.chartDataJson(spark, dir,
      Some(s"$dir/tieba_count.csv"))

    val expForums = (22 to 3 by -1)
      .map(i => s""""forum$i":"$i"""").mkString(",")
    val expected =
      """{"summary":[""" +
        """["first summary","https://tieba.baidu.com/p/100#post_content_200"],""" +
        """["quoted, \"inner\"","https://tieba.baidu.com/p/101#post_content_201"]],""" +
        """"keywords":{"spark":"5","data":"3"},""" +
        """"sentiments":{"positive":"2","negative":"1","neutral":"4"},""" +
        """"stats":{"replies_count":"7"},""" +
        s""""forums":{$expForums}}"""
    assert(got == expected)
    // no tieba_count.csv ⇒ forums is null (reference: top_forums stays None)
    assert(ChartDisplay.chartDataJson(spark, dir).endsWith(""""forums":null}"""))
  }

  test("keywordFrequency: order-preserving dedup, 10-cap, regex containment") {
    import spark.implicits._
    val replies = Seq(
      ("1", "1", "spark merge window", "0"),
      ("1", "2", "sparkle", "0"),
      ("2", "1", "data dana", "0"),
      ("2", "2", "", "0"), // empty content ≡ pandas NaN-dropped row
      ("3", "1", "nothing here", "0"))
      .toDF("post_id", "reply_id", "content", "comment_num")
    val got = ChartDisplay.keywordFrequency(replies,
      " spark  spark da[tn]a zzz merge.*window ")
    assert(got == Seq("spark" -> 2L, "da[tn]a" -> 1L, "zzz" -> 0L,
      "merge.*window" -> 1L))
    // the 10-term cap (views.py MAX)
    val many = (1 to 15).map(i => s"t$i").mkString(" ")
    assert(ChartDisplay.keywordFrequency(replies, many).size == 10)

    // plan shape: ONE streamed aggregation pass, no join of any kind —
    // and the patterns are foldable literals (each regex compiles once
    // per task, not per evaluated row), the property that holds at any
    // replies size
    val qe = ChartDisplay.keywordFrequencyDF(replies,
      Seq("spark", "da[tn]a")).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Join"), plan.take(2000))
    val rlikes = qe.optimizedPlan.collect { case n => n.expressions }
      .flatten.flatMap(_.collect {
        case r: org.apache.spark.sql.catalyst.expressions.RLike => r
      })
    assert(rlikes.nonEmpty && rlikes.forall(_.right.foldable), plan.take(2000))
  }
}
