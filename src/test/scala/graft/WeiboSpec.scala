package graft

import graft.analytics.WeiboPipeline
import graft.core.WeiboClean
import org.scalatest.funsuite.AnyFunSuite

class WeiboSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("column-algebra clean chain ≡ pure WeiboClean for every card") {
    import spark.implicits._
    val cards = WeiboPipeline.syntheticCards(spark, nPages = 5, cardsPerPage = 8)
    val both = cards
      .select($"mblog.text".as("raw"),
        WeiboPipeline.cleanCol($"mblog.text").as("col_clean"),
        WeiboPipeline.cleanUdf($"mblog.text").as("udf_clean"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      val expected = WeiboClean.clean(r.getString(0))
      assert(r.getString(1) == expected) // codegen'd chain byte-identical
      assert(r.getString(2) == expected)
    }
  }

  test("card pipeline: type-9 filter, projection, json round-trip") {
    val cards = WeiboPipeline.syntheticCards(spark, nPages = 4, cardsPerPage = 8)
    val processed = WeiboPipeline.processCards(cards)
    val total = cards.count()
    val kept = processed.count()
    assert(kept > 0 && kept < total) // card_type filter bites
    // cleaned text has no tags / colons left
    assert(processed.filter("cleaned RLIKE '<[a-z]'").count() == 0)
    assert(processed.filter("cleaned LIKE '%:%'").count() == 0)
    val records = WeiboPipeline.toJsonRecords(processed)
    // key layout id-page-idx (weibo_crawler.py:148)
    assert(records.filter("record_key NOT RLIKE '^[0-9]+-[0-9]+-[0-9]+$'")
      .count() == 0)
    val display = WeiboPipeline.displayProjection(records, spark)
    assert(display.count() == kept)
    assert(display.columns.toSet ==
      Set("text", "time", "likes", "comments", "reposts", "id"))
  }
}
