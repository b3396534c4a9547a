package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The incremental event-time-timeout sessionizer against hand-computed
  * sessions on a crafted multi-batch input: sessions that CONTINUE across
  * the micro-batch boundary, sessions that close at it, and idle-session
  * eviction via the watermark timeout path. */
class StreamSessionizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val M = 60L * 1000000 // one minute in micros
  private val base = 1546300800L * 1000000 // 2019-01-01T00:00Z

  test("sessions spanning micro-batches match gaps-and-islands semantics") {
    import spark.implicits._
    // input spans [0, 200min]; the stage splits at the midpoint (100min).
    // user 1: events at 95..105min, 5min apart — ONE session crossing the
    //         batch boundary (state merge across triggers)
    // user 2: events at 10min and 190min — two singleton sessions, the
    //         first must be emitted in-stream, the second via timeout
    // user 3: events at 98min and 129min (31min gap crossing the
    //         boundary) — two sessions split exactly by the gap rule
    val rows =
      (95 to 105 by 5).map(m => (1L, base + m * M)) ++
        Seq((2L, base + 10 * M), (2L, base + 190 * M)) ++
        Seq((3L, base + 98 * M), (3L, base + 129 * M))
    val events = rows.toDF("user_id", "u")
      .select(col("user_id"), timestamp_micros(col("u")).as("ts"))

    val got = Queries.streamSessionizeOf(spark, events)
      .select(col("user_id"), col("session_idx"), col("n_events"),
        unix_micros(col("session_start")).as("s"),
        unix_micros(col("session_end")).as("e"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(t => (t._1, t._2))
    val expected = Seq(
      (1L, 0L, 3L, base + 95 * M, base + 105 * M),
      (2L, 0L, 1L, base + 10 * M, base + 10 * M),
      (2L, 1L, 1L, base + 190 * M, base + 190 * M),
      (3L, 0L, 1L, base + 98 * M, base + 98 * M),
      (3L, 1L, 1L, base + 129 * M, base + 129 * M))
    assert(got.toSeq == expected)
  }
}
