package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("asOf attaches latest at-or-before right row; null when none precedes") {
    import spark.implicits._
    val clicks = Seq((1L, 10L, 100L), (1L, 30L, 101L), (2L, 50L, 102L))
      .toDF("user_id", "t", "click_id")
    val buys = Seq(
      (1L, 35L, 201L),  // after click 101 → 101
      (1L, 12L, 202L),  // between clicks → 100
      (1L, 30L, 203L),  // EXACT tie with click 101 → 101 (>= semantics)
      (2L, 40L, 204L),  // before user 2's only click → no match
      (3L, 5L, 205L))   // user with no clicks → no match
      .toDF("user_id", "t", "buy_id")

    val out = AsOfJoin.asOf(buys, clicks, "user_id", "t")
      .select(col("buy_id"), col("asof.click_id").as("click_id"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Long])).toMap
    assert(out == Map(
      201L -> Some(101L), 202L -> Some(100L), 203L -> Some(101L),
      204L -> None, 205L -> None))
  }
}
