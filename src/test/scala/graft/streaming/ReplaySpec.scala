package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark
import graft.streaming.Machines._

/** Golden tests for the batch virtual-time replay, asserting the
  * reference's own documented outputs:
  *  - cart totals 9.00 → 36.00 → 22.50 → 42.50 (e5_retail_cart.py,
  *    README-documented expected log)
  *  - feedback: 10 orders / 9 ACKs at 1 s round-trips (e1_feedback.py)
  *  - greeter Hello / Hello again (+1 s deferred variant) (common.py)
  *  - periodic timer: exactly 10 ticks over 10 s (tests/test_past.py:104-119)
  *  - input-order invariance (shuffled input ≡ ordered input)
  */
class ReplaySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  import Fixtures.{T0, s}

  import Fixtures.cartUpdates

  private def runCart(updates: Seq[CartUpdate]): Seq[CartTotal] =
    Replay.run(spark.createDataset(updates), "user_id", "ts_us", "seq", Some(T0))(
      _.user_id, _.ts_us)(Fixtures.cartFactory)
      .collect().toSeq.sortBy(_.ts_us)

  test("W8 cart: totals match the reference example output") {
    val out = runCart(cartUpdates)
    assert(out.map(t => math.round(t.total * 100) / 100.0) == Seq(9.00, 36.00, 22.50, 42.50))
    assert(out.map(_.num_items) == Seq(1L, 3L, 2L, 3L))
    assert(out.map(_.ts_us) == Seq(s(15), s(30), s(45), s(75)))
  }

  test("W8 cart: shuffled input produces identical output (ordering invariance)") {
    val shuffled = Seq(cartUpdates(2), cartUpdates(0), cartUpdates(3), cartUpdates(1))
    assert(runCart(shuffled) == runCart(cartUpdates))
  }

  test("W9 feedback: 10 orders, 9 exec reports, 1 s round-trips") {
    val seed = Seq(SessionSeed(1L, T0, 0))
    val out = Replay.run(spark.createDataset(seed), "session_id", "ts_us", "seq", Some(T0))(
        _.session_id, _.ts_us)(sid => new FeedbackMachine(sid))
      .collect().toSeq.sortBy(e => (e.ts_us, e.kind))

    val orders = out.filter(_.kind == "order")
    val acks = out.filter(_.kind == "exec_report")
    assert(orders.map(_.order_id) == (1L to 10L))
    assert(acks.map(_.order_id) == (1L to 9L))
    // order k goes out at T0 + (k-1)·1 s (0.3 s + 0.7 s latency per round)
    assert(orders.map(_.ts_us) == (0 until 10).map(k => T0 + k * 1000000L))
    assert(acks.map(_.ts_us) == (1 to 9).map(k => T0 + k * 1000000L))
    assert(orders.map(e => math.round(e.price * 100)) == (0 until 10).map(k => 10000L + k))
  }

  test("W1 greeter: first-seen vs seen-again") {
    val names = Seq("Jane", "John", "Sarah", "Paul", "Jane").zipWithIndex.map {
      case (n, i) => NameEvent(n, s(i + 1), i.toLong)
    }
    val out = Replay.run(spark.createDataset(names), "name", "ts_us", "seq", None)(
        _.name, _.ts_us)(n => new GreeterMachine(n))
      .collect().toSeq.sortBy(_.ts_us)
    assert(out.map(_.text) == Seq("Hello Jane", "Hello John", "Hello Sarah",
      "Hello Paul", "Hello again Jane"))
  }

  test("W2 greet_later: greeting deferred 1 s; event_time = due time") {
    val names = Seq(NameEvent("Jane", s(1), 0), NameEvent("Jane", s(2), 1))
    val out = Replay.run(spark.createDataset(names), "name", "ts_us", "seq", None)(
        _.name, _.ts_us)(n => new GreeterMachine(n, delayUs = 1000000L))
      .collect().toSeq.sortBy(_.ts_us)
    assert(out.map(_.ts_us) == Seq(s(2), s(3)))
    assert(out.map(_.text) == Seq("Hello Jane", "Hello again Jane"))
  }

  test("P6 timer: exactly 10 ticks over 10 s at 1 s step") {
    val seed = Seq(TimerSeed(7L, T0, 0))
    val out = Replay.run(spark.createDataset(seed), "timer_id", "ts_us", "seq", Some(T0))(
        _.timer_id, _.ts_us){ val t0 = T0; id => new PeriodicTimerMachine(id, t0, 1000000L, t0 + 10000000L) }
      .collect().toSeq.sortBy(_.n)
    assert(out.size == 10)
    assert(out.map(_.ts_us) == (1 to 10).map(k => T0 + k * 1000000L))
  }

  test("replay scales per key: many independent keys in one pass") {
    val many = (0 until 200).flatMap { uid =>
      cartUpdates.map(u => u.copy(user_id = uid.toLong))
    }
    val out = Replay.run(spark.createDataset(many), "user_id", "ts_us", "seq", Some(T0))(
        _.user_id, _.ts_us)(Fixtures.cartFactory)
      .collect()
    assert(out.length == 800)
    assert(out.groupBy(_.user_id).values.forall(g =>
      g.sortBy(_.ts_us).map(t => math.round(t.total * 100) / 100.0).toSeq
        == Seq(9.00, 36.00, 22.50, 42.50)))
  }
}
