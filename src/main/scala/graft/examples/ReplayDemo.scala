package graft.examples

import org.apache.spark.sql.SparkSession
import graft.streaming._
import graft.streaming.Machines._

/** Runnable tour of the event-loop runtime — the reference's README
  * examples (cart, feedback, greeter, periodic timer) replayed through
  * [[graft.streaming.Replay]]. `sbt "runMain graft.examples.ReplayDemo"`. */
object ReplayDemo {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.Tables.configure(
      SparkSession.builder().master("local[4]").appName("replay-demo"), "4").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val T0 = java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli * 1000L
    def s(n: Double): Long = T0 + (n * 1e6).toLong
    def fmt(us: Long): String = java.time.Instant.ofEpochMilli(us / 1000).toString

    // W8 retail cart (e5_retail_cart.py): discount expires at T0+60 s
    val updates = Seq(
      CartUpdate(42L, s(15), 0, "X", 10.0, 1, add = true),
      CartUpdate(42L, s(30), 1, "Y", 15.0, 2, add = true),
      CartUpdate(42L, s(45), 2, "Y", 0.0, 1, add = false),
      CartUpdate(42L, s(75), 3, "Z", 20.0, 1, add = true))
    val expiry = T0 + 60L * 1000000L
    println("== W8 cart replay (expect totals 9.00, 36.00, 22.50, 42.50)")
    Replay.run(spark.createDataset(updates), "user_id", "ts_us", "seq", Some(T0))(
        _.user_id, _.ts_us)(uid => new CartMachine(uid, expiry))
      .collect().sortBy(_.ts_us)
      .foreach(t => println(f"${fmt(t.ts_us)} user=${t.user_id} total=${t.total}%.2f items=${t.num_items}"))

    // W9 feedback loop (e1_feedback.py): 10 orders, 9 ACKs, 1 s round-trips
    println("== W9 feedback replay (expect order 1..10 + exec_report 1..9)")
    Replay.run(spark.createDataset(Seq(SessionSeed(1L, T0, 0))),
        "session_id", "ts_us", "seq", Some(T0))(
        _.session_id, _.ts_us)(sid => new FeedbackMachine(sid))
      .collect().sortBy(e => (e.ts_us, e.kind))
      .foreach(e => println(f"${fmt(e.ts_us)} ${e.kind}%-12s id=${e.order_id} price=${e.price}%.2f"))

    spark.stop()
  }
}
