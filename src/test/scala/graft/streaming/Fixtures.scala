package graft.streaming

import graft.streaming.Machines._

/** Standalone fixture data/constants — lives outside the scalatest suites
  * so Spark closures never capture a suite instance. */
object Fixtures {
  val T0: Long = java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli * 1000L
  def s(n: Double): Long = T0 + (n * 1e6).toLong
  val DiscountExpiryUs: Long = T0 + 60L * 1000000L

  val cartUpdates: Seq[CartUpdate] = Seq(
    CartUpdate(42L, s(15), 0, "X", 10.0, 1, add = true),
    CartUpdate(42L, s(30), 1, "Y", 15.0, 2, add = true),
    CartUpdate(42L, s(45), 2, "Y", 0.0, 1, add = false),
    CartUpdate(42L, s(75), 3, "Z", 20.0, 1, add = true))

  val expectedTotals: Seq[Double] = Seq(9.00, 36.00, 22.50, 42.50)

  def cartFactory: Long => CartMachine = {
    val expiry = DiscountExpiryUs
    uid => new CartMachine(uid, expiry)
  }

  /** One side of the stream-stream interval join test. */
  final case class IvEv(user_id: Long, ts_us: Long, value: Double)

  /** Cross-batch late-arrival fixture (watermark 10 min, so the 30 s
    * quote arriving after the 60 s trade is late-but-not-dropped). */
  val lateTicks1: Seq[MarketTick] = Seq(
    MarketTick(1L, s(10), 1, "quote", 1.0),
    MarketTick(1L, s(60), 2, "trade", 100.0))
  val lateTicks2: Seq[MarketTick] = Seq(
    MarketTick(1L, s(30), 3, "quote", 2.0), // regresses behind s(60)
    MarketTick(1L, s(90), 4, "trade", 200.0))
}
