package graft.taxi

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row, SparkSession}

import graft.schema.Schemas

/** Deterministic reference-shaped taxi fixtures (FIXTURES.md §B) used
  * by the golden end-to-end tests of the medallion pipeline. Seeded
  * scala.util.Random — same rows on every run. Each quirk of the
  * generator exercises one SURVEY §2 operator: exact duplicate rows
  * (W1), duplicate 7-col quarantine keys (J3), out-of-month rows (P3),
  * pre-watermark rows (P2's `> lld` bound), ratecodeid "1.0"/"99"/NULL
  * (F7), unmapped vendorid (F6 → NULL, A7), payment_type without a dim
  * row (J2 left-join NULL), dropoff < pickup (negative F5 duration —
  * the reference does not filter it, so neither do we), amounts with
  * >2 decimals (F9 rounding).
  */
object TaxiFixtures {

  /** One month's raw batch — what the reference downloads per month
    * (src/incremental_ingestion.py:30). */
  def monthBatch(spark: SparkSession, year: Int, month: Int,
                 rows: Int = 2000): DataFrame = {
    val rnd = new scala.util.Random(year * 100 + month)
    val vendors = Array(1, 2, 6, 7, 42) // 42 = unmapped → NULL decode
    val ratecodes = Array("1", "1.0", "2", "5.0", "99", null)
    val payments = Array(0, 1, 2, 3, 4, 5, 6, 9) // 9 has no dim row

    def ts(day: Int, minute: Int): Timestamp =
      Timestamp.valueOf(f"$year%04d-$month%02d-${day max 1}%02d " +
        f"${(minute / 60) % 24}%02d:${minute % 60}%02d:00")

    val base = (0 until rows).map { i =>
      val day = rnd.nextInt(28) + 1
      val minute = rnd.nextInt(24 * 60)
      val pickup = ts(day, minute)
      // a few negative durations: dropoff before pickup
      val durMin = if (i % 97 == 0) -15 else rnd.nextInt(90) + 1
      val dropoff = new Timestamp(pickup.getTime + durMin * 60000L)
      val dist = math.rint(rnd.nextDouble() * 2000) / 100.0
      val fare = math.rint(rnd.nextDouble() * 10000) / 100.0
      val tip = rnd.nextDouble() * 20.0 // >2 decimals on purpose
      Row(vendors(rnd.nextInt(vendors.length)), pickup, dropoff,
        if (i % 53 == 0) null else rnd.nextInt(5).toString,
        dist, ratecodes(rnd.nextInt(ratecodes.length)),
        if (rnd.nextBoolean()) "Y" else "N",
        rnd.nextInt(265) + 1, rnd.nextInt(265) + 1,
        payments(rnd.nextInt(payments.length)),
        fare, 1.0, 0.5, tip, 0.0, 0.3,
        fare + tip + 1.8, 2.5, 0.0)
    }

    // exact full-row duplicates (W1) + out-of-month stragglers whose
    // 7-col keys collide pairwise (J3 ON CONFLICT)
    val dups = base.take(rows / 100)
    val nextMonthTs = Timestamp.valueOf(
      f"$year%04d-${month % 12 + 1}%02d-02 08:30:00")
    val straggler = Row(1, nextMonthTs,
      new Timestamp(nextMonthTs.getTime + 600000L), "1", 3.25, "1", "N",
      100, 200, 1, 14.2, 1.0, 0.5, 2.0, 0.0, 0.3, 18.0, 2.5, 0.0)
    val stragglers = Seq(straggler, straggler) // duplicate key pair

    spark.createDataFrame(
      java.util.Arrays.asList((base ++ dups ++ stragglers): _*),
      Schemas.bronze)
  }
}
