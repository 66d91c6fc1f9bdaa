package graft

import java.nio.file.Files

import graft.schema.Schemas
import graft.taxi.TaxiFixtures

/** S2/S3 capability (reference src/incremental_ingestion.py:41-52):
  * the CSV staging transport with `NULL ''` semantics. Our engine has
  * no PG hop so parquet is the bulk path, but the CSV round-trip must
  * still hold for interop: write with nullValue "", read back with
  * the declared schema, get identical rows. */
class CsvRoundTripSpec extends SparkTestBase {

  test("taxi batch survives a CSV round-trip with NULL '' semantics") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val batch = TaxiFixtures.monthBatch(spark, 2024, 1, rows = 300)

    batch.write.mode("overwrite")
      .option("header", "false").option("nullValue", "")
      // match the reference's CSV timestamp fidelity
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)

    val back = spark.read.schema(Schemas.bronze)
      .option("header", "false").option("nullValue", "")
      .option("timestampFormat", "yyyy-MM-dd HH:mm:ss")
      .csv(dir)

    assert(back.count() == batch.count())
    // full-row equality both directions (nulls included)
    assert(back.exceptAll(batch).isEmpty && batch.exceptAll(back).isEmpty)
    // the NULL-vs-empty-string distinction is preserved for the text
    // columns that carry nulls (passenger_count, ratecodeid)
    assert(back.filter(back("ratecodeid").isNull).count() ==
           batch.filter(batch("ratecodeid").isNull).count())
  }
}
