package graft

import org.apache.spark.sql.functions._

import graft.catalog.{ColumnRoles, PipeKeys, PipeSpec}
import graft.sync.SyncEngine

/** Rows with a NULL datetime axis must survive the whole lifecycle: the
  * reference tolerates null dt (bounds are computed over non-null values,
  * the rows ride along), and a chunked store must give them a home
  * partition rather than crash or drop them. */
class NullDtEdgeSpec extends SparkSpec {
  import spark.implicits._

  test("null-datetime rows sync, read back, and update in place") {
    val eng = new SyncEngine(spark, tmpDir())
    val spec = PipeSpec(PipeKeys("probe", "nulldt"),
      columns = ColumnRoles(Map("datetime" -> "dt", "primary" -> "id")))
    val df = Seq(
      (1L, Some("2024-01-01T00:00:00"), 1.0),
      (2L, None, 2.0),
      (3L, Some("2024-01-02T00:00:00"), 3.0))
      .toDF("id", "dt", "v")
      .withColumn("dt", col("dt").cast("timestamp_ntz"))
    assert(eng.sync(spec, df).inserted == 3)
    val all = eng.getData(spec).orderBy("id").collect()
    assert(all.length == 3 && all(1).isNullAt(1))
    // update the null-dt row through the diff path
    val r2 = eng.sync(spec,
      Seq((2L, None: Option[String], 20.0)).toDF("id", "dt", "v")
        .withColumn("dt", col("dt").cast("timestamp_ntz")))
    assert(r2.updated == 1 && r2.inserted == 0)
    val after = eng.getData(spec).orderBy("id").collect()
    assert(after(1).getDouble(2) == 20.0)
    // bounded reads exclude the null-axis rows, as a time predicate must
    val bounded = eng.getData(spec,
      begin = Some(java.time.LocalDateTime.parse("2024-01-01T00:00:00")))
    assert(bounded.count() == 2)
  }
}
