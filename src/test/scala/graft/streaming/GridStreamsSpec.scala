package graft.streaming

import graft.{SparkTestBase, XarrayContext}
import graft.grid.{BinaryGridStore, Fixtures}
import graft.sources.ReadCounters
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class GridStreamsSpec extends SparkTestBase {

  final case class Cell(t: Int, lat: Double, lon: Double, air: Double)

  private def slab(t0: Int, t1: Int): Seq[Cell] =
    for {
      t <- t0 until t1
      i <- 0 until 12
      j <- 0 until 10
    } yield Cell(t, 75.0 - 2.5 * i, 200.0 + 2.5 * j,
      200.0 + t + 2.0 * i + 3.0 * j)

  test("streaming append sink: micro-batches extend the store along t") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._

    val root = java.nio.file.Files
      .createTempDirectory("graft-stream-append").toString + "/store"
    BinaryGridStore.write(Fixtures.linearGridSlice(0, 12), root,
      Map("t" -> 6), "zstd")

    val input = MemoryStream[Cell]
    val q = GridStreams.appendSink(input.toDF(), root,
        Fixtures.linearGrid.schema, Seq("t", "lat", "lon"), "t")
      .start()
    // two micro-batches, one 6-step chunk each
    input.addData(slab(12, 18): _*)
    q.processAllAvailable()
    input.addData(slab(18, 24): _*)
    q.processAllAvailable()
    q.stop()

    val store = BinaryGridStore.open(root)
    assert(store.schema.dim("t").size == 24)
    // a query straddling the two streamed batches sees one seamless
    // grid and still prunes: t >= 15 opens only the two streamed
    // chunks (2: t 12-17 boundary, 3: t 18-23) — 2 of 4
    val df = new XarrayContext(spark)
      .dataFrame("streamed_grid", store, store.chunks, Seq("t", "lat", "lon"))
    ReadCounters.reset()
    val rows = df.filter(col("t") >= 15).collect()
    assert(rows.length == 9 * 12 * 10)
    assert(ReadCounters.partitionsOpened.sum() == 2L)
    val law = Fixtures.linearGrid.laws("air")
    rows.foreach { r =>
      val t = r.getInt(0)
      val i = ((75.0 - r.getDouble(1)) / 2.5).round.toInt
      val j = ((r.getDouble(2) - 200.0) / 2.5).round.toInt
      assert(r.getDouble(3) == law(Array(t, i, j)), s"cell ($t,$i,$j)")
    }
    // streamed chunks carry value stats like written ones
    assert(store.varBounds("air", Seq((18, 6), (0, 12), (0, 10))).nonEmpty)

    // at-least-once replay: re-delivering an already-appended batch is
    // a no-op, not a duplicated slab
    GridStreams.appendBatch(
      slab(18, 24).map(c => (c.t, c.lat, c.lon, c.air))
        .toDF("t", "lat", "lon", "air"),
      root, Fixtures.linearGrid.schema, Seq("t", "lat", "lon"), "t")
    assert(BinaryGridStore.open(root).schema.dim("t").size == 24)

    def cellsDf(cells: Seq[Cell]) =
      cells.map(c => (c.t, c.lat, c.lon, c.air))
        .toDF("t", "lat", "lon", "air")
    // an INCOMPLETE slab must fail fast — NaN-filling it and dropping
    // the remainder as a "replay" next batch would lose data silently
    val part = intercept[IllegalArgumentException] {
      GridStreams.appendBatch(cellsDf(slab(24, 30).drop(7)), root,
        Fixtures.linearGrid.schema, Seq("t", "lat", "lon"), "t")
    }
    assert(part.getMessage.contains("cells"))
    // a batch not closing whole chunks would poison every LATER batch;
    // fail THIS one with the actionable message
    val ragged = intercept[IllegalArgumentException] {
      GridStreams.appendBatch(cellsDf(slab(24, 27)), root,
        Fixtures.linearGrid.schema, Seq("t", "lat", "lon"), "t")
    }
    assert(ragged.getMessage.contains("chunk"))
    assert(BinaryGridStore.open(root).schema.dim("t").size == 24) // intact
  }

  test("tailCells: appended chunks arrive as later stream batches") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-tail").toString + "/store"
    BinaryGridStore.write(Fixtures.linearGridSlice(0, 12), root,
      Map("t" -> 6), "zstd")
    val q = GridStreams.tailCells(spark, root, "air")
      .writeStream.outputMode("append").format("memory")
      .queryName("tail_out").start()
    q.processAllAvailable()
    assert(spark.table("tail_out").count() == 12L * 12 * 10)
    // the archive grows; the stream picks up exactly the new chunks
    BinaryGridStore.appendAlong(root, Fixtures.linearGridSlice(12, 24), "t")
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("tail_out").collect()
    assert(rows.length == 24 * 12 * 10)
    val law = Fixtures.linearGrid.laws("air")
    rows.foreach { r =>
      val t = r.getInt(0)
      val i = ((75.0 - r.getDouble(1)) / 2.5).round.toInt
      val j = ((r.getDouble(2) - 200.0) / 2.5).round.toInt
      assert(r.getDouble(3) == law(Array(t, i, j)), s"cell ($t,$i,$j)")
    }
    // no duplicates: every (t, lat, lon) exactly once
    assert(rows.map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .distinct.length == rows.length)
  }
}
