package graft.grid

import org.scalatest.funsuite.AnyFunSuite

class ChunkGridSpec extends AnyFunSuite {

  test("chunkSizes: even divide plus remainder") {
    assert(ChunkGrid.chunkSizes(10, 4) == Seq(4, 4, 2))
    assert(ChunkGrid.chunkSizes(12, 4) == Seq(4, 4, 4))
    assert(ChunkGrid.chunkSizes(3, 10) == Seq(3))
    assert(ChunkGrid.chunkSizes(0, 5) == Seq.empty)
  }

  test("chunkSizes always sum to the dim size") {
    for (size <- 1 to 50; chunk <- 1 to 12)
      assert(ChunkGrid.chunkSizes(size, chunk).sum == size,
        s"size=$size chunk=$chunk")
  }

  test("blocks: cross product of per-dim chunks, C-order") {
    val s = Fixtures.pruneGrid.schema // time=100, lat=5
    val bs = ChunkGrid.blocks(s, Map("time" -> 25))
    assert(bs.size == 4)
    assert(bs.head == Seq((0, 25), (0, 5)))
    assert(bs.last == Seq((75, 25), (0, 5)))
    assert(bs.map(ChunkGrid.rowCount).sum == 500L)
  }

  test("blocks: both dims chunked") {
    val s = Fixtures.pruneGrid.schema
    val bs = ChunkGrid.blocks(s, Map("time" -> 30, "lat" -> 2))
    // time -> [30,30,30,10], lat -> [2,2,1]
    assert(bs.size == 12)
    assert(bs.map(ChunkGrid.rowCount).sum == 500L)
  }

  test("autoChunks: budget splits outer dims first, keeps inner whole") {
    val s = Fixtures.linearGrid.schema // t=24, lat=12, lon=10, 1 double var
    // whole grid = 24*12*10*8 = 23040 B; inner slice (lat,lon) = 960 B
    assert(ChunkGrid.autoChunks(s, budgetBytes = 30000) == Map.empty)
    assert(ChunkGrid.autoChunks(s, budgetBytes = 4000) == Map("t" -> 4))
    // one (lat,lon) slice over budget -> t=1 and lat splits too (80 B/row)
    assert(ChunkGrid.autoChunks(s, budgetBytes = 500) ==
      Map("t" -> 1, "lat" -> 6))
    // blocks under the spec never exceed the budget
    val spec = ChunkGrid.autoChunks(s, budgetBytes = 4000)
    val maxCells = ChunkGrid.blocks(s, spec).map(ChunkGrid.rowCount).max
    assert(maxCells * 8 <= 4000)
  }

  test("autoChunks: snaps down to whole existing chunks, never splits one") {
    val s = Fixtures.linearGrid.schema
    // raw answer would be t->4; existing chunk 3 -> snap to 3
    assert(ChunkGrid.autoChunks(s, 4000, existing = Map("t" -> 3)) ==
      Map("t" -> 3))
    // raw answer 4 < existing chunk 6 -> one chunk is atomic, stay at 6
    assert(ChunkGrid.autoChunks(s, 4000, existing = Map("t" -> 6)) ==
      Map("t" -> 6))
  }

  test("scalar (0-dim) schema yields exactly one empty block") {
    val s = GridSchema(Seq.empty, Seq(VarDef("x", Seq.empty, GDouble)))
    val bs = ChunkGrid.blocks(s, Map.empty)
    assert(bs == Seq(Seq.empty))
    assert(ChunkGrid.rowCount(bs.head) == 1L)
  }
}
