package graft.grid

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based laws of the chunk partitioner (beyond the reference's
  * parametrized cases, which only cross a handful of shapes): for ANY
  * grid shape and chunk spec, the blocks tile the grid exactly — they
  * are disjoint, cover every cell, respect the chunk bound, and their
  * row counts sum to the grid size. These invariants are what the DSv2
  * scan's exactness (stats, pruning, metadata counts) rests on.
  */
class ChunkGridPropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private val shapeGen: Gen[List[Int]] =
    Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.choose(1, 12)))

  private def schemaOf(shape: List[Int]): GridSchema =
    GridSchema(
      shape.zipWithIndex.map { case (sz, d) =>
        DimDef(s"d$d", IntCoords(Array.range(0, sz)))
      },
      Seq.empty)

  test("blocks tile the grid: disjoint, covering, chunk-bounded, exact counts") {
    check("tiling", Prop.forAll(shapeGen, Gen.listOf(Gen.choose(1, 13))) {
      (shape: List[Int], rawChunks: List[Int]) =>
        val schema = schemaOf(shape)
        val chunks = shape.indices.zip(rawChunks).map {
          case (d, c) => s"d$d" -> c
        }.toMap
        val blocks = ChunkGrid.blocks(schema, chunks)
        val bounded = blocks.forall(_.zipWithIndex.forall {
          case ((start, len), d) =>
            len >= 1 && len <= chunks.getOrElse(s"d$d", shape(d)) &&
              start >= 0 && start + len <= shape(d)
        })
        val exactCount = blocks.map(ChunkGrid.rowCount).sum ==
          shape.foldLeft(1L)(_ * _.toLong)
        // disjoint + covering: every cell lands in exactly one block
        val cells = shape.foldLeft(Seq(Seq.empty[Int])) { (acc, sz) =>
          for (p <- acc; i <- 0 until sz) yield p :+ i
        }
        val partition = cells.forall { cell =>
          blocks.count(_.zip(cell).forall {
            case ((start, len), i) => i >= start && i < start + len
          }) == 1
        }
        bounded && exactCount && partition
    })
  }

  test("chunkSizes sums to the dim, never exceeds the chunk, short tail only") {
    check("chunkSizes",
      Prop.forAll(Gen.choose(0, 200), Gen.choose(1, 50)) {
        (size: Int, chunk: Int) =>
          val s = ChunkGrid.chunkSizes(size, chunk)
          s.sum == size &&
            s.forall(c => c >= 1 && c <= chunk) &&
            s.dropRight(1).forall(_ == chunk)
      })
  }
}
