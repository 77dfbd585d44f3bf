package graft.grid

import graft.SparkTestBase

import java.nio.file.Files
import scala.util.Random

/** Randomized crash-point injection over the store append lifecycle.
  *
  * The distributed append's protocol (GridWriter.append) is: stage the
  * slab as a sibling `.staging-*` tree -> rename chunk files to their
  * shifted indices inside the store -> delete staging -> commit
  * metadata ONCE. A crash anywhere before the commit must leave
  * readers on the old committed extent (planning is driven purely by
  * metadata), vacuum must reclaim every orphan byte, and a retried
  * append must land the exact final grid. Each trial replays the
  * protocol up to a RANDOM crash step and asserts all three.
  */
class CrashRecoverySpec extends SparkTestBase {

  private val trials = 8

  test("append crash at any step: readers isolated, vacuum reclaims, retry lands") {
    for (trial <- 0 until trials) {
      val rnd = new Random(0xC0FFEE + trial)
      val axisChunk = if (rnd.nextBoolean()) 6 else 3
      val codec = if (rnd.nextBoolean()) "zstd" else "none"
      val base = Files.createTempDirectory(s"crash_$trial")
      base.toFile.deleteOnExit()
      val root = base.resolve("store").toString

      // committed store: t 0-11; the slab to append: t 12-23
      val existing = BinaryGridStore.write(Fixtures.linearGridSlice(0, 12),
        root, Map("t" -> axisChunk), codec)
      val slab = Fixtures.linearGridSlice(12, 24)
      val chunkOffset = 12 / axisChunk

      // ---- replay the append protocol up to a random crash step ----
      val staging = root + ".staging-" + trial
      BinaryGridStore.write(slab, staging, existing.chunks, codec)
      val conf = GridIO.driverConf()
      val staged = GridIO.listNames(s"$staging/air", conf)
        .filter(_.endsWith(".bin"))
      // crash after renaming r of n staged files (r = n means the
      // crash hit between the last rename and the metadata commit)
      val r = rnd.nextInt(staged.size + 1)
      rnd.shuffle(staged).take(r).foreach { fn =>
        val parts = fn.stripSuffix(".bin").split('.')
        parts(0) = (parts(0).toInt + chunkOffset).toString
        GridIO.rename(s"$staging/air/$fn",
          s"$root/air/${parts.mkString(".")}.bin", conf)
      }
      val stagingDeleted = r == staged.size && rnd.nextBoolean()
      if (stagingDeleted) GridIO.delete(staging, conf)
      // metadata NEVER commits in a crash trial

      // ---- 1. readers stay on the committed extent ----
      val reopened = BinaryGridStore.open(root)
      assert(reopened.schema.dim("t").size == 12, s"trial $trial")
      val oldFull = Seq((0, 12), (0, 12), (0, 10))
      assert(reopened.readVar("air", oldFull).asInstanceOf[Array[Double]]
        .sameElements(Fixtures.linearGridSlice(0, 12).readVar("air", oldFull)
          .asInstanceOf[Array[Double]]), s"trial $trial: values changed")

      // ---- 2. vacuum reclaims every orphan byte ----
      val deleted = BinaryGridStore.vacuum(root)
      assert(deleted.orphanChunks.count(_.startsWith("air/")) == r,
        s"trial $trial: expected $r orphan chunks, got $deleted")
      assert(deleted.stagingTrees.size == (if (stagingDeleted) 0 else 1),
        s"trial $trial: staging sweep mismatch: $deleted")
      val validFiles = (0 until 12 / axisChunk).map(i => s"$i.0.0.bin").toSet
      assert(GridIO.listNames(s"$root/air", conf)
        .filter(_.endsWith(".bin")).toSet == validFiles,
        s"trial $trial: var dir not clean")
      assert(!Files.exists(base.resolve(s"store.staging-$trial")),
        s"trial $trial: staging tree survived vacuum")

      // ---- 3. the retried append lands the exact final grid ----
      val appended = BinaryGridStore.appendAlong(root, slab, "t")
      assert(appended.schema.dim("t").size == 24)
      val full = Seq((0, 24), (0, 12), (0, 10))
      assert(appended.readVar("air", full).asInstanceOf[Array[Double]]
        .sameElements(Fixtures.linearGrid.readVar("air", full)
          .asInstanceOf[Array[Double]]), s"trial $trial: retry mismatch")
      // appended chunks carry stats (pruning survives recovery)
      assert(appended.varBounds("air",
        Seq((12, axisChunk), (0, 12), (0, 10))).isDefined,
        s"trial $trial: missing stats on appended chunk")
    }
  }
}
