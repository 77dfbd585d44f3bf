package graft.grid

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Property laws of the format-v2 stats sidecar (per-variable files +
  * manifest): write → read round-trips every recorded bound/sum, and a
  * merge (the append path) is BYTE-identical to a one-shot write of
  * the merged entries — the sidecar half of the append-equals-one-shot
  * identity the chunk files already pin.
  */
class StatsSidecarPropertySpec extends AnyFunSuite {

  private val conf = new org.apache.hadoop.conf.Configuration()

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  private def freshRoot(): String = {
    val p = Files.createTempDirectory("stats_prop")
    p.toFile.deleteOnExit()
    p.toString
  }

  private val varNamesGen =
    Gen.choose(1, 4).flatMap(n => Gen.pick(n,
      Seq("alpha", "beta", "gamma", "delta")).map(_.toSeq.sorted))

  /** Entries for one variable: distinct chunk keys with optional
    * bounds and sums (never both absent — the writer drops those).
    */
  private def entriesGen(v: String, long: Boolean)
      : Gen[Seq[(String, Option[(Any, Any)], Option[Double])]] =
    Gen.choose(0, 6).flatMap(n =>
      Gen.sequence[Seq[(String, Option[(Any, Any)], Option[Double])],
        (String, Option[(Any, Any)], Option[Double])](
        (0 until n).map { ci =>
          for {
            lo <- Gen.choose(-1000, 1000)
            hi <- Gen.choose(0, 100).map(lo + _)
            hasSum <- Gen.oneOf(true, false)
          } yield {
            val mm: Option[(Any, Any)] =
              if (long) Some((lo.toLong, hi.toLong))
              else Some((lo.toDouble, hi.toDouble))
            (s"$v $ci", mm,
              if (hasSum) Some((lo + hi).toDouble) else None)
          }
        }))

  private def schemaOf(vars: Seq[String],
      longKind: Map[String, Boolean]): GridSchema =
    GridSchema(
      Seq(DimDef("t", IntCoords(Array.range(0, 4)))),
      vars.map(v => VarDef(v, Seq("t"),
        if (longKind(v)) GLong else GDouble)))

  test("write -> read round-trips every bound and sum") {
    check("roundtrip", Prop.forAll(varNamesGen, Gen.long) { (vars, seed) =>
      val rnd = new scala.util.Random(seed)
      val longKind = vars.map(v => v -> rnd.nextBoolean()).toMap
      val entries = vars.flatMap(v =>
        entriesGen(v, longKind(v)).pureApply(
          org.scalacheck.Gen.Parameters.default,
          org.scalacheck.rng.Seed(rnd.nextLong())))
      val root = freshRoot()
      ZarrGridStore.writeStatsSidecar(root, schemaOf(vars, longKind),
        entries, conf)
      val src = ZarrGridStore.readStatsManifest(root,
        new SerializableHadoopConf(conf))
      val wantBounds = entries.flatMap(e => e._2.map(e._1 -> _)).toMap
      val wantSums = entries.flatMap(e => e._3.map(e._1 -> _)).toMap
      src.allBounds == wantBounds && src.allSums == wantSums &&
        entries.forall(e => src.bounds(e._1) == e._2 &&
          src.sum(e._1) == e._3)
    })
  }

  test("merge == one-shot write, byte for byte") {
    check("merge-identity", Prop.forAll(varNamesGen, Gen.long) {
      (vars, seed) =>
        val rnd = new scala.util.Random(seed)
        val longKind = vars.map(v => v -> rnd.nextBoolean()).toMap
        val schema = schemaOf(vars, longKind)
        val all = vars.flatMap(v =>
          entriesGen(v, longKind(v)).pureApply(
            org.scalacheck.Gen.Parameters.default,
            org.scalacheck.rng.Seed(rnd.nextLong())))
        // split: "old" entries vs an appended tail touching a random
        // subset of variables (with key overlap allowed — new wins,
        // same values here so bytes cannot differ)
        val (oldE, newE) = all.partition(_ => rnd.nextBoolean())
        val oneShot = freshRoot()
        ZarrGridStore.writeStatsSidecar(oneShot, schema, all, conf)
        val merged = freshRoot()
        ZarrGridStore.writeStatsSidecar(merged, schema, oldE, conf)
        val oldSrc = ZarrGridStore.readStatsManifest(merged,
          new SerializableHadoopConf(conf))
        ZarrGridStore.mergeStatsSidecar(merged, schema, oldSrc, newE, conf)
        def bytesOf(root: String): Map[String, Seq[Byte]] = {
          import scala.jdk.CollectionConverters._
          val p = java.nio.file.Paths.get(root)
          Files.walk(p).iterator().asScala
            .filter(f => Files.isRegularFile(f) &&
              f.getFileName.toString == ".graft-stats.json")
            .map(f => p.relativize(f).toString ->
              Files.readAllBytes(f).toSeq).toMap
        }
        bytesOf(merged) == bytesOf(oneShot)
    })
  }
}
