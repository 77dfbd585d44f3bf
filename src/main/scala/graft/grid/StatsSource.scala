package graft.grid

import com.fasterxml.jackson.databind.JsonNode
import scala.jdk.CollectionConverters._

/** Per-chunk value stats of a zarr tree, abstracted over the sidecar
  * format so readers never pay more I/O than the variables they touch:
  *
  *  - format v1 (legacy, still readable): ONE root `.graft-stats.json`
  *    holding every variable's entries — fine at thousands of chunks,
  *    a GB-scale single driver read at 10⁸ inner chunks (SCALE.md does
  *    the math);
  *  - format v2 (written since round 11): the root file is a tiny
  *    MANIFEST (`{"version":2,"vars":[...]}`) and each listed variable
  *    carries its own `<root>/<var>/.graft-stats.json`. Opening a tree
  *    reads only the manifest; a variable's stats file is fetched on
  *    first [[bounds]]/[[sum]] touch and memoized, so a query over one
  *    variable of a 300-array archive loads one stats file, not 300.
  *
  * Stats are purely an optimization: a corrupt or future-versioned
  * sidecar degrades to "no stats" with a warning instead of failing the
  * open (the tree itself is intact; only pruning/metadata-aggregates
  * lose their shortcut).
  *
  * Keys follow the store contract: `"<var> <ci.dotted>"` on the
  * variable's effective (inner, for sharded v3) chunk grid.
  */
sealed trait StatsSource extends Serializable {
  def bounds(key: String): Option[(Any, Any)]
  def sum(key: String): Option[Double]
  /** Variables known to carry stats (no per-var loads). */
  def varNames: Set[String]
  /** One variable's full entry list (key, bounds, sum) — forces that
    * variable's load only. Append merges ride on this: untouched
    * variables' files are never read or rewritten.
    */
  def entriesFor(v: String): Seq[(String, Option[(Any, Any)], Option[Double])]
  /** Everything, eagerly — test/inspection surface, O(all files). */
  final def allBounds: Map[String, (Any, Any)] =
    varNames.toSeq.flatMap(v =>
      entriesFor(v).flatMap(e => e._2.map(e._1 -> _))).toMap
  final def allSums: Map[String, Double] =
    varNames.toSeq.flatMap(v =>
      entriesFor(v).flatMap(e => e._3.map(e._1 -> _))).toMap
}

object StatsSource {

  private def warn(msg: String): Unit =
    org.slf4j.LoggerFactory.getLogger(classOf[StatsSource]).warn(msg)

  case object Empty extends StatsSource {
    def bounds(key: String): Option[(Any, Any)] = None
    def sum(key: String): Option[Double] = None
    def varNames: Set[String] = Set.empty
    def entriesFor(v: String)
        : Seq[(String, Option[(Any, Any)], Option[Double])] = Seq.empty
  }

  /** Fully-materialized maps — the v1 single-file format, and the
    * in-memory form tests build directly.
    */
  final case class Eager(stats: Map[String, (Any, Any)],
      sums: Map[String, Double]) extends StatsSource {
    def bounds(key: String): Option[(Any, Any)] = stats.get(key)
    def sum(key: String): Option[Double] = sums.get(key)
    def varNames: Set[String] =
      (stats.keysIterator ++ sums.keysIterator)
        .map(_.split(" ", 2)(0)).toSet
    def entriesFor(v: String)
        : Seq[(String, Option[(Any, Any)], Option[Double])] = {
      val p = v + " "
      (stats.keysIterator ++ sums.keysIterator).filter(_.startsWith(p))
        .toSeq.distinct.sorted
        .map(k => (k, stats.get(k), sums.get(k)))
    }
  }

  /** Format v2: per-variable files loaded on first touch. The cache is
    * transient — a store shipped to executors re-reads lazily there
    * (executors only readVar today, so in practice nothing loads).
    *
    * `manifestKey` is the manifest's (length, mtime) captured at OPEN:
    * every append rewrites the manifest last, so a per-var load whose
    * manifest has since changed belongs to a NEWER tree state than this
    * handle's extent — v1's eager open-time parse could never serve
    * post-append stats against a pre-append extent (e.g. a merged
    * edge-chunk SUM covering rows the handle doesn't scan), and the
    * lazy form must not either. A changed (or vanished) manifest
    * degrades that load to "no stats" with a warning: one extra HEAD
    * per first-touched variable, zero for the common single-process
    * case where nothing moved.
    */
  final class LazyPerVar(root: String, vars: Set[String],
      hconf: SerializableHadoopConf,
      manifestKey: Option[(Long, Long)]) extends StatsSource {
    @transient private lazy val cache =
      scala.collection.concurrent.TrieMap
        .empty[String, (Map[String, (Any, Any)], Map[String, Double])]

    private def load(v: String)
        : (Map[String, (Any, Any)], Map[String, Double]) =
      cache.getOrElseUpdate(v, {
        val p = s"$root/$v/${ZarrGridStore.StatsSidecar}"
        val manifest = s"$root/${ZarrGridStore.StatsSidecar}"
        try {
          val nowKey = GridIO.statusOf(manifest, hconf.value)
          if (nowKey != manifestKey) {
            warn(s"$p: stats manifest changed since this handle opened " +
              "(concurrent append?) — serving no stats for this variable")
            (Map.empty, Map.empty)
          } else {
            val node = ZarrGridStore.parseJson(
              GridIO.readAllBytes(p, hconf.value))
            if (node.path("version").asInt(0) != 2) {
              warn(s"$p: unsupported per-var stats version — ignoring")
              (Map.empty, Map.empty)
            } else parseVarStats(v, node)
          }
        } catch {
          case _: java.io.FileNotFoundException =>
            // manifest listed it but the file is gone (e.g. hand-pruned
            // tree): stats are optional, serve none
            (Map.empty, Map.empty)
          case scala.util.control.NonFatal(e) =>
            warn(s"$p: unreadable stats file (${e.getMessage}) — ignoring")
            (Map.empty, Map.empty)
        }
      })

    def bounds(key: String): Option[(Any, Any)] = {
      val v = key.split(" ", 2)(0)
      if (!vars(v)) None else load(v)._1.get(key)
    }
    def sum(key: String): Option[Double] = {
      val v = key.split(" ", 2)(0)
      if (!vars(v)) None else load(v)._2.get(key)
    }
    def varNames: Set[String] = vars
    def entriesFor(v: String)
        : Seq[(String, Option[(Any, Any)], Option[Double])] =
      if (!vars(v)) Seq.empty
      else {
        val (st, su) = load(v)
        (st.keysIterator ++ su.keysIterator).toSeq.distinct.sorted
          .map(k => (k, st.get(k), su.get(k)))
      }
  }

  /** Parse one variable's v2 stats node (`kind`/`stats`/`sums`) into
    * store-keyed maps.
    */
  private[grid] def parseVarStats(name: String, vn: JsonNode)
      : (Map[String, (Any, Any)], Map[String, Double]) = {
    val long = vn.path("kind").asText("double") == "long"
    val stats = Map.newBuilder[String, (Any, Any)]
    val sums = Map.newBuilder[String, Double]
    vn.path("stats").properties().asScala.foreach { s =>
      val a = s.getValue
      require(a.isArray && a.size() == 2, s"$name: bad stats entry")
      val pair: (Any, Any) =
        if (long) (a.get(0).asLong(), a.get(1).asLong())
        else (a.get(0).asDouble(), a.get(1).asDouble())
      stats += s"$name ${s.getKey}" -> pair
    }
    vn.path("sums").properties().asScala.foreach(s =>
      sums += s"$name ${s.getKey}" -> s.getValue.asDouble())
    (stats.result(), sums.result())
  }
}
