package graft.grid

/** On-disk chunked array store — a minimal Zarr-v2-like layout, so the
  * engine's laziness/pruning/projection pushdowns hit real file I/O:
  *
  * {{{
  * <root>/metadata.txt            # dims, coords, vars, chunk grid, codec
  * <root>/<var>/<i>.<j>...bin     # one little-endian C-order file
  *                                # per variable per chunk
  * }}}
  *
  * Chunk payloads are optionally encoded ([[ChunkCodec]]): `zstd`
  * whole-chunk frames (the codec Zarr deployments default to, via
  * Spark's bundled zstd-jni), a `delta` varint stage for integer-kind
  * data, and a `shuffle` byte-transpose stage for float fields —
  * composable as `delta+zstd` / `shuffle+zstd`. A read is one file
  * fetch plus one stateless decode.
  *
  * Pruned partitions never open their chunk files; unprojected variables'
  * files are never opened (the storage-level effect the reference gets
  * from Zarr variable pruning, reader.py:279-296). The DSv2 scan
  * partitions on exactly this chunk grid, so its reads are chunk-aligned
  * single-file fast paths; arbitrary (unaligned, multi-chunk) ranges are
  * also served, assembled chunk by chunk.
  *
  * All byte I/O goes through [[GridIO]] (the Hadoop FileSystem API): the
  * same store code serves local paths, HDFS, S3A and GCS. The Hadoop conf
  * is captured at construction on the driver and shipped inside the store
  * (which is itself serialized into every InputPartition), so executor
  * reads resolve the same FileSystem with the same credentials.
  *
  * String coordinates are not supported on disk (numeric/time axes only).
  */
final case class BinaryGridStore(root: String, schema: GridSchema,
    chunks: Map[String, Int], codec: String = "none",
    hconf: SerializableHadoopConf = GridIO.shippable(),
    stats: Map[String, (Any, Any)] = Map.empty,
    sums: Map[String, Double] = Map.empty) extends GridStore {

  /** Chunk-file key for `block` when it is chunk-aligned, else None.
    * len <= chunk: a tail block LONGER than one chunk (scan chunk = a
    * multiple of the disk chunk) spans several files — serving the
    * first file's stats for it would be unsound.
    */
  private def alignedKey(name: String,
      block: Seq[(Int, Int)]): Option[String] = {
    val v = schema.vars.find(_.name == name).getOrElse(return None)
    val chunkSz = v.dims.map(d =>
      chunks.getOrElse(d, math.max(schema.dim(d).size, 1)))
    val aligned = v.dims.indices.forall { i =>
      val (start, len) = block(i)
      start % chunkSz(i) == 0 && len <= chunkSz(i) &&
        (len == chunkSz(i) || start + len == schema.dim(v.dims(i)).size)
    }
    if (!aligned) None
    else Some(
      s"$name ${block.zip(chunkSz).map(b => b._1._1 / b._2).mkString(".")}")
  }

  /** Per-chunk variable min/max recorded at write time (finite-only
    * chunks; see GridStore.varBounds contract). Served for
    * chunk-aligned blocks — exactly the blocks the DSv2 scan plans.
    */
  override def varBounds(name: String,
      block: Seq[(Int, Int)]): Option[(Any, Any)] =
    alignedKey(name, block).flatMap(stats.get)

  /** Per-chunk variable value sums recorded at write time (float/double
    * variables, all-finite chunks only; see GridStore.varSums
    * contract). Served for chunk-aligned blocks.
    */
  override def varSums(name: String,
      block: Seq[(Int, Int)]): Option[Double] =
    alignedKey(name, block).flatMap(sums.get)

  def readVar(name: String, ranges: Seq[(Int, Int)]): AnyRef = {
    val v = schema.vars.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"unknown var $name"))
    val chunkSz = v.dims.map(d =>
      chunks.getOrElse(d, math.max(schema.dim(d).size, 1)))
    // len <= chunk keeps a multi-file tail block (scan chunk = a
    // multiple of the disk chunk) on the assembly path — the fast path
    // would decode ONE file for it
    val aligned = v.dims.indices.forall { i =>
      val (start, len) = ranges(i)
      start % chunkSz(i) == 0 && len <= chunkSz(i) &&
        (len == chunkSz(i) || start + len == schema.dim(v.dims(i)).size)
    }
    if (aligned) readChunk(v, ranges.zip(chunkSz).map(r => r._1._1 / r._2),
      ranges.map(_._2).product)
    else assembleUnaligned(v, ranges, chunkSz)
  }

  /** One whole chunk: a single file read + one [[ChunkCodec]] decode. */
  private def readChunk(v: VarDef, chunkIdx: Seq[Int], n: Int): AnyRef = {
    val raw = GridIO.readAllBytes(
      s"$root/${v.name}/${chunkIdx.mkString(".")}.bin", hconf.value)
    ChunkCodec.decode(raw, codec, v.dtype, n)
  }

  /** Multi-chunk / unaligned read: the shared [[ChunkAssembly]] gather
    * over this store's exact-size chunk files. The DSv2 scan never takes
    * this path (its partitions are chunk-aligned by construction); it
    * serves direct store access such as LazyGridView window slices.
    */
  private def assembleUnaligned(v: VarDef, ranges: Seq[(Int, Int)],
      chunkSz: Seq[Int]): AnyRef =
    ChunkAssembly.gather(ranges, chunkSz, v.dims.map(d => schema.dim(d).size),
      v.dtype,
      // edge chunks are stored clipped to the dim extent (no padding)
      storedShape = (_, eff) => eff,
      readChunk = (ci, srcShape) => readChunk(v, ci, srcShape.product))
}

/** What [[BinaryGridStore.vacuum]] deleted. `orphanChunks` are paths
  * RELATIVE TO THE STORE ROOT (`<var>/<idx>.bin`); `stagingTrees` are
  * the swept trees' directory names — they are SIBLINGS of the root
  * (`<rootname>.staging-*`), which a root-relative path cannot
  * address, hence the separate field rather than a `../` prefix hack.
  */
final case class VacuumReport(orphanChunks: Seq[String],
    stagingTrees: Seq[String]) {
  def isEmpty: Boolean = orphanChunks.isEmpty && stagingTrees.isEmpty
  def size: Int = orphanChunks.size + stagingTrees.size
}

object BinaryGridStore {

  /** Materialize `source` to `root` chunk by chunk (streaming: one chunk
    * of one variable resident at a time) and return the disk-backed store.
    * `codec = "zstd"` compresses each chunk payload as one zstd frame.
    */
  def write(source: GridStore, root: String, chunks: Map[String, Int],
      codec: String = "none"): BinaryGridStore = {
    ChunkCodec.validate(codec)
    val conf = GridIO.driverConf()
    val schema = source.schema
    GridIO.mkdirs(root, conf)
    val stats = Map.newBuilder[String, (Any, Any)]
    val sums = Map.newBuilder[String, Double]
    schema.vars.foreach { v =>
      GridIO.mkdirs(s"$root/${v.name}", conf)
      val sub = GridSchema(v.dims.map(schema.dim), Seq.empty)
      ChunkGrid.blocks(sub, chunks).foreach { block =>
        val idx = v.dims.zip(block).map { case (d, (start, _)) =>
          start / chunks.getOrElse(d, math.max(schema.dim(d).size, 1))
        }
        val data = source.readVar(v.name, block)
        val key = s"${v.name} ${idx.mkString(".")}"
        chunkStats(data).foreach(s => stats += key -> s)
        chunkSum(data).foreach(s => sums += key -> s)
        GridIO.write(s"$root/${v.name}/${idx.mkString(".")}.bin",
          encodeChunk(data, codec), conf)
      }
    }
    val statMap = stats.result()
    val sumMap = sums.result()
    writeMetadata(s"$root/metadata.txt", schema, chunks, codec, conf,
      statMap, sumMap)
    BinaryGridStore(root, schema, chunks, codec, stats = statMap,
      sums = sumMap)
  }

  /** (min, max) of one chunk payload — Long-boxed for long kinds, Double
    * otherwise; None when any value is non-finite (NaN chunks must not
    * feed containment reasoning) or the chunk is empty.
    */
  def chunkStats(data: AnyRef): Option[(Any, Any)] = data match {
    case a: Array[Double] if a.nonEmpty =>
      var mn = a(0); var mx = a(0); var i = 0
      while (i < a.length) {
        val x = a(i)
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
          return None
        if (x < mn) mn = x; if (x > mx) mx = x; i += 1
      }
      Some((mn, mx))
    case a: Array[Float] if a.nonEmpty =>
      var mn = a(0); var mx = a(0); var i = 0
      while (i < a.length) {
        val x = a(i)
        if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
          return None
        if (x < mn) mn = x; if (x > mx) mx = x; i += 1
      }
      Some((mn.toDouble, mx.toDouble))
    case a: Array[Int] if a.nonEmpty =>
      Some((a.min.toDouble, a.max.toDouble))
    case a: Array[Long] if a.nonEmpty =>
      // Long.MinValue doubles as the NaT (null) sentinel for time
      // variables; a chunk containing it reports no bounds (the same
      // all-values-known rule NaN enforces for floats). Conservative
      // for a genuine i8 MinValue — sound either way.
      val mn = a.min
      if (mn == Long.MinValue) None else Some((mn, a.max))
    case a: Array[String] if a.nonEmpty =>
      // UTF-8 binary order — the order string predicates prune in
      // (graft.sources.Utf8Order == Spark's UTF8_BINARY). Any null
      // element hides the chunk from stats (the all-values-known rule
      // NaN enforces for floats). Zarr sidecars serialize these as
      // JSON strings; BinaryGridStore rejects string vars before
      // stats are ever taken. One UTF-8 encode per element (minMax
      // caches the running extrema's bytes).
      graft.sources.Utf8Order.minMax(a, 0, a.length)
    case _ => None
  }

  /** Value sum of one chunk payload — float/double kinds only (the
    * kinds whose Spark SUM is DoubleType, matching the metadata
    * constant a sum rewrite folds in); None when any value is
    * non-finite, so NaN/Inf chunks always reach the scan and IEEE
    * semantics propagate through the real aggregate.
    */
  def chunkSum(data: AnyRef): Option[Double] = data match {
    case a: Array[Double] if a.nonEmpty =>
      var s = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i)
        if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
          return None
        s += x; i += 1
      }
      Some(s)
    case a: Array[Float] if a.nonEmpty =>
      var s = 0.0; var i = 0
      while (i < a.length) {
        val x = a(i)
        if (java.lang.Float.isNaN(x) || java.lang.Float.isInfinite(x))
          return None
        s += x; i += 1
      }
      Some(s)
    case _ => None
  }

  /** Incrementally extend an existing store along `along` — the
    * append-only ingest path of growing archives (a reanalysis gains a
    * new day of hours; a corpus store gains a new batch): `source`
    * carries the SAME schema except that `along`'s coordinates are the
    * new values being appended. New chunk files land at chunk indices
    * shifted past the existing extent; existing chunk files and their
    * stats are untouched; only the small metadata file is rewritten
    * (coords concatenated, stats merged). Readers opened afterwards see
    * one seamless grid — scans, pruning and value-stats work across
    * the append boundary unchanged.
    *
    * The existing `along` extent need NOT be chunk-aligned: when the
    * old extent ends inside a chunk, that edge chunk is read back,
    * concatenated with the slab's first planes, and rewritten at its
    * grown clipped shape (stats/sums recomputed from the merged data) —
    * the same read-modify-write xarray's `to_zarr(append_dim=...)`
    * performs on Zarr trees.
    */
  def appendAlong(root: String, source: GridStore,
      along: String): BinaryGridStore = {
    val existing = open(root)
    val add = source.schema
    val conf = GridIO.driverConf()
    val oldN = validateAppend(existing, add, along)
    val stats = Map.newBuilder[String, (Any, Any)]
    val sums = Map.newBuilder[String, Double]
    val touched = Set.newBuilder[String]
    add.vars.filter(_.dims.contains(along)).foreach { v =>
      val axisPos = v.dims.indexOf(along)
      // blocks over the GROWN global grid, keeping only those touching
      // the appended region [oldN, oldN+addN); the boundary block (if
      // the old extent ends inside it) merges old planes + slab planes
      val mergedDims = v.dims.map { dn =>
        val d = add.dim(dn)
        if (dn == along) d.copy(coords =
          concatCoords(existing.schema.dim(dn).coords, d.coords))
        else d
      }
      val sub = GridSchema(mergedDims, Seq.empty)
      ChunkGrid.blocks(sub, existing.chunks)
        .filter(b => b(axisPos)._1 + b(axisPos)._2 > oldN)
        .foreach { block =>
          val (bStart, bLen) = block(axisPos)
          val data: AnyRef =
            if (bStart >= oldN)
              source.readVar(v.name,
                block.updated(axisPos, (bStart - oldN, bLen)))
            else {
              val eff = block.map(_._2).toArray
              val arr = ChunkAssembly.alloc(v.dtype, eff.product)
              val oldLen = oldN - bStart
              ChunkAssembly.copyAxisSlab(arr, eff,
                existing.readVar(v.name,
                  block.updated(axisPos, (bStart, oldLen))),
                oldLen, axisPos, 0)
              ChunkAssembly.copyAxisSlab(arr, eff,
                source.readVar(v.name,
                  block.updated(axisPos, (0, bLen - oldLen))),
                bLen - oldLen, axisPos, oldLen)
              arr
            }
          val idx = v.dims.zip(block).map { case (dn, (start, _)) =>
            start / existing.chunks.getOrElse(dn,
              math.max(add.dim(dn).size, 1))
          }
          val key = s"${v.name} ${idx.mkString(".")}"
          touched += key
          chunkStats(data).foreach(st => stats += key -> st)
          chunkSum(data).foreach(st => sums += key -> st)
          GridIO.write(s"$root/${v.name}/${idx.mkString(".")}.bin",
            encodeChunk(data, existing.codec), conf)
        }
    }
    commitAppend(root, existing, add.dim(along).coords, along,
      stats.result(), sums.result(), touched = touched.result())
  }

  /** Shared append preconditions; returns the existing extent of the
    * axis (the global index the slab's first plane lands at).
    */
  private[grid] def validateAppend(existing: BinaryGridStore,
      add: GridSchema, along: String): Int = {
    val schema = existing.schema
    val oldN = schema.dim(along).size
    // an unchunked axis must be rejected: readers derive its chunk size
    // from the (merged, larger) dim size and would misread the old file
    require(existing.chunks.contains(along),
      s"$along is unchunked — only chunked axes can grow")
    require(add.dims.map(_.name) == schema.dims.map(_.name),
      s"dim mismatch: ${add.dims.map(_.name)} vs ${schema.dims.map(_.name)}")
    schema.dims.filter(_.name != along).foreach { d =>
      require(coordsEqual(d.coords, add.dim(d.name).coords),
        s"coordinates differ on invariant dim ${d.name}")
    }
    require(add.vars.map(v => (v.name, v.dims, v.dtype)) ==
      schema.vars.map(v => (v.name, v.dims, v.dtype)), "var mismatch")
    // duplicate coords would double every cell of the overlap in every
    // scan — the retried-append failure mode; reject it here
    val have = coordSet(schema.dim(along).coords)
    val dup = coordSet(add.dim(along).coords).intersect(have)
    require(dup.isEmpty,
      s"append overlaps existing $along coordinates (e.g. ${dup.head})")
    oldN
  }

  private def coordSet(c: CoordArray): Set[Any] = c match {
    case DoubleCoords(v) => v.toSet
    case FloatCoords(v) => v.toSet
    case IntCoords(v) => v.toSet
    case LongCoords(v) => v.toSet
    case TimeCoords(v) => v.toSet
    case DurationCoords(v) => v.toSet
    case StringCoords(v) => v.toSet
  }

  /** Concatenate coords, merge stats, rewrite metadata — the commit
    * step both append paths (driver-side and distributed) share.
    */
  private[grid] def commitAppend(root: String, existing: BinaryGridStore,
      addCoords: CoordArray, along: String,
      newStats: Map[String, (Any, Any)],
      newSums: Map[String, Double] = Map.empty,
      /** Every chunk key the append REWROTE — entries for touched
        * chunks that produced no fresh stats (NaT/NaN introduced by an
        * edge merge) must be dropped, never inherited: stale bounds
        * would mis-prune the merged chunk.
        */
      touched: Set[String] = Set.empty): BinaryGridStore = {
    val merged = GridSchema(
      existing.schema.dims.map(d => if (d.name == along)
        d.copy(coords = concatCoords(d.coords, addCoords)) else d),
      existing.schema.vars, existing.schema.attrs)
    val drop = touched ++ newStats.keySet ++ newSums.keySet
    val mergedStats = (existing.stats -- drop) ++ newStats
    val mergedSums = (existing.sums -- drop) ++ newSums
    writeMetadata(s"$root/metadata.txt", merged, existing.chunks,
      existing.codec, GridIO.driverConf(), mergedStats, mergedSums)
    BinaryGridStore(root, merged, existing.chunks, existing.codec,
      stats = mergedStats, sums = mergedSums)
  }

  private def coordsEqual(a: CoordArray, b: CoordArray): Boolean = (a, b) match {
    case (DoubleCoords(x), DoubleCoords(y)) => x.sameElements(y)
    case (FloatCoords(x), FloatCoords(y)) => x.sameElements(y)
    case (IntCoords(x), IntCoords(y)) => x.sameElements(y)
    case (LongCoords(x), LongCoords(y)) => x.sameElements(y)
    case (TimeCoords(x), TimeCoords(y)) => x.sameElements(y)
    case (DurationCoords(x), DurationCoords(y)) => x.sameElements(y)
    case (StringCoords(x), StringCoords(y)) => x.sameElements(y)
    case _ => false
  }

  private def concatCoords(a: CoordArray, b: CoordArray): CoordArray =
    (a, b) match {
      case (DoubleCoords(x), DoubleCoords(y)) => DoubleCoords(x ++ y)
      case (FloatCoords(x), FloatCoords(y)) => FloatCoords(x ++ y)
      case (IntCoords(x), IntCoords(y)) => IntCoords(x ++ y)
      case (LongCoords(x), LongCoords(y)) => LongCoords(x ++ y)
      case (TimeCoords(x), TimeCoords(y)) => TimeCoords(x ++ y)
      case (DurationCoords(x), DurationCoords(y)) => DurationCoords(x ++ y)
      case _ => throw new IllegalArgumentException(
        s"cannot concat coords of different kinds: $a vs $b")
    }

  /** Create the store directory skeleton + metadata only (chunk files
    * written separately — e.g. from executors by GridWriter).
    */
  def writeMetadataOnly(root: String, schema: GridSchema,
      chunks: Map[String, Int], codec: String = "none",
      stats: Map[String, (Any, Any)] = Map.empty,
      sums: Map[String, Double] = Map.empty): Unit = {
    ChunkCodec.validate(codec)
    val conf = GridIO.driverConf()
    GridIO.mkdirs(root, conf)
    schema.vars.foreach(v => GridIO.mkdirs(s"$root/${v.name}", conf))
    writeMetadata(s"$root/metadata.txt", schema, chunks, codec, conf, stats,
      sums)
  }

  /** One chunk payload encoded for disk (see [[ChunkCodec]] grammar). */
  def encodeChunk(data: AnyRef, codec: String): Array[Byte] =
    ChunkCodec.encode(data, codec)

  /** Reclaim files a CRASHED writer left behind: chunk files whose
    * indices fall outside the committed chunk grid (an append renames
    * its staged chunks into the var dirs BEFORE the single metadata
    * commit, so a crash between the two strands over-extent chunks),
    * plus sibling `.staging-*` trees from appends that died earlier
    * still. Readers never see orphans — planning is driven purely by
    * the committed metadata extent — so vacuum is storage reclamation,
    * not correctness repair. Same single-writer contract as append:
    * run only while no append is in flight. The two delete families
    * live under DIFFERENT bases (orphan chunks inside the root,
    * staging trees NEXT TO it), so the report keeps them in separate
    * typed fields instead of mixing path conventions in one list.
    */
  def vacuum(root: String): VacuumReport = {
    val store = open(root)
    val conf = GridIO.driverConf()
    val cleanRoot = root.stripSuffix("/")
    val orphanChunks = store.schema.vars.flatMap { v =>
      val sub = GridSchema(v.dims.map(store.schema.dim), Seq.empty)
      val valid = ChunkGrid.blocks(sub, store.chunks).map { block =>
        v.dims.zip(block).map { case (d, (start, _)) =>
          start / store.chunks.getOrElse(d,
            math.max(store.schema.dim(d).size, 1))
        }.mkString(".") + ".bin"
      }.toSet
      GridIO.listNames(s"$cleanRoot/${v.name}", conf)
        .filter(n => n.endsWith(".bin") && !valid(n))
        .map { n =>
          GridIO.delete(s"$cleanRoot/${v.name}/$n", conf)
          s"${v.name}/$n"
        }
    }
    VacuumReport(orphanChunks, GridIO.sweepStaging(cleanRoot, conf))
  }

  /** Open an existing store from its metadata (driver-side: resolves
    * the active session's Hadoop conf). From executors use the
    * conf-carrying overload — `driverConf()` there degrades to a bare
    * `new Configuration()` without the driver's filesystem credentials.
    */
  def open(root: String): BinaryGridStore =
    open(root, new SerializableHadoopConf(GridIO.driverConf()))

  /** Open with an explicitly shipped Hadoop conf (executor-safe). */
  def open(root: String, hconf: SerializableHadoopConf): BinaryGridStore = {
    val lines = GridIO.readLines(s"$root/metadata.txt", hconf.value)
    var dims = Vector.empty[DimDef]
    var vars = Vector.empty[VarDef]
    var chunks = Map.empty[String, Int]
    var codec = "none"
    var dsAttrs = Map.empty[String, String]
    var stats = Map.empty[String, (Any, Any)]
    var sums = Map.empty[String, Double]
    def dec(s: String): String =
      java.net.URLDecoder.decode(s, java.nio.charset.StandardCharsets.UTF_8)
    lines.foreach { line =>
      line.split(" ", 4).toList match {
        case "codec" :: c :: Nil => codec = c
        case "dim" :: name :: tpe :: values :: Nil =>
          val vs = if (values.isEmpty) Array.empty[String] else values.split(",")
          val coords = tpe match {
            case "double" => DoubleCoords(vs.map(_.toDouble))
            case "float" => FloatCoords(vs.map(_.toFloat))
            case "int" => IntCoords(vs.map(_.toInt))
            case "long" => LongCoords(vs.map(_.toLong))
            case "timestamp" => TimeCoords(vs.map(_.toLong))
            case "duration" => DurationCoords(vs.map(_.toLong))
            case other => throw new IllegalArgumentException(s"bad dim type $other")
          }
          dims :+= DimDef(name, coords)
        case "var" :: name :: dimList :: tpe :: Nil =>
          vars :+= VarDef(name, dimList.split(",").toSeq, parseType(tpe))
        case "chunk" :: name :: size :: Nil =>
          chunks += name -> size.toInt
        case "calendar" :: name :: cal :: units :: Nil =>
          dims = dims.map(d => if (d.name == name)
            d.copy(calendar = Some(dec(cal)),
              units = Some(dec(units)).filter(_.nonEmpty)) else d)
        case "stats" :: vn :: ck :: mm :: Nil =>
          // written after var lines, so the dtype is already known
          val longKind = vars.find(_.name == vn).exists(v =>
            v.dtype == GLong || v.dtype == GTimestamp || v.dtype == GDuration)
          val Array(mn, mx) = mm.split(" ", 2)
          stats += s"$vn $ck" -> (if (longKind) (mn.toLong, mx.toLong)
            else (mn.toDouble, mx.toDouble))
        case "sumstat" :: vn :: ck :: v :: Nil =>
          sums += s"$vn $ck" -> v.toDouble
        case "attr" :: "ds" :: k :: v :: Nil => dsAttrs += dec(k) -> dec(v)
        case "attr" :: scope :: k :: v :: Nil if scope.startsWith("dim:") =>
          val dn = scope.stripPrefix("dim:")
          dims = dims.map(d => if (d.name == dn)
            d.copy(attrs = d.attrs + (dec(k) -> dec(v))) else d)
        case "attr" :: scope :: k :: v :: Nil if scope.startsWith("var:") =>
          val vn = scope.stripPrefix("var:")
          vars = vars.map(x => if (x.name == vn)
            x.copy(attrs = x.attrs + (dec(k) -> dec(v))) else x)
        case Nil | ("" :: _) => ()
        case other => throw new IllegalArgumentException(s"bad metadata line: $line")
      }
    }
    BinaryGridStore(root, GridSchema(dims, vars, dsAttrs), chunks, codec,
      hconf = hconf, stats = stats, sums = sums)
  }

  private def parseType(s: String): GridType = s match {
    case "double" => GDouble
    case "float" => GFloat
    case "int" => GInt
    case "long" => GLong
    case "timestamp" => GTimestamp
    case "duration" => GDuration
    case other => throw new IllegalArgumentException(s"bad var type $other")
  }

  private def typeName(t: GridType): String = t match {
    case GDouble => "double"
    case GFloat => "float"
    case GInt => "int"
    case GLong => "long"
    case GTimestamp => "timestamp"
    case GDuration => "duration"
    case GString => throw new IllegalArgumentException("string unsupported")
  }

  private def writeMetadata(path: String, schema: GridSchema,
      chunks: Map[String, Int], codec: String,
      conf: org.apache.hadoop.conf.Configuration,
      stats: Map[String, (Any, Any)] = Map.empty,
      sums: Map[String, Double] = Map.empty): Unit = {
    val sb = new StringBuilder
    schema.dims.foreach { d =>
      val (tpe, values) = d.coords match {
        case DoubleCoords(v) => ("double", v.mkString(","))
        case FloatCoords(v) => ("float", v.mkString(","))
        case IntCoords(v) => ("int", v.mkString(","))
        case LongCoords(v) => ("long", v.mkString(","))
        case TimeCoords(v) => ("timestamp", v.mkString(","))
        case DurationCoords(v) => ("duration", v.mkString(","))
        case StringCoords(_) => throw new IllegalArgumentException(
          "string coords unsupported in BinaryGridStore")
      }
      sb.append(s"dim ${d.name} $tpe $values\n")
    }
    schema.vars.foreach { v =>
      sb.append(s"var ${v.name} ${v.dims.mkString(",")} ${typeName(v.dtype)}\n")
    }
    chunks.foreach { case (d, c) => sb.append(s"chunk $d $c\n") }
    if (codec != "none") sb.append(s"codec $codec\n")
    // xarray metadata: CF calendar/units and attrs survive the store
    // round trip (URL-encoded — keys/values may contain spaces)
    def enc(s: String): String =
      java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)
    schema.dims.foreach { d =>
      (d.calendar, d.units) match {
        case (Some(c), u) =>
          sb.append(s"calendar ${d.name} ${enc(c)} ${enc(u.getOrElse(""))}\n")
        case _ => ()
      }
      d.attrs.foreach { case (k, v) =>
        sb.append(s"attr dim:${d.name} ${enc(k)} ${enc(v)}\n") }
    }
    schema.vars.foreach(v => v.attrs.foreach { case (k, a) =>
      sb.append(s"attr var:${v.name} ${enc(k)} ${enc(a)}\n") })
    schema.attrs.foreach { case (k, v) =>
      sb.append(s"attr ds ${enc(k)} ${enc(v)}\n") }
    // per-chunk variable min/max (Double.toString / Long.toString both
    // round-trip exactly); key = "<var> <chunkIdx dotted>"
    stats.toSeq.sortBy(_._1).foreach { case (k, (mn, mx)) =>
      sb.append(s"stats $k $mn $mx\n") }
    // per-chunk value sums (float/double vars; Double.toString
    // round-trips exactly); same key grammar as stats
    sums.toSeq.sortBy(_._1).foreach { case (k, s) =>
      sb.append(s"sumstat $k $s\n") }
    GridIO.writeString(path, sb.toString, conf)
  }

}
