package graft.grid

/** Chunk-spec arithmetic: a `chunks = Map(dim -> size)` spec is normalized
  * to per-dim chunk-size tuples, and the cross product of per-dim chunk
  * indices yields block slices — one scan partition per block.
  *
  * Pure arithmetic port of the semantics in the reference
  * (xarray_sql/df.py:29-113 `compute_chunks` / `block_slices`): even divide
  * plus remainder; dims absent from the spec stay single-chunk; a scalar
  * (0-dim) schema yields exactly one empty block.
  */
object ChunkGrid {

  /** Per-dim chunk sizes, e.g. size 10 chunked by 4 -> [4, 4, 2]. */
  def chunkSizes(dimSize: Int, chunk: Int): Seq[Int] = {
    require(chunk > 0, s"chunk size must be positive, got $chunk")
    if (dimSize == 0) Seq.empty
    else (0 until dimSize by chunk).map(s => math.min(chunk, dimSize - s))
  }

  /** Normalize a spec to every dim: missing dims span the whole axis. */
  def resolve(schema: GridSchema, chunks: Map[String, Int]): Seq[(String, Seq[Int])] =
    schema.dims.map { d =>
      d.name -> chunkSizes(d.size, chunks.getOrElse(d.name, math.max(d.size, 1)))
    }

  /** One block = (start, length) per dim, in schema dim order. The cross
    * product of per-dim chunk indices, C-order (last dim fastest).
    */
  def blocks(schema: GridSchema, chunks: Map[String, Int]): Seq[Seq[(Int, Int)]] = {
    val perDim: Seq[Seq[(Int, Int)]] = resolve(schema, chunks).map {
      case (_, sizes) =>
        sizes.scanLeft(0)(_ + _).zip(sizes).map { case (start, len) => (start, len) }
    }
    perDim.foldLeft(Seq(Seq.empty[(Int, Int)])) { (acc, dimBlocks) =>
      for (prefix <- acc; b <- dimBlocks) yield prefix :+ b
    }
  }

  /** Blocks restricted to the dims of one variable group, plus exact row
    * counts (product of block lengths — the reference's exact-statistics
    * trick, lib.rs:139-151).
    */
  def groupBlocks(
      schema: GridSchema,
      groupDims: Seq[String],
      chunks: Map[String, Int]): Seq[Seq[(Int, Int)]] = {
    val sub = GridSchema(groupDims.map(schema.dim), Seq.empty)
    blocks(sub, chunks)
  }

  def rowCount(block: Seq[(Int, Int)]): Long =
    block.foldLeft(1L)((acc, b) => acc * b._2)
}
