package graft.grid

/** Pure-JVM BloscLZ codec — blosc's own FastLZ-derived inner format and
  * the historical DEFAULT `cname` of c-blosc 1.x, so older public Zarr
  * v2 archives (pre-lz4-default numcodecs) are full of chunks this
  * format encodes. Written against the public c-blosc `blosclz.c`
  * token layout (the reference's ecosystem decodes it via numcodecs;
  * reference perf_tests/open_era5.py:7-8 opens blosc-encoded trees).
  *
  * Token stream (FastLZ heritage):
  *
  *   - the FIRST byte's low 5 bits are an initial literal-run length
  *     minus one (its high bits are ignored — a stream always opens
  *     with literals);
  *   - control byte `ctrl < 32`: literal run of `ctrl + 1` bytes
  *     copied verbatim from the input;
  *   - `ctrl >= 32`: a back-reference. The top 3 bits hold a length
  *     field `lf = ctrl >> 5` in [1, 7]; copy length starts at
  *     `lf + 2` and `lf == 7` extends it by following bytes (each
  *     adds its value; a byte of 255 continues the extension). The
  *     low 5 bits are the distance's high byte; the byte after the
  *     length extension is its low byte: `dist = ((ctrl & 31) << 8 |
  *     low) + 1`, valid up to 8191+1. The reserved combination
  *     `ctrl & 31 == 31 && low == 255` (distance field = 8191 =
  *     MAX_DISTANCE) switches to the FAR form: two more bytes hold a
  *     big-endian 16-bit extra offset and `dist = extra + 8192`.
  *     Matches may self-overlap (RLE-style runs), copied forward
  *     byte-by-byte.
  *
  * Both directions are implemented so [[Blosc.compress]] can emit
  * blosclz containers and property tests pin the round trip; decode
  * correctness against the byte format is pinned by hand-encoded
  * streams in BloscSpec.
  */
private[grid] object BloscLz {

  /** Near-form distances encode `dist - 1` in 13 bits; 8191 itself is
    * the far-form marker, so the largest near distance is 8191 and far
    * distances run to 8191 + 65536.
    */
  private val MaxDistance = 8191

  /** Decode exactly `destLen` bytes into `dest[destOff, destOff+destLen)`.
    * Fails loudly on truncation, overflow, or out-of-range references.
    */
  def decompress(src: Array[Byte], srcOff: Int, srcLen: Int,
      dest: Array[Byte], destOff: Int, destLen: Int): Unit = {
    require(srcLen > 0, "empty blosclz stream")
    var ip = srcOff
    val ipEnd = srcOff + srcLen
    var op = destOff
    val opEnd = destOff + destLen
    var ctrl = src(ip) & 31
    ip += 1
    var done = false
    while (!done) {
      if (ctrl >= 32) {
        var len = (ctrl >> 5) - 1
        var ofs = (ctrl & 31) << 8
        if (len == 6) { // length field maxed: extension bytes follow
          var code = 0
          do {
            require(ip < ipEnd, "truncated blosclz length extension")
            code = src(ip) & 0xff; ip += 1
            len += code
          } while (code == 255)
        }
        require(ip < ipEnd, "truncated blosclz match")
        val low = src(ip) & 0xff; ip += 1
        len += 3
        var ref = op - ofs - low
        if (low == 255 && ofs == (31 << 8)) { // far form
          require(ip + 1 < ipEnd, "truncated blosclz far distance")
          ofs = (src(ip) & 0xff) << 8; ip += 1
          ofs += src(ip) & 0xff; ip += 1
          ref = op - ofs - MaxDistance
        }
        ref -= 1 // distances are 1-based
        require(ref >= destOff,
          s"blosclz reference ${op - ref} bytes back crosses buffer start")
        require(op + len <= opEnd,
          s"blosclz output overflow (${op - destOff} + $len > $destLen)")
        // forward copy; overlap is the RLE case and must copy serially
        var i = 0
        while (i < len) { dest(op) = dest(ref); op += 1; ref += 1; i += 1 }
      } else {
        val run = ctrl + 1
        require(ip + run <= ipEnd, "truncated blosclz literal run")
        require(op + run <= opEnd,
          s"blosclz output overflow (${op - destOff} + $run > $destLen)")
        System.arraycopy(src, ip, dest, op, run)
        ip += run; op += run
      }
      if (ip >= ipEnd) done = true
      else { ctrl = src(ip) & 0xff; ip += 1 }
    }
    require(op == opEnd,
      s"blosclz stream yields ${op - destOff} of $destLen bytes")
  }

  /** Greedy single-pass encoder (3-byte hash heads, right-extension):
    * always valid output, reasonable ratios on the shuffled numeric
    * chunks blosc feeds it. Returns a fresh array; callers compare its
    * length against the raw block to decide stored-vs-compressed, like
    * every other inner codec here.
    */
  def compress(src: Array[Byte], srcOff: Int, srcLen: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(srcLen / 2 + 16)
    if (srcLen == 0) return out.toByteArray
    val end = srcOff + srcLen
    val htab = new Array[Int](8192)
    java.util.Arrays.fill(htab, -1)
    def hash(p: Int): Int = {
      val v = ((src(p) & 0xff)) | ((src(p + 1) & 0xff) << 8) |
        ((src(p + 2) & 0xff) << 16)
      (v * 2654435761L >>> 19).toInt & 8191
    }
    def flushLiterals(from: Int, until: Int): Unit = {
      var a = from
      while (a < until) {
        val run = math.min(32, until - a)
        out.write(run - 1)
        out.write(src, a, run)
        a += run
      }
    }
    def emitMatch(len: Int, dist: Int): Unit = {
      val d = dist - 1
      val far = d >= MaxDistance
      val distHi = if (far) 31 else d >> 8
      val lf = if (len - 2 <= 6) len - 2 else 7
      out.write((lf << 5) | distHi)
      if (lf == 7) {
        var rem = len - 9
        while (rem >= 255) { out.write(255); rem -= 255 }
        out.write(rem)
      }
      if (far) {
        out.write(255)
        val extra = d - MaxDistance // in [0, 65535]
        out.write((extra >> 8) & 0xff)
        out.write(extra & 0xff)
      } else out.write(d & 0xff)
    }
    var anchor = srcOff
    var ip = srcOff
    while (ip + 3 <= end) {
      val h = hash(ip)
      val ref = htab(h)
      htab(h) = ip
      val dist = ip - ref
      if (ref >= srcOff && dist <= MaxDistance + 65536 &&
        src(ref) == src(ip) && src(ref + 1) == src(ip + 1) &&
        src(ref + 2) == src(ip + 2) &&
        // far-form matches spend 3 extra bytes; require length >= 5
        (dist - 1 < MaxDistance || end - ip >= 5)) {
        var len = 3
        while (ip + len < end && src(ref + len) == src(ip + len)) len += 1
        if (dist - 1 >= MaxDistance && len < 5) {
          ip += 1 // a short far match loses to literals
        } else {
          flushLiterals(anchor, ip)
          emitMatch(len, dist)
          ip += len
          anchor = ip
        }
      } else ip += 1
    }
    flushLiterals(anchor, end)
    out.toByteArray
  }
}
