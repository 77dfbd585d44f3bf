package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types._

/** Scale-path hashing primitives for 100 TB dedup / similarity search.
  *
  * The oracle-gated queries in `PipelineQueries` use md5 so DuckDB can
  * replay them; these are the production-speed equivalents: a one-pass
  * k-permutation 64-bit MinHash (single traversal computes all k minima,
  * vs k interpreted array transforms) and signed-random-projection
  * (hyperplane) LSH for embeddings. Both are pure functions of their
  * input plus a seed — deterministic across executors, no fitted model
  * to broadcast (unlike spark.ml's MinHashLSH, which must be fit).
  */
object ScaleHashes {

  /** splitmix64 — public-domain mixing function (Steele et al.). */
  @inline def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** FNV-1a over UTF-8 bytes — stable string hash independent of JVM. */
  @inline def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ (bytes(i) & 0xffL)) * 0x100000001b3L; i += 1 }
    h
  }

  def minhash64(tokens: Column, k: Int): Column =
    ColumnInterop.toColumn(MinHash64(ColumnInterop.toExpr(tokens), k))

  def hyperplaneBucket(vec: Column, bits: Int, seed: Long): Column =
    ColumnInterop.toColumn(
      HyperplaneBucket(ColumnInterop.toExpr(vec), bits, seed))

  /** Estimated Jaccard similarity of two signatures = fraction of
    * agreeing positions.
    */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length && a.nonEmpty)
    a.zip(b).count { case (x, y) => x == y }.toDouble / a.length
  }
}

/** One-pass k-permutation MinHash over array<string>: signature_j =
  * min over tokens of splitmix64(seed_j ^ fnv1a(token)). All k minima
  * computed in a single traversal of the token array.
  */
case class MinHash64(child: Expression, k: Int)
  extends UnaryExpression with RefCallCodegen {

  require(k > 0 && k <= 1024, s"k out of range: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash64"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base = ScaleHashes.fnv1a(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < k) {
        val h = ScaleHashes.splitmix64(base ^ (j.toLong * 0x9e3779b97f4a7c15L))
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Signed-random-projection LSH bucket: bit b of the bucket id is the
  * sign of <vec, r_b> where hyperplane r_b's components are derived
  * deterministically from (seed, b, i) via splitmix64 mapped to [-1, 1].
  * Collision probability per bit = 1 - angle(x, y) / pi (Charikar 2002).
  */
case class HyperplaneBucket(child: Expression, bits: Int, seed: Long)
  extends UnaryExpression with RefCallCodegen {

  require(bits > 0 && bits <= 30, s"bits out of range: $bits")

  override def dataType: DataType = IntegerType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var bucket = 0
    var b = 0
    while (b < bits) {
      var dotv = 0.0
      var i = 0
      while (i < n) {
        val r = ScaleHashes.splitmix64(seed ^ (b.toLong << 32) ^ i.toLong)
        // map to [-1, 1)
        val comp = (r >>> 11).toDouble / (1L << 52).toDouble * 2.0 - 1.0
        dotv += arr.getDouble(i) * comp
        i += 1
      }
      if (dotv >= 0) bucket |= (1 << b)
      b += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
