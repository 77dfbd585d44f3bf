package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftinterop.ColumnInterop
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Order/whitespace-insensitive content fingerprint: md5 hex of the
  * space-joined, binary-sorted distinct words of `lower(text)` —
  * exactly the value of
  * `md5(concat_ws(" ", array_sort(array_distinct(split(lower(text), " ")))))`
  * in one pass. The composable form is correct but its generated code
  * (lambda comparators for sort/distinct) dominates cold time via Janino
  * compilation; a dedup stage at scale also wants one traversal, not four
  * array materializations per document.
  *
  * Split semantics match Spark/DuckDB `split(s, " ")`: every single space
  * is a separator and empty tokens (leading/trailing/consecutive spaces)
  * are kept. Sort order is unsigned-byte (UTF-8) order — identical to
  * Spark's `array_sort` on strings and DuckDB's `list_sort` on varchar.
  */
case class WordSetFingerprint(child: Expression)
  extends UnaryExpression with RefCallCodegen {

  override def dataType: DataType = StringType
  override def prettyName: String = "word_set_fingerprint"

  @transient private lazy val md = MessageDigest.getInstance("MD5")

  override def nullSafeEval(v: Any): Any = {
    val lowered = v.asInstanceOf[UTF8String].toLowerCase
    // UTF8String.compareTo is unsigned byte-wise — the required order
    val set = new java.util.TreeSet[UTF8String]()
    var start = 0
    val s = lowered.toString
    var i = 0
    while (i <= s.length) {
      if (i == s.length || s.charAt(i) == ' ') {
        set.add(UTF8String.fromString(s.substring(start, i)))
        start = i + 1
      }
      i += 1
    }
    md.reset()
    val it = set.iterator()
    var first = true
    while (it.hasNext) {
      if (!first) md.update(' '.toByte)
      md.update(it.next().getBytes)
      first = false
    }
    val d = md.digest()
    val hex = new java.lang.StringBuilder(32)
    d.foreach(b => hex.append(f"${b & 0xff}%02x"))
    UTF8String.fromString(hex.toString)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordSetFingerprint {
  def word_set_fingerprint(text: Column): Column =
    ColumnInterop.toColumn(WordSetFingerprint(ColumnInterop.toExpr(text)))
}
