package graft.core

/** Mutable ASCII byte-slice CharSequence: a zero-copy view over a parse
  * buffer, reused across tokens by the parsers. `charAt` is safe because
  * parsers only create views over verified 7-bit ASCII runs. A view is
  * valid ONLY for the duration of the plate call it is passed to —
  * consumers that retain content must copy (`toString`).
  */
final class ByteSliceCharSeq extends CharSequence {
  private[this] var arr: Array[Byte] = _
  private[this] var off = 0
  private[this] var n = 0

  private[core] def set(a: Array[Byte], o: Int, len: Int): Unit = {
    arr = a; off = o; n = len
  }

  def length: Int = n
  def charAt(index: Int): Char = (arr(off + index) & 0x7F).toChar
  def subSequence(start: Int, end: Int): CharSequence =
    new String(arr, off + start, end - start, java.nio.charset.StandardCharsets.US_ASCII)
  override def toString: String =
    new String(arr, off, n, java.nio.charset.StandardCharsets.US_ASCII)

  /** Raw slice access for zero-decode consumers (the bytes are verified
    * 7-bit ASCII, hence valid UTF-8; copy before the call returns).
    */
  def bytes: Array[Byte] = arr
  def offset: Int = off
}
