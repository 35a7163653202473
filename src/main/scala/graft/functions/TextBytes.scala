package graft.functions

/** Byte-level predicates shared by the native text expressions. */
private[functions] object TextBytes {
  /** Java regex \\s: space, \\t, \\n, \\x0B, \\f, \\r — all ASCII, and
    * ASCII bytes never occur inside UTF-8 multibyte sequences, so a
    * byte-level whitespace test is exact on UTF-8 text (the argument
    * every native tokenizer here relies on). */
  @inline def isWs(b: Byte): Boolean = {
    val x = b & 0xFF
    x == ' ' || (x >= 0x09 && x <= 0x0D)
  }
}
