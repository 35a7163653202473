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

  /** Loud failure for a null array slot reached by a native expression
    * that declares non-null output. Analysis-time rejection of
    * containsNull=true inputs is TOO strict — Catalyst's inferred
    * nullability is conservatively true for join outputs and most
    * HOF-composed arrays even when no element is ever null — so the
    * native expressions accept them and instead refuse AT THE ELEMENT
    * READ, which is the advice's actual invariant: never compute wrong
    * values from a null slot. */
  def failNullSlot(fn: String, i: Int): Nothing =
    throw new IllegalArgumentException(
      s"$fn: null array element at index $i — this expression declares " +
        "non-null output and will not compute from null slots; " +
        "null-filter the producer first")
}
