package graft.tools

/** Structural JSON helpers for the bench tools' merge-on-rewrite paths
  * ([[FullScaleBench]] subset runs splicing into SCALE10.json,
  * [[graft.bench.ServeBench]] path-filtered runs splicing into
  * SERVE_BENCH*.json). The earlier string-level regex splice silently
  * corrupted the merged file the moment a cell stopped being flat (a
  * nested value, or an `err` string containing '}').
  *
  * Not a general JSON parser — no value decoding, no unescaping. It
  * tracks exactly the state needed to find member/element boundaries in
  * WELL-FORMED JSON (string mode incl. escapes, brace/bracket depth) and
  * returns raw substrings, so a re-emitted document is byte-identical on
  * the parts that were not replaced. Malformed input fails loudly
  * (require), never quietly mis-splits.
  */
object JsonSplice {

  /** Index just past the closing quote of the string starting at `i0`
    * (s(i0) must be '"'); escape-aware.
    */
  private def skipString(s: String, i0: Int): Int = {
    require(s.charAt(i0) == '"', s"expected '\"' at $i0")
    var i = i0 + 1
    while (i < s.length && s.charAt(i) != '"') {
      if (s.charAt(i) == '\\') i += 1
      i += 1
    }
    require(i < s.length, s"unterminated string starting at $i0")
    i + 1
  }

  /** Index just past the raw value starting at `i0` — scans to the next
    * depth-0 ',' / '}' / ']' boundary.
    */
  private def skipValue(s: String, i0: Int): Int = {
    var i = i0
    var depth = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '"' => i = skipString(s, i)
        case '{' | '[' => depth += 1; i += 1
        case '}' | ']' =>
          if (depth == 0) return i
          depth -= 1; i += 1
        case ',' if depth == 0 => return i
        case _ => i += 1
      }
    }
    i
  }

  /** Top-level members of a JSON object string, as (key, rawValue) in
    * document order. Keys are returned verbatim-unescaped-free (the
    * tools' keys are plain identifiers).
    */
  def membersOf(obj: String): Seq[(String, String)] = {
    val s = obj.trim
    require(s.startsWith("{") && s.endsWith("}"),
      s"not a JSON object: ${s.take(40)}")
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var i = 1
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    ws()
    while (s.charAt(i) != '}') {
      require(s.charAt(i) == '"', s"expected member key at $i: ${s.slice(i, i + 20)}")
      val kEnd = skipString(s, i)
      val key = s.substring(i + 1, kEnd - 1)
      i = kEnd; ws()
      require(s.charAt(i) == ':', s"expected ':' at $i")
      i += 1; ws()
      val vEnd = skipValue(s, i)
      out += key -> s.substring(i, vEnd).trim
      i = vEnd; ws()
      if (s.charAt(i) == ',') { i += 1; ws() }
      else require(s.charAt(i) == '}', s"expected ',' or '}' at $i")
    }
    require(i == s.length - 1,
      s"trailing content after object close at $i of ${s.length}")
    out.toSeq
  }

  /** Top-level elements of a JSON array string, raw, in order. */
  def elementsOf(arr: String): Seq[String] = {
    val s = arr.trim
    require(s.startsWith("[") && s.endsWith("]"),
      s"not a JSON array: ${s.take(40)}")
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 1
    def ws(): Unit = while (i < s.length && s.charAt(i).isWhitespace) i += 1
    ws()
    while (s.charAt(i) != ']') {
      val vEnd = skipValue(s, i)
      out += s.substring(i, vEnd).trim
      i = vEnd; ws()
      if (s.charAt(i) == ',') { i += 1; ws() }
      else require(s.charAt(i) == ']', s"expected ',' or ']' at $i")
    }
    require(i == s.length - 1,
      s"trailing content after array close at $i of ${s.length}")
    out.toSeq
  }

  /** The raw value of top-level member `key`, or None. */
  def member(obj: String, key: String): Option[String] =
    membersOf(obj).collectFirst { case (k, v) if k == key => v }

  /** Re-emit an object from (key, rawValue) members. */
  def emitObject(members: Seq[(String, String)]): String =
    members.map { case (k, v) => s""""$k":$v""" }.mkString("{", ",", "}")

  /** Re-emit an array from raw elements. */
  def emitArray(elems: Seq[String]): String = elems.mkString("[", ",", "]")
}
