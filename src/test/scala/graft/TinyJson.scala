package graft

/** Minimal dependency-free JSON parser for test assertions.
  *
  * BenchLineSpec previously imported json4s, which compiled only
  * because Spark's unmanaged jar directory happens to ship it — not a
  * declared dependency in build.sbt and NOT resolvable from the
  * offline coursier cache, so a Spark image change would have broken
  * the suite non-obviously (ADVICE r6, carried to r7). Sixty lines of
  * recursive descent cover the full grammar the bench line uses and
  * keep the suite compilable from declared dependencies alone.
  */
object TinyJson {
  sealed trait J {
    def obj: Map[String, J] = asInstanceOf[JObj].fields
    def arr: List[J]        = asInstanceOf[JArr].items
    def str: String         = asInstanceOf[JStr].s
    def num: Double         = asInstanceOf[JNum].d
    def bool: Boolean       = asInstanceOf[JBool].b
  }
  final case class JObj(fields: Map[String, J]) extends J
  final case class JArr(items: List[J]) extends J
  final case class JStr(s: String) extends J
  final case class JNum(d: Double) extends J
  final case class JBool(b: Boolean) extends J
  case object JNull extends J

  def parse(input: String): J = {
    val p = new P(input)
    val v = p.value()
    p.ws()
    require(p.eof, s"trailing content at offset ${p.i}")
    v
  }

  private final class P(s: String) {
    var i = 0
    def eof: Boolean = i >= s.length
    def ws(): Unit = while (!eof && s(i).isWhitespace) i += 1
    private def expect(c: Char): Unit = {
      require(!eof && s(i) == c, s"expected '$c' at offset $i")
      i += 1
    }
    def value(): J = { ws(); s(i) match {
      case '{' => obj()
      case '[' => arr()
      case '"' => JStr(str())
      case 't' => lit("true", JBool(true))
      case 'f' => lit("false", JBool(false))
      case 'n' => lit("null", JNull)
      case _   => num()
    } }
    private def lit(word: String, j: J): J = {
      require(s.startsWith(word, i), s"bad literal at offset $i")
      i += word.length; j
    }
    private def obj(): J = {
      expect('{'); ws()
      if (s(i) == '}') { i += 1; return JObj(Map.empty) }
      val b = Map.newBuilder[String, J]
      var more = true
      while (more) {
        ws(); val k = str(); ws(); expect(':'); b += k -> value(); ws()
        if (s(i) == ',') i += 1 else more = false
      }
      expect('}'); JObj(b.result())
    }
    private def arr(): J = {
      expect('['); ws()
      if (s(i) == ']') { i += 1; return JArr(Nil) }
      val b = List.newBuilder[J]
      var more = true
      while (more) {
        b += value(); ws()
        if (s(i) == ',') i += 1 else more = false
      }
      expect(']'); JArr(b.result())
    }
    private def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s(i) != '"') {
        if (s(i) == '\\') {
          i += 1
          s(i) match {
            case '"'  => sb += '"'
            case '\\' => sb += '\\'
            case '/'  => sb += '/'
            case 'n'  => sb += '\n'
            case 't'  => sb += '\t'
            case 'r'  => sb += '\r'
            case 'b'  => sb += '\b'
            case 'f'  => sb += '\f'
            case 'u'  =>
              sb += Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar
              i += 4
            case c => throw new IllegalArgumentException(s"bad escape \\$c")
          }
          i += 1
        } else { sb += s(i); i += 1 }
      }
      i += 1
      sb.result()
    }
    private def num(): J = {
      val start = i
      while (!eof && (s(i).isDigit || "+-.eE".contains(s(i)))) i += 1
      require(i > start, s"expected JSON value at offset $start")
      JNum(s.substring(start, i).toDouble)
    }
  }
}
