package graft.util

/** Minimal JSON AST + renderer + recursive-descent parser, used for
  * detector persistence (replacing the reference's joblib pickles,
  * `/root/reference/tsod/base.py:95-104`, with a portable parameter
  * document). No third-party deps by design (offline build).
  *
  * Non-finite doubles (the reference's `np.inf` defaults) are encoded as
  * the strings "Infinity"/"-Infinity"/"NaN" to stay valid JSON.
  */
object Json {
  sealed trait JValue {
    def render: String = this match {
      case JNull => "null"
      case JBool(b) => b.toString
      case JNum(d) =>
        if (d.isNaN || d.isInfinite) JStr(d.toString).render
        else if (d == d.toLong.toDouble && math.abs(d) < 1e15) d.toLong.toString
        else d.toString
      case JStr(s) => "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\r' => "\\r"
        case '\t' => "\\t"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
      case JArr(xs) => xs.map(_.render).mkString("[", ",", "]")
      case JObj(fs) => fs.map { case (k, v) => JStr(k).render + ":" + v.render }
        .mkString("{", ",", "}")
    }
    def apply(key: String): JValue = this match {
      case JObj(fs) => fs.toMap.getOrElse(key, JNull)
      case _ => JNull
    }
    def str: String = this match { case JStr(s) => s; case other => sys.error(s"not a string: $other") }
    def num: Double = this match {
      case JNum(d) => d
      case JStr("Infinity") => Double.PositiveInfinity
      case JStr("-Infinity") => Double.NegativeInfinity
      case JStr("NaN") => Double.NaN
      case other => sys.error(s"not a number: $other")
    }
    def arr: Seq[JValue] = this match { case JArr(xs) => xs; case other => sys.error(s"not an array: $other") }
    def opt: Option[JValue] = this match { case JNull => None; case v => Some(v) }
  }
  case object JNull extends JValue
  final case class JBool(b: Boolean) extends JValue
  final case class JNum(d: Double) extends JValue
  final case class JStr(s: String) extends JValue
  final case class JArr(xs: Seq[JValue]) extends JValue
  final case class JObj(fs: Seq[(String, JValue)]) extends JValue

  def num(d: Double): JValue = JNum(d)
  def numOpt(d: Option[Double]): JValue = d.map(JNum).getOrElse(JNull)

  def parse(s: String): JValue = {
    val p = new Parser(s)
    val v = p.value()
    p.skipWs()
    require(p.eof, s"trailing content at ${p.pos}")
    v
  }

  private final class Parser(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def skipWs(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def expect(c: Char): Unit = {
      skipWs()
      require(!eof && s.charAt(pos) == c, s"expected '$c' at $pos")
      pos += 1
    }
    def value(): JValue = {
      skipWs()
      require(!eof, "unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => array()
        case '"' => JStr(string())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _ => number()
      }
    }
    private def lit(w: String): Unit = {
      require(s.startsWith(w, pos), s"bad literal at $pos"); pos += w.length
    }
    private def obj(): JValue = {
      expect('{'); skipWs()
      if (s.charAt(pos) == '}') { pos += 1; return JObj(Nil) }
      val fs = Seq.newBuilder[(String, JValue)]
      var done = false
      while (!done) {
        skipWs()
        val k = string()
        expect(':')
        fs += k -> value()
        skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect('}'); done = true }
      }
      JObj(fs.result())
    }
    private def array(): JValue = {
      expect('['); skipWs()
      if (s.charAt(pos) == ']') { pos += 1; return JArr(Nil) }
      val xs = Seq.newBuilder[JValue]
      var done = false
      while (!done) {
        xs += value()
        skipWs()
        if (s.charAt(pos) == ',') pos += 1 else { expect(']'); done = true }
      }
      JArr(xs.result())
    }
    private def string(): String = {
      expect('"')
      val sb = new StringBuilder
      while (s.charAt(pos) != '"') {
        val c = s.charAt(pos)
        if (c == '\\') {
          pos += 1
          s.charAt(pos) match {
            case '"' => sb += '"'
            case '\\' => sb += '\\'
            case '/' => sb += '/'
            case 'n' => sb += '\n'
            case 'r' => sb += '\r'
            case 't' => sb += '\t'
            case 'b' => sb += '\b'
            case 'f' => sb += '\f'
            case 'u' =>
              sb += Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar
              pos += 4
            case other => sys.error(s"bad escape \\$other at $pos")
          }
        } else sb += c
        pos += 1
      }
      pos += 1
      sb.result()
    }
    private def number(): JValue = {
      val start = pos
      while (!eof && "+-0123456789.eE".indexOf(s.charAt(pos)) >= 0) pos += 1
      JNum(s.substring(start, pos).toDouble)
    }
  }
}
