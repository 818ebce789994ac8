package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Canonical JSON — byte-compatible with Python's
  * `json.dumps(obj, sort_keys=True)` (default separators `", "` / `": "`,
  * `ensure_ascii=True`), which is what the reference signs over
  * (reference: demo_did_graph/common/did_utils.py:43,88-100 — VC proofs
  * verify only if the serialization matches byte-for-byte).
  *
  * Spark's `to_json` is NOT key-sorted and formats numbers differently, so
  * this is a standalone parser + serializer (SURVEY.md §4 item 3):
  *   - keys sorted by Unicode code point (Python `str` ordering);
  *   - int/float distinction of the source text preserved (`42` vs `42.0`);
  *   - floats rendered with Python's `repr` rules (shortest round-trip
  *     digits, fixed notation for 1e-4 <= |x| < 1e16, else `e+NN`);
  *   - non-ASCII and control chars escaped as lowercase `\uXXXX`, one
  *     escape per UTF-16 unit (surrogate pairs escape as two).
  *
  * This runs per-row as a UDF: it is a pure string→string function with no
  * state, so it scales embarrassingly (no shuffle); a codegen Expression
  * would only save the UDF-boundary boxing.
  */
object JsonCanon {

  sealed trait JValue
  case object JNull extends JValue
  final case class JBool(v: Boolean) extends JValue
  final case class JInt(v: BigInt) extends JValue
  final case class JFloat(v: Double) extends JValue
  final case class JStr(v: String) extends JValue
  final case class JArr(v: Vector[JValue]) extends JValue
  final case class JObj(v: Vector[(String, JValue)]) extends JValue

  /** Python repr() for doubles — shortest round-trip digits re-formatted
    * with Python's fixed/scientific switch.
    *
    * Shortest digits are derived explicitly (probe precisions 1..17 and keep
    * the first that round-trips): JDK 17's `Double.toString` does not always
    * emit the shortest form (Ryu landed in JDK 19), and ~1% of doubles would
    * otherwise carry an extra digit and break byte-compat with CPython.
    */
  def pyFloatRepr(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isPosInfinity) return "Infinity"
    if (d.isNegInfinity) return "-Infinity"
    if (d == 0.0) return if (1.0 / d < 0) "-0.0" else "0.0"
    val neg = d < 0
    val a = math.abs(d)
    var prec = 0
    var s: String = null
    while (s == null) {
      val cand = String.format(java.util.Locale.ROOT, "%." + prec + "e", java.lang.Double.valueOf(a))
      if (prec == 16 || java.lang.Double.parseDouble(cand) == a) s = cand
      prec += 1
    }
    // %e always yields a nonzero leading digit, so the exponent is decExp
    // directly: value = d1.d2... * 10^decExp
    val ei = s.indexOf('e')
    val mant = s.substring(0, ei)
    val decExp = s.substring(ei + 1).toInt
    val digitsRaw = mant.filter(_ != '.')
    val digits0 = digitsRaw.reverse.dropWhile(_ == '0').reverse
    val digits = if (digits0.isEmpty) "0" else digits0
    val sb = new StringBuilder
    if (neg) sb.append('-')
    if (decExp >= -4 && decExp < 16) {
      if (decExp >= digits.length - 1) {
        sb.append(digits).append("0" * (decExp - (digits.length - 1))).append(".0")
      } else if (decExp >= 0) {
        sb.append(digits.substring(0, decExp + 1)).append('.')
          .append(digits.substring(decExp + 1))
      } else {
        sb.append("0.").append("0" * (-decExp - 1)).append(digits)
      }
    } else {
      sb.append(digits.charAt(0))
      if (digits.length > 1) sb.append('.').append(digits.substring(1))
      sb.append('e')
      sb.append(if (decExp < 0) '-' else '+')
      val ae = math.abs(decExp)
      if (ae < 10) sb.append('0')
      sb.append(ae)
    }
    sb.toString
  }

  /** Python ensure_ascii string escaping, one escape per UTF-16 unit. */
  def escape(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"'  => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\b' => sb.append("\\b")
        case '\f' => sb.append("\\f")
        case _ if c < 0x20 || c > 0x7e => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"')
    sb.toString
  }

  private def cpCompare(a: String, b: String): Int = {
    // Unicode code-point order (Python str comparison), not UTF-16 order.
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  def serialize(v: JValue): String = {
    val sb = new StringBuilder
    def go(v: JValue): Unit = v match {
      case JNull => sb.append("null")
      case JBool(b) => sb.append(if (b) "true" else "false")
      case JInt(n) => sb.append(n.toString)
      case JFloat(d) => sb.append(pyFloatRepr(d))
      case JStr(s) => sb.append(escape(s))
      case JArr(xs) =>
        sb.append('[')
        var first = true
        xs.foreach { x => if (!first) sb.append(", "); first = false; go(x) }
        sb.append(']')
      case JObj(fields) =>
        sb.append('{')
        var first = true
        fields.sortWith((x, y) => cpCompare(x._1, y._1) < 0).foreach { case (k, x) =>
          if (!first) sb.append(", ")
          first = false
          sb.append(escape(k)).append(": ")
          go(x)
        }
        sb.append('}')
    }
    go(v)
    sb.toString
  }

  /** Minimal recursive-descent JSON parser preserving int/float identity. */
  def parse(s: String): JValue = {
    var i = 0
    def err(msg: String) = throw new IllegalArgumentException(s"JSON parse error at $i: $msg")
    def ws(): Unit = while (i < s.length && Character.isWhitespace(s.charAt(i))) i += 1
    def expect(c: Char): Unit = { if (i >= s.length || s.charAt(i) != c) err(s"expected '$c'"); i += 1 }
    def value(): JValue = {
      ws()
      if (i >= s.length) err("eof")
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => JStr(str())
        case 't' => lit("true"); JBool(true)
        case 'f' => lit("false"); JBool(false)
        case 'n' => lit("null"); JNull
        case _   => num()
      }
    }
    def lit(w: String): Unit = {
      if (!s.startsWith(w, i)) err(s"expected $w")
      i += w.length
    }
    def obj(): JValue = {
      expect('{'); ws()
      val fields = Vector.newBuilder[(String, JValue)]
      if (i < s.length && s.charAt(i) == '}') { i += 1; return JObj(Vector.empty) }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        fields += k -> value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); done = true }
      }
      JObj(fields.result())
    }
    def arr(): JValue = {
      expect('['); ws()
      val xs = Vector.newBuilder[JValue]
      if (i < s.length && s.charAt(i) == ']') { i += 1; return JArr(Vector.empty) }
      var done = false
      while (!done) {
        xs += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); done = true }
      }
      JArr(xs.result())
    }
    def str(): String = {
      expect('"')
      val sb = new StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) err("eof in string")
          s.charAt(i) match {
            case '"'  => sb.append('"')
            case '\\' => sb.append('\\')
            case '/'  => sb.append('/')
            case 'n'  => sb.append('\n')
            case 't'  => sb.append('\t')
            case 'r'  => sb.append('\r')
            case 'b'  => sb.append('\b')
            case 'f'  => sb.append('\f')
            case 'u'  =>
              sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              i += 4
            case other => err(s"bad escape \\$other")
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      expect('"')
      sb.toString
    }
    def num(): JValue = {
      val start = i
      if (i < s.length && (s.charAt(i) == '-' || s.charAt(i) == '+')) i += 1
      var isFloat = false
      while (i < s.length && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0)) {
        if (".eE".indexOf(s.charAt(i)) >= 0) isFloat = true
        i += 1
      }
      val t = s.substring(start, i)
      if (t.isEmpty || t == "-") err("bad number")
      if (isFloat) JFloat(t.toDouble) else JInt(BigInt(t))
    }
    val v = value()
    ws()
    if (i != s.length) err("trailing data")
    v
  }

  /** String→string canonicalization (parse + key-sorted re-serialize). */
  def canonicalize(json: String): String = serialize(parse(json))

  /** Column form, for pipelines. */
  val canonicalJsonUdf = udf((s: String) => if (s == null) null else canonicalize(s))
  def canonical_json(c: Column): Column = canonicalJsonUdf(c)
}
