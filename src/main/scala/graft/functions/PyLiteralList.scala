package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import scala.collection.mutable.ArrayBuffer

/** Safe parser for Python-literal string lists: `['Male', "Don't know"]`.
  *
  * The reference `eval()`s these (xml_generator.py:147) — a code-execution
  * hazard and wrong for us anyway. The portable `from_json` path
  * (Projections.parseStringifiedList) breaks on embedded apostrophes
  * because it blindly rewrites quotes; this expression is a real tokenizer:
  * both quote styles, backslash escapes, bare tokens (numbers/None),
  * arbitrary whitespace. Malformed input → null (quarantine semantics, F9),
  * never an exception and never code execution. (SURVEY.md §7.4 hard part.)
  */
case class PyLiteralListParse(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  // malformed NON-NULL input also yields null — must not inherit the
  // child's nullability or codegen assigns into a constant-false isNull
  override def nullable: Boolean = true
  override def prettyName: String = "py_literal_list"

  override protected def nullSafeEval(input: Any): Any =
    PyLiteralListParse.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = s"graft.functions.PyLiteralListParse.parse"
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = $fn($c);
      ${ev.isNull} = (${ev.value} == null);
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): PyLiteralListParse =
    copy(child = newChild)
}

object PyLiteralListParse {

  /** Returns GenericArrayData of UTF8String, or null if malformed. */
  def parse(u: UTF8String): GenericArrayData = {
    if (u == null) return null
    val s = u.toString
    var i = 0
    val n = s.length
    def skipWs(): Unit = while (i < n && s.charAt(i).isWhitespace) i += 1
    skipWs()
    if (i >= n || s.charAt(i) != '[') return null
    i += 1
    val out = ArrayBuffer.empty[UTF8String]
    skipWs()
    if (i < n && s.charAt(i) == ']') {
      i += 1
      skipWs()
      // '[] garbage' is malformed, same as the non-empty case
      return if (i == n) new GenericArrayData(out.toArray) else null
    }
    while (true) {
      skipWs()
      if (i >= n) return null
      val c = s.charAt(i)
      if (c == '\'' || c == '"') {
        val quote = c
        i += 1
        val sb = new StringBuilder
        var closed = false
        while (i < n && !closed) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < n) {
            // Python string-literal escape semantics: recognized escapes
            // decode; \x/\u/\U decode from hex (short digits = malformed,
            // like eval); UNRECOGNIZED escapes keep the backslash ('\d'
            // stays two chars — Python never drops it)
            val e = s.charAt(i + 1)
            i += 2
            def hex(len: Int): Int = {
              if (i + len > n) return -1
              var v = 0
              var k = 0
              while (k < len) {
                val d = Character.digit(s.charAt(i + k), 16)
                if (d < 0) return -1
                v = (v << 4) | d
                k += 1
              }
              i += len
              v
            }
            e match {
              case 'n'  => sb += '\n'
              case 't'  => sb += '\t'
              case 'r'  => sb += '\r'
              case 'a'  => sb += 7.toChar  // BEL
              case 'b'  => sb += '\b'
              case 'f'  => sb += '\f'
              case 'v'  => sb += 11.toChar // VT
              case '\\' => sb += '\\'
              case '\'' => sb += '\''
              case '"'  => sb += '"'
              case '\n' => () // line continuation: swallowed
              case 'x' =>
                val v = hex(2)
                if (v < 0) return null
                sb += v.toChar
              case 'u' =>
                val v = hex(4)
                if (v < 0) return null
                sb += v.toChar
              case 'U' =>
                val v = hex(8)
                if (v < 0 || !Character.isValidCodePoint(v)) return null
                sb.appendAll(Character.toChars(v))
              case o if o >= '0' && o <= '7' =>
                // \ooo: up to three octal digits (first already consumed)
                var v = o - '0'
                var k = 0
                while (k < 2 && i < n && s.charAt(i) >= '0' && s.charAt(i) <= '7') {
                  v = v * 8 + (s.charAt(i) - '0')
                  i += 1
                  k += 1
                }
                sb += v.toChar
              case other =>
                sb += '\\'
                sb += other
            }
          } else if (ch == quote) {
            closed = true
            i += 1
          } else {
            sb += ch
            i += 1
          }
        }
        if (!closed) return null
        out += UTF8String.fromString(sb.toString)
      } else {
        // bare token (number, True, None, ...) up to , or ]
        val start = i
        while (i < n && s.charAt(i) != ',' && s.charAt(i) != ']') i += 1
        val tok = s.substring(start, i).trim
        if (tok.isEmpty) return null
        out += UTF8String.fromString(tok)
      }
      skipWs()
      if (i >= n) return null
      s.charAt(i) match {
        case ',' => i += 1
        case ']' =>
          i += 1
          skipWs()
          return if (i == n) new GenericArrayData(out.toArray) else null
        case _ => return null
      }
    }
    null // unreachable
  }
}
