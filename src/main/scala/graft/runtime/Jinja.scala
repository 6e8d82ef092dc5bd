package graft.runtime

import scala.collection.mutable
import scala.util.matching.Regex

/** Minimal Jinja block interpreter: the control-flow subset the reference's
  * macros actually use beyond plain substitution — `{% set %}`, `{% for %}`
  * (with `loop.first/last/index`), general `{% if/elif/else %}` expressions,
  * `{% do %}`, dict/list literals, `~` concat, `|` filters (trim/lower/upper/
  * length/replace/default/join), methods (.split/.items/.update/.get),
  * membership `in`, `is [not] none`, and inline ternaries.
  *
  * Archetypes: /root/reference/macros/generate_alias_name.sql:2-25 and
  * get_custom_schema.sql:2-21 ({% set %} + loop over var('...').split(',')
  * building a dict guard), spark_adapter_patch/tblproperties_clause.sql:7-11
  * ({% for k, v in d.items() %} with loop.last comma control and a replace
  * filter).
  *
  * Output expressions (`{{ … }}`) that the evaluator cannot resolve — `ref`,
  * `source`, `this`, unexpanded macro calls — are left verbatim for
  * [[SqlTemplater]]'s substitution passes; tag-level failures (set/for/if/do)
  * throw, because silently dropping control flow would corrupt the SQL.
  */
object Jinja {

  // ---------------------------------------------------------------- values
  sealed trait V {
    def truthy: Boolean
    def render: String
  }
  case object VNone extends V { def truthy = false; def render = "None" }
  final case class VStr(s: String) extends V { def truthy = s.nonEmpty; def render = s }
  final case class VBool(b: Boolean) extends V { def truthy = b; def render = if (b) "True" else "False" }
  final case class VInt(n: Long) extends V { def truthy = n != 0; def render = n.toString }
  /** Float literal; keeps the source text so render is byte-faithful
    * (reference: bigquery_check_counts_max_diff_fraction: 0.0001,
    * models/spark/gold/gold_order_groups.sql:17). */
  final case class VFloat(text: String) extends V { def truthy = text.toDouble != 0; def render = text }
  final case class VList(xs: Seq[V]) extends V { def truthy = xs.nonEmpty; def render = xs.map(_.render).mkString("[", ", ", "]") }
  final case class VMap(m: mutable.LinkedHashMap[String, V]) extends V { def truthy = m.nonEmpty; def render = m.map { case (k, v) => s"$k: ${v.render}" }.mkString("{", ", ", "}") }

  /** Host bindings: `var()` lookup and `is_incremental()`. */
  final case class Env(vars: Map[String, String], isIncremental: Boolean,
                       bindings: Map[String, V] = Map.empty)

  private final class UnresolvedName(val name: String)
    extends RuntimeException(s"unknown name: $name")

  // ------------------------------------------------------------------ AST
  private sealed trait Node
  private final case class Text(s: String) extends Node
  private final case class Output(expr: String) extends Node
  private final case class SetN(name: String, expr: String) extends Node
  private final case class DoN(expr: String) extends Node
  private final case class ForN(names: Seq[String], expr: String, body: Vector[Node]) extends Node
  private final case class IfN(branches: Seq[(Option[String], Vector[Node])]) extends Node

  private val TagRe: Regex = """(?s)\{\{-?(.*?)-?\}\}|\{%-?(.*?)-?%\}""".r

  /** Render a template: interpret tags, substitute evaluable outputs. */
  def render(text: String, env: Env): String = {
    val nodes = parse(text)
    val scope = mutable.LinkedHashMap[String, V](env.bindings.toSeq: _*)
    val sb = new StringBuilder
    exec(nodes, scope, env, sb)
    sb.toString
  }

  // --------------------------------------------------------------- parser
  private def parse(text: String): Vector[Node] = {
    // (isExpr, content, start, end, trimLeft, trimRight) per template token
    final case class Piece(isExpr: Boolean, content: String, start: Int, end: Int,
                           trimL: Boolean, trimR: Boolean)
    val pieces = TagRe.findAllMatchIn(text).map { m =>
      val isExpr = m.group(1) != null
      val content = if (isExpr) m.group(1) else m.group(2)
      Piece(isExpr, content.trim, m.start, m.end,
        m.matched.startsWith("{%-") || m.matched.startsWith("{{-"),
        m.matched.endsWith("-%}") || m.matched.endsWith("-}}"))
    }.toVector

    // stack of open blocks; each frame accumulates completed nodes
    sealed trait Frame { val nodes = mutable.ArrayBuffer.empty[Node] }
    final class Root extends Frame
    final class ForF(val names: Seq[String], val expr: String) extends Frame
    final class IfF extends Frame {
      val branches = mutable.ArrayBuffer.empty[(Option[String], Vector[Node])]
      var cond: Option[String] = None // current branch condition
      def close(): Unit = { branches += ((cond, nodes.toVector)); nodes.clear() }
    }
    val stack = mutable.Stack[Frame](new Root)

    var pos = 0
    var pendingTrim = false
    def emitText(upTo: Int): Unit = {
      var t = text.substring(pos, upTo)
      if (pendingTrim) t = t.replaceAll("^\\s+", "")
      if (t.nonEmpty) stack.top.nodes += Text(t)
    }
    val SetRe = """(?s)^set\s+(\w+)\s*=\s*(.+)$""".r
    val ForRe = """(?s)^for\s+(\w+(?:\s*,\s*\w+)?)\s+in\s+(.+)$""".r
    val IfRe = """(?s)^if\s+(.+)$""".r
    val ElifRe = """(?s)^elif\s+(.+)$""".r
    val DoRe = """(?s)^do\s+(.+)$""".r

    for (p <- pieces) {
      if (p.trimL) {
        emitText(p.start)
        stack.top.nodes.lastOption match {
          case Some(Text(t)) =>
            stack.top.nodes.remove(stack.top.nodes.size - 1)
            val trimmed = t.replaceAll("\\s+$", "")
            if (trimmed.nonEmpty) stack.top.nodes += Text(trimmed)
          case _ =>
        }
      } else emitText(p.start)
      pos = p.end
      pendingTrim = p.trimR

      if (p.isExpr) stack.top.nodes += Output(p.content)
      else p.content match {
        case SetRe(name, expr) => stack.top.nodes += SetN(name, expr.trim)
        case DoRe(expr) => stack.top.nodes += DoN(expr.trim)
        case ForRe(names, expr) =>
          stack.push(new ForF(names.split(",").toSeq.map(_.trim), expr.trim))
        case "endfor" => stack.pop() match {
          case f: ForF => stack.top.nodes += ForN(f.names, f.expr, f.nodes.toVector)
          case _ => throw new IllegalArgumentException("endfor without for")
        }
        case IfRe(cond) =>
          val f = new IfF; f.cond = Some(cond.trim); stack.push(f)
        case ElifRe(cond) => stack.top match {
          case f: IfF => f.close(); f.cond = Some(cond.trim)
          case _ => throw new IllegalArgumentException("elif without if")
        }
        case "else" => stack.top match {
          case f: IfF => f.close(); f.cond = None
          case _ => throw new IllegalArgumentException("else without if")
        }
        case "endif" => stack.pop() match {
          case f: IfF => f.close(); stack.top.nodes += IfN(f.branches.toSeq)
          case _ => throw new IllegalArgumentException("endif without if")
        }
        case other => throw new IllegalArgumentException(s"unsupported tag: {% $other %}")
      }
    }
    emitText(text.length)
    require(stack.size == 1, "unclosed {% for %} / {% if %} block")
    stack.top.nodes.toVector
  }

  // ------------------------------------------------------------ execution
  private def exec(nodes: Vector[Node], scope: mutable.LinkedHashMap[String, V],
                   env: Env, sb: StringBuilder): Unit =
    nodes.foreach {
      case Text(t) => sb.append(t)
      case Output(e) =>
        // unresolvable outputs (ref/source/this/macro calls) pass through
        // verbatim for SqlTemplater's later substitution passes
        try sb.append(eval(e, scope, env).render)
        catch { case _: Exception => sb.append("{{ ").append(e).append(" }}") }
      case SetN(name, e) => scope(name) = eval(e, scope, env)
      case DoN(e) => eval(e, scope, env)
      case IfN(branches) =>
        branches.find { case (cond, _) =>
          cond.forall(c => eval(c, scope, env).truthy)
        }.foreach { case (_, body) => exec(body, scope, env, sb) }
      case ForN(names, e, body) =>
        val items: Seq[V] = eval(e, scope, env) match {
          case VList(xs) => xs
          case VMap(m) => m.map { case (k, v) => VList(Seq(VStr(k), v)) }.toSeq
          case VStr(s) => s.map(c => VStr(c.toString))
          case other => throw new IllegalArgumentException(s"cannot iterate ${other.render}")
        }
        val saved = names.flatMap(n => scope.get(n).map(n -> _))
        for ((item, i) <- items.zipWithIndex) {
          names match {
            case Seq(a) => scope(a) = item
            case Seq(a, b) => item match {
              case VList(Seq(x, y)) => scope(a) = x; scope(b) = y
              case _ => throw new IllegalArgumentException("cannot unpack loop item")
            }
            case _ => throw new IllegalArgumentException("at most 2 loop variables")
          }
          scope("loop") = VMap(mutable.LinkedHashMap(
            "index" -> VInt(i + 1), "index0" -> VInt(i),
            "first" -> VBool(i == 0), "last" -> VBool(i == items.size - 1),
            "length" -> VInt(items.size)))
          exec(body, scope, env, sb)
        }
        names.foreach(scope.remove); scope.remove("loop")
        saved.foreach { case (k, v) => scope(k) = v }
    }

  // ---------------------------------------------------------- expressions
  private final case class Tok(kind: String, text: String) // kinds: str num name op

  private def lexer(s: String): Vector[Tok] = {
    val out = mutable.ArrayBuffer.empty[Tok]
    var i = 0
    val ops = Seq("==", "!=", "<=", ">=", "|", "~", ".", ",", "(", ")", "[", "]",
      "{", "}", ":", "<", ">", "=")
    while (i < s.length) {
      val c = s(i)
      if (c.isWhitespace) i += 1
      else if (c == '\'' || c == '"') {
        val sb = new StringBuilder; i += 1
        while (i < s.length && s(i) != c) {
          if (s(i) == '\\' && i + 1 < s.length) { sb.append(s(i + 1)); i += 2 }
          else { sb.append(s(i)); i += 1 }
        }
        require(i < s.length, s"unterminated string in: $s")
        i += 1
        out += Tok("str", sb.toString)
      } else if (c.isDigit) {
        val start = i
        while (i < s.length && s(i).isDigit) i += 1
        if (i + 1 < s.length && s(i) == '.' && s(i + 1).isDigit) {
          i += 1
          while (i < s.length && s(i).isDigit) i += 1
        }
        out += Tok("num", s.substring(start, i))
      } else if (c.isLetter || c == '_') {
        val start = i
        while (i < s.length && (s(i).isLetterOrDigit || s(i) == '_')) i += 1
        out += Tok("name", s.substring(start, i))
      } else ops.find(op => s.startsWith(op, i)) match {
        case Some(op) => out += Tok("op", op); i += op.length
        case None => throw new IllegalArgumentException(s"bad char '$c' in: $s")
      }
    }
    out.toVector
  }

  private final class P(toks: Vector[Tok], scope: mutable.LinkedHashMap[String, V], env: Env) {
    private var i = 0
    private def peek: Option[Tok] = if (i < toks.length) Some(toks(i)) else None
    private def at(kind: String, text: String = null): Boolean =
      peek.exists(t => t.kind == kind && (text == null || t.text == text))
    private def take(): Tok = { val t = toks(i); i += 1; t }
    private def expect(kind: String, text: String = null): Tok = {
      require(at(kind, text), s"expected ${Option(text).getOrElse(kind)} at ${toks.drop(i).map(_.text).mkString(" ")}")
      take()
    }
    def done: Boolean = i >= toks.length

    def expr(): V = {
      val v = orE()
      if (at("name", "if")) { // A if C else B
        take()
        val cond = orE()
        expect("name", "else")
        val other = expr()
        if (cond.truthy) v else other
      } else v
    }

    private def orE(): V = {
      var v = andE()
      while (at("name", "or")) { take(); val r = andE(); v = VBool(v.truthy || r.truthy) }
      v
    }
    private def andE(): V = {
      var v = notE()
      while (at("name", "and")) { take(); val r = notE(); v = VBool(v.truthy && r.truthy) }
      v
    }
    private def notE(): V =
      if (at("name", "not")) { take(); VBool(!notE().truthy) } else cmpE()

    private def isNum(v: V): Boolean = v match {
      case VInt(_) | VFloat(_) => true
      case _ => false
    }
    private def asDouble(v: V): Double = v match {
      case VInt(n) => n.toDouble
      case VFloat(t) => t.toDouble
      case VStr(s) => s.trim.toDouble
      case VBool(b) => if (b) 1 else 0
      case _ => throw new IllegalArgumentException(s"not a number: ${v.render}")
    }
    private def cmpE(): V = {
      val l = concatE()
      // == / != on two numerics compare by value (0.50 == 0.5), else by text
      if (at("op", "==")) { take(); val r = concatE()
        VBool(if (isNum(l) && isNum(r)) asDouble(l) == asDouble(r) else l.render == r.render) }
      else if (at("op", "!=")) { take(); val r = concatE()
        VBool(if (isNum(l) && isNum(r)) asDouble(l) != asDouble(r) else l.render != r.render) }
      else if (at("op", "<") || at("op", ">") || at("op", "<=") || at("op", ">=")) {
        val op = take().text
        val r = concatE()
        // double-compare: a Long from asLong would silently truncate floats
        val (a, b) = (asDouble(l), asDouble(r))
        VBool(op match { case "<" => a < b; case ">" => a > b; case "<=" => a <= b; case _ => a >= b })
      } else if (at("name", "in")) { take(); VBool(contains(concatE(), l)) }
      else if (at("name", "not") && toks.lift(i + 1).exists(t => t.kind == "name" && t.text == "in")) {
        take(); take(); VBool(!contains(concatE(), l))
      } else if (at("name", "is")) {
        take()
        val neg = if (at("name", "not")) { take(); true } else false
        val t = expect("name").text
        val r = t match {
          case "none" | "defined" => if (t == "none") l == VNone else l != VNone
          case other => throw new IllegalArgumentException(s"unsupported test: is $other")
        }
        VBool(if (neg) !r else r)
      } else l
    }

    private def concatE(): V = {
      var v = postfixE()
      while (at("op", "~")) { take(); val r = postfixE(); v = VStr(v.render + r.render) }
      v
    }

    private def postfixE(): V = {
      var v = primary()
      var continue = true
      while (continue) {
        if (at("op", ".")) {
          take()
          val name = expect("name").text
          if (at("op", "(")) v = call(v, name, args())
          else v = attr(v, name)
        } else if (at("op", "|")) {
          take()
          val name = expect("name").text
          val as = if (at("op", "(")) args() else Nil
          v = filter(v, name, as)
        } else if (at("op", "[")) {
          take()
          val k = expr()
          expect("op", "]")
          v = attr(v, k.render)
        } else continue = false
      }
      v
    }

    private def args(): Seq[V] = {
      expect("op", "(")
      val out = mutable.ArrayBuffer.empty[V]
      if (!at("op", ")")) { out += expr(); while (at("op", ",")) { take(); out += expr() } }
      expect("op", ")")
      out.toSeq
    }

    private def primary(): V = peek match {
      case Some(Tok("str", s)) => take(); VStr(s)
      case Some(Tok("num", n)) => take()
        if (n.contains('.')) VFloat(n) else VInt(n.toLong)
      case Some(Tok("op", "(")) => take(); val v = expr(); expect("op", ")"); v
      case Some(Tok("op", "[")) =>
        take()
        val out = mutable.ArrayBuffer.empty[V]
        if (!at("op", "]")) {
          out += expr()
          // trailing commas tolerated (Python/Jinja allow them; reference
          // configs use them, e.g. dsa_orders.sql's meta dict)
          while (at("op", ",")) { take(); if (!at("op", "]")) out += expr() }
        }
        expect("op", "]")
        VList(out.toSeq)
      case Some(Tok("op", "{")) =>
        take()
        val m = mutable.LinkedHashMap.empty[String, V]
        if (!at("op", "}")) {
          def pair(): Unit = { val k = expr(); expect("op", ":"); m(k.render) = expr() }
          pair(); while (at("op", ",")) { take(); if (!at("op", "}")) pair() }
        }
        expect("op", "}")
        VMap(m)
      case Some(Tok("name", n)) =>
        take()
        n match {
          case "true" | "True" => VBool(true)
          case "false" | "False" => VBool(false)
          case "none" | "None" => VNone
          case "var" if at("op", "(") =>
            val as = args()
            env.vars.get(as.head.render) match {
              case Some(s) => VStr(s)
              case None if as.size > 1 => as(1)
              case None => throw new UnresolvedName(s"var ${as.head.render}")
            }
          case "is_incremental" if at("op", "(") => args(); VBool(env.isIncremental)
          case "range" if at("op", "(") =>
            val as = args().map(asLong)
            val (lo, hi) = if (as.size == 1) (0L, as.head) else (as.head, as(1))
            VList((lo until hi).map(VInt(_)))
          case _ if at("op", "(") => throw new UnresolvedName(n) // ref/source/macro call
          case _ => scope.getOrElse(n, throw new UnresolvedName(n))
        }
      case other => throw new IllegalArgumentException(s"unexpected token: $other")
    }

    private def attr(v: V, name: String): V = v match {
      case VMap(m) => m.getOrElse(name, VNone)
      case VList(xs) if name.forall(_.isDigit) => xs(name.toInt)
      case _ => throw new IllegalArgumentException(s"no attribute $name on ${v.render}")
    }

    private def call(v: V, name: String, as: Seq[V]): V = (v, name) match {
      case (VStr(s), "split") => VList(s.split(java.util.regex.Pattern.quote(as.head.render), -1).toSeq.map(VStr))
      case (VMap(m), "items") => VList(m.map { case (k, x) => VList(Seq(VStr(k), x)) }.toSeq)
      case (VMap(m), "keys") => VList(m.keys.map(VStr).toSeq)
      case (VMap(m), "values") => VList(m.values.toSeq)
      case (VMap(m), "update") => as.head match {
        case VMap(other) => m ++= other; VNone
        case _ => throw new IllegalArgumentException("update() needs a dict")
      }
      case (VMap(m), "get") => m.getOrElse(as.head.render, as.lift(1).getOrElse(VNone))
      case (VStr(s), "strip") => VStr(s.trim)
      case (VStr(s), "startswith") => VBool(s.startsWith(as.head.render))
      case (VStr(s), "endswith") => VBool(s.endsWith(as.head.render))
      case _ => throw new IllegalArgumentException(s"unsupported method .$name on ${v.render}")
    }

    private def filter(v: V, name: String, as: Seq[V]): V = name match {
      case "trim" => VStr(v.render.trim)
      case "lower" => VStr(v.render.toLowerCase)
      case "upper" => VStr(v.render.toUpperCase)
      case "length" => v match {
        case VStr(s) => VInt(s.length)
        case VList(xs) => VInt(xs.size)
        case VMap(m) => VInt(m.size)
        case _ => throw new IllegalArgumentException(s"no length for ${v.render}")
      }
      case "replace" => VStr(v.render.replace(as.head.render, as(1).render))
      case "default" => if (v == VNone) as.head else v
      case "join" => v match {
        case VList(xs) => VStr(xs.map(_.render).mkString(as.headOption.map(_.render).getOrElse("")))
        case _ => throw new IllegalArgumentException("join needs a list")
      }
      case "int" => VInt(asLong(v))
      case "string" => VStr(v.render)
      case other => throw new IllegalArgumentException(s"unsupported filter |$other")
    }

    private def contains(hay: V, needle: V): Boolean = hay match {
      case VMap(m) => m.contains(needle.render)
      case VList(xs) => xs.exists(_.render == needle.render)
      case VStr(s) => s.contains(needle.render)
      case _ => false
    }

    private def asLong(v: V): Long = v match {
      case VInt(n) => n
      case VFloat(t) => t.toDouble.toLong
      case VStr(s) => s.trim.toLong
      case VBool(b) => if (b) 1 else 0
      case _ => throw new IllegalArgumentException(s"not a number: ${v.render}")
    }
  }

  private[runtime] def eval(e: String, scope: mutable.LinkedHashMap[String, V], env: Env): V = {
    val p = new P(lexer(e), scope, env)
    val v = p.expr()
    require(p.done, s"trailing tokens in expression: $e")
    v
  }
}
