package graft.expr

/** TAQL-subset → Spark SQL predicate rewriter.
  *
  * The reference delegates `taql_where` strings to casacore's TAQL dialect
  * (ref: daskms/ordering.py:68-71,180-183; daskms/query.py:25-30). Catalyst
  * parses a strictly larger SQL grammar, so only token-level rewrites are
  * needed:
  *
  *   - `&&` → `AND`, `||` → `OR`, `!` → `NOT` (but `!=` survives)
  *   - `==` → `=`
  *   - TAQL `IN [a,b]` bracket lists → `IN (a,b)`; all OTHER brackets are
  *     left untouched so Spark's native array subscripts (`FLAG[0]`) work
  *   - string literals (single or double quoted, with backslash escapes)
  *     pass through verbatim
  *   - known-unsupported TAQL constructs (`~=`, `!~`, pattern ops) raise
  *     immediately with a clear message instead of failing later inside
  *     Catalyst
  */
object Taql {

  /** Casacore-specific operators we deliberately do not support. */
  private val Unsupported = Seq("~=", "!~")

  def toSql(taql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = taql.length
    var inStr: Char = 0 // 0 = not in a literal, else the quote char
    // Depth of currently-open IN-list brackets: only brackets whose opening
    // `[` directly follows an IN keyword are rewritten to parens; nested
    // brackets inside such a list keep their own meaning (subscripts) and a
    // separate counter tracks non-IN brackets so closers match openers.
    var lastToken: String = "" // last identifier/keyword seen outside strings
    val bracketIsInList = scala.collection.mutable.Stack[Boolean]()

    def flushToken(tok: StringBuilder): Unit = {
      if (tok.nonEmpty) { lastToken = tok.toString(); tok.clear() }
    }

    val tok = new StringBuilder

    while (i < n) {
      val c = taql.charAt(i)
      if (inStr != 0) {
        if (c == '\\' && i + 1 < n) { // backslash escape inside literal
          out += c; out += taql.charAt(i + 1); i += 2
        } else {
          out += c
          if (c == inStr) inStr = 0
          i += 1
        }
      } else if (c.isLetterOrDigit || c == '_') {
        tok += c; out += c; i += 1
      } else {
        // check unsupported two-char operators first
        if (i + 1 < n) {
          val two = taql.substring(i, i + 2)
          if (Unsupported.contains(two))
            throw new IllegalArgumentException(
              s"TAQL operator '$two' (casacore pattern matching) is not " +
                s"supported by the Spark engine; use LIKE/RLIKE instead: $taql")
        }
        flushToken(tok)
        c match {
          case '\'' | '"' =>
            inStr = c; out += c; i += 1
          case '&' if i + 1 < n && taql.charAt(i + 1) == '&' =>
            out ++= " AND "; i += 2
          case '|' if i + 1 < n && taql.charAt(i + 1) == '|' =>
            out ++= " OR "; i += 2
          case '=' if i + 1 < n && taql.charAt(i + 1) == '=' =>
            out ++= " = "; i += 2
          case '!' if i + 1 < n && taql.charAt(i + 1) == '=' =>
            out ++= "!="; i += 2
          case '!' =>
            out ++= " NOT "; i += 1
          case '[' =>
            val isInList = lastToken.equalsIgnoreCase("in")
            bracketIsInList.push(isInList)
            out += (if (isInList) '(' else '[')
            lastToken = ""; i += 1
          case ']' =>
            val wasInList = bracketIsInList.nonEmpty && bracketIsInList.pop()
            out += (if (wasInList) ')' else ']')
            i += 1
          case _ =>
            if (!c.isWhitespace) lastToken = ""
            out += c; i += 1
        }
      }
    }
    out.toString
  }
}
