package graft.expr

/** TAQL-subset → Spark SQL predicate rewriter.
  *
  * The reference delegates `taql_where` strings to casacore's TAQL dialect
  * (ref: daskms/ordering.py:68-71,180-183; daskms/query.py:25-30). Catalyst
  * parses a strictly larger SQL grammar, so only token-level rewrites are
  * needed:
  *
  *   `&&` → `AND`, `||` → `OR`, `!` → `NOT` (but `!=` survives),
  *   `==` → `=`, `~` prefix of `~=` (near) is not supported,
  *   TAQL `IN [a,b]` bracket lists → `IN (a,b)`.
  *
  * Rewrites are applied outside string literals only.
  */
object Taql {

  def toSql(taql: String): String = {
    val out = new StringBuilder
    var i = 0
    val n = taql.length
    var inStr: Char = 0 // 0 = not in a literal, else the quote char
    while (i < n) {
      val c = taql.charAt(i)
      if (inStr != 0) {
        out += c
        if (c == inStr) inStr = 0
        i += 1
      } else c match {
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
        case '[' => // TAQL IN-list brackets
          out += '('; i += 1
        case ']' =>
          out += ')'; i += 1
        case _ =>
          out += c; i += 1
      }
    }
    out.toString
  }
}
