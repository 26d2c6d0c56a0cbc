package graft.gateway

/** Basic SQL formatter (A15), rule-for-rule the reference's `formatSQL`
  * (/root/reference/frontend/js/app.js:352-369): collapse whitespace,
  * break after commas with a 4-space continuation, break before major
  * clauses, indent AND/OR. Like the reference it is a cosmetic text
  * transform, not a parser — string literals containing commas or
  * keywords are reformatted too (same observable behavior).
  */
object SqlFormatter {

  def format(input: String): String = {
    var sql = input.replaceAll("\\s+", " ")
    sql = sql.replace(",", ",\n    ")
    sql = sql.replaceAll("(?i)\\sFROM\\s", "\nFROM ")
    sql = sql.replaceAll("(?i)\\sWHERE\\s", "\nWHERE ")
    sql = sql.replaceAll("(?i)\\sGROUP BY\\s", "\nGROUP BY ")
    sql = sql.replaceAll("(?i)\\sORDER BY\\s", "\nORDER BY ")
    sql = sql.replaceAll("(?i)\\sLIMIT\\s", "\nLIMIT ")
    sql = sql.replaceAll("(?i)\\sAND\\s", "\n  AND ")
    sql = sql.replaceAll("(?i)\\sOR\\s", "\n  OR ")
    sql
  }
}
