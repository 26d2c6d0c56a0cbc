package graft.gateway

/** CSV export of a query result (A14) — server-side analog of the
  * reference's client-side `exportResults`
  * (/root/reference/frontend/js/app.js:451-479): a header row, then
  * every data cell double-quoted, rows separated by `\n`. Cells render
  * as the UI table would show them (null -> empty string, timestamps
  * ISO-8601). Two deliberate fixes over the reference's blob writer:
  * inner double quotes are doubled (RFC 4180 — a cell containing `"`
  * would emit a malformed row there), and headers get the same quoting
  * (a column alias containing a comma would shift the parsed grid).
  */
object ResultExport {

  // Headers get the same quoting as cells — a column alias containing a
  // comma or quote must not shift the parsed column grid.
  private def quote(s: String): String =
    "\"" + s.replace("\"", "\"\"") + "\""

  def toCsv(result: Engine.QueryResult): String = {
    val sb = new StringBuilder
    sb ++= result.columns.iterator.map(quote).mkString(",")
    sb += '\n'
    result.rows.foreach { row =>
      sb ++= row.iterator.map(c => quote(cellText(c))).mkString(",")
      sb += '\n'
    }
    sb.toString
  }

  private def cellText(v: Any): String = v match {
    case null => ""
    case t: java.sql.Timestamp => t.toInstant.toString
    case t: java.time.Instant => t.toString
    case b: Array[Byte] => java.util.Base64.getEncoder.encodeToString(b)
    case a: Array[_] => a.iterator.map(cellText).mkString("[", ",", "]")
    case s: Seq[_] => s.iterator.map(cellText).mkString("[", ",", "]")
    case m: Map[_, _] =>
      m.iterator.map { case (k, mv) => s"${String.valueOf(k)}:${cellText(mv)}" }
        .mkString("{", ",", "}")
    case r: org.apache.spark.sql.Row => r.toSeq.map(cellText).mkString("[", ",", "]")
    case other => String.valueOf(other)
  }
}
