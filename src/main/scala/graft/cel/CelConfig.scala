package graft.cel

import java.nio.file.{Files, Path}

/** The mito CLI's YAML configuration subset (reference mito.go `config`
  * struct, :85-147): named regular expressions, typed globals, XSD
  * hint tables, and client-level Basic auth. Not a YAML engine — it
  * parses the shapes the reference documents and its goldens use
  * (scalars, inline lists, one nested map level, quoted or bare keys).
  * OAuth2 provider flavors are a streaming-source concern here
  * (sources.HttpSource), not a one-shot CLI one.
  */
object CelConfig {

  final case class Cfg(
      regexps: Map[String, String] = Map.empty,
      globalsJson: String = "",
      xsds: Map[String, String] = Map.empty,
      basicAuth: Option[(String, String)] = None)

  private val entry = """(?m)^\s*"?([^":]+?)"?:\s*"(.+?)"\s*$""".r
  private val kvLine = """^\s*"?([^":]+?)"?:\s*(.*)$""".r

  /** Parse cfg YAML; `baseDir` resolves XSD file references (the CLI's
    * working directory, like mito's). Left = human-readable error. */
  def parse(yaml: String, baseDir: Option[Path]): Either[String, Cfg] = {
    var cfg = Cfg()
    val lines = yaml.linesIterator.toVector
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      val trimmed = l.trim
      if (trimmed.isEmpty || trimmed.startsWith("#") || l.startsWith(" ")) i += 1
      else kvLine.findFirstMatchIn(l) match {
        case None => return Left(s"unsupported cfg line: $l")
        case Some(m) =>
          val section = m.group(1)
          val start = i + 1
          var end = start
          while (end < lines.length &&
            (lines(end).trim.isEmpty || lines(end).startsWith(" "))) end += 1
          val body = lines.slice(start, end).mkString("\n")
          section match {
            case "regexp" =>
              // quoted scalars, plus bare (unquoted) patterns like the
              // xsd section accepts: `products: foo(\s)bar` — silently
              // dropping them made later re_* calls fail as unknown
              // functions instead of binding the pattern
              cfg = cfg.copy(regexps = entry.findAllMatchIn(body)
                .map(e => e.group(1) -> e.group(2)).toMap ++
                lines.slice(start, end).flatMap(kvLine.findFirstMatchIn(_))
                  .filter(e => e.group(2).nonEmpty && !e.group(2).startsWith("\""))
                  .map(e => e.group(1) -> e.group(2).trim))
            case "globals" =>
              cfg = cfg.copy(globalsJson = globalsToJson(lines.slice(start, end)))
            case "xsd" =>
              val xs = entry.findAllMatchIn(body).map(e => e.group(1) -> e.group(2)).toMap ++
                // bare (unquoted) file values: name: order.xsd
                lines.slice(start, end).flatMap(kvLine.findFirstMatchIn(_))
                  .filter(e => e.group(2).nonEmpty && !e.group(2).startsWith("\""))
                  .map(e => e.group(1) -> e.group(2).trim)
              val compiled = xs.map { case (name, file) =>
                val p = baseDir.fold(java.nio.file.Paths.get(file))(_.resolve(file))
                if (!Files.exists(p)) return Left(s"xsd $name: no such file: $file")
                name -> graft.expressions.XsdCompiler.compile(
                  new String(Files.readAllBytes(p), java.nio.charset.StandardCharsets.UTF_8))
              }
              cfg = cfg.copy(xsds = compiled)
            case "auth" =>
              if (!body.contains("basic:"))
                return Left("unsupported auth config (CLI supports auth.basic; " +
                  "OAuth2 flavors live on the streaming HTTP source)")
              val kv = """(?m)^\s*(username|password):\s*(.+)$""".r
                .findAllMatchIn(body).map(e => e.group(1) -> unquote(e.group(2).trim)).toMap
              (kv.get("username"), kv.get("password")) match {
                case (Some(u), Some(p)) => cfg = cfg.copy(basicAuth = Some((u, p)))
                case _ => return Left("auth.basic needs username and password")
              }
            case "interval" | "state" | "max_executions" =>
              // driver-loop knobs the reference accepts; harmless to skip
              ()
            case other => return Left(s"unsupported cfg section: $other")
          }
          i = end
      }
    }
    Right(cfg)
  }

  /** Strip matching surrounding double quotes (YAML quoted scalar). */
  private def unquote(t: String): String =
    if (t.length >= 2 && t.head == '"' && t.last == '"') t.substring(1, t.length - 1)
    else t

  private def jsonQuote(t: String): String =
    "\"" + t.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  /** globals: section -> JSON object (scalars, inline lists, one nested
    * map level — the reference types these reflectively,
    * lib/globals.go:85-100). */
  private def globalsToJson(lines: Vector[String]): String = {
    def scalar(v: String): String = {
      val t = v.trim
      if (t.startsWith("[")) t
      else if (t.startsWith("\"")) jsonQuote(unquote(t)) // re-escape safely
      else if (t == "true" || t == "false") t
      else if (t.matches("-?\\d+(\\.\\d+)?")) t
      else jsonQuote(t)
    }
    val content = lines.filter(_.trim.nonEmpty)
    val entries = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < content.length) {
      val l = content(i)
      val indent = l.takeWhile(_ == ' ').length
      val Array(k, rest @ _*) = l.trim.split(":", 2)
      val value = rest.headOption.getOrElse("").trim
      if (value.nonEmpty) { entries += s"${jsonQuote(unquote(k))}: ${scalar(value)}"; i += 1 }
      else {
        val nested = scala.collection.mutable.ArrayBuffer.empty[String]
        i += 1
        while (i < content.length && content(i).takeWhile(_ == ' ').length > indent) {
          val Array(nk, nrest @ _*) = content(i).trim.split(":", 2)
          nested += s"${jsonQuote(unquote(nk))}: ${scalar(nrest.headOption.getOrElse("").trim)}"
          i += 1
        }
        entries += s"${jsonQuote(unquote(k))}: {${nested.mkString(",")}}"
      }
    }
    "{" + entries.mkString(",") + "}"
  }
}
