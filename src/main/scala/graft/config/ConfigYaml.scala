package graft.config

import scala.collection.mutable

/** YAML front-end for [[PipelineConfig]] — the engine's "parser" stage
  * (SURVEY §3: `CONSUMER_CONFIG` env YAML → typed config → plan).
  *
  * Implements the YAML subset the reference's configs actually use
  * (`/root/reference/README.md:74-169`): nested maps by 2-space indentation,
  * lists of scalars, lists of flat maps (`- key: value` blocks), `#` comments,
  * quoted scalars. Zero dependencies by design (this build resolves nothing
  * beyond Spark + scalatest); a full YAML engine would accept documents this
  * schema must reject anyway.
  *
  * Field names, aliases and defaults mirror the reference's pydantic models
  * (`/root/reference/src/config.py:44-117`), including the reference's own
  * `keypath-seperator` spelling. `custom-config` (Python `eval`,
  * `/root/reference/src/base.py:35-42`) maps to the whitelisted
  * [[ColumnTypeOverride]]: only `oracledb.Cursor.setinputsizes` entries with
  * known type names are accepted — anything else fails validation instead of
  * evaluating.
  */
object ConfigYaml {

  final case class ParseError(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------------ lexer
  private final case class Line(indent: Int, text: String)

  private def lines(src: String): List[Line] =
    src.linesIterator.map { raw =>
      val noComment = stripComment(raw)
      val t = noComment.dropWhile(_ == ' ')
      Line(noComment.length - t.length, t.trim)
    }.filter(_.text.nonEmpty).toList

  private def stripComment(s: String): String = {
    var inS = false; var inD = false
    val out = new StringBuilder
    var i = 0
    var break = false
    while (i < s.length && !break) {
      val c = s.charAt(i)
      if (c == '\'' && !inD) inS = !inS
      else if (c == '"' && !inS) inD = !inD
      if (c == '#' && !inS && !inD && (i == 0 || s.charAt(i - 1).isWhitespace)) break = true
      else { out.append(c); i += 1 }
    }
    out.toString
  }

  private def unquote(v: String): String = {
    val t = v.trim
    if (t.length >= 2 && ((t.head == '"' && t.last == '"') || (t.head == '\'' && t.last == '\'')))
      t.substring(1, t.length - 1)
    else t
  }

  // ----------------------------------------------------------------- parser
  /** Parse a block of lines (all at indent >= `indent`) into a Map or List. */
  private def parseBlock(ls: List[Line]): Any = {
    if (ls.isEmpty) return Map.empty[String, Any]
    val base = ls.head.indent
    if (ls.head.text.startsWith("- ") || ls.head.text == "-") parseList(ls, base)
    else parseMap(ls, base)
  }

  private def parseMap(ls: List[Line], indent: Int): Map[String, Any] = {
    val out = mutable.LinkedHashMap.empty[String, Any]
    var rest = ls
    while (rest.nonEmpty) {
      val l = rest.head
      if (l.indent != indent) throw ParseError(s"bad indentation at: '${l.text}'")
      val idx = l.text.indexOf(':')
      if (idx < 0) throw ParseError(s"expected 'key: value' at: '${l.text}'")
      val key = unquote(l.text.substring(0, idx))
      val inline = l.text.substring(idx + 1).trim
      rest = rest.tail
      val (children, remain) = rest.span(_.indent > indent)
      rest = remain
      if (inline.nonEmpty) {
        if (children.nonEmpty) throw ParseError(s"value and nested block for key '$key'")
        out(key) = unquote(inline)
      } else if (children.nonEmpty) {
        out(key) = parseBlock(children)
      } else if (rest.nonEmpty && rest.head.indent == indent && rest.head.text.startsWith("- ")) {
        // list items at the SAME indent as their key (valid YAML, used in the
        // reference's message-filters example)
        val (items, remain2) = rest.span(l2 => l2.indent >= indent && (l2.text.startsWith("- ") || l2.indent > indent))
        rest = remain2
        out(key) = parseList(items, indent)
      } else out(key) = ""
    }
    out.toMap
  }

  private def parseList(ls: List[Line], indent: Int): List[Any] = {
    val out = mutable.ListBuffer.empty[Any]
    var rest = ls
    while (rest.nonEmpty) {
      val l = rest.head
      if (l.indent != indent || !l.text.startsWith("-"))
        throw ParseError(s"expected list item at: '${l.text}'")
      val head = l.text.drop(1).trim
      rest = rest.tail
      val (children, remain) = rest.span(_.indent > indent)
      rest = remain
      if (head.isEmpty) out += parseBlock(children)
      else if (head.contains(":")) {
        // '- key: value' — fold the item head into the child map block
        val virtualHead = Line(indent + 2, head)
        out += parseBlock(virtualHead :: children.map(c => Line(c.indent, c.text)))
      } else {
        if (children.nonEmpty) throw ParseError(s"scalar list item with children: '$head'")
        out += unquote(head)
      }
    }
    out.toList
  }

  def parseTree(src: String): Map[String, Any] = parseBlock(lines(src)) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw ParseError(s"top level must be a map, got $other")
  }

  // ------------------------------------------------------------- typed view
  private def str(m: Map[String, Any], k: String): Option[String] =
    m.get(k).map(_.toString)
  private def sub(m: Map[String, Any], k: String): Option[Map[String, Any]] =
    m.get(k).map {
      case mm: Map[_, _] => mm.asInstanceOf[Map[String, Any]]
      case other => throw ParseError(s"'$k' must be a map, got: $other")
    }
  private def seqOf(m: Map[String, Any], k: String): Seq[Any] =
    m.get(k).map {
      case l: List[_] => l
      case other => throw ParseError(s"'$k' must be a list, got: $other")
    }.getOrElse(Nil)

  /** Whitelisted `custom-config` translation (NO eval): oracledb type names →
    * JDBC column type DDL.
    */
  private val bindTypeWhitelist = Map(
    "oracledb.TIMESTAMP" -> "TIMESTAMP",
    "oracledb.DB_TYPE_TIMESTAMP" -> "TIMESTAMP",
    "oracledb.DB_TYPE_CLOB" -> "CLOB",
    "oracledb.DB_TYPE_BLOB" -> "BLOB",
    "oracledb.NUMBER" -> "NUMBER(38)",
    "oracledb.DB_TYPE_NVARCHAR" -> "NVARCHAR2(2000)")

  def fromYaml(src: String): PipelineConfig = {
    val root = parseTree(src)
    val s = sub(root, "source").getOrElse(throw ParseError("missing 'source' section"))
    val t = sub(root, "target").getOrElse(throw ParseError("missing 'target' section"))

    val source = SourceConfig(
      topic = str(s, "topic").getOrElse(throw ParseError("source.topic is required")),
      batchSize = str(s, "batch-size").map(_.toInt).getOrElse(5000),
      schemaMode = str(s, "schema").map(SchemaMode.parse).getOrElse(SchemaMode.Json),
      keyDecoder = str(s, "key-deserializer").map(KeyDecoder.parse).getOrElse(KeyDecoder.Utf8),
      strategy = str(s, "strategy") match {
        case Some("subscribe") => ConsumerStrategy.Subscribe
        case Some("assign") | None => ConsumerStrategy.Assign
        case Some(other) => throw ParseError(s"unknown strategy: $other")
      },
      groupId = str(s, "group-id").getOrElse("graft"),
      keypathSeparator = str(s, "keypath-seperator").orElse(str(s, "keypath-separator")).getOrElse("."),
      messageFieldsFilter = seqOf(s, "message-fields-filter").map(_.toString),
      flagFieldConfig = seqOf(s, "flag-field-config").map(_.toString),
      messageFilters = seqOf(s, "message-filters").map {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          MessageFilter(
            str(mm, "key").getOrElse(throw ParseError("message-filter needs 'key'")),
            str(mm, "allowed_value").getOrElse(throw ParseError("message-filter needs 'allowed_value'")))
        case other => throw ParseError(s"message-filters entries must be maps, got: $other")
      },
      pollTimeoutSec = str(s, "poll-timeout").map(_.toInt).getOrElse(10),
      schemaRegistryUrl = str(s, "schema-registry-url"))

    val target = TargetConfig(
      table = str(t, "table").getOrElse(throw ParseError("target.table is required")),
      skipDuplicatesWith = seqOf(t, "skip-duplicates-with").map(_.toString),
      k6Filter = sub(t, "k6-filter").map { k6 =>
        K6FilterConfig(
          filterTable = str(k6, "filter-table").getOrElse(throw ParseError("k6-filter.filter-table is required")),
          filterCol = str(k6, "filter-col").getOrElse(throw ParseError("k6-filter.filter-col is required")),
          col = str(k6, "col").getOrElse(throw ParseError("k6-filter.col is required")),
          timestamp = str(k6, "timestamp").getOrElse("kafka_timestamp"),
          colKeypathSeparator = str(k6, "col-keypath-separator").getOrElse("."))
      },
      delta = sub(t, "delta").map { d =>
        DeltaConfig(
          deltaTable = str(d, "table").getOrElse(throw ParseError("delta.table is required")),
          deltaColumn = str(d, "column").getOrElse(throw ParseError("delta.column is required")))
      },
      columnTypes = seqOf(t, "custom-config").map {
        case m: Map[_, _] =>
          val mm = m.asInstanceOf[Map[String, Any]]
          val method = str(mm, "method").getOrElse("")
          if (method != "oracledb.Cursor.setinputsizes")
            throw ParseError(s"custom-config method not whitelisted: '$method'")
          val value = str(mm, "value").getOrElse("")
          val sqlType = bindTypeWhitelist.getOrElse(value,
            throw ParseError(s"custom-config value not whitelisted: '$value'"))
          ColumnTypeOverride(
            column = str(mm, "name").getOrElse(throw ParseError("custom-config needs 'name'")),
            sqlType = sqlType)
        case other => throw ParseError(s"custom-config entries must be maps, got: $other")
      })

    val transform = seqOf(root, "transform").map {
      case m: Map[_, _] =>
        val mm = m.asInstanceOf[Map[String, Any]]
        TransformRule(
          src = str(mm, "src").getOrElse(throw ParseError("transform rule needs 'src'")),
          dst = str(mm, "dst").getOrElse(throw ParseError("transform rule needs 'dst'")),
          fun = str(mm, "fun"),
          allowUndefined = str(mm, "allow_undefined").exists(v => v == "true" || v == "True"))
      case other => throw ParseError(s"transform entries must be maps, got: $other")
    }

    // Embedded curation chain: the full training-data stage battery over
    // the table this consumer lands; `input` defaults to the sink table so
    // one document describes the whole source → sink → curate lifecycle.
    val curate = sub(root, "curate")
      .map(c => CurateConfig.fromTree(c, defaultInput = Some(target.table)))

    PipelineConfig(source, target, transform, curate).validated
  }
}
