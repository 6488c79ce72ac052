package graft.shelf

/** Generic JSON-schema validation of shelf documents, run against the
  * reference's four schema files embedded VERBATIM below — closing the
  * one declared parity gap of the behavioral-twin approach: a
  * hand-edited shelf.yaml / sidecar now fails with schema-keyed errors
  * (`(required)`, `(pattern)`, `(type)`, `(additionalProperties)`,
  * `(enum)`, `(maxItems)`), and a new constraint is a JSON edit, not a
  * re-code.
  *
  * The walker implements exactly the draft-07 subset the four schemas
  * use: type / properties / patternProperties / required /
  * additionalProperties / enum / pattern / items / minItems / maxItems.
  * Two keywords are deliberately NOT asserted, for behavioral parity
  * with the reference's validator (jsonschema without a format
  * checker): `format` (draft-07 formats are annotations by default) and
  * the reference's `$oneOf` (a non-standard spelling of `oneOf` —
  * draft-07 ignores unknown keywords, so the reference never enforces
  * those branches either; see schemas.py:14-17 + snapshot-v1:69-76).
  *
  * Schema `pattern`s are ECMA-262; the one incompatibility in these
  * four files is a literal `[` inside a character class (the URL
  * patterns), which Java reads as a nested-class open — fixed up by
  * escaping it at compile time, with identical match semantics.
  */
object Schemas {

  /** ECMA-262 -> java.util.regex: escape a literal `[` inside a
    * character class. Everything else in the embedded schemas' patterns
    * (including the `[a-z-Z0-9-_]` oddity, measured) matches
    * identically under both engines.
    */
  private[graft] def ecmaToJava(p: String): String = {
    val sb = new StringBuilder
    var inClass = false
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      if (c == '\\' && i + 1 < p.length) {
        sb.append(c).append(p.charAt(i + 1)); i += 2
      } else {
        if (c == '[' && inClass) sb.append("\\[")
        else {
          if (c == '[') inClass = true
          if (c == ']') inClass = false
          sb.append(c)
        }
        i += 1
      }
    }
    sb.toString
  }

  private val patternCache = scala.collection.concurrent
    .TrieMap[String, java.util.regex.Pattern]()
  private def regex(p: String): java.util.regex.Pattern =
    patternCache.getOrElseUpdate(p,
      java.util.regex.Pattern.compile(ecmaToJava(p)))

  private def typeName(v: Any): String = v match {
    case null            => "null"
    case _: Map[_, _]    => "object"
    case _: Seq[_]       => "array"
    case _: String       => "string"
    case _: Int | _: Long | _: java.math.BigInteger => "integer"
    case _: Double | _: Float | _: java.math.BigDecimal => "number"
    case _: Boolean      => "boolean"
    case other           => other.getClass.getSimpleName
  }

  private def isType(v: Any, t: String): Boolean = t match {
    case "object"  => v.isInstanceOf[Map[_, _]]
    case "array"   => v.isInstanceOf[Seq[_]]
    case "string"  => v.isInstanceOf[String]
    case "integer" => v.isInstanceOf[Int] || v.isInstanceOf[Long] ||
      v.isInstanceOf[java.math.BigInteger]
    case "number"  => isType(v, "integer") || v.isInstanceOf[Double] ||
      v.isInstanceOf[Float] || v.isInstanceOf[java.math.BigDecimal]
    case "boolean" => v.isInstanceOf[Boolean]
    case "null"    => v == null
    case _         => true // unknown type names assert nothing (draft-07)
  }

  private def subSchema(v: Any): Option[Map[String, Any]] = v match {
    case m: Map[_, _] => Some(m.asInstanceOf[Map[String, Any]])
    case _            => None
  }

  /** Validate `doc` against `schema`; returns violations, each keyed
    * with the schema rule name. `allowExtra` whitelists TOP-LEVEL
    * properties beyond the schema under additionalProperties:false —
    * the documented extension hook for repo-only sidecar fields (the
    * `execution` runtime block, inherited `description`).
    */
  def validate(doc: Any, schema: Map[String, Any], where: String = "$",
               allowExtra: Set[String] = Set.empty): Seq[String] = {
    val errs = Seq.newBuilder[String]
    schema.get("type").collect { case t: String => t }.foreach { t =>
      if (!isType(doc, t))
        errs += s"$where: expected $t, got ${typeName(doc)} (type)"
    }
    schema.get("enum").collect { case vs: Seq[_] => vs }.foreach { vs =>
      if (!vs.contains(doc))
        errs += s"$where: value '$doc' is not one of " +
          vs.mkString("[", ", ", "]") + " (enum)"
    }
    doc match {
      case s: String =>
        schema.get("pattern").collect { case p: String => p }.foreach { p =>
          if (!regex(p).matcher(s).find())
            errs += s"$where: '$s' does not match '$p' (pattern)"
        }
      case xs: Seq[_] =>
        schema.get("minItems").collect { case n: Int => n }.foreach { n =>
          if (xs.size < n) errs += s"$where: ${xs.size} items < $n (minItems)"
        }
        schema.get("maxItems").collect { case n: Int => n }.foreach { n =>
          if (xs.size > n) errs += s"$where: ${xs.size} items > $n (maxItems)"
        }
        schema.get("items").flatMap(subSchema).foreach { sub =>
          xs.zipWithIndex.foreach { case (x, i) =>
            errs ++= validate(x, sub, s"$where[$i]")
          }
        }
      case obj: Map[_, _] =>
        val om = obj.asInstanceOf[Map[String, Any]]
        schema.get("required").collect { case r: Seq[_] => r }
          .foreach(_.foreach { k =>
            if (!om.contains(k.toString))
              errs += s"$where: required property '$k' is missing (required)"
          })
        val props = schema.get("properties").flatMap(subSchema)
          .getOrElse(Map.empty)
        val patProps = schema.get("patternProperties").flatMap(subSchema)
          .getOrElse(Map.empty)
        val strict = schema.get("additionalProperties").contains(false)
        om.foreach { case (k, v) =>
          val direct = props.get(k).flatMap(subSchema)
          direct.foreach(s => errs ++= validate(v, s, s"$where.$k"))
          val matched = patProps.filter { case (p, _) =>
            regex(p).matcher(k).find()
          }
          matched.values.flatMap(subSchema(_))
            .foreach(s => errs ++= validate(v, s, s"$where.$k"))
          if (strict && direct.isEmpty && matched.isEmpty &&
              !allowExtra.contains(k))
            errs += s"$where: unexpected property '$k' (additionalProperties)"
        }
      case _ =>
    }
    errs.result()
  }

  /** Validate-or-throw, naming the offending file. */
  def ensure(doc: Any, schema: Map[String, Any], file: String,
             allowExtra: Set[String] = Set.empty): Unit = {
    val errs = validate(doc, schema, "$", allowExtra)
    if (errs.nonEmpty) throw new IllegalArgumentException(
      s"$file: schema validation failed:\n" + errs.mkString("\n"))
  }

  /** Drop null-valued fields before validation — the reference prunes
    * missing values the same way (schemas.py validate_snapshot:14-17).
    */
  def pruneNulls(doc: Map[String, Any]): Map[String, Any] =
    doc.filter { case (_, v) => v != null }

  /** Embedded verbatim from
    * /root/reference/src/shelf/schemas/shelf-v1.schema.json. */
  private val shelfV1Text: String = """{
  "$schema": "http://json-schema.org/draft-07/schema#",
  "title": "Shelf config",
  "type": "object",
  "properties": {
    "version": {
      "type": "integer",
      "description": "Version of the shelf config file"
    },
    "data_dir": {
      "type": "string",
      "description": "Directory where the shelf data is stored, relative to this file.",
      "default": "data"
    },
    "steps": {
      "type": "object",
      "description": "List of available steps to run",
      "patternProperties": {
        "^snapshot://": {
          "type": "array",
          "maxItems": 0
        },
        "^table://": {
          "type": "array",
          "minItems": 0,
          "items": {
            "type": "string",
            "$oneOf": [
              {
                "pattern": "^snapshot://[a-z0-9-/]+$"
              },
              {
                "pattern": "^table://[a-z0-9-/]+.(jsonl|csv|feather)$"
              }
            ]
          }
        }
      }
    }
  }
}"""

  lazy val ShelfV1: Map[String, Any] = Yaml.loadString(shelfV1Text)

  /** Embedded verbatim from
    * /root/reference/src/shelf/schemas/snapshot-v1.schema.json. */
  private val snapshotV1Text: String = """{
  "$schema": "http://json-schema.org/draft-07/schema#",
  "title": "Snapshot metadata",
  "type": "object",
  "properties": {
    "version": {
      "type": "integer",
      "description": "Version of the shelf config file"
    },
    "uri": {
      "type": "string",
      "pattern": "^snapshot://[a-z0-9-_/]+$"
    },
    "checksum": {
      "type": "string",
      "pattern": "^[a-f0-9]{64}$"
    },
    "snapshot_type": {
      "type": "string",
      "enum": ["file", "directory"]
    },
    "extension": {
      "type": "string",
      "pattern": "^\\.[a-z0-9]+$"
    },
    "name": {
      "type": "string"
    },
    "description": {
      "type": "string"
    },
    "source_name": {
      "type": "string"
    },
    "source_url": {
      "type": "string",
      "pattern": "^https?://[A-Za-z0-9-._~:/?#[\\]@!$&'()*+,;=%]+$"
    },
    "date_accessed": {
      "type": "string",
      "format": "date"
    },
    "access_notes": {
      "type": "string"
    },
    "manifest": {
      "type": "object",
      "patternProperties": {
        "^[a-z-Z0-9-_]+$": {
          "type": "string",
          "pattern": "^[a-f0-9]{64}$"
        }
      }
    },
    "license": {
      "type": "string"
    },
    "license_url": {
      "type": "string",
      "pattern": "^https?://[A-Za-z0-9-._~:/?#[\\]@!$&'()*+,;=%]+$"
    }
  },
  "required": ["version", "uri", "checksum"],
  "$oneOf": [
    {
      "required": ["extension"]
    },
    {
      "required": ["manifest"]
    }
  ],
  "additionalProperties": false
}"""

  lazy val SnapshotV1: Map[String, Any] = Yaml.loadString(snapshotV1Text)

  /** Embedded verbatim from
    * /root/reference/src/shelf/schemas/table-v1.schema.json. */
  private val tableV1Text: String = """{
  "$schema": "http://json-schema.org/draft-07/schema#",
  "title": "Table metadata",
  "type": "object",
  "properties": {
    "version": {
      "type": "integer",
      "description": "Version of the shelf config file"
    },
    "uri": {
      "type": "string",
      "pattern": "^table://[a-z0-9-_/]+$"
    },
    "checksum": {
      "type": "string",
      "pattern": "^[a-f0-9]{64}$"
    },
    "extension": {
      "type": "string",
      "pattern": "^\\.[a-z0-9]+$"
    },
    "name": {
      "type": "string"
    },
    "source_name": {
      "type": "string"
    },
    "source_url": {
      "type": "string",
      "pattern": "^https?://[A-Za-z0-9-._~:/?#[\\]@!$&'()*+,;=%]+$"
    },
    "date_accessed": {
      "type": "string",
      "format": "date"
    },
    "access_notes": {
      "type": "string"
    },
    "license": {
      "type": "string"
    },
    "license_url": {
      "type": "string",
      "pattern": "^https?://[A-Za-z0-9-._~:/?#[\\]@!$&'()*+,;=%]+$"
    },
    "input_manifest": {
      "type": "object",
      "patternProperties": {
        "^[a-z0-9-_/]+$": {
          "type": "string",
          "pattern": "^[a-f0-9]{64}$"
        }
      }
    },
    "schema": {
      "type": "object",
      "patternProperties": {
        "^[a-z][a-z0-9_]+$": {
          "type": "string"
        }
      }
    }
  },
  "required": ["version", "uri", "checksum", "input_manifest", "schema"],
  "additionalProperties": false
}"""

  lazy val TableV1: Map[String, Any] = Yaml.loadString(tableV1Text)

  /** Embedded verbatim from
    * /root/reference/src/shelf/schemas/table-config-v1.schema.json. */
  private val tableConfigV1Text: String = """{
  "$schema": "http://json-schema.org/draft-07/schema#",
  "title": "Table metadata configuration spec",
  "type": "object",
  "properties": {
    "inherit": {
      "type": "object",
      "patternProperties": {
        "^(snapshot|table)://[a-z0-9-_/]+$": {
          "type": "object",
          "properties": {
            "fields": {
              "type": "array",
              "items": {
                "type": "string",
                "enum": [
                  "name",
                  "description",
                  "source_name",
                  "source_url",
                  "date_accessed",
                  "access_notes",
                  "license",
                  "license_url"
                ]
              }
            }
          },
          "required": ["fields"]
        }
      }
    },
    "override": {
      "type": "object",
      "properties": {
        "name": { "type": "string" },
        "description": { "type": "string" },
        "source_name": { "type": "string" },
        "source_url": {
          "type": "string",
          "pattern": "^https?://[A-Za-z0-9-._~:/?#[\\]@!$&'()*+,;=%]+$"
        },
        "date_accessed": {
          "type": "string",
          "format": "date"
        },
        "access_notes": { "type": "string" },
        "license": { "type": "string" },
        "license_url": {
          "type": "string",
          "pattern": "^https?://[A-Za-z0-9-._~:/?#[\\]@!$&'()*+,;=%]+$"
        }
      }
    },
    "schema": {
      "type": "object",
      "patternProperties": {
        "^[a-z][a-z0-9_]+$": {
          "type": "string",
          "enum": ["string", "integer", "float", "boolean", "date", "timestamp"]
        }
      }
    },
    "validation": {
      "type": "object",
      "properties": {
        "required_columns": {
          "type": "array",
          "items": { "type": "string" }
        },
        "unique_columns": {
          "type": "array",
          "items": { "type": "string" }
        },
        "not_null": {
          "type": "array",
          "items": { "type": "string" }
        },
        "require_dimension_prefix": {
          "type": "boolean",
          "default": true
        }
      }
    }
  }
}"""

  lazy val TableConfigV1: Map[String, Any] = Yaml.loadString(tableConfigV1Text)
}
