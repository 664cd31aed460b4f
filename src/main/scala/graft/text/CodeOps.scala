package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Code-corpus curation layer — the source-code lane of a training-data
  * pipeline (the StarCoder/CodeParrot-class preprocessing stages:
  * language identification, license screening, comment-density quality
  * signals). Same design rules as the rest of the text package: pure
  * RE2-portable Catalyst expressions, zero UDFs, map-only — a 100 TB
  * code lane is scan → per-row expressions → whatever aggregate the
  * caller adds.
  *
  * Everything here is deliberately oracle-replayable: extension and
  * license tables are fixed public knowledge (SPDX identifiers), the
  * shebang grammar is POSIX, and the comment-line classes are literal
  * prefixes — no model, no heuristics that drift.
  */
object CodeOps {

  /** (extension → language) for the common corpus languages — the
    * path-based fast path every code pipeline runs before any
    * content-based classifier. Public-knowledge mapping, shared with
    * the oracle. */
  val ExtensionLanguages: Seq[(String, String)] = Seq(
    "py" -> "python", "js" -> "javascript", "ts" -> "typescript",
    "java" -> "java", "c" -> "c", "h" -> "c", "cc" -> "cpp",
    "cpp" -> "cpp", "hpp" -> "cpp", "cs" -> "csharp", "go" -> "go",
    "rs" -> "rust", "rb" -> "ruby", "php" -> "php", "scala" -> "scala",
    "kt" -> "kotlin", "swift" -> "swift", "sh" -> "shell",
    "bash" -> "shell", "pl" -> "perl", "r" -> "r", "sql" -> "sql",
    "html" -> "html", "css" -> "css", "json" -> "json",
    "yaml" -> "yaml", "yml" -> "yaml", "md" -> "markdown")

  /** Language from a file path's extension (lowercased; NULL when the
    * extension is unknown or absent). */
  def languageFromPath(path: Column): Column = {
    val ext = lower(regexp_extract(path, "\\.([A-Za-z0-9]+)$", 1))
    ExtensionLanguages.foldLeft(lit(null).cast("string")) {
      case (acc, (e, lang)) => when(ext === e, lit(lang)).otherwise(acc)
    }
  }

  /** Interpreter named by a POSIX `#!` first line (NULL when none):
    * the basename of the interpreter path, except `env X` resolves to
    * X (`#!/usr/bin/env python3` → `python3`). */
  def shebangInterpreter(text: Column): Column = {
    val line = regexp_extract(text, "^#!([^\\n]*)", 1)
    val viaEnv =
      regexp_extract(line, "^\\s*\\S*/env\\s+(\\S+)", 1)
    val tok = regexp_extract(line, "^\\s*(\\S+)", 1)
    val direct = regexp_extract(tok, "([^/]+)$", 1)
    when(line === "" || trim(line) === "", lit(null).cast("string"))
      .when(viaEnv =!= "", viaEnv)
      .otherwise(direct)
  }

  /** (detection regex [RE2-portable, case-insensitive] → SPDX id) for
    * the license families a corpus must screen — permissive-only
    * training sets gate on exactly this signal. Explicit
    * `SPDX-License-Identifier:` tags win over prose matches, and
    * longer tag variants sit ABOVE their prefixes (MIT-0 above MIT,
    * `-or-later`/`-only` above the bare GPL ids) so first-match-wins
    * resolves each tag to its exact id. Prose matches return
    * FAMILY-level ids on purpose: the GPL/LGPL preamble phrasing is
    * shared across 2.0/2.1/3.0 and the BSD clause text across
    * 2/3-clause, so a prose hit asserts only `GPL`, `LGPL`, `MIT`
    * (MIT-0 shares the grant sentence), `Apache-2.0` (its prose names
    * the version), or `BSD-3-Clause` (clause-3 text) — a
    * permissive-only gate excludes the whole family either way. */
  val LicensePatterns: Seq[(String, String)] = Seq(
    "(?i)SPDX-License-Identifier:\\s*Apache-2\\.0" -> "Apache-2.0",
    "(?i)SPDX-License-Identifier:\\s*MIT-0" -> "MIT-0",
    "(?i)SPDX-License-Identifier:\\s*MIT\\b" -> "MIT",
    "(?i)SPDX-License-Identifier:\\s*GPL-3\\.0-or-later"
      -> "GPL-3.0-or-later",
    "(?i)SPDX-License-Identifier:\\s*GPL-3\\.0-only" -> "GPL-3.0-only",
    "(?i)SPDX-License-Identifier:\\s*GPL-3\\.0" -> "GPL-3.0",
    "(?i)SPDX-License-Identifier:\\s*GPL-2\\.0-or-later"
      -> "GPL-2.0-or-later",
    "(?i)SPDX-License-Identifier:\\s*GPL-2\\.0-only" -> "GPL-2.0-only",
    "(?i)SPDX-License-Identifier:\\s*GPL-2\\.0" -> "GPL-2.0",
    "(?i)SPDX-License-Identifier:\\s*LGPL-3\\.0-or-later"
      -> "LGPL-3.0-or-later",
    "(?i)SPDX-License-Identifier:\\s*LGPL-3\\.0-only" -> "LGPL-3.0-only",
    "(?i)SPDX-License-Identifier:\\s*LGPL-3\\.0" -> "LGPL-3.0",
    "(?i)SPDX-License-Identifier:\\s*LGPL-2\\.1-or-later"
      -> "LGPL-2.1-or-later",
    "(?i)SPDX-License-Identifier:\\s*LGPL-2\\.1-only" -> "LGPL-2.1-only",
    "(?i)SPDX-License-Identifier:\\s*LGPL-2\\.1" -> "LGPL-2.1",
    "(?i)SPDX-License-Identifier:\\s*BSD-3-Clause" -> "BSD-3-Clause",
    "(?i)SPDX-License-Identifier:\\s*BSD-2-Clause" -> "BSD-2-Clause",
    "(?i)Licensed under the Apache License,? Version 2\\.0"
      -> "Apache-2.0",
    "(?i)Permission is hereby granted, free of charge" -> "MIT",
    "(?i)GNU Lesser General Public License" -> "LGPL",
    "(?i)GNU General Public License" -> "GPL",
    "(?i)Redistribution and use in source and binary forms"
      -> "BSD-3-Clause")

  /** SPDX id (or prose-match FAMILY id — see [[LicensePatterns]]) of
    * the first matching license pattern in the document's leading
    * `headChars` characters (NULL = no recognized license — which a
    * permissive-only pipeline treats as "exclude", not "free"). First
    * match in [[LicensePatterns]] order wins, so the explicit SPDX tag
    * beats prose and longer tags beat their prefixes. */
  def licenseId(text: Column, headChars: Int = 1500): Column = {
    val head = substring(text, 1, headChars)
    LicensePatterns.reverse.foldLeft(lit(null).cast("string")) {
      case (acc, (re, spdx)) =>
        when(head.rlike(re), lit(spdx)).otherwise(acc)
    }
  }

  /** Fraction of non-blank lines that are line comments (`//`, `#`,
    * `--`, or block-comment delimiters `/*` `*` `*/`), 6-dp rounded —
    * the code-quality twin of the prose stopword ratio: near-0 often
    * means minified/generated code, near-1 means license boilerplate
    * or commented-out graveyards; both are exclusion signals. 0.0 for
    * empty documents. */
  def commentLineRatio(text: Column): Column = {
    val lines = filter(split(text, "\n"), l => trim(l) =!= "")
    val comments = filter(lines, l =>
      trim(l).rlike("^(//|#|--|/\\*|\\*)"))
    when(size(lines) === 0, lit(0.0))
      .otherwise(round(
        size(comments).cast("double") / size(lines).cast("double"), 6))
  }
}
