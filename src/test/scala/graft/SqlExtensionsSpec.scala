package graft

/** graft_* SQL functions registered via SparkSessionExtensions. */
class SqlExtensionsSpec extends SparkSuite {

  test("graft SQL functions are callable from spark.sql") {
    val r = spark.sql(
      """SELECT graft_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |  round(graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c,
        |  graft_simhash64(array('a', 'b', 'a')) AS sh,
        |  size(graft_shingle_hashes('abcdef', 3)) AS nsh,
        |  size(graft_minhash(graft_shingle_hashes('abcdef', 3), 16)) AS k,
        |  graft_text_stats('hello world').ws_tokens AS wt""".stripMargin)
      .collect()(0)
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 1.0)
    assert(r.getLong(2) !== 0L)
    assert(r.getInt(3) === 4)
    assert(r.getInt(4) === 16)
    assert(r.getInt(5) === 2)
  }

  test("selection/curation functions are callable from spark.sql") {
    val r = spark.sql(
      """SELECT graft_md5long('abc') AS h,
        |  graft_hash_uniform('7', 42) AS u,
        |  graft_redact_pii('mail a@b.co now') AS red""".stripMargin)
      .collect()(0)
    // pinned md5-derived value (first 8 md5 bytes of 'abc', big-endian)
    assert(r.getLong(0) === java.lang.Long.parseUnsignedLong(
      "900150983cd24fb0", 16))
    assert(r.getDouble(1) >= 0.0 && r.getDouble(1) < 1.0)
    assert(r.getString(2) === "mail <PII> now")
    // the SQL uniform replays the Scala API's value exactly
    import org.apache.spark.sql.functions.lit
    val apiU = spark.range(1)
      .select(graft.operators.Sampling.hashUniform(lit("7"), 42L))
      .collect()(0).getDouble(0)
    assert(r.getDouble(1) === apiU)
  }

  test("graft_nfc composes from SQL and equals the Scala API") {
    // NB: Spark SQL chr() wraps mod 256, so the combining acute must be
    // a \u escape in the literal, not chr(769)
    val r = spark.sql(
      "SELECT graft_nfc('e\\u0301') AS c, " +
        "length(graft_nfc('e\\u0301')) AS n, " +
        "graft_nfc(NULL) AS z").collect()(0)
    assert(r.getString(0) === "\u00e9") // precomposed e-acute
    assert(r.getInt(1) === 1)
    assert(r.isNullAt(2))
    import org.apache.spark.sql.functions.lit
    val api = spark.range(1).select(
      graft.functions.NormalizeExpression.nfcNormalize(lit("e\u0301")))
      .collect()(0).getString(0)
    assert(api === r.getString(0))
  }

  test("non-literal int parameter is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_minhash(array(1L), cast(rand()*4 as int))")
        .collect()
    }
    assert(e.getMessage.contains("integer literal"))
  }
}
