package graft

import org.apache.spark.sql.SparkSession

/** The spark.sql.extensions entry point must make the native functions
  * available to a pure-SQL session (no Scala registration calls).
  */
class ExtensionsSpec extends SparkSpec {

  test("graft.GraftExtensions registers the native functions for SQL use") {
    val prev = spark // ensure the shared context exists first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // new SparkSession over the SAME SparkContext, with extensions applied
      // (the spark.sql.extensions STATIC conf only takes effect on a fresh
      // SparkContext — spark-submit's case; withExtensions exercises the
      // identical injection path in-process)
      val s = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        """SELECT graft_cosine_sim(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c,
          |       graft_md5_prefix('abc', 7) AS h""".stripMargin).head()
      assert(row.getDouble(0) === 1.0)
      // substr(md5('abc'), 1, 7) = "9001509" (md5 'abc' = 900150983cd24fb0...)
      assert(row.getLong(1) === java.lang.Long.parseLong("9001509", 16))
      // codegen path too, not just eval
      assert(s.sql("SELECT graft_md5_prefix(cast(id AS string), 5) FROM range(10)")
        .collect().length == 10)
      // round-6 registrations: simhash + set-intersect size
      val r6 = s.sql(
        """SELECT graft_simhash('a b c') AS sh,
          |       graft_set_intersect_size(array(1L, 2L, 3L), array(2L, 3L, 9L)) AS i
          |""".stripMargin).head()
      assert(r6.getLong(0) != 0L)
      assert(r6.getInt(1) === 2)
      // round-10 registrations: word n-grams, token counters, shingle set
      val r10 = s.sql(
        """SELECT size(graft_word_ngrams('a b c d e f', 5)) AS ng,
          |       graft_token_counts('ab cd!').n_ws_tokens AS ws,
          |       size(graft_shingle_set('abcdef', 5)) AS sh
          |""".stripMargin).head()
      assert(r10.getInt(0) === 2)  // two distinct word 5-grams
      assert(r10.getInt(1) === 2)
      assert(r10.getInt(2) === 2)  // 'abcde', 'bcdef'
    } finally {
      SparkSession.setDefaultSession(prev)
      SparkSession.setActiveSession(prev)
    }
  }
}
