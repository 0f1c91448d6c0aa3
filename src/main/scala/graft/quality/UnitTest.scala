package graft.quality

import org.apache.spark.sql.DataFrame

/** dbt unit tests (dbt-core 1.8): run a MODEL — a function of its
  * ref/source inputs — against literal FIXTURE frames instead of real
  * tables, and diff the output against expected rows. The comparison is
  * a row MULTISET diff (dbt compares row sets with duplicates counted):
  * `missing` = expected rows the model failed to produce, `unexpected` =
  * produced rows not in the expectation, both via exceptAll so duplicate
  * cardinality mismatches surface instead of cancelling.
  *
  * The model is typed as `Map[inputName, DataFrame] => DataFrame` — the
  * same shape as the user-model materialization (SURVEY §2.1 S8), so a
  * production model runs under test by passing fixtures where it
  * normally receives catalog reads. Fixtures are tiny by construction;
  * the diff is two exceptAll plans over them — metadata-scale work.
  */
object UnitTest {

  /** A unit-test outcome: the two diff directions (empty = clean) and
    * the verdict. `missing`/`unexpected` are lazy plans — collect or
    * count only what the report needs.
    */
  final case class Result(missing: DataFrame, unexpected: DataFrame) {
    def passed: Boolean = missing.isEmpty && unexpected.isEmpty
  }

  def run(model: Map[String, DataFrame] => DataFrame,
      fixtures: Map[String, DataFrame], expected: DataFrame): Result = {
    val got = model(fixtures)
    require(got.columns.sorted.sameElements(expected.columns.sorted),
      s"unit test schema mismatch: model produced " +
        s"[${got.columns.mkString(", ")}], expected " +
        s"[${expected.columns.mkString(", ")}]")
    // Column order must not affect the diff — align to the expected order.
    val aligned = got.select(expected.columns.map(org.apache.spark.sql
      .functions.col).toIndexedSeq: _*)
    Result(missing = expected.exceptAll(aligned),
      unexpected = aligned.exceptAll(expected))
  }
}
