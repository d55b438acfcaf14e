package graft

import graft.operators.{Relational, TextAnalysis}

/** pr01 plan-budget regression tests: pin the plan SHAPE of flagship
  * operators — exchange ceilings and broadcast floors — so a silent
  * strategy degradation fails the suite at test scale instead of
  * costing 100× at cluster scale. Budgets are ceilings with headroom
  * (AQE/stats changes may move a plan by one node), not exact pins. */
class PlanBudgetSpec extends GraftSpec {

  test("q01 aggregation: one shuffle, fully codegen'd") {
    // shape budget from the static plan (the final adaptive plan
    // re-lists exchanges per stage); codegen from the executed one
    val df = Relational.q01(Tables.lineitem(spark, SF))
    val shape = PlanReport.analyze(df)
    assert(shape.exchanges <= 2, shape) // partial agg -> one exchange (+sort)
    assert(shape.sortMergeJoins == 0, shape)
    val ran = PlanReport.analyze(df, execute = true)
    assert(ran.codegenSpans >= 1, ran)  // final adaptive plan is codegen'd
  }

  test("q05 six-table join keeps every dimension broadcast") {
    val df = Relational.q05(Tables.region(spark, SF), Tables.nation(spark, SF),
      Tables.customer(spark, SF), Tables.orders(spark, SF),
      Tables.lineitem(spark, SF), Tables.supplier(spark, SF))
    val r = PlanReport.analyze(df)
    // the whole dimension chain must stay broadcast — a sort-merge
    // join sneaking in means the fact table gets shuffled repeatedly
    assert(r.broadcastJoins >= 3, r)
    assert(r.sortMergeJoins <= 2, r)
  }

  test("q160 entropy: the (doc, tok) count is the only data-sized shuffle class") {
    val r = PlanReport.analyze(TextAnalysis.q160(Tables.documents(spark, SF)))
    assert(r.exchanges <= 4, r) // tok-count, doc-agg, final order
  }

  test("q169 semantic decontam: the benchmark side must stay broadcast") {
    import org.apache.spark.sql.functions.col
    val e = Tables.embeddings(spark, SF)
    val r = PlanReport.analyze(graft.operators.Similarity.q169(
      e.filter(col("vec_id") >= 10), e.filter(col("vec_id") < 10)))
    // the benchmark rides a broadcast exchange into a nested-loop
    // join (no equi-key); a sort-merge join here would shuffle the
    // corpus per query batch
    assert(r.broadcastExchanges >= 1, r)
    assert(r.sortMergeJoins == 0, r)
  }

  test("q116 BM25: query terms and df stats ride broadcast joins") {
    import spark.implicits._
    val r = PlanReport.analyze(graft.operators.TextAnalysis.q116(
      Tables.documents(spark, SF),
      Oracles.Bm25Queries.toDF("query_id", "terms")))
    assert(r.broadcastJoins >= 2, r)
  }

  test("q48 quality scoring is shuffle-free up to the output sort") {
    val r = PlanReport.analyze(TextAnalysis.q48(Tables.documents(spark, SF)))
    assert(r.exchanges <= 1, r) // only the orderBy range exchange
    assert(r.sortMergeJoins == 0 && r.broadcastJoins == 0, r)
  }
}
