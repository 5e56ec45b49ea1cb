package graft

import org.apache.spark.sql.functions._

/** The native JL kernel ([[graft.functions.JlProjectVec]]) must be
  * bit-identical to the declarative 64-term fold it replaced — the fold IS
  * the cross-engine parity contract with the DuckDB oracle, so any rounding
  * drift here would silently desynchronize sim_jl_project/_distortion.
  */
class JlKernelSpec extends SparkSpec {

  test("kernel coordinates equal the declarative fold bit-for-bit") {
    import graft.similarity.{JlProjection, Similarity}
    Similarity.register(spark)
    val emb = Tables.embeddings(spark, sf)
    val both = emb.select(
      Seq(col("vec_id"), expr("graft_jl_project(embedding)").as("jl")) ++
        (0 until JlProjection.OutDim).map(j =>
          JlProjection.projCol(col("embedding"), j).as(s"ref$j")): _*)
    val rows = both.collect()
    assert(rows.nonEmpty)
    for (r <- rows; j <- 0 until JlProjection.OutDim) {
      val k = r.getSeq[Double](1)(j)
      val d = r.getDouble(2 + j)
      // bit compare, not ==: the contract is exact IEEE equality
      assert(java.lang.Double.doubleToRawLongBits(k) ==
        java.lang.Double.doubleToRawLongBits(d),
        s"vec ${r.get(0)} coord $j: kernel $k vs declarative $d")
    }
  }

  test("null and short arrays poison to null; interpreted path agrees") {
    import spark.implicits._
    graft.similarity.Similarity.register(spark)
    val df = Seq(
      (1L, Some(Array.fill(64)(1.0f))),
      (2L, Some(Array.fill(63)(1.0f))), // short: null
      (3L, None)                        // null array: null
    ).toDF("id", "embedding")
      .select($"id", expr("graft_jl_project(embedding)").as("jl"))
    val m = df.collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(!m(1L) && m(2L) && m(3L))
    // interpreted (non-codegen) evaluation takes the same path
    val e = graft.functions.JlProjectVec(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Array.fill(64)(0.5f),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.FloatType, containsNull = false)))
    val out = e.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    assert(out.numElements() == graft.similarity.JlProjection.OutDim)
  }
}
