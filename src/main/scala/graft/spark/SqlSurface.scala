package graft.spark

import graft.extract.{Extraction, ExtractorOptions, TrafConfig}
import graft.out.Serializers.Span
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit Charikar simhash as a native Catalyst expression (preference order
  * (b) from the build brief: a scalar this opaque beats a Scala UDF — no
  * codegen of blake2b itself, but null handling and type plumbing stay in
  * Catalyst and the expression composes in SQL). */
case class Simhash64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    graft.hash.SimHash.createHash(input.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** SQL registration: exposes the kernel to `spark.sql` users
  * (SURVEY §2.10 — optional UDF/expression surface). */
object SqlSurface {

  def register(spark: SparkSession): Unit = {
    // native expressions
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => Simhash64(exprs.head), "scala_udf")
    registerVecDot(spark) // vec_dot + minhash128
    // kernel as SQL functions (opaque per-row transforms -> UDFs)
    val opts = ExtractorOptions(config = TrafConfig.Zero, fast = true, images = true)
    spark.udf.register("extract_text",
      (html: String) => Extraction.extract(html, null, opts))
    spark.udf.register("extract_spans", (html: String) => {
      val d = Extraction.bareExtraction(html, null, opts)
      if (d == null) Seq.empty[Span] else d.spans
    })
    spark.udf.register("extract_title", (html: String) => {
      val d = Extraction.bareExtraction(html, null, opts)
      if (d == null) null else d.meta.title
    })
  }

  /** Native similarity/hashing expressions only (idempotent) — the TextOps
    * operators call this so they resolve in any session. */
  def registerVecDot(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => graft.functions.VecDot(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "minhash128", exprs => graft.functions.MinHash128(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sorted_intersect_count",
      exprs => graft.functions.SortedIntersectCount(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_unit", exprs => graft.functions.VecUnit(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dots", exprs => graft.functions.VecDots(exprs(0), exprs(1)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "srp_buckets",
      exprs => graft.functions.SrpBuckets(exprs(0), exprs(1), exprs(2)), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash64", exprs => Simhash64(exprs.head), "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "shingle_hashes", exprs => graft.functions.ShingleHashes(exprs.head), "scala_udf")
  }
}
