package graft.plans

import org.apache.spark.sql.{DataFrame, GraftShims, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Project, UnaryNode}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.DoubleType

/**
 * Whole-operator similarity join as a first-class plan citizen — the
 * SURVEY.md §4 artifact: a custom `LogicalPlan` node + `Rule[LogicalPlan]`
 * that lets the OPTIMIZER, not the query author, choose between the exact
 * quadratic plan and the hyperplane-LSH plan.
 *
 * The user declares intent ([[SimilarityJoin.cosineSelfJoin]]): "all pairs
 * with cosine ≥ t". [[CosineSelfJoin]] carries that declaration through
 * analysis unchanged; [[SimilarityJoinRewrite]] then expands it into one of
 * two ordinary Catalyst subtrees:
 *
 *  - **exact**: pair BNLJ with conjunct-ordered condition + DotF32 kernel
 *    ([[graft.llm.Similarity.exactPairs]]) — optimal when n² pair work is
 *    cheaper than building signatures (small corpora, probes, unit tests);
 *  - **lsh**: 192-bit random-hyperplane signatures, band-bucket self-join,
 *    exact-cosine verify ([[graft.llm.Similarity.hyperplanePairs]]) —
 *    candidates ∝ bucket occupancy, never all-pairs; recall ≈ 0.9995 at
 *    the calibrated banding for the near-dup regime (cos ≥ 0.9).
 *
 * `strategy = "auto"` is cost-based: the child's logical `Statistics`
 * (row count when CBO has it, `sizeInBytes / 280` estimated rows
 * otherwise — 280 B ≈ a 64-float embedding row in parquet) against
 * `spark.graft.simjoin.autoLshRowThreshold` (default 100 000 rows, i.e.
 * ~5·10⁹ candidate pairs — the point where quadratic work dwarfs the
 * signature scan). This mirrors how Spark itself promotes BHJ vs SMJ on
 * `autoBroadcastJoinThreshold`; here the trade is exactness-certain-cost
 * vs bounded-recall-linear-cost, so auto only ever picks LSH above a
 * corpus size where the exact form would not finish anyway, and callers
 * can pin `"exact"` / `"lsh"` explicitly.
 *
 * Scale note (100 TB): the decision happens per-query on driver-side
 * stats — no data is read to decide. At cluster scale the same node and
 * rule work unchanged; only the threshold conf moves.
 */
case class CosineSelfJoin(
    child: LogicalPlan,
    idCol: String,
    vecCol: String,
    threshold: Double,
    strategy: String,
    override val output: Seq[Attribute])
  extends UnaryNode {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  // The pair/cosine attributes originate here, not in the child — without
  // this, CheckAnalysis reports them as missing inputs.
  override def producedAttributes: AttributeSet = AttributeSet(output)
  // The node consumes exactly the id and vector columns. Declaring this
  // lets ColumnPruning drop every OTHER child column (correct) instead of
  // inserting an empty Project under the node (which it does for a node
  // with no references — the id/vec lookup in the rewrite would then fail).
  override def references: AttributeSet =
    AttributeSet(child.output.filter(a => a.name == idCol || a.name == vecCol))
  override protected def withNewChildInternal(newChild: LogicalPlan): CosineSelfJoin =
    copy(child = newChild)
}

/**
 * The token-set twin of [[CosineSelfJoin]]: "all pairs with Jaccard ≥ t
 * over each doc's token set". Arms: prefix-filtered exact AllPairs join
 * ([[graft.llm.Dedup.exactJaccardPairs]]) vs banded MinHash-LSH
 * ([[graft.llm.Dedup.minhashLsh]]) — with these two nodes the optimizer
 * owns the exact-vs-approximate decision for BOTH similarity modalities
 * (vectors and token sets) behind one declarative API.
 */
case class TokenSelfJoin(
    child: LogicalPlan,
    idCol: String,
    textCol: String,
    threshold: Double,
    strategy: String,
    override val output: Seq[Attribute])
  extends UnaryNode {
  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  override def producedAttributes: AttributeSet = AttributeSet(output)
  override def references: AttributeSet =
    AttributeSet(child.output.filter(a => a.name == idCol || a.name == textCol))
  override protected def withNewChildInternal(newChild: LogicalPlan): TokenSelfJoin =
    copy(child = newChild)
}

object SimilarityJoinRewrite extends Rule[LogicalPlan] {

  val ThresholdKey = "spark.graft.simjoin.autoLshRowThreshold"
  /** ≈ bytes per (id, 64-float vector) parquet row — used only when CBO
    * row counts are absent; measured 390 B/row on the test tables, kept
    * low so the estimate errs toward LSH (the plan that always finishes). */
  private val EstRowBytes = 280

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case sj: CosineSelfJoin =>
      val spark = SparkSession.active
      val emb = GraftShims.ofRows(spark, sj.child)
        .select(col(sj.idCol).as("vec_id"), col(sj.vecCol).as("embedding"))
      val useLsh = sj.strategy match {
        case "exact" => false
        case "lsh" => true
        case _ =>
          val st = sj.child.stats
          val estRows = st.rowCount.getOrElse(st.sizeInBytes / EstRowBytes)
          estRows > BigInt(conf.getConfString(ThresholdKey, "100000").toLong)
      }
      val pairs =
        if (useLsh) graft.llm.Similarity.hyperplanePairs(emb, sj.threshold)
        else graft.llm.Similarity.exactPairs(emb, sj.threshold)
      splice(pairs, sj.output)

    case tj: TokenSelfJoin =>
      val spark = SparkSession.active
      val docs = GraftShims.ofRows(spark, tj.child)
        .select(col(tj.idCol).as("doc_id"), col(tj.textCol).as("text"))
      val useLsh = tj.strategy match {
        case "exact" => false
        case "lsh" => true
        case _ =>
          val st = tj.child.stats
          val estRows = st.rowCount.getOrElse(st.sizeInBytes / EstRowBytes)
          estRows > BigInt(conf.getConfString(ThresholdKey, "100000").toLong)
      }
      val pairs =
        if (useLsh) graft.llm.Dedup.minhashLsh(docs, tj.threshold)
        else graft.llm.Dedup.exactJaccardPairs(docs, tj.threshold)
      splice(pairs, tj.output)
  }

  /** Optimize the expanded sub-plan in its own QueryExecution (this rule
    * may run in the post-hoc extraOptimizations batch, after the main
    * pushdown/pruning batches have already passed over the outer plan),
    * then splice it under the node's original attribute ids so parent
    * operators' references stay resolved. */
  private def splice(pairs: DataFrame, out: Seq[Attribute]): LogicalPlan = {
    val sub = pairs.queryExecution.optimizedPlan
    Project(sub.output.zip(out).map { case (a, o) =>
      Alias(a, o.name)(exprId = o.exprId) }, sub)
  }
}

object SimilarityJoin {

  /**
   * All pairs (a, b) with `idCol(a) < idCol(b)` and
   * `round(cosine(vecCol(a), vecCol(b)), 4) ≥ threshold`, as
   * `(vec_a, vec_b, cos_sim)`. `strategy`: `"auto"` (optimizer picks by
   * stats), `"exact"`, or `"lsh"`.
   */
  def cosineSelfJoin(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, strategy: String = "auto"): DataFrame = {
    require(Set("auto", "exact", "lsh")(strategy), s"bad strategy $strategy")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val idField = df.schema(idCol)
    val out = Seq(
      AttributeReference("vec_a", idField.dataType, idField.nullable)(),
      AttributeReference("vec_b", idField.dataType, idField.nullable)(),
      AttributeReference("cos_sim", DoubleType)())
    GraftShims.ofRows(spark,
      CosineSelfJoin(df.queryExecution.analyzed, idCol, vecCol, threshold,
        strategy, out))
  }

  /**
   * All pairs (a, b) with `idCol(a) < idCol(b)` and exact token-set
   * `jaccard ≥ threshold` (tokens = whitespace split of `textCol`), as
   * `(doc_a, doc_b, jaccard)`. `strategy` as in [[cosineSelfJoin]].
   */
  def jaccardSelfJoin(df: DataFrame, idCol: String, textCol: String,
      threshold: Double, strategy: String = "auto"): DataFrame = {
    require(Set("auto", "exact", "lsh")(strategy), s"bad strategy $strategy")
    val spark = df.sparkSession
    ensureRegistered(spark)
    val idField = df.schema(idCol)
    val out = Seq(
      AttributeReference("doc_a", idField.dataType, idField.nullable)(),
      AttributeReference("doc_b", idField.dataType, idField.nullable)(),
      AttributeReference("jaccard", DoubleType)())
    GraftShims.ofRows(spark,
      TokenSelfJoin(df.queryExecution.analyzed, idCol, textCol, threshold,
        strategy, out))
  }

  /** Idempotently add the rewrite to the session (config-time path is
    * `spark.sql.extensions=graft.plans.GraftExtensions`). */
  def ensureRegistered(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(SimilarityJoinRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ SimilarityJoinRewrite
  }
}
