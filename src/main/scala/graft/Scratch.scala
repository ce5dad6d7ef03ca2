package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway sub-stage profiler — NOT part of the shipped surface. */
object Scratch {
  def t[A](name: String)(f: => A): A = {
    val t0 = System.nanoTime(); val r = f
    println(f"[scratch] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    r
  }
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.Functions.registerAll(spark)
    // warm-up
    SparkEntry.queries("lim_first")(spark, d).count()
    SparkEntry.queries("fn_gst")(spark, d).count()

    // dedup_semantic sub-stages
    val assigned = operators.Vectors.semanticAssigned(spark, d, operators.Vectors.FixedNList)
    t("assigned.count")(assigned.count())
    t("assigned.count again")(assigned.count())
    val pairs = operators.Vectors.semanticPairs(assigned)
    t("pairs.count")(pairs.count())
    t("pairs.count again")(pairs.count())
    t("cc(pairs)")(operators.Graph.connectedComponents(
      assigned.select(col("vec_id").as("id")), pairs).count())
    t("dedup_semantic full")(
      SparkEntry.queries("dedup_semantic")(spark, d).count())
    t("dedup_semantic again")(
      SparkEntry.queries("dedup_semantic")(spark, d).count())

    // dedup_cc_star sub-stages
    val (v2, e2) = operators.Graph.dedupGraph(spark, d)
    t("dedup edges.count")(e2.count())
    t("dedup edges again")(e2.count())
    val (lbl, rounds) = t("ccStar")(
      operators.Graph.connectedComponentsStar(v2, e2))
    println(s"[scratch] ccStar rounds=$rounds")
    t("ccStar labels.count")(lbl.count())
    t("dedup_cc_star full")(
      SparkEntry.queries("dedup_cc_star")(spark, d).count())
    t("dedup_cc_star again")(
      SparkEntry.queries("dedup_cc_star")(spark, d).count())
    spark.stop()
  }
}
