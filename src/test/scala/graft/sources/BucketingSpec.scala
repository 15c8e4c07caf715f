package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import graft.SparkTestSession

class BucketingSpec extends AnyFunSuite with SparkTestSession {

  test("same-bucketed tables join without any Exchange") {
    val sf = "/root/testdata/sf0.001"
    // unique names: managed-table locations outlive the test JVM
    val custTbl = s"bkt_customer_${System.nanoTime()}"
    val ordTbl = s"bkt_orders_${System.nanoTime()}"
    Bucketing.writeBucketed(
      Tables.customer(spark, sf), custTbl, "c_custkey", 4)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).withColumnRenamed("o_custkey", "c_custkey"),
      ordTbl, "c_custkey", 4)

    // force the merge-join path so the bucketing (not broadcast) is what
    // avoids the shuffle
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.colocatedJoin(spark, custTbl, ordTbl, "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      // row parity with the plain join
      val cust = Tables.customer(spark, sf)
      val ord = Tables.orders(spark, sf)
      val plain = cust.join(ord, cust("c_custkey") === ord("o_custkey"))
      assert(joined.count() == plain.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP TABLE IF EXISTS $custTbl")
      spark.sql(s"DROP TABLE IF EXISTS $ordTbl")
    }
  }
}
