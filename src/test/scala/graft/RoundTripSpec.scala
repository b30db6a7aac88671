package graft

import graft.sources.RoundTrip

class RoundTripSpec extends SparkSpec {

  test("csv round-trip preserves schema and every value exactly") {
    val orig = Tables.customer(spark, sfDir).orderBy("c_custkey").collect()
    val back = RoundTrip.src01(spark, sfDir).collect()
    assert(RoundTrip.src01(spark, sfDir).schema ==
      Tables.customer(spark, sfDir).schema)
    assert(back.length == orig.length)
    orig.zip(back).foreach { case (o, b) => assert(o == b) }
  }

  test("json round-trip preserves schema and every value exactly") {
    val orig = Tables.part(spark, sfDir).orderBy("p_partkey").collect()
    val back = RoundTrip.src02(spark, sfDir).collect()
    assert(back.length == orig.length)
    orig.zip(back).foreach { case (o, b) => assert(o == b) }
  }
}
