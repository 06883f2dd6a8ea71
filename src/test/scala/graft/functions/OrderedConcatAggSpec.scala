package graft.functions

import graft.SparkSpec

class OrderedConcatAggSpec extends SparkSpec {
  import spark.implicits._

  test("ordered concat assembles fragments by pos regardless of partitioning") {
    val ds = Seq(
      ("doc1", 2, "<b/>"), ("doc1", 1, "<a/>"), ("doc1", 3, "<c/>"),
      ("doc2", 1, "<x/>"))
      .toDS().repartition(4) // scatter fragments across partitions
    val out = ds.groupByKey(_._1)
      .mapValues(r => (r._2, r._3))
      .agg(OrderedConcatAgg.toColumn.name("body"))
      .collect().toMap
    assert(out("doc1") == "<a/><b/><c/>")
    assert(out("doc2") == "<x/>")
  }
}
