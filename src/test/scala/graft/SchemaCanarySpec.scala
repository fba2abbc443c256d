package graft

/** Schema-drift canary over the driver-generated testdata.
  *
  * Round 6 lost 30/177 correctness rows because the driver silently changed
  * `events.ts` from int64 nanos to timestamp[us] between rounds. This spec
  * pins the POST-normalization schema of every table (i.e. what the catalog
  * actually sees after `graft.util.EventTime.tsToLongNanos`), so the next
  * fixture change fails here with a printed actual-vs-expected diff instead
  * of surfacing as dozens of opaque analysis errors.
  */
class SchemaCanarySpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private val expected: Map[String, String] = Map(
    "region"    -> "r_regionkey int,r_name string",
    "nation"    -> "n_nationkey int,n_name string,n_regionkey int",
    "customer"  -> ("c_custkey bigint,c_name string,c_nationkey int," +
                    "c_acctbal double,c_mktsegment string"),
    "supplier"  -> "s_suppkey bigint,s_name string,s_nationkey int,s_acctbal double",
    "part"      -> ("p_partkey bigint,p_name string,p_brand string,p_type string," +
                    "p_size int,p_retailprice double"),
    "orders"    -> ("o_orderkey bigint,o_custkey bigint,o_orderstatus string," +
                    "o_totalprice double,o_orderdate timestamp_ntz,o_orderpriority string"),
    "lineitem"  -> ("l_orderkey bigint,l_partkey bigint,l_suppkey bigint," +
                    "l_linenumber int,l_quantity double,l_extendedprice double," +
                    "l_discount double,l_tax double,l_returnflag string," +
                    "l_linestatus string,l_shipdate timestamp_ntz"),
    // ts MUST be bigint here regardless of the fixture's on-disk vintage —
    // that is the whole point of the EventTime seam.
    "events"    -> ("event_id bigint,ts bigint,user_id bigint,event_type string," +
                    "value double,props string"),
    "documents" -> "doc_id bigint,text string,lang string,source string,n_chars bigint",
    "embeddings" -> "vec_id bigint,embedding array<float>,label int"
  )

  test("testdata schemas (post ts-normalization) match the pinned catalog contract") {
    val diffs = expected.toSeq.sortBy(_._1).flatMap { case (name, want) =>
      val got = graft.util.EventTime
        .tsToLongNanos(spark.read.parquet(s"$sfDir/$name.parquet"))
        .schema.fields.map(f => s"${f.name} ${f.dataType.simpleString}")
        .mkString(",")
      if (got == want) None
      else Some(s"$name:\n  expected: $want\n  actual:   $got")
    }
    withClue(diffs.mkString("\n")) { diffs shouldBe empty }
  }

  test("the session timezone is UTC (EventTime's NTZ interpretation depends on it)") {
    spark.conf.get("spark.sql.session.timeZone") shouldBe "UTC"
  }
}
