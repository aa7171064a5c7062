package graft

import graft.sources.{FileIngest, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

class FileIngestSpec extends SparkSpec {
  import spark.implicits._

  private val evSchema = StructType(Seq(
    StructField("event_id", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  test("csv ingest: typed rows parse, malformed lines land in the audit column") {
    val dir = Files.createTempDirectory("graft-csv-in").toString
    val f = new java.io.PrintWriter(s"$dir/part.csv")
    f.println("event_id,user_id,event_type,value")
    f.println("1,10,click,1.5")
    f.println("2,11,view,2.25")
    f.println("not-a-long,12,error,oops") // malformed: two bad fields
    f.println("4,13,signup,0.0")
    f.close()
    // cache before corrupt-column queries (Spark refuses them over raw
    // files — see FileIngest.CorruptCol)
    val got = FileIngest.csv(spark, dir, evSchema).cache()
    // no silent loss: every line is a row
    assert(got.count() == 4)
    val bad = got.filter(col(FileIngest.CorruptCol).isNotNull)
    assert(bad.count() == 1)
    assert(bad.head().getAs[String](FileIngest.CorruptCol)
      .startsWith("not-a-long"))
    // clean rows are fully typed with a null audit column
    val good = got.filter(col(FileIngest.CorruptCol).isNull)
    assert(good.count() == 3)
    assert(good.agg(sum("value")).head().getDouble(0) == 3.75)
  }

  test("json-lines ingest captures malformed documents the same way") {
    val dir = Files.createTempDirectory("graft-jsonl-in").toString
    val f = new java.io.PrintWriter(s"$dir/part.json")
    f.println("""{"event_id": 1, "user_id": 10, "event_type": "click", "value": 1.5}""")
    f.println("""{"event_id": broken""")
    f.println("""{"event_id": 3, "user_id": 12, "event_type": "view", "value": 2.5}""")
    f.close()
    val got = FileIngest.jsonLines(spark, dir, evSchema).cache()
    assert(got.count() == 3)
    assert(got.filter(col(FileIngest.CorruptCol).isNotNull).count() == 1)
    assert(got.filter(col(FileIngest.CorruptCol).isNull)
      .agg(sum("value")).head().getDouble(0) == 4.0)
  }

  test("orc round-trips events exactly and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/events"
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value", "ts")
    FileIngest.writeOrc(ev, dir)
    val back = FileIngest.orc(spark, dir)
    assert(back.count() == ev.count())
    assert(back.exceptAll(ev).count() == 0 && ev.exceptAll(back).count() == 0)
    // pushdown: the typed filter must reach the ORC scan, not a
    // post-scan Filter over full rows only
    val q = back.filter(col("event_type") === "click")
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.replaceAll("\\s", "").contains("event_type,click") ||
      plan.contains("EqualTo(event_type,click)"),
      s"filter should push to the ORC scan:\n$plan")
  }
}
