package graft.tools
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Seq(
      "select cast(conv(substr(md5('hello'),1,15),16,10) as bigint)",
      "select aggregate(zip_with(array(1.0D,2.0D), array(3.0D,4.0D), (x,y) -> x*y), cast(0.0 as double), (a,b) -> a+b)",
      "select transform(sequence(0,3), i -> i*i)",
      "select array_min(transform(array(5L,2L,9L), x -> (x*7+1)%11))",
      "select ascii('a'), ascii('中')",
      "select split('a b  c', '\\\\s+')",
      "select size(split(trim('a  b c'), '\\\\s+'))",
      "select (13 >> 2) & 1",
      "select aggregate(array(1L,2L,3L), 0L, (acc, x) -> (acc*31+x) % 2147483647)",
      "select slice(array(1,2,3,4),2,2)",
      "select concat_ws(',', transform(array(1L,2L), x -> cast(x as string)))",
      "select shiftright(13, 2) & 1"
    ).foreach { q =>
      try println(q + " -> " + spark.sql(q).collect().mkString)
      catch { case e: Exception => println(q + " ERR " + e.getMessage.take(120)) }
    }
    spark.stop()
  }
}
