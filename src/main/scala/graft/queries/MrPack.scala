package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.mr.MapReduceJob

/** The MapReduce parity surface exercised as a query: word count — the
  * reference's own canonical example job (reference submit.py:41-50
  * defaults to wc_map.sh / wc_reduce.sh) — run through the full
  * map → md5-partition → sort → reduce pipeline of
  * [[graft.mr.MapReduceJob]] and surfaced as a DataFrame.
  *
  * The reducer is the streaming sorted-run fold the reference contract
  * implies: same keys arrive contiguously, so one pass suffices
  * (reference worker/__main__.py:168-181).
  */
object MrPack extends QueryPack {

  /** Sum `key\tlong` runs of a sorted stream — wc_reduce.sh semantics. */
  def sumRuns(it: Iterator[String]): Iterator[String] = {
    val b = it.buffered
    new Iterator[String] {
      override def hasNext: Boolean = b.hasNext
      override def next(): String = {
        val key = b.head.takeWhile(_ != '\t')
        var c = 0L
        while (b.hasNext && b.head.takeWhile(_ != '\t') == key) {
          val line = b.next()
          val tab = line.indexOf('\t')
          c += (if (tab < 0) 1L else line.substring(tab + 1).toLong)
        }
        s"$key\t$c"
      }
    }
  }

  def queries: Seq[(String, Q)] = Seq(
    "mr01_wordcount" -> Q(
      run = (s, d) => {
        import s.implicits._
        // documents is one parquet file → spread the map stage first
        val lines = Tables.documents(s, d).select(col("text")).as[String]
          .rdd.repartition(s.sparkContext.defaultParallelism)
        val counted = MapReduceJob.typed(s, lines,
          mapper = line => line.split(" ").iterator.map(w => s"$w\t1"),
          reducer = sumRuns,
          numReducers = 8)
        counted
          .map { l =>
            val tab = l.indexOf('\t')
            (l.substring(0, tab), l.substring(tab + 1).toLong)
          }
          .toDF("word", "cnt")
          .orderBy("word")
      },
      oracle = Some("""
        SELECT t AS word, count(*) AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS t FROM documents)
        GROUP BY t ORDER BY word"""),
      bench = true)
  )
}
