package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the production-session survival configs (BASELINE.md rehearsal
  * lessons): every entry point builds through Sessions.builder, so these
  * four settings reaching every session reduces to this map being right. */
class SessionsSpec extends AnyFunSuite {

  test("survival configs carry the rehearsal + host-I/O lessons") {
    assert(Sessions.survivalConfigs == Map(
      // lesson 5: spillable window buffers from row 512 — the SN lead()
      // window's unspillable 4096-row default drained the task pool at 6M docs
      "spark.sql.windowExec.buffer.in.memory.threshold" -> "512",
      // lesson 1: dead shuffle files are GC-gated; bound them to the live set
      "spark.cleaner.periodicGC.interval" -> "2min",
      // lesson 4: shuffle bytes are the binding resource; zstd halves them
      "spark.io.compression.codec" -> "zstd",
      // CC local finish / ANN top-up collects must not die on the 1g default
      "spark.driver.maxResultSize" -> "4g",
      // round-6 lesson: the bypass shuffle writer's transferTo concat
      // mmaps/unmaps every per-reducer segment — a VM-exit storm on this
      // guest (thread dumps: map stages 13 s task time, 1.7 s CPU)
      "spark.file.transferTo" -> "false"))
  }

  test("builder applies the survival configs (options visible pre-build)") {
    // a second SparkContext can't be created in the suite JVM, so assert at
    // the builder level: survival() must leave every key in the builder's
    // option map (reflection on the private options field — stable across
    // Spark 3.x/4.x; if it moves, this test fails loudly, not silently)
    val b = Sessions.builder(2, "sessions-spec")
    val f = Iterator.iterate[Class[_]](b.getClass)(_.getSuperclass)
      .takeWhile(_ != null)
      .flatMap(_.getDeclaredFields.find(_.getName == "options"))
      .toSeq.headOption
      .getOrElse(fail("SparkSessionBuilder no longer has an options field"))
    f.setAccessible(true)
    val opts = f.get(b).asInstanceOf[scala.collection.mutable.Map[String, String]]
    Sessions.survivalConfigs.foreach { case (k, v) =>
      assert(opts.get(k).contains(v), s"builder lost survival config $k (has: $opts)")
    }
  }

  test("builder defaults to local[cores] but never overrides a submitted master") {
    def masterOpt(b: org.apache.spark.sql.SparkSession.Builder): Option[String] = {
      val f = Iterator.iterate[Class[_]](b.getClass)(_.getSuperclass)
        .takeWhile(_ != null)
        .flatMap(_.getDeclaredFields.find(_.getName == "options"))
        .toSeq.headOption.getOrElse(fail("no options field"))
      f.setAccessible(true)
      f.get(b).asInstanceOf[scala.collection.mutable.Map[String, String]].get("spark.master")
    }
    val saved = sys.props.remove("spark.master")
    try {
      // plain runMain / tests: no external master -> local[cores] default
      assert(masterOpt(Sessions.builder(2, "m-spec")).contains("local[2]"))
      // spark-submit publishes --master as the spark.master system property;
      // the builder must leave it alone or every cluster submission would
      // silently become a single-JVM local run
      sys.props("spark.master") = "spark://127.0.0.1:7077"
      assert(masterOpt(Sessions.builder(2, "m-spec")).isEmpty)
    } finally {
      sys.props.remove("spark.master")
      saved.foreach(v => sys.props("spark.master") = v)
    }
  }
}
