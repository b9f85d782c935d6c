package graft.examples

import graft.SparkSpec
import graft.core.TestSchemeFs

/** Deployment realism for the EXAMPLE pipelines, end-to-end: every
  * persistent artifact (suppression ledger, signature store, shard
  * export, shipped z-order layout + stats ledger, PQ index store; the
  * streaming pipeline's incoming dir, exactly-once output store and
  * checkpoint) routed through the non-`file:` `graftfs:` scheme, with
  * outputs equal to the local-FS run. SchemeFsSpec covers the stores
  * one at a time; this covers their composition — a `java.io.File`
  * regression anywhere in the pipelines' store paths fails here.
  */
class ExamplePipelinesFsSpec extends SparkSpec {

  private def schemeRoot(): String = {
    spark.sparkContext.hadoopConfiguration
      .set("fs.graftfs.impl", classOf[TestSchemeFs].getName)
    "graftfs:" + java.nio.file.Files
      .createTempDirectory("graftfs_pipeline_").toString
  }

  test("TrainingDataPipeline runs on graftfs: with outputs equal to the " +
    "local-FS run") {
    val local = TrainingDataPipeline.run(spark, sf(),
      java.nio.file.Files.createTempDirectory("pipeline_local_").toString)
    val scheme = TrainingDataPipeline.run(spark, sf(), schemeRoot())
    assert(scheme === local)
    // the counts must be real pipeline numbers, not a degenerate run
    val m = local.toMap
    assert(m("corpus") > 0 && m("capped") > 0 && m("probe_rows") > 0)
    assert(m("suppressed") < m("corpus"), "suppression did nothing")
  }

  test("StreamingCurationPipeline runs on graftfs: (incoming + output " +
    "store + checkpoint) with outputs equal to the local-FS run") {
    val local = StreamingCurationPipeline.run(spark, sf(),
      java.nio.file.Files.createTempDirectory("stream_local_").toString)
    val scheme = StreamingCurationPipeline.run(spark, sf(), schemeRoot())
    assert(scheme === local)
    assert(local._1 > 0 && local._1 < local._2)
  }
}
