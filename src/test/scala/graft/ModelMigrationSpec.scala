package graft

import graft.operators.{ModelMigration, Similarity}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** ANN model-version migration: retrain → full re-encode → atomic
  * marker-file swap. The prior generation stays fully servable until
  * the one-file commit; probes never see a mixed-generation index. */
class ModelMigrationSpec extends SparkSpec {

  test("migrate publishes atomically; crash before publish leaves v1 servable") {
    val root = Files.createTempDirectory("graft-mig").toString
    val emb = graft.sources.Tables.embeddings(spark, sf)
      .withColumn("embedding", col("embedding").cast("array<double>"))
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val v1Corpus = emb.filter(col("vec_id") < 250)
    val queries = emb.filter(col("vec_id") % 100 === 0)

    // generation 1: train + encode + publish on the initial corpus
    assert(ModelMigration.currentVersion(spark, root).isEmpty)
    val v1 = ModelMigration.migrate(v1Corpus, "vec_id", "embedding", root,
      nCells = 8, m = 8, nCodes = 16, iters = 2)
    assert(v1 == 1L &&
      ModelMigration.currentVersion(spark, root).contains(1L))
    def search() = ModelMigration.searchCurrent(root, emb, queries,
      "vec_id", "embedding", k = 5, nProbe = 8, shortlist = 256)
    val served1 = search().localCheckpoint()
    assert(served1.count() > 0)

    // the crash window: generation 2 fully PREPARED (trained on the
    // grown corpus, re-encoded) but the process dies before publish —
    // readers still resolve v1 end-to-end, byte-identical results
    ModelMigration.prepare(emb, "vec_id", "embedding", root, 2L,
      nCells = 8, m = 8, nCodes = 16, iters = 2)
    assert(ModelMigration.currentVersion(spark, root).contains(1L))
    val (v, _, _, codes1) = ModelMigration.loadCurrent(spark, root)
    assert(v == 1L && codes1.count() == v1Corpus.count())
    val duringCrash = search()
    assert(duringCrash.exceptAll(served1).count() == 0 &&
      served1.exceptAll(duringCrash).count() == 0)

    // re-running the crashed prepare is safe (overwrite, deterministic)
    ModelMigration.prepare(emb, "vec_id", "embedding", root, 2L,
      nCells = 8, m = 8, nCodes = 16, iters = 2)

    // commit: ONE marker create flips every component together
    ModelMigration.publish(spark, root, 2L)
    assert(ModelMigration.currentVersion(spark, root).contains(2L))
    val (_, cents2, cb2, codes2) = ModelMigration.loadCurrent(spark, root)
    assert(codes2.count() == emb.count())
    val served2 = search().localCheckpoint()

    // served v2 == a fresh from-scratch composite over the same corpus
    // (deterministic trainers make retrain == reload bit-for-bit)
    val cN = Similarity.normalized(emb, "vec_id", "embedding")
      .localCheckpoint()
    val qN = Similarity.normalizedQueries(queries, "vec_id", "embedding")
    val fresh = Similarity.ivfPqTopKWith(cN, qN, cents2, cb2,
      Similarity.encodeIvfPq(cN, cents2, cb2), 5, 8, 256, dim)
    assert(served2.exceptAll(fresh).count() == 0 &&
      fresh.exceptAll(served2).count() == 0)

    // publishing a half-prepared generation must fail
    intercept[IllegalArgumentException] {
      ModelMigration.publish(spark, root, 3L)
    }
    // vacuum: v1 drops only after it is no longer current
    intercept[IllegalArgumentException] {
      ModelMigration.dropVersion(spark, root, 2L)
    }
    ModelMigration.dropVersion(spark, root, 1L)
    assert(ModelMigration.currentVersion(spark, root).contains(2L))
    val after = search()
    assert(after.exceptAll(served2).count() == 0 &&
      served2.exceptAll(after).count() == 0)
  }
}
