package graft

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("cosine: identity 1, orthogonal 0, opposite -1") {
    val df = Seq(
      (Array(1f, 0f), Array(1f, 0f), 1.0),
      (Array(1f, 0f), Array(0f, 1f), 0.0),
      (Array(1f, 0f), Array(-1f, 0f), -1.0))
      .toDF("a", "b", "expected")
      .withColumn("cos",
        Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))))
    df.collect().foreach(r => assert(math.abs(r.getDouble(3) - r.getDouble(2)) < 1e-12))
  }

  test("cosine of zero vector is NULL, not a crash or 0/0") {
    val df = Seq((Array(0f, 0f), Array(1f, 0f))).toDF("a", "b")
      .withColumn("cos",
        Similarity.cosine(Similarity.asDouble(col("a")), Similarity.asDouble(col("b"))))
    assert(df.collect().head.isNullAt(2))
  }

  test("brute-force top-k: every probe finds itself first with score 1") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val top = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 3)
    val first = top.filter(col("probe_id") === col("vec_id"))
      .select("probe_id", "score").collect()
    assert(first.length == probes.count())
    assert(first.forall(_.getDouble(1) >= 0.999999))
  }

  test("ANN bucket candidates share the probe's bucket; scores bounded") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val ann = Similarity.annTopK(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 3, bits = 4)
    val buckets = vecs.withColumn("b", Similarity.bucketId(col("embedding"), 4))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    ann.select("probe_id", "vec_id", "score").collect().foreach { r =>
      assert(buckets(r.getLong(0)) == buckets(r.getLong(1)),
        "ANN neighbor must come from the probe's bucket")
      assert(r.getDouble(2) >= -1.0 - 1e-6 && r.getDouble(2) <= 1.0 + 1e-6)
    }
  }

  test("native codegen cosine is bit-identical to the portable HOF form") {
    graft.functions.GraftFunctions.register(spark)
    val vecs = Tables.embeddings(spark, sfDir).limit(100)
      .select(col("vec_id"), col("embedding"))
    val probe = Tables.embeddings(spark, sfDir).filter(col("vec_id") === 0)
      .select(col("embedding").as("probe_vec"))
    val both = vecs.crossJoin(probe).select(
      Similarity.cosine(Similarity.asDouble(col("embedding")),
        Similarity.asDouble(col("probe_vec"))).as("hof"),
      Similarity.cosineNative(col("embedding"), col("probe_vec")).as("native"))
    assert(both.collect().forall(r => r.getDouble(0) == r.getDouble(1)),
      "sequential-sum double results must match exactly")
  }

  test("native cosine handles zero vectors (NULL) and null elements (as 0)") {
    graft.functions.GraftFunctions.register(spark)
    val df = Seq(
      (Array[java.lang.Float](0f, 0f), Array[java.lang.Float](1f, 0f)),
      (Array[java.lang.Float](1f, null), Array[java.lang.Float](1f, 1f)))
      .toDF("a", "b")
      .withColumn("cos", Similarity.cosineNative(col("a"), col("b")))
    val rows = df.collect()
    assert(rows(0).isNullAt(2), "zero norm -> NULL")
    assert(math.abs(rows(1).getDouble(2) - 1.0 / math.sqrt(2)) < 1e-12,
      "null element treated as 0")
  }

  test("fused CosineTopKExec is bit-identical to the declarative brute force") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val declarative = rows(Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 5))
    val fused = rows(Similarity.bruteForceTopKFused(vecs, "vec_id", "embedding",
      probes, "probe_id", "probe_vec", k = 5))
    assert(fused == declarative)
    // partitioning must not change the answer (partial buffers merge exactly)
    val fused7 = rows(Similarity.bruteForceTopKFused(vecs.repartition(7), "vec_id",
      "embedding", probes, "probe_id", "probe_vec", k = 5))
    assert(fused7 == declarative)
  }

  test("ANN recall vs brute force across bits; hamming-1 multiprobe recovers it") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k = 10)
      .select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (for (bits <- Seq(2, 4, 6, 8); mp <- Seq(0, 1)) yield {
      val ann = Similarity.annTopK(vecs, "vec_id", "embedding",
          probes, "probe_id", "probe_vec", k = 10, bits = bits,
          multiprobeHamming = mp)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = (ann intersect truth).size.toDouble / truth.size
      info(f"bits=$bits multiprobe=$mp recall=$rec%.3f")
      ((bits, mp), rec)
    }).toMap
    // multiprobe can only add candidate buckets — recall must not drop
    for (bits <- Seq(2, 4, 6, 8))
      assert(recall((bits, 1)) >= recall((bits, 0)),
        s"multiprobe must not lose recall at bits=$bits")
    // more bits = smaller buckets = lower single-probe recall (weak monotone)
    assert(recall((8, 0)) <= recall((2, 0)) + 1e-9)

    // multi-table recall: tables is the knob that raises recall WITHOUT
    // growing bucket size; the documented production setting must clear 0.9
    val mt = (for (tables <- Seq(2, 4, 8)) yield {
      val ann = Similarity.annTopKMultiTable(vecs, "vec_id", "embedding",
          probes, "probe_id", "probe_vec", k = 10, bits = 4, tables = tables,
          multiprobeHamming = 1)
        .select("probe_id", "vec_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val rec = (ann intersect truth).size.toDouble / truth.size
      info(f"bits=4 tables=$tables multiprobe=1 recall=$rec%.3f")
      tables -> rec
    }).toMap
    assert(mt(2) <= mt(4) + 1e-9 && mt(4) <= mt(8) + 1e-9,
      "recall must not drop as tables are added")
    assert(mt(8) >= 0.9,
      "documented setting (bits=4, 8 tables, multiprobe) must reach 0.9 recall")
  }

  test("IVF: nprobe=nlist degrades to brute force; nprobe=2 keeps self-hit") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val probes = vecs.filter(col("vec_id") % 100 === 0)
      .select(col("vec_id").as("probe_id"), col("embedding").as("probe_vec"))
    val truth = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k = 3)
      .select("probe_id", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // full probing scans every cell — must equal the exact answer
    val full = Similarity.ivfTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k = 3, nlist = 8, nprobe = 8)
      .select("probe_id", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(full == truth, "nprobe = nlist must reproduce brute force exactly")
    // narrow probing: every probe's own vector lives in the probe's best
    // cell by construction, so the self-hit (score 1) must survive
    val narrow = Similarity.ivfTopK(vecs, "vec_id", "embedding",
        probes, "probe_id", "probe_vec", k = 3, nlist = 8, nprobe = 2)
    val self = narrow.filter(col("probe_id") === col("vec_id")).collect()
    assert(self.length == probes.count(), "self-hit must survive IVF pruning")
    val rec = (narrow.select("probe_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
      .map((p: (Long, Long)) => p)
      intersect truth.map(t => (t._1, t._2))).size.toDouble / truth.size
    info(f"ivf nlist=8 nprobe=2 recall=$rec%.3f")
    assert(rec >= 0.5, "nprobe=2/8 should keep at least half the true top-k")
  }

  test("centroid assignment covers every vector exactly once") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), col("label"))
    val cents = Similarity.centroids(vecs, "label", "embedding")
    assert(cents.count() == vecs.select("label").distinct().count())
    val assigned = Similarity.assignNearestCentroid(vecs, "vec_id", "embedding", cents)
    assert(assigned.count() == vecs.count())
    assert(assigned.select("vec_id").distinct().count() == vecs.count())
  }

  test("int8 quantization: q bounded, scale hit, reconstruction error < scale/2") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val q = Similarity.int8Quantize(vecs, "vec_id", "embedding")
    val n = vecs.count()
    assert(q.count() == n * 64, "one row per (vector, dim)")
    assert(q.filter(abs(col("q")) > 127).count() == 0)
    // every non-zero vector has at least one |q| == 127 (the max element)
    assert(q.groupBy("vec_id").agg(max(abs(col("q"))).as("m"))
      .filter(col("m") =!= 127).count() == 0)
    // dequantized values stay within half a quantization step of the input
    val scales = vecs.select(col("vec_id"),
      (array_max(transform(col("embedding"), x => abs(x.cast("double")))) / 127.0)
        .as("scale"),
      posexplode(col("embedding")).as(Seq("dim", "x")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        col("x").cast("double").as("x"), col("scale"))
    val joined = q.join(scales, Seq("vec_id", "dim"))
      .withColumn("err", abs(col("q") * col("scale") - col("x")))
    assert(joined.filter(col("err") > col("scale") * 0.5000001).count() == 0)
  }

  test("mean pooling: per-(label, dim) mean within fixed-point tolerance of true mean") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("label"), col("embedding"))
    val pooled = Similarity.meanPoolByKey(vecs, "label", "embedding")
    val nLabels = vecs.select("label").distinct().count()
    assert(pooled.count() == nLabels * 64)
    val direct = vecs
      .select(col("label").cast("long").as("pool_key"),
        posexplode(col("embedding")).as(Seq("dim", "x")))
      .groupBy(col("pool_key"), col("dim").cast("long").as("dim"))
      .agg(avg(col("x").cast("double")).as("true_mean"))
    val drift = pooled.join(direct, Seq("pool_key", "dim"))
      .withColumn("d", abs(col("mean_val") - col("true_mean")))
    // fixed-point quantization (5e-7) + final 6-digit rounding (5e-7)
    assert(drift.filter(col("d") > 1.1e-6).count() == 0)
  }

  test("fused kNN graph equals the declarative window form, row for row") {
    val vecs = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding")).limit(120)
    val declarative = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3)
    val fused = Similarity.knnGraphFused(vecs, "vec_id", "embedding", k = 3)
    assert(fused.count() == declarative.count())
    assert(fused.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(fused).isEmpty)
  }

  test("approximate kNN graph: recall >= 0.9 at documented setting, no broadcast needed") {
    val vecs = Tables.embeddings(spark, sfDir).select(col("vec_id"), col("embedding"))
    val truth = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 3)
      .select("src_id", "dst_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Similarity.knnGraphApprox(vecs, "vec_id", "embedding", k = 3,
      bits = 4, tables = 8, multiprobeHamming = 1)
    val edges = approx.select("src_id", "dst_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = (edges intersect truth).size.toDouble / truth.size
    info(f"knnGraphApprox bits=4 tables=8 multiprobe=1 recall=$rec%.3f")
    assert(rec >= 0.9,
      "documented setting (bits=4, 8 tables, multiprobe) must reach 0.9 recall")
    // every emitted edge must be a real scored pair: no self-edges,
    // at most k per source, and scores must match the exact graph's
    // scoring wherever the edge is shared
    assert(approx.filter(col("src_id") === col("dst_id")).count() == 0)
    val perSrc = approx.groupBy("src_id").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    assert(perSrc <= 3)
    // candidate generation must be an equi-join, never a cartesian
    val plan = approx.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "LSH self-join must plan as an equi-join")
  }
}
