"""The numpy-GEMM top-k path must agree with the expression-fold path."""

from pyspark.sql import functions as F

from flink_examples_spark.catalog import load_table
from flink_examples_spark.operators.similarity import (
    cosine_topk,
    cosine_topk_gemm,
    hyperplane_lsh_buckets,
)


def test_gemm_matches_expression_topk(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    expr_rows = {
        (r.query_id, r.rank): (r.neighbor_id, round(r.cosine, 5))
        for r in cosine_topk(emb, q, k=5).collect()
    }
    gemm_rows = {
        (r.query_id, r.rank): (r.neighbor_id, round(r.cosine, 5))
        for r in cosine_topk_gemm(emb, q, k=5).collect()
    }
    assert expr_rows == gemm_rows


def test_neardup_gemm_matches_expr(spark, sf_dir):
    from flink_examples_spark.operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    gemm = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_neardup_pairs(emb, strategy="gemm").collect()
    }
    expr = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_neardup_pairs(emb, strategy="expr").collect()
    }
    assert gemm == expr


def test_neardup_lsh_is_subset_of_exact(spark, sf_dir):
    from flink_examples_spark.operators.similarity import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    emb = load_table(spark, "embeddings", sf_dir)
    exact = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_pairs(emb, strategy="gemm").collect()
    }
    lsh = {(r.vec_a, r.vec_b) for r in embedding_neardup_lsh(emb).collect()}
    assert lsh <= exact


def test_lsh_buckets_deterministic(spark, sf_dir):
    emb = load_table(spark, "embeddings", sf_dir)
    b1 = {r.vec_id: r.bucket for r in hyperplane_lsh_buckets(emb).collect()}
    b2 = {r.vec_id: r.bucket for r in hyperplane_lsh_buckets(emb).collect()}
    assert b1 == b2
    assert all(len(v) == 8 and set(v) <= {"0", "1"} for v in b1.values())


def test_ivf_exact_when_probing_all_cells(spark, sf_dir):
    """n_probe == n_clusters degenerates IVF to exact brute force."""
    from flink_examples_spark.operators.similarity import (
        cosine_topk_gemm,
        cosine_topk_ivf,
    )
    from flink_examples_spark.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    exact = cosine_topk_gemm(emb, q, k=3).toPandas()
    ivf = cosine_topk_ivf(emb, q, k=3, n_clusters=8, n_probe=8).toPandas()
    key = ["query_id", "rank"]
    assert (
        exact.sort_values(key).reset_index(drop=True)[["query_id", "neighbor_id", "rank"]]
        .equals(ivf.sort_values(key).reset_index(drop=True)[["query_id", "neighbor_id", "rank"]])
    )


def test_ivf_partial_probe_recall(spark, sf_dir):
    """With n_probe < n_clusters, results are a subset of the scored
    universe and recall vs exact top-k stays useful (>= 40% here)."""
    from flink_examples_spark.operators.similarity import (
        cosine_topk_gemm,
        cosine_topk_ivf,
    )
    from flink_examples_spark.catalog import load_table

    emb = load_table(spark, "embeddings", sf_dir)
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk_gemm(emb, q, k=5).toPandas()
    ivf = cosine_topk_ivf(emb, q, k=5, n_clusters=16, n_probe=4).toPandas()
    exact_pairs = set(zip(exact["query_id"], exact["neighbor_id"]))
    ivf_pairs = set(zip(ivf["query_id"], ivf["neighbor_id"]))
    assert len(ivf_pairs & exact_pairs) / len(exact_pairs) >= 0.4


def test_neardup_blocked_matches_expr(spark, sf_dir):
    """The distributed triangle block join is exact: identical pair set
    and 6-dp cosines vs the all-JVM expression baseline."""
    from flink_examples_spark.operators.similarity import embedding_neardup_pairs

    emb = load_table(spark, "embeddings", sf_dir)
    blocked = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_neardup_pairs(emb, strategy="blocked", n_blocks=4).collect()
    }
    expr = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in embedding_neardup_pairs(emb, strategy="expr").collect()
    }
    assert blocked == expr
    assert len(blocked) > 0


def test_registered_neardup_never_collects(spark, sf_dir, monkeypatch):
    """Scale guard: the registered embedding_neardup query must not pull
    the corpus to the driver (VERDICT r1 headline). DataFrame.collect is
    poisoned for the whole build+execute of the query."""
    from pyspark.sql import DataFrame

    from flink_examples_spark.queries import registry

    def boom(self):
        raise AssertionError("registered neardup path called DataFrame.collect()")

    monkeypatch.setattr(DataFrame, "collect", boom)
    df = registry()["embedding_neardup"].spark_fn(spark, sf_dir)
    assert df.count() > 0


def test_int8_quantization_error_bound_and_zero_vector(spark):
    import numpy as np

    from flink_examples_spark.operators.similarity import (
        quantize_embeddings_int8,
    )

    vecs = [
        (1, [0.5, -1.0, 0.25, 0.125]),
        (2, [0.0, 0.0, 0.0, 0.0]),          # zero vector: scale 0, codes 0
        (3, [1e-6, -1e-6, 5e-7, 0.0]),       # tiny magnitudes still code
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}

    assert out[2]["scale"] == 0.0 and out[2]["q"] == [0, 0, 0, 0]
    for vid, v in [(1, vecs[0][1]), (3, vecs[2][1])]:
        scale, q = out[vid]["scale"], out[vid]["q"]
        assert max(abs(x) for x in q) == 127          # max component saturates
        deq = np.array(q) * scale
        assert np.max(np.abs(deq - np.array(v))) <= scale / 2 + 1e-12
