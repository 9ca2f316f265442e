"""Derived collections, embedding utils, window operators."""

from datetime import datetime

from pyspark.sql import functions as F

from linkml_store_spark.operators.derived import derive_collection
from linkml_store_spark.operators.embeddings import (
    dimension_means,
    embedding_stats,
    sample_embeddings,
)
from linkml_store_spark.operators.windows import (
    argmax_per_key,
    latest_per_key,
    rolling_agg,
    sessionize,
    with_lag_lead,
    with_rank,
)


def test_derive_collection(spark):
    src = spark.createDataFrame(
        [{"first": "Ada", "last": "L", "age_in_years": 36},
         {"first": "Bob", "last": "M", "age_in_years": 20}]
    )
    out = derive_collection(
        src,
        {"full_name": "concat(first, ' ', last)", "age_months": "age_in_years * 12"},
        where={"age_in_years": {"$gte": 30}},
    ).collect()
    assert len(out) == 1
    assert out[0]["full_name"] == "Ada L" and out[0]["age_months"] == 432


def test_embedding_stats(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    stats = embedding_stats(emb, "embedding").first()
    assert stats["n_vectors"] == emb.count()
    assert stats["mean_norm"] > 0
    per_label = embedding_stats(emb, "embedding", group_by="label").collect()
    assert sum(r["n_vectors"] for r in per_label) == emb.count()


def test_dimension_means(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    dim = len(emb.first()["embedding"])
    means = dimension_means(emb, "embedding")
    assert len(means) == dim


def test_sample_embeddings(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    total = emb.count()
    s = sample_embeddings(emb, fraction=0.5, seed=1)
    assert 0 < s.count() < total
    strat = sample_embeddings(emb, fraction=0.5, stratify_by="label", seed=1)
    assert 0 < strat.count() < total
    topn = sample_embeddings(emb, n=10)
    assert topn.count() <= 10


def test_rank_and_latest(spark):
    df = spark.createDataFrame(
        [{"u": 1, "t": 3, "v": "c"}, {"u": 1, "t": 1, "v": "a"},
         {"u": 2, "t": 5, "v": "z"}, {"u": 1, "t": 2, "v": "b"}]
    )
    latest = {r["u"]: r["v"] for r in latest_per_key(df, "u", F.desc("t")).collect()}
    assert latest == {1: "c", 2: "z"}
    ranked = with_rank(df, "u", "t").filter("u = 1").orderBy("rank").collect()
    assert [r["v"] for r in ranked] == ["a", "b", "c"]


def test_lag_lead(spark):
    df = spark.createDataFrame([{"u": 1, "t": i, "v": float(i)} for i in range(3)])
    out = {r["t"]: r.asDict() for r in with_lag_lead(df, "u", "t", "v").collect()}
    assert out[1]["v_lag"] == 0.0 and out[1]["v_lead"] == 2.0
    assert out[0]["v_lag"] is None and out[2]["v_lead"] is None


def test_argmax_per_key_matches_window_path(spark, sf_dir):
    from linkml_store_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    via_window = latest_per_key(ev, "user_id", [F.desc("ts"), F.desc("event_id")])
    via_agg = argmax_per_key(ev, "user_id", ["ts", "event_id"])
    a = {r["user_id"]: r["event_id"] for r in via_window.collect()}
    b = {r["user_id"]: r["event_id"] for r in via_agg.collect()}
    assert a == b and a


def test_rolling_agg_range_frame(spark):
    # rows at t=0,5,11,12 with a 10s window: frame is value-based
    df = spark.createDataFrame(
        [{"u": 1, "ts": float(t), "v": 1.0} for t in (0, 5, 11, 12)]
    )
    out = rolling_agg(
        df, "u", "ts", 10, {"n_10s": F.count(F.lit(1)), "sum_10s": F.sum("v")}
    )
    got = {r["ts"]: r["n_10s"] for r in out.collect()}
    # frames: t=0 -> {0}; t=5 -> {0,5}; t=11 -> [1,11]={5,11}; t=12 -> {5,11,12}
    assert got == {0.0: 1, 5.0: 2, 11.0: 2, 12.0: 3}


def test_sessionize(spark):
    rows = [
        {"u": 1, "ts": datetime(2024, 1, 1, 0, 0)},
        {"u": 1, "ts": datetime(2024, 1, 1, 0, 10)},   # same session
        {"u": 1, "ts": datetime(2024, 1, 1, 2, 0)},    # gap > 30m -> new
        {"u": 2, "ts": datetime(2024, 1, 1, 0, 5)},
    ]
    df = spark.createDataFrame(rows)
    out = sessionize(df, "u", "ts", gap="30 minutes").collect()
    sessions = {(r["u"], r["ts"].hour): r["session_id"] for r in out}
    assert sessions[(1, 0)] == "1-1"
    assert sessions[(1, 2)] == "1-2"
    assert sessions[(2, 0)] == "2-1"
    # the two 0-hour events of user 1 share a session
    u1_hour0 = [r["session_id"] for r in out if r["u"] == 1 and r["ts"].hour == 0]
    assert set(u1_hour0) == {"1-1"}


def test_pca_project(spark, sf_dir):
    import pytest
    from linkml_store_spark.operators.dimreduce import pca_project, tsne_project
    from linkml_store_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    out = pca_project(emb, "embedding", k=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert all(len(r["pca"]) == 2 for r in rows)
    # PCA components carry variance: coordinates are not all identical
    xs = {round(r["pca"][0], 6) for r in rows}
    assert len(xs) > 10
    # t-SNE runs for real via the built-in numpy implementation (sklearn
    # absent in this container) — bounded sample, deterministic
    y = tsne_project(emb, "embedding", sample_size=50, n_iter=60)
    assert y.shape == (50, 2)
    y2 = tsne_project(emb, "embedding", sample_size=50, n_iter=60)
    import numpy as np

    assert np.array_equal(y, y2)


def test_tsne_separates_clusters():
    import numpy as np

    from linkml_store_spark.operators.dimreduce import _tsne_numpy

    rng = np.random.RandomState(0)
    # three well-separated 10-d Gaussian clusters
    X = np.concatenate(
        [rng.randn(20, 10) * 0.1 + mu for mu in (0.0, 8.0, -8.0)]
    )
    Y = _tsne_numpy(X, perplexity=10, n_iter=300, seed=1)
    labels = np.repeat([0, 1, 2], 20)
    # mean within-cluster distance far below mean between-cluster distance
    d = np.linalg.norm(Y[:, None, :] - Y[None, :, :], axis=2)
    same = labels[:, None] == labels[None, :]
    np.fill_diagonal(same, False)
    within = d[same].mean()
    between = d[(~same)].mean()
    assert within * 3 < between


def test_umap_separates_clusters_and_is_deterministic():
    # built-in numpy UMAP: three well-separated 16-d Gaussians must stay
    # separated in the 2-d embedding (inter-centroid distance >> intra
    # spread), and the layout is a pure function of the seed
    import numpy as np

    from linkml_store_spark.operators.dimreduce import _umap_numpy

    rng = np.random.RandomState(0)
    centers = rng.randn(3, 16) * 8
    X = np.vstack([c + rng.randn(60, 16) for c in centers])
    labels = np.repeat([0, 1, 2], 60)
    Y = _umap_numpy(X, n_neighbors=10, n_epochs=120, seed=1)
    assert Y.shape == (180, 2)
    intra = [
        np.linalg.norm(Y[labels == a] - Y[labels == a].mean(axis=0), axis=1).mean()
        for a in range(3)
    ]
    inter = [
        np.linalg.norm(Y[labels == a].mean(axis=0) - Y[labels == b].mean(axis=0))
        for a in range(3)
        for b in range(a + 1, 3)
    ]
    assert min(inter) > 2 * max(intra), (min(inter), max(intra))
    assert np.array_equal(Y, _umap_numpy(X, n_neighbors=10, n_epochs=120, seed=1))


def test_umap_project_runs_without_umap_learn(spark, sf_dir):
    from linkml_store_spark.operators.dimreduce import umap_project
    from linkml_store_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    y = umap_project(emb, "embedding", sample_size=40, n_epochs=30)
    assert y.shape == (40, 2)
