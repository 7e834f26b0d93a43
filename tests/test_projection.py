"""PCA / whitening over embedding columns (operators/projection.py):
numerical agreement with local numpy, whitening variance contract, and
the narrow projection plan."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from nyc_taxi_data_warehouse_spark.operators.projection import fit_pca, project
from nyc_taxi_data_warehouse_spark.sources import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").select("vec_id", "embedding")


def _local(emb_rows):
    X = np.array([list(r) for r in emb_rows], dtype=np.float64)
    mean = X.mean(axis=0)
    cov = (X - mean).T @ (X - mean) / len(X)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    return X, mean, evals[order], evecs[:, order]


def test_fit_matches_local_numpy(spark, emb):
    model = fit_pca(emb, "embedding", n_components=8)
    X, mean, evals, evecs = _local([r.embedding for r in emb.collect()])
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["eigenvalues"], evals[:8], atol=1e-9)
    # eigenvectors match up to sign
    for got, want in zip(np.array(model["components"]), evecs[:, :8].T):
        assert np.allclose(np.abs(got @ want), 1.0, atol=1e-6)


def test_projection_matches_local_and_whitening_unit_variance(spark, emb):
    k = 6
    model = fit_pca(emb, "embedding", n_components=k)
    proj = project(emb, model, "embedding", whiten=False)
    got = {r.vec_id: np.array(r.projected) for r in proj.collect()}

    X, mean, _, _ = _local([r.embedding for r in emb.orderBy("vec_id").collect()])
    comps = np.array(model["components"])
    ids = [r.vec_id for r in emb.orderBy("vec_id").collect()]
    want = (X - mean) @ comps.T
    for i, vid in enumerate(ids):
        assert np.allclose(got[vid], want[i], atol=1e-6)

    # whitened components have (population) variance ~1
    white = project(emb, model, "embedding", whiten=True)
    W = np.array([r.projected for r in white.collect()])
    var = W.var(axis=0)
    assert np.allclose(var, 1.0, atol=1e-3)


def test_projection_plan_is_narrow(spark, emb):
    model = fit_pca(emb, "embedding", n_components=4)
    plan = (
        project(emb, model, "embedding")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_fit_rejects_degenerate_input(spark):
    one = spark.createDataFrame([(1, [1.0, 2.0])], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        fit_pca(one, "embedding")
