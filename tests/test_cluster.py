"""Distributed k-means + SemDeDup invariants (cluster.py).

A synthetic well-separated fixture gives ground truth the diffuse
testdata embeddings can't: three orthogonal-ish Gaussian blobs plus
planted exact duplicates.
"""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def blob_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("blobs")
    rng = np.random.default_rng(123)
    dim, per = 16, 30
    centers = np.zeros((3, dim))
    centers[0, 0] = centers[1, 1] = centers[2, 2] = 10.0
    rows, truth = [], []
    for c in range(3):
        pts = centers[c] + rng.normal(0, 0.05, size=(per, dim))
        rows.append(pts)
        truth.extend([c] * per)
    x = np.concatenate(rows)
    # planted exact duplicates: vectors 90/91 copy vec 0, 92 copies 30
    dups = np.stack([x[0], x[0], x[30]])
    x = np.concatenate([x, dups])
    truth.extend([0, 0, 1])
    t = pa.table({
        "vec_id": pa.array(range(len(x)), pa.int64()),
        "embedding": pa.array([r.astype(np.float32).tolist() for r in x],
                              pa.list_(pa.float32())),
        "label": pa.array(truth, pa.int32()),
    })
    pq.write_table(t, f"{d}/embeddings.parquet")
    return str(d), np.asarray(truth)


def test_kmeans_recovers_separated_blobs(ray_session, blob_dir):
    from mycelium_ray.pipelines.cluster import embedding_kmeans
    d, truth = blob_dir
    out = embedding_kmeans(d, k=3, iters=6).to_pandas() \
        .sort_values("vec_id").reset_index(drop=True)
    assert len(out) == len(truth)
    # same-truth-blob <=> same-kmeans-cluster (partition equality up to
    # centroid relabeling)
    for g in range(3):
        cl = out["cluster"][truth == g]
        assert cl.nunique() == 1, f"blob {g} split across clusters"
    assert out["cluster"].nunique() == 3


def test_kmeans_deterministic(ray_session):
    from mycelium_ray.pipelines.cluster import embedding_kmeans
    a = embedding_kmeans(SF, iters=2).to_pandas().sort_values("vec_id")
    b = embedding_kmeans(SF, iters=2).to_pandas().sort_values("vec_id")
    assert (a["cluster"].to_numpy() == b["cluster"].to_numpy()).all()


def test_semantic_dedup_drops_planted_duplicates(ray_session, blob_dir):
    from mycelium_ray.pipelines.cluster import semantic_dedup
    d, truth = blob_dir
    out = semantic_dedup(d, threshold=0.999, k=3, iters=6).to_pandas() \
        .sort_values("vec_id").set_index("vec_id")
    assert len(out) == len(truth)  # every vector gets a verdict
    # exact dups of vec 0 (90, 91) and vec 30 (92) are dropped, reps kept
    for dup, rep in [(90, 0), (91, 0), (92, 30)]:
        assert out.loc[dup, "kept"] == 0
        assert out.loc[dup, "rep"] == rep
    assert out.loc[0, "kept"] == 1 and out.loc[30, "kept"] == 1
    # kept rows are exactly those that are their own rep
    assert ((out["rep"] == out.index.to_numpy())
            == (out["kept"] == 1)).all()


def test_semantic_dedup_runs_on_testdata(ray_session):
    from mycelium_ray.pipelines.cluster import semantic_dedup
    out = semantic_dedup(SF).to_pandas()
    assert len(out) == 500
    assert set(out.columns) == {"vec_id", "kept", "rep"}
    assert 0 < out["kept"].sum() <= 500
