"""DSIR importance resampling pinned against an independent
single-process reference over the same corpus (exact: integer histograms
+ identical per-doc summation order)."""
import numpy as np
import pyarrow.parquet as pq

from mycelium_ray.pipelines.dsir import (N_FEATURE_BUCKETS, N_SELECT,
                                         TARGET_SOURCE, _SMOOTH,
                                         _bigram_buckets, _gumbel_keys,
                                         dsir_resample)

SF = "/root/testdata/sf0.001"


def _reference(sf_dir, n_select=N_SELECT, n_buckets=N_FEATURE_BUCKETS,
               target=TARGET_SOURCE):
    t = pq.read_table(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text", "source"])
    ids = np.array(t["doc_id"].to_pylist(), dtype=np.int64)
    texts = t["text"].to_pylist()
    srcs = t["source"].to_pylist()
    tgt = np.zeros(n_buckets, dtype=np.int64)
    raw = np.zeros(n_buckets, dtype=np.int64)
    grams = [_bigram_buckets(x or "", n_buckets) for x in texts]
    for g, s in zip(grams, srcs):
        np.add.at(tgt if s == target else raw, g, 1)
    p = (tgt + _SMOOTH) / (tgt.sum() + _SMOOTH * n_buckets)
    q = (raw + _SMOOTH) / (raw.sum() + _SMOOTH * n_buckets)
    lr = np.log(p) - np.log(q)
    keep = np.array([s != target for s in srcs])
    logw = np.array([lr[g].sum() if len(g) else 0.0 for g in grams])
    key = logw + _gumbel_keys(ids)
    order = np.argsort(key[keep])[::-1][:n_select]
    sel_ids = ids[keep][order]
    sel_w = logw[keep][order]
    srt = np.argsort(sel_ids)
    return sel_ids[srt], sel_w[srt]


def test_dsir_matches_reference(ray_session):
    got = dsir_resample(SF).to_pandas()
    want_ids, want_w = _reference(SF)
    assert len(got) == N_SELECT
    np.testing.assert_array_equal(got["doc_id"].to_numpy(), want_ids)
    np.testing.assert_allclose(got["logw"].to_numpy(), want_w,
                               rtol=0, atol=0)


def test_dsir_excludes_target_and_shifts_distribution(ray_session):
    got = dsir_resample(SF).to_pandas()
    t = pq.read_table(f"{SF}/documents.parquet",
                      columns=["doc_id", "source"]).to_pandas()
    sel = t.set_index("doc_id").loc[got["doc_id"]]
    assert (sel["source"] != TARGET_SOURCE).all()
    # importance weighting must bias selection toward high-logw docs:
    # the selected mean logw beats the raw-corpus mean
    ids, w = _reference(SF, n_select=10**9)  # all raw docs, sorted by id
    assert got["logw"].mean() > w.mean()


def test_bigram_buckets_edges():
    assert len(_bigram_buckets("", 64)) == 0
    assert len(_bigram_buckets("one", 64)) == 0
    b = _bigram_buckets("a b c", 64)
    assert len(b) == 2 and ((0 <= b) & (b < 64)).all()
    # deterministic across calls
    np.testing.assert_array_equal(b, _bigram_buckets("a b c", 64))
