"""Round-4 operator invariants beyond the DuckDB oracle equality that
tests/test_queries.py already parametrizes over every key:

- image_channel_stats (rows-only: SQL can't decode image bytes) must
  equal a direct serial decode of the same derived corpus;
- bigram_lm_score per-doc invariants that hold for ANY corpus under the
  MLE bigram model (score <= 0, n_bigrams == n_tokens - 1);
- orders_band_join neighbor relation is symmetric, so the corpus-wide
  neighbor count is even and zero-neighbor orders still appear.
"""
import numpy as np
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_image_channel_stats_matches_serial_decode(ray_session):
    import pyarrow as pa

    from mycelium_ray.imaging import decode_image
    from mycelium_ray.pipelines.flagship import (derive_images_batch,
                                                 image_channel_stats)

    got = image_channel_stats(SF).to_pandas().sort_values("channel")

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    imgs = derive_images_batch(docs)
    n = np.zeros(3, np.int64)
    s = np.zeros(3, np.int64)
    ss = np.zeros(3, np.int64)
    for data in imgs["content"].to_pylist():
        px, _ = decode_image(data)
        p = px.reshape(-1, 3).astype(np.int64)
        n += p.shape[0]
        s += p.sum(axis=0)
        ss += (p * p).sum(axis=0)

    # integer partials are exact — distribution order cannot change them
    np.testing.assert_array_equal(got["n_px"].to_numpy(), n)
    np.testing.assert_array_equal(got["px_sum"].to_numpy(), s)
    np.testing.assert_array_equal(got["px_sumsq"].to_numpy(), ss)
    mean = s / n
    std = np.sqrt(ss / n - mean * mean)
    np.testing.assert_allclose(got["mean"].to_numpy(), mean, rtol=1e-12)
    np.testing.assert_allclose(got["std"].to_numpy(), std, rtol=1e-12)


def test_bigram_lm_score_invariants(ray_session):
    from mycelium_ray.pipelines import textops

    df = textops.bigram_lm_score(SF).to_pandas()
    # MLE bigram probability C2/C1 is always <= 1 → mean log-prob <= 0
    assert (df["lm_score"].to_numpy() <= 1e-12).all()
    assert (df["n_bigrams"].to_numpy() >= 1).all()

    # n_bigrams == n_tokens - 1 for every doc with >= 2 tokens, and
    # docs with < 2 tokens are absent
    tok = textops.token_count(SF).to_pandas().set_index("doc_id")
    merged = df.set_index("doc_id").join(tok, how="left")
    assert (merged["n_bigrams"] == merged["n_tokens"] - 1).all()
    absent = tok[~tok.index.isin(df["doc_id"])]
    assert (absent["n_tokens"] < 2).all()


def test_orders_band_join_symmetry(ray_session):
    from mycelium_ray.pipelines import analytics

    df = analytics.orders_band_join(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_orderkey"])
    # one output row per order, zero-neighbor orders included
    assert len(df) == orders.num_rows
    assert set(df["o_orderkey"]) == set(orders["o_orderkey"].to_pylist())
    # "within ±30 days, same customer" is symmetric → total count even
    assert int(df["n_nearby"].sum()) % 2 == 0
    assert (df.loc[df["n_nearby"] == 0, "nearby_revenue_c"] == 0).all()
