"""Property-based robustness tests (hypothesis).

The canonicalization invariants here are what the crawl's seen-set parity
silently depends on: normalize must be idempotent and get/assign must
round-trip, for anything that parses at all.
"""
import hypothesis.strategies as st
import numpy as np
from hypothesis import given, settings

from mycelium_ray.frontier import FrontierEmpty, UrlClassifier
from mycelium_ray.robots import Robots
from mycelium_ray.state.urlseen import UrlSeenShard
from mycelium_ray.urlcanon import Url, UrlParseError

# url-ish strings: printable ascii with url punctuation over-weighted
_url_chars = st.sampled_from(
    list("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
         ":/?#[]@!$&'()*+,;=-._~% \t"))
urlish = st.text(alphabet=_url_chars, min_size=0, max_size=60)
hosts = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z]{2,4}){0,2}", fullmatch=True)


@settings(max_examples=300, deadline=None)
@given(urlish)
def test_parse_roundtrip_and_normalize_idempotent(s):
    try:
        u = Url(s)
    except UrlParseError:
        return  # rejection is fine; crashing is not
    except RecursionError:
        raise
    # serialize → reparse is stable WHEN the serialized form re-parses.
    # (Quirk preserved from the reference: the scheme setter marks
    # has_authority — Url.cc:391 — so bare "a:" serializes to "a://",
    # which assign() rejects for non-file schemes. Same behavior in C++.)
    s1 = u.get()
    try:
        u2 = Url(s1)
    except UrlParseError:
        return
    assert u2.get() == s1
    # normalize is idempotent
    try:
        n1 = Url(s).normalize().get()
    except UrlParseError:
        return  # normalize re-parses; some degenerate forms fail there
    n2 = Url(n1).normalize().get()
    assert n2 == n1


@settings(max_examples=100, deadline=None)
@given(hosts, st.lists(st.sampled_from("abc/."), min_size=0, max_size=12))
def test_http_urls_always_canonicalize(host, path_chars):
    s = f"http://{host}/" + "".join(path_chars)
    try:
        c = Url(s).normalize().get()
    except UrlParseError:
        return
    assert c.startswith("http://")
    assert Url(c).normalize().get() == c


@settings(max_examples=50, deadline=None)
@given(st.text(min_size=0, max_size=300))
def test_robots_parser_never_crashes(body):
    r = Robots()
    res = r.parse(body)
    assert res in (0, -1)
    assert r.path_allowed("any-agent", "/any/path") in (True, False)


@settings(max_examples=50, deadline=None)
@given(st.lists(st.tuples(hosts, st.integers(0, 10**6)),
                min_size=0, max_size=60),
       st.integers(1, 6))
def test_frontier_conservation(items, n_queues):
    """Everything pushed is popped exactly once; FIFO within host."""
    c = UrlClassifier(n_queues)
    for host, payload in items:
        c.push(host, payload)
    assert c.size() == len(items)
    drained = []
    while not c.empty():
        progressed = False
        for n in range(n_queues):
            try:
                drained.append(c.peek(n))
                c.pop(n)
                progressed = True
            except FrontierEmpty:
                continue
        assert progressed, "frontier stuck with items remaining"
    assert sorted(p for _, p in drained) == sorted(p for _, p in items)
    # FIFO within each host
    per_host: dict = {}
    for h, p in drained:
        per_host.setdefault(h, []).append(p)
    pushed: dict = {}
    for h, p in items:
        pushed.setdefault(h, []).append(p)
    assert per_host == pushed


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(0, 2**63 - 1), min_size=0, max_size=300))
def test_urlseen_no_false_drops(keys):
    """check_and_insert never drops a genuinely-novel key (exact-verify
    mode) and never double-admits a seen one."""
    s = UrlSeenShard(0, capacity=1 << 12)
    seen = set()
    arr = np.array(keys, dtype=np.uint64)
    out = s.check_and_insert(arr)
    for k, novel in zip(keys, out):
        assert novel == (k not in seen)
        seen.add(k)


def test_simhash_neardup_pigeonhole_complete(ray_session):
    """A hamming-6 pair that disagrees on ALL four 16-bit segments (the
    round-1 blocking scheme's blind spot) must be found by the 8x8-bit
    segment blocking, which is pigeonhole-complete for d <= 7."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from mycelium_ray.pipelines.dedup import simhash_neardup_pairs

    a = np.uint64(0x123456789ABCDEF0)
    # flip bits 1,17,33,49 (one per 16-bit segment) plus 2 more in seg 0:
    # every 16-bit segment differs, but 8-bit segments 1,3,5,7 (bits 8-15,
    # 24-31, 40-47, 56-63) are untouched
    flips = (np.uint64(1) << np.array([1, 2, 3, 17, 33, 49], dtype=np.uint64))
    b = a
    for f in flips:
        b ^= f
    assert bin(int(a ^ b)).count("1") == 6
    for seg in range(4):  # shares no 16-bit segment
        assert (int(a) >> (16 * seg)) & 0xFFFF != (int(b) >> (16 * seg)) & 0xFFFF
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "simhash": np.array([a, b, np.uint64(0xFFFFFFFFFFFFFFFF ^ a)])
        .astype("int64"),
    }))
    out = simhash_neardup_pairs(ds, max_hamming=7).to_pandas()
    assert list(zip(out["doc_id_a"], out["doc_id_b"])) == [(1, 2)]
    assert out["hamming"].tolist() == [6]


def test_simhash_neardup_adaptive_segments_complete_any_d(ray_session):
    """Segments adapt to the contract (d+1 disjoint spans): a planted
    hamming-8 pair is found at max_hamming=8, missed at max_hamming=3."""
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from mycelium_ray.pipelines.dedup import (_simhash_segments,
                                              simhash_neardup_pairs)
    assert sum(w for _, w in _simhash_segments(3)) == 64
    assert len(_simhash_segments(3)) == 4
    assert sum(w for _, w in _simhash_segments(8)) == 64
    a = np.uint64(0x0F0F0F0F0F0F0F0F)
    b = a ^ np.uint64(0x0101010101010101)  # 8 flipped bits, one per byte
    assert bin(int(a ^ b)).count("1") == 8
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": [1, 2], "simhash": np.array([a, b]).astype("int64")}))
    out8 = simhash_neardup_pairs(ds, max_hamming=8).to_pandas()
    assert list(zip(out8["doc_id_a"], out8["doc_id_b"])) == [(1, 2)]
    out3 = simhash_neardup_pairs(ds, max_hamming=3).to_pandas()
    assert len(out3) == 0  # distance 8 > contract 3: correctly excluded


def test_ann_lsh_actually_prunes(ray_session):
    """Signatures gate the exact matmul: scored candidate fraction must be
    well below 1 (round-1 computed exact sims for every row and only
    filtered afterwards)."""
    from mycelium_ray.pipelines.ann import ann_topk_lsh
    _, stats = ann_topk_lsh("/root/testdata/sf0.001", with_stats=True)
    assert stats["n_rows_x_queries"] > 0
    frac = stats["n_candidates"] / stats["n_rows_x_queries"]
    assert frac < 0.5, frac


def test_embedding_neardup_blockwise_matches_full_matmul(ray_session, tmp_path):
    """A skewed label (one label owns nearly all vectors) must produce the
    same pair set as a full O(n^2) matmul — blockwise split is invisible."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    from mycelium_ray.pipelines import ann

    rng = np.random.default_rng(7)
    n, dim = 300, 16
    emb = rng.standard_normal((n, dim)).astype(np.float32)
    emb[1] = emb[0] + 0.01 * emb[1]          # planted near-dup
    labels = np.zeros(n, dtype=np.int64)     # one hot label
    labels[-3:] = 1
    pq.write_table(pa.table({
        "vec_id": pa.array(np.arange(n), pa.int64()),
        "label": pa.array(labels, pa.int64()),
        "embedding": pa.array(list(emb), pa.list_(pa.float32())),
    }), tmp_path / "embeddings.parquet")

    old = ann.NEARDUP_BLOCK_ELEMS
    ann.NEARDUP_BLOCK_ELEMS = 64 * n  # force many small blocks (block≈64)
    try:
        got = ann.embedding_neardup(str(tmp_path), threshold=0.3).to_pandas()
    finally:
        ann.NEARDUP_BLOCK_ELEMS = old

    e = emb.astype(np.float64)
    en = e / np.linalg.norm(e, axis=1, keepdims=True)
    sims = en @ en.T
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if labels[i] == labels[j] and sims[i, j] >= 0.3:
                want.add((i, j))
    assert set(zip(got["vec_id_a"], got["vec_id_b"])) == want
    assert (0, 1) in want


def test_ann_ivf_recall_and_pruning(ray_session):
    """IVF coarse quantization: recall vs brute force must clearly beat
    random candidate selection, and the scored fraction must be close to
    nprobe/N_CENTROIDS (the pruning is structural)."""
    import __ray_entry__ as em
    from mycelium_ray.pipelines.ann import ann_topk_ivf, N_CENTROIDS, NPROBE
    SF = "/root/testdata/sf0.001"
    exact = em.queries()["ann_topk"](SF).to_pandas()
    approx, stats = ann_topk_ivf(SF, with_stats=True)
    approx = approx.to_pandas()
    e = {(q, v) for q, v in zip(exact["query_id"], exact["vec_id"])}
    a = {(q, v) for q, v in zip(approx["query_id"], approx["vec_id"])}
    assert len(a & e) / len(e) >= 0.4
    frac = stats["n_candidates"] / stats["n_rows_x_queries"]
    assert frac <= 2.5 * NPROBE / N_CENTROIDS, frac


def test_robots_vectorized_property():
    """Property: path_allowed_many ≡ scalar path_allowed on random rule
    sets and adversarial random paths."""
    from hypothesis import given, settings, strategies as st
    import numpy as np
    from mycelium_ray.robots import Robots

    path_chars = st.sampled_from(list("abc/%7E.~_-%2F \t?*$"))
    paths_st = st.lists(
        st.text(path_chars, min_size=0, max_size=12).map(lambda s: "/" + s),
        min_size=1, max_size=20)
    rules_st = st.lists(
        st.tuples(st.sampled_from(["Allow", "Disallow"]),
                  st.text(st.sampled_from(list("abc/~%7E")), max_size=6)),
        min_size=0, max_size=5)

    @settings(max_examples=60, deadline=None)
    @given(rules=rules_st, paths=paths_st)
    def check(rules, paths):
        body = "User-agent: *\n" + "".join(
            f"{kind}: {text}\n" for kind, text in rules)
        r = Robots(body)
        got = r.path_allowed_many("*", paths)
        want = np.array([r.path_allowed("*", p) for p in paths])
        assert (got == want).all()

    check()


def test_simhash_blocking_complete_property():
    """Property: for random 64-bit hashes, every pair within the stated
    max_hamming is found (pigeonhole blocking has NO false negatives)."""
    from hypothesis import given, settings, strategies as st
    import numpy as np
    import pandas as pd
    import ray.data as rd
    from mycelium_ray.pipelines.dedup import simhash_neardup_pairs

    @settings(max_examples=5, deadline=None)
    @given(seed=st.integers(0, 10_000), d=st.sampled_from([2, 3, 5]))
    def check(seed, d):
        rng = np.random.default_rng(seed)
        base = rng.integers(0, 2**63, size=6, dtype=np.int64)
        rows = list(base)
        # planted neighbors at distance exactly d from each base hash
        for b in base:
            flips = rng.choice(64, size=d, replace=False)
            v = np.uint64(b)
            for f in flips:
                v ^= np.uint64(1) << np.uint64(f)
            rows.append(np.int64(v.view(np.int64)))
        ids = np.arange(len(rows))
        h = np.array(rows, dtype=np.int64)
        ds = rd.from_pandas(pd.DataFrame({"doc_id": ids, "simhash": h}))
        got = simhash_neardup_pairs(ds, max_hamming=d).to_pandas()
        gpairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
        hu = h.astype(np.uint64)
        for i in range(len(h)):
            for j in range(i + 1, len(h)):
                if bin(int(hu[i] ^ hu[j])).count("1") <= d:
                    assert (i, j) in gpairs, (i, j)
    check()


def test_ann_indexed_matches_in_memory_ivf(ray_session):
    """The persisted-index probe must be bit-identical to the in-memory
    IVF at equal parameters (same centroid training, same deterministic
    assignment, same candidate sets) — the index changes WHERE bytes are
    read, never WHAT is computed."""
    import shutil

    import pandas as pd

    from mycelium_ray.pipelines.ann import ann_topk_indexed, ann_topk_ivf
    shutil.rmtree("/tmp/mycelium_ann_index", ignore_errors=True)
    sf = "/root/testdata/sf0.001"
    mem = ann_topk_ivf(sf).to_pandas()
    idx = ann_topk_indexed(sf).to_pandas()
    pd.testing.assert_frame_equal(idx.reset_index(drop=True),
                                  mem.reset_index(drop=True))


def test_ann_indexed_prunes_reads(ray_session):
    """With a small nprobe the probe must open strictly fewer cell
    partitions than exist — unneeded cells never leave storage."""
    from mycelium_ray.pipelines.ann import ann_topk_indexed
    _, stats = ann_topk_indexed("/root/testdata/sf0.001", nprobe=2,
                                with_stats=True)
    assert stats["n_cells_read"] < stats["n_cells_total"]
    assert stats["n_candidates"] <= stats["n_rows_x_queries"]


def test_substring_dedup_planted_span(ray_session, tmp_path):
    """A w-token span shared by two docs (and only that span) is removed
    from BOTH docs; surrounding unique tokens survive; a third doc with
    no cross-doc window is untouched."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from mycelium_ray.pipelines.dedup import substring_dedup

    span = " ".join(f"dup{i}" for i in range(8))        # exactly w=8 tokens
    a = "alpha beta " + span + " gamma delta"
    b = "one two three " + span + " four"
    c = "totally unique words that never repeat anywhere else at all"
    pq.write_table(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([a, b, c], pa.string()),
    }), str(tmp_path / "documents.parquet"))

    out = substring_dedup(str(tmp_path)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert out["doc_id"].tolist() == [1, 2, 3]
    assert out["n_removed"].tolist() == [8, 8, 0]
    assert out["clean_text"].tolist() == [
        "alpha beta gamma delta", "one two three four", c]


@settings(max_examples=40, deadline=None)
@given(seed=st.integers(0, 10**6), h=st.integers(1, 40),
       w=st.integers(1, 40), quality=st.sampled_from([80, 92, 98]))
def test_progressive_jpeg_always_matches_baseline(seed, h, w, quality):
    """Progressive and baseline share the quantizer, so decoded output
    must be bit-identical for ANY image/shape/quality — the entropy
    layers (EOB runs, refinement buffering) carry no loss of their own."""
    import numpy as np

    from mycelium_ray.jpeg import decode_jpeg, encode_jpeg
    from mycelium_ray.jpegprog import encode_jpeg_progressive

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert np.array_equal(base, prog)
