

def test_ann_topk_pq_recall_and_compression(ray_session):
    """PQ/ADC with exact refine: perfect self-retrieval at rank 1, high
    recall vs brute force (the refine step reranks the ADC shortlist
    with exact float math), and the codes realize the advertised 32x
    compression."""
    from mycelium_ray.pipelines.ann import ann_topk, ann_topk_pq
    sf = "/root/testdata/sf0.001"
    exact = ann_topk(sf).to_pandas()
    table, stats = ann_topk_pq(sf, with_stats=True)
    pq = table.to_pandas()
    assert stats["compression"] == 32.0
    assert stats["bytes_pq"] * 32 == stats["bytes_raw"]
    top1 = pq[pq["rank"] == 1]
    assert dict(zip(top1["query_id"], top1["vec_id"])) == \
        {q: q for q in exact["query_id"].unique()}
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["vec_id"])
        p = set(pq[pq["query_id"] == q]["vec_id"])
        recalls.append(len(e & p) / len(e))
    assert sum(recalls) / len(recalls) >= 0.8


def test_pq_encode_deterministic_and_bounded(ray_session):
    import numpy as np

    from mycelium_ray.pipelines.ann import (PQ_K, PQ_M, _pq_encode,
                                            _train_pq_codebooks)
    books = _train_pq_codebooks("/root/testdata/sf0.001")
    assert books.shape[0] == PQ_M and books.shape[1] == PQ_K
    rng = np.random.default_rng(3)
    x = rng.standard_normal((40, PQ_M * books.shape[2]))
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    c1 = _pq_encode(x, books)
    c2 = _pq_encode(x, books)
    assert (c1 == c2).all()
    assert c1.dtype == np.uint8 and c1.max() < PQ_K


def test_ann_recall_harness(ray_session):
    """The evaluation op reports sane recalls for every approximate path
    (unclustered gaussian embeddings are the LSH/IVF worst case, so the
    floors are conservative; PQ refines a shortlist and stays high)."""
    from mycelium_ray.pipelines.ann import ann_recall

    got = ann_recall("/root/testdata/sf0.001").to_pandas() \
        .set_index("method")
    assert set(got.index) == {"hnsw", "lsh", "ivf", "ivf_indexed", "pq"}
    assert (got["n_queries"] == 5).all()
    assert (got["recall_at_k"] <= 1.0).all()
    assert got.loc["pq", "recall_at_k"] >= 0.8
    assert got.loc["lsh", "recall_at_k"] >= 0.4
    assert got.loc["ivf", "recall_at_k"] >= 0.4
    # the persisted index must agree with the in-memory IVF path
    assert got.loc["ivf_indexed", "recall_at_k"] == \
        got.loc["ivf", "recall_at_k"]


class TestHnsw:
    def test_kernel_recall_and_determinism(self):
        import numpy as np

        from mycelium_ray.hnsw import HNSW
        rng = np.random.default_rng(0)
        n, dim, k = 1200, 24, 10
        X = rng.standard_normal((n, dim))
        idx = HNSW(dim)
        for i in range(n):
            idx.add(i, X[i])
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        recalls = []
        for qi in range(30):
            got = {vid for _s, vid in idx.search(X[qi], k, ef=64)}
            truth = set(np.argsort(-(Xn @ Xn[qi]))[:k].tolist())
            recalls.append(len(got & truth) / k)
        assert np.mean(recalls) >= 0.95
        # a self-query's nearest neighbor is itself
        assert idx.search(X[3], 1)[0][1] == 3
        # same data, same graph, same results
        idx2 = HNSW(dim)
        for i in range(n):
            idx2.add(i, X[i])
        assert idx.search(X[7], k) == idx2.search(X[7], k)

    def test_kernel_edges(self):
        import numpy as np

        from mycelium_ray.hnsw import HNSW
        idx = HNSW(4)
        assert idx.search(np.ones(4), 3) == []
        idx.add(42, np.array([1.0, 0, 0, 0]))
        assert [v for _s, v in idx.search(np.array([1.0, 0, 0, 0]), 3)] \
            == [42]
        # degree stays bounded at every level
        rng = np.random.default_rng(1)
        big = HNSW(8, m=4)
        for i in range(300):
            big.add(i, rng.standard_normal(8))
        for node_links in big.links:
            for lvl, nbs in enumerate(node_links):
                assert len(nbs) <= (big.m0 if lvl == 0 else big.m)

    def test_pipeline_recall_floor(self, ray_session):
        from mycelium_ray.pipelines.ann import ann_recall
        df = ann_recall("/root/testdata/sf0.001").to_pandas()
        r = df.set_index("method")["recall_at_k"]
        assert r["hnsw"] >= 0.9   # graph path: the strongest approximate
