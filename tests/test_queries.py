"""Runs every queries() entry at sf0.001 and compares against its DuckDB
oracle the same way the driver does: row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted)."""
import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(obj) -> pd.DataFrame:
    from .conftest import ds_to_pandas
    return ds_to_pandas(obj)


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns)).reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return c


@pytest.fixture(scope="module")
def qs():
    return entrymod.queries()


@pytest.fixture(scope="module")
def oracles():
    return entrymod.oracle_sql()


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())
ALL_KEYS = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_vs_oracle(ray_session, con, qs, oracles, name):
    got = _norm(_to_pandas(qs[name](SF)))
    want = _norm(con.execute(oracles[name]).df())
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: {len(got)} rows != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


@pytest.mark.parametrize("name", sorted(set(ALL_KEYS) - set(ORACLE_KEYS)))
def test_rows_only_queries_run(ray_session, qs, name):
    got = _to_pandas(qs[name](SF))
    assert len(got) >= 0
    assert len(got.columns) > 0


def test_entry_smoke(ray_session):
    ds = entrymod.entry()
    df = _to_pandas(ds)
    assert len(df) > 0
    assert df["decode_ok"].all()
    assert (df["w"] == df["w_true"]).all()
    assert (df["h"] == df["h_true"]).all()


def test_minhash_recall_vs_exact(ray_session, qs):
    """LSH candidates verified by exact Jaccard ⇒ output ⊆ exact pairs;
    recall at threshold 0.5 should be high with 16 bands × 4 rows."""
    exact = _to_pandas(qs["ngram_jaccard_pairs"](SF))
    lsh = _to_pandas(qs["minhash_lsh_dedup"](SF))
    epairs = set(zip(exact["doc_id_a"], exact["doc_id_b"]))
    lpairs = set(zip(lsh["doc_id_a"], lsh["doc_id_b"]))
    assert lpairs <= epairs
    if epairs:
        assert len(lpairs) / len(epairs) >= 0.8


def test_ann_lsh_recall(ray_session, qs):
    exact = _to_pandas(qs["ann_topk"](SF))
    approx = _to_pandas(qs["ann_topk_lsh"](SF))
    e = {(q, v) for q, v in zip(exact["query_id"], exact["vec_id"])}
    a = {(q, v) for q, v in zip(approx["query_id"], approx["vec_id"])}
    # unclustered random embeddings are LSH's worst case; multi-table
    # collision still has to beat random candidate selection clearly
    assert len(a & e) / len(e) >= 0.4


def test_connected_components_transitive(ray_session):
    """Multi-hop chains resolve to one component (label propagation must
    iterate past direct neighbors), islands stay separate."""
    import ray.data as rd

    from mycelium_ray.pipelines.dedup import connected_components
    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_id_a": [1, 2, 3, 4, 10, 20],
         "doc_id_b": [2, 3, 4, 5, 11, 21]}))
    got = _to_pandas(connected_components(pairs))
    labels = dict(zip(got["node"], got["label"]))
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                      10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_iterative_path_parity(ray_session, monkeypatch):
    """Force the >4M-edge iterative label-propagation path on the same
    graph the fast union-find path resolves, and require identical
    labels — this keeps the 100-TB shape exercised even though small
    graphs route to the single-task path."""
    import ray.data as rd

    import mycelium_ray.pipelines.dedup as dd
    pairs = rd.from_pandas(pd.DataFrame(
        {"doc_id_a": [1, 2, 3, 4, 10, 20],
         "doc_id_b": [2, 3, 4, 5, 11, 21]}))
    monkeypatch.setattr(dd, "SMALL_GRAPH_EDGES", 0)
    got = _to_pandas(dd.connected_components(pairs, n_buckets=4))
    labels = dict(zip(got["node"], got["label"]))
    assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1,
                      10: 10, 11: 10, 20: 20, 21: 20}


def test_pagerank_bsp_path_parity(ray_session, monkeypatch):
    """Force the >4M-edge BSP shuffle path and require bit-identical
    fixed-point ranks to the small-graph single-task path."""
    import mycelium_ray.pipelines.graph as gr
    fast = _to_pandas(gr.pagerank(SF)).sort_values("doc_id") \
        .reset_index(drop=True)
    monkeypatch.setattr(gr, "SMALL_GRAPH_EDGES", 0)
    bsp = _to_pandas(gr.pagerank(SF)).sort_values("doc_id") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(fast, bsp, check_dtype=False)


def test_corpus_filter_subset_semantics(ray_session, qs):
    """corpus_filter output ⊆ gates; every near-dup cluster non-rep is
    excluded."""
    kept = set(_to_pandas(qs["corpus_filter"](SF))["doc_id"])
    clusters = _to_pandas(qs["dedup_clusters"](SF))
    non_reps = set(clusters.loc[clusters["doc_id"] != clusters["rep"],
                                "doc_id"])
    assert not (kept & non_reps)
