"""Planted-fixture tests for the corpus-cleaning ops (pii_redact,
repetition_filter, decontaminate): the sf* documents are PII-free word
soup, so these fixtures plant real emails/IPs/phones, pathological
repetition, and exact benchmark 8-gram overlaps to prove the ops act —
and re-check each against its DuckDB oracle on the planted table."""
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mycelium_ray.pipelines import cleaning

DOCS = [
    # eval-set doc (doc_id % 100 == 0) with a distinctive 8-gram
    (0, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # shares the planted 8-gram "alpha beta ... theta" -> contaminated
    (1, "prefix words alpha beta gamma delta epsilon zeta eta theta end"),
    # same words but 7-token overlap only -> clean
    (2, "beta gamma delta epsilon zeta eta theta other words here"),
    # PII-laden doc
    (3, "mail bob@example.com or 10.0.0.1 and call 555-123-4567 soon"),
    # pathological repetition (ratio 9/10 > 0.5 -> dropped)
    (4, "spam spam spam spam spam spam spam spam spam ham"),
    # diverse doc (ratio 0 -> kept)
    (5, "one two three four five six seven eight nine ten"),
    (6, ""),  # empty text: 0 tokens, no grams, no PII
    # three docs sharing a boilerplate footer line (df=3 > max_df=2)
    (7, "unique body seven\nCopyright Footer Inc"),
    (8, "unique body eight\nCopyright Footer Inc"),
    (9, "Copyright Footer Inc\nunique body nine\nmid line nine"),
]


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cleaning_sf")
    t = pa.table({"doc_id": pa.array([i for i, _ in DOCS], pa.int64()),
                  "text": pa.array([s for _, s in DOCS], pa.string())})
    pq.write_table(t, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM "
              f"'{sf_dir}/documents.parquet'")
    return c


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("fn,sql", [
    (cleaning.pii_redact, cleaning.PII_REDACT_SQL),
    (cleaning.repetition_filter, cleaning.REPETITION_FILTER_SQL),
    (cleaning.decontaminate, cleaning.DECONTAMINATE_SQL),
    (cleaning.boilerplate_lines, cleaning.BOILERPLATE_LINES_SQL),
])
def test_oracle_parity_on_planted(ray_session, sf_dir, con, fn, sql):
    got = _norm(fn(sf_dir).to_pandas())
    want = _norm(con.execute(sql).df())
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def test_pii_actually_redacted(ray_session, sf_dir):
    out = cleaning.pii_redact(sf_dir).to_pandas().set_index("doc_id")
    assert out.loc[3, "n_pii"] == 3
    assert out.loc[3, "clean_text"] == \
        "mail <EMAIL> or <IP> and call <PHONE> soon"
    assert out.loc[5, "n_pii"] == 0
    assert out.loc[5, "clean_text"] == "one two three four five six seven eight nine ten"


def test_repetition_gate(ray_session, sf_dir):
    out = cleaning.repetition_filter(sf_dir).to_pandas().set_index("doc_id")
    assert not out.loc[4, "keep"]          # 9x "spam" -> ratio 0.9
    assert out.loc[4, "n_distinct"] == 2
    assert out.loc[5, "keep"]              # all-distinct -> ratio 0.0
    assert out.loc[6, "n_tokens_f"] == 0   # empty text
    assert not out.loc[6, "keep"]          # ratio 1.0 by convention: empty
                                           # docs fail the gate (both sides)


def test_boilerplate_footer_dropped_order_kept(ray_session, sf_dir):
    out = cleaning.boilerplate_lines(sf_dir).to_pandas().set_index("doc_id")
    assert out.loc[7, "clean_text"] == "unique body seven"
    assert out.loc[7, "n_dropped"] == 1 and out.loc[7, "n_lines"] == 2
    # leading boilerplate removed, remaining lines keep their order
    assert out.loc[9, "clean_text"] == "unique body nine\nmid line nine"
    # non-repeated single-line docs untouched
    assert out.loc[5, "clean_text"] == \
        "one two three four five six seven eight nine ten"
    assert out.loc[5, "n_dropped"] == 0


def test_decontaminate_exact_8gram_boundary(ray_session, sf_dir):
    out = cleaning.decontaminate(sf_dir).to_pandas().set_index("doc_id")
    assert 0 not in out.index              # eval doc excluded from output
    assert bool(out.loc[1, "contaminated"])       # full 8-gram shared
    assert not bool(out.loc[2, "contaminated"])   # only 7 tokens shared
    assert not bool(out.loc[6, "contaminated"])   # empty text
