"""Image embedding + similarity search (pipelines/imageann.py):
rows-only invariants for the embedding (unit norm, determinism,
dup-identity, non-dup separation) and a serial recompute of the
similarity search's gated pair set."""

import numpy as np
import pyarrow.parquet as pq

from mycelium_ray.imaging import decode_image
from mycelium_ray.pipelines.flagship import synth_image_row
from mycelium_ray.pipelines.imageann import (EMBED_DIM, QUERY_DOC_IDS,
                                             SIM_THRESHOLD, _projection,
                                             embed_pixels, image_embed,
                                             image_similarity_search)

SF = "/root/testdata/sf0.001"


def _serial_embeddings():
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    proj = _projection()
    out = {}
    for d, t in zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()):
        px, _ = decode_image(synth_image_row(d, t)[0])
        out[d] = embed_pixels(px, proj)
    return out


def test_embedding_invariants(ray_session):
    df = image_embed(SF).to_pandas()
    assert len(df) == 500 and df["embed_ok"].all()
    mat = np.stack([np.asarray(v) for v in df["embedding"]])
    assert mat.shape[1] == EMBED_DIM
    np.testing.assert_allclose(np.linalg.norm(mat, axis=1), 1.0,
                               atol=1e-12)
    # distributed result == serial recompute (determinism end to end)
    serial = _serial_embeddings()
    for d, v in zip(df["doc_id"], mat):
        np.testing.assert_allclose(v, serial[int(d)], atol=1e-12)


def test_dup_identity_and_separation(ray_session):
    emb = _serial_embeddings()
    ids = sorted(emb)
    # planted dup-group members embed IDENTICALLY (same pixels)
    for d in ids:
        if d % 50 == 0:
            rep = emb[d % 150]
            np.testing.assert_array_equal(emb[d], rep)
    # every cross-seed-key cosine stays clearly below the gate
    mat = np.stack([emb[d] for d in ids])
    sims = mat @ mat.T
    same_key = np.zeros_like(sims, dtype=bool)
    keyed = [(f"dup:{d % 150}" if d % 50 == 0 else f"txt:{d}")
             for d in ids]
    for i, ki in enumerate(keyed):
        for j, kj in enumerate(keyed):
            same_key[i, j] = ki == kj
    worst = sims[~same_key].max()
    assert worst < 0.9 < SIM_THRESHOLD, worst


def test_similarity_search_matches_serial(ray_session):
    got = image_similarity_search(SF).to_pandas()
    emb = _serial_embeddings()
    want = set()
    for q in QUERY_DOC_IDS:
        for d, v in emb.items():
            if float(emb[q] @ v) >= SIM_THRESHOLD:
                want.add((q, d))
    assert set(zip(got["query_id"], got["match_id"])) == want
    assert len(want) >= len(QUERY_DOC_IDS)  # self-matches ⇒ non-vacuous
