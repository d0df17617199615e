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


def test_caption_tower_exactness():
    """Aligned non-dup rows: the caption tower renders byte-identical
    images (same seed, same path) ⇒ cosine exactly 1. Swapped captions
    and dup-group pixels land far below the gate."""
    from mycelium_ray.hashing import url_hash64
    from mycelium_ray.pipelines.flagship import synth_image_from_seed
    from mycelium_ray.pipelines.imageann import (_ALIGN_SWAP_SUFFIX,
                                                 CaptionAlignScore)
    docs = pq.read_table(f"{SF}/documents.parquet",
                         columns=["doc_id", "text"])
    rows = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    scorer = CaptionAlignScore()
    # pick one of each class deterministically
    aligned = next(d for d in sorted(rows) if d % 17 != 3 and d % 50 != 0)
    swapped = next(d for d in sorted(rows) if d % 17 == 3 and d % 50 != 0)
    dup = next(d for d in sorted(rows) if d % 50 == 0 and d % 17 != 3)
    # byte-identity for the aligned row
    img = synth_image_row(aligned, rows[aligned])[0]
    cap = synth_image_from_seed(url_hash64("txt:" + rows[aligned]))[0]
    assert img == cap
    e_img = embed_pixels(decode_image(img)[0], scorer.proj)
    assert float(e_img @ scorer._caption_embedding(rows[aligned])) == 1.0
    # swapped caption ⇒ different seed ⇒ below gate
    e_sw = embed_pixels(
        decode_image(synth_image_row(swapped, rows[swapped])[0])[0],
        scorer.proj)
    c_sw = scorer._caption_embedding(rows[swapped] + _ALIGN_SWAP_SUFFIX)
    assert float(e_sw @ c_sw) < SIM_THRESHOLD
    # dup-group pixels are not the caption's render ⇒ below gate
    e_dup = embed_pixels(
        decode_image(synth_image_row(dup, rows[dup])[0])[0], scorer.proj)
    c_dup = scorer._caption_embedding(rows[dup])
    assert float(e_dup @ c_dup) < SIM_THRESHOLD


def test_caption_align_e2e(ray_session):
    from mycelium_ray.pipelines.imageann import caption_align
    df = caption_align(SF).to_pandas()
    assert len(df) == 500
    want = (df["doc_id"] % 17 != 3) & (df["doc_id"] % 50 != 0)
    assert (df["align_ok"] == want).all()
    # both classes non-vacuous at the smallest sf
    assert df["align_ok"].sum() not in (0, len(df))
