"""phash-band near-dup over the image corpus: the corpus reuses pixel
buffers for some rows (dup_pairs), so known near-dups must be found."""
import numpy as np
import pyarrow as pa

from mycelium_ray.corpus import generate_corpus
from mycelium_ray.imaging import decode_image, phash64, hamming64
from mycelium_ray.pipelines.imagedup import phash_neardup


def test_phash_neardup_finds_reused_pixels(ray_session):
    images, site, seeds = generate_corpus(n_hosts=8, pages_per_host=6, seed=42)
    # ground truth: decode every image, group by decoded-phash hamming
    rows = images.select(["image_id", "phash"])
    out = phash_neardup(rows, max_hamming=6).to_pandas()
    found = set(zip(out["id_a"].tolist(), out["id_b"].tolist()))

    # brute-force ground truth from the table itself
    ids = images.column("image_id").to_pylist()
    ph = images.column("phash").to_pylist()
    want = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if hamming64(ph[i], ph[j]) <= 6:
                a, b = sorted((ids[i], ids[j]))
                want.add((a, b))
    # banding guarantees recall for hamming ≤ 3 (pigeonhole over 4 bands);
    # wider pairs may be missed, so found ⊆ want and the tight pairs are in
    assert found <= want
    tight = {(a, b) for (a, b) in want
             if hamming64(ph[ids.index(a)], ph[ids.index(b)]) <= 3}
    assert tight <= found
    # the corpus's deliberate pixel-reuse rows produce at least one pair
    assert len(tight) > 0


def test_phash_neardup_empty(ray_session):
    t = pa.table({"image_id": ["a", "b"], "phash": [0, -1]})  # hamming 64
    from tests.conftest import ds_to_pandas
    out = phash_neardup(t, max_hamming=4)
    df = ds_to_pandas(out)
    assert len(df) == 0
    # the Arrow-typed final stage preserves the schema on empty results
    assert list(df.columns) == ["id_a", "id_b", "hamming"]


def test_image_metadata_probe_matches_true_dims(ray_session):
    """Header-only probe must agree with the derive-time true dims and
    format for EVERY row — no pixel decode happened to get them."""
    import ray.data as rd

    from mycelium_ray.pipelines.flagship import (derive_images_batch,
                                                 image_metadata)
    sf = "/root/testdata/sf0.001"
    probed = image_metadata(sf).to_pandas().set_index("doc_id")
    truth = rd.read_parquet(f"{sf}/documents.parquet",
                            columns=["doc_id", "text"]) \
        .map_batches(derive_images_batch, batch_format="pyarrow") \
        .to_pandas().set_index("doc_id")
    assert probed["probe_ok"].all()
    joined = probed.join(truth, rsuffix="_t")
    assert (joined["w"] == joined["w_true"]).all()
    assert (joined["h"] == joined["h_true"]).all()
    assert (joined["fmt"] == joined["fmt_t"]).all()
