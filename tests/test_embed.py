"""Text-embedding stage: determinism + similarity geometry + Ray plumbing."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from png_from_pdf_extracter_ray.stages.embed import TextEmbedder, embed_texts

A = "the quick brown fox jumps over the lazy dog and runs into the forest tonight"
A_NEAR = A + " again"
B = "database query planners optimize join order using cardinality estimates"


def _cos(u: np.ndarray, v: np.ndarray) -> float:
    return float(np.dot(u, v))


def test_embedder_deterministic_and_normalized() -> None:
    e1, e2 = TextEmbedder(), TextEmbedder()
    v1, v2 = e1._embed_doc(A), e2._embed_doc(A)
    assert np.array_equal(v1, v2)
    assert abs(np.linalg.norm(v1) - 1.0) < 1e-6
    assert np.array_equal(TextEmbedder()._embed_doc(""), np.zeros(64, dtype=np.float32))


def test_embedding_similarity_tracks_text_similarity() -> None:
    e = TextEmbedder()
    va, vn, vb = e._embed_doc(A), e._embed_doc(A_NEAR), e._embed_doc(B)
    assert _cos(va, vn) > 0.9 > _cos(va, vb)


def test_embed_texts_dataset(ray_session) -> None:  # noqa: ANN001
    ds = rd.from_arrow(
        pa.Table.from_pydict({"doc_id": [1, 2, 3], "text": [A, A_NEAR, B]})
    )
    out = embed_texts(ds).to_pandas().sort_values("doc_id", ignore_index=True)
    assert list(out.columns) == ["doc_id", "embedding"]
    assert all(len(v) == 64 for v in out["embedding"])
    # batch path ≡ single-doc path
    assert np.allclose(out["embedding"][0], TextEmbedder()._embed_doc(A))
