"""Text → embedding stage (the model-inference shape of a training-data
pipeline).

``TextEmbedder`` is an actor-pool ``map_batches`` class: "model" state
(compiled tokenizer regex, hash seeds) is built once per actor in
``__init__`` — the slot where a real sentence-encoder would load its
weights — and ``__call__`` embeds a batch at a time.  The embedding
itself is a deterministic hashing-trick featurizer (signed feature
hashing onto ``dim`` buckets, L2-normalized): no model weights exist in
this container, but the vectors are real enough to drive the ANN /
near-dup stages downstream (similar texts → similar vectors), and the
Ray-side contract (schema, batching, actor lifecycle, composition with
``embedding_near_dup_pairs`` / ``cosine_topk``) is exactly the
production one — swap ``_embed_doc`` for a model forward pass.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

import ray.data as rd


class TextEmbedder:
    def __init__(
        self,
        id_col: str = "doc_id",
        text_col: str = "text",
        dim: int = 64,
        seed: int = 7,
    ) -> None:
        self.id_col, self.text_col, self.dim = id_col, text_col, dim
        self.token_re = re.compile(r"[a-z0-9]+")
        self.salt = f"emb:{seed}:".encode()

    def _token_hash(self, tok: str) -> int:
        return int.from_bytes(
            hashlib.blake2b(self.salt + tok.encode(), digest_size=8).digest(), "big"
        )

    def _embed_doc(self, text: str) -> np.ndarray:
        vec = np.zeros(self.dim, dtype=np.float32)
        toks = self.token_re.findall((text or "").lower())
        if toks:
            hs = np.fromiter(
                (self._token_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
            )
            buckets = (hs % np.uint64(self.dim)).astype(np.int64)
            signs = 1.0 - 2.0 * ((hs >> np.uint64(32)) & np.uint64(1)).astype(np.float32)
            np.add.at(vec, buckets, signs)
        n = float(np.linalg.norm(vec))
        if n > 0:
            vec /= n
        return vec

    def __call__(self, batch: pa.Table) -> pa.Table:
        vecs = [self._embed_doc(t) for t in batch[self.text_col].to_pylist()]
        return pa.Table.from_pydict(
            {
                self.id_col: batch[self.id_col],
                "embedding": pa.array(
                    [v.tolist() for v in vecs], pa.list_(pa.float32())
                ),
            }
        )


def embed_texts(
    ds: rd.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 64,
    concurrency: int | tuple[int, int] = (1, 8),
) -> rd.Dataset:
    """Attach the embedding actor pool to a text dataset."""
    return ds.map_batches(
        TextEmbedder,
        fn_constructor_kwargs={"id_col": id_col, "text_col": text_col, "dim": dim},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
