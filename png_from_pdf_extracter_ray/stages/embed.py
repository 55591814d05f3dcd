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

import re

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

_EMB_ODD = np.uint64(0x9E3779B97F4A7C15)  # odd 64-bit mix constant


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
        # seed folded arithmetically into the token hash (multiply-add
        # post-mix over one hash_array pass — no per-token Python hashing)
        self.seed_add = np.uint64(seed * 2 + 1)

    def _embed_batch(self, texts: list[str]) -> np.ndarray:
        """(len(texts), dim) float32 — the WHOLE batch in one hash pass:
        tokens concatenated across docs, one ``pd.util.hash_array``, one
        scattered add into the flattened matrix, row-normalize."""
        tok_lists = [self.token_re.findall((t or "").lower()) for t in texts]
        counts = np.fromiter(
            (len(t) for t in tok_lists), dtype=np.int64, count=len(tok_lists)
        )
        mat = np.zeros((len(texts), self.dim), dtype=np.float32)
        total = int(counts.sum())
        if total:
            all_toks = np.empty(total, dtype=object)
            pos = 0
            for toks in tok_lists:
                all_toks[pos : pos + len(toks)] = toks
                pos += len(toks)
            hs = (pd.util.hash_array(all_toks) + self.seed_add) * _EMB_ODD
            buckets = (hs % np.uint64(self.dim)).astype(np.int64)
            signs = 1.0 - 2.0 * ((hs >> np.uint64(32)) & np.uint64(1)).astype(
                np.float32
            )
            doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), counts)
            np.add.at(mat.reshape(-1), doc_idx * self.dim + buckets, signs)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return mat / norms

    def _embed_doc(self, text: str) -> np.ndarray:
        """Single-doc wrapper over the batch kernel (both paths share one
        definition by construction)."""
        return self._embed_batch([text])[0]

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = self._embed_batch(batch[self.text_col].to_pylist())
        return pa.Table.from_pydict(
            {
                self.id_col: batch[self.id_col],
                "embedding": pa.array(mat.tolist(), pa.list_(pa.float32())),
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
