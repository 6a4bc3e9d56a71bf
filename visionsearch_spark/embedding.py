"""Pluggable embedder surface: name-keyed factory + batch feature UDFs.

The reference's central extension point is an abstract embedder with
`extract_text_feature` / `extract_image_feature` / `get_embed_dim` and a
name-keyed factory that picks the implementation
(`/root/reference/visionsearch/common_utils/embedding/base.py:6-13`,
`embedding/__init__.py:5-11`; impls `clip/core.py:16-32`,
`perception_encoder/core.py:21-40`). This module reproduces that shape
Spark-first:

* :class:`BaseEmbedder` — the abstract surface; implementations are
  BATCH functions (ndarray in/out), which maps 1:1 onto Arrow-batched
  `pandas_udf` execution — never per-row Python.
* :func:`register_embedder` / :func:`create_embedder` — the factory.
  Wiring a real model (CLIP et al.) is registering one class; the GPU
  libs aren't in this container, so the bundled model is the
  deterministic stub below.
* :class:`HashProjectionEmbedder` — a DETERMINISTIC text embedder:
  tokens (the frozen analyzer spec) hash to integers (low 8 md5 bytes,
  little-endian — DuckDB's `md5_number_lower`, so the whole computation
  has an exact ANSI-SQL twin), each token contributes an integer-valued
  pseudo-random offset per dimension, per-doc sums are L2-normalized.
  ALL accumulation is integer (order-independent => bit-identical
  across Spark partitionings and vs the DuckDB oracle, including the
  squared-norm, summed as exact integers); the only float ops are one
  sqrt and one division per component — IEEE-deterministic in every
  engine. Not a semantic embedding — the deterministic stand-in that
  makes the dense pipeline (text -> embedding -> ANN index -> recall
  eval) testable end-to-end without model weights.
* :func:`embed_text` — the batch operator: DataFrame in,
  (id, embedding array<double>) out via one Arrow-batched pandas_udf.
"""

from __future__ import annotations

import hashlib
import math
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from visionsearch_spark.analyzer import tokenize

# Embedder arithmetic constants — mirrored verbatim in the DuckDB twin
# (__spark_entry__._embed_hashproj_oracle). All mod-P affine, like the
# MinHash/SimHash families.
EMBED_PRIME = 2_147_483_647          # 2^31 - 1
EMBED_MULT = 1_103_515_245
EMBED_OFFSET = 12_345
EMBED_STEP = 1_299_709               # per-dimension stride (prime)
EMBED_HALF = (EMBED_PRIME - 1) // 2  # centers values on 0


class BaseEmbedder:
    """Abstract embedder (reference shape: `embedding/base.py:6-13`).

    Implementations are whole-batch: lists/ndarrays in, (n, dim) float64
    ndarray out — the shape a `pandas_udf` feeds. A text-only or
    image-only model raises NotImplementedError for the other modality,
    exactly like the reference's text-only encoders."""

    model_name: str = "base"

    def get_embed_dim(self) -> int:
        raise NotImplementedError

    def extract_text_feature(self, texts: list[str]) -> np.ndarray:
        raise NotImplementedError

    def extract_image_feature(self, payloads: list[bytes]) -> np.ndarray:
        raise NotImplementedError


_REGISTRY: dict[str, type] = {}


def register_embedder(name: str, cls: type) -> None:
    """Register an embedder class under a model name (the reference's
    factory dict, `embedding/__init__.py:5-11`)."""
    _REGISTRY[name] = cls


def create_embedder(model_name: str, **kwargs) -> BaseEmbedder:
    """Name-keyed factory. Unknown names list what IS registered."""
    try:
        cls = _REGISTRY[model_name]
    except KeyError:
        raise ValueError(
            f"unknown embedder {model_name!r}; registered: "
            f"{sorted(_REGISTRY)}"
        ) from None
    return cls(**kwargs)


def token_hash(term: str) -> int:
    """Token -> [0, EMBED_PRIME): low 8 bytes of md5, little-endian
    (== DuckDB `md5_number_lower`), reduced mod P. Cross-engine by
    construction: md5 is md5 everywhere."""
    raw = struct.unpack("<Q", hashlib.md5(term.encode()).digest()[8:])[0]
    return raw % EMBED_PRIME


class HashProjectionEmbedder(BaseEmbedder):
    """Deterministic hash-projection text embedder (see module doc).

    Component j of a doc: raw_j = Σ_tokens v(h_t, j) with
        g = (h_t + j·STEP) mod P
        v = (MULT·g + OFFSET) mod P − HALF          (integer, centered)
    then e_j = raw_j / sqrt(Σ_j raw_j²) — the squared norm is summed as
    EXACT integers (python ints; the oracle uses HUGEINT) so the sqrt
    input is bit-identical everywhere. Zero-token docs embed to the zero
    vector."""

    model_name = "hash-projection"

    def __init__(self, dim: int = 16):
        if dim <= 0:
            raise ValueError(f"dim must be positive, got {dim}")
        self.dim = dim

    def get_embed_dim(self) -> int:
        return self.dim

    def extract_text_feature(self, texts: list[str]) -> np.ndarray:
        dim = self.dim
        j = np.arange(dim, dtype=np.int64)
        out = np.zeros((len(texts), dim), dtype=np.float64)
        for i, t in enumerate(texts):
            toks = tokenize(t)
            if not toks:
                continue
            h = np.array([token_hash(tok) for tok in toks], dtype=np.int64)
            g = (h[:, None] + j[None, :] * EMBED_STEP) % EMBED_PRIME
            v = (EMBED_MULT * g + EMBED_OFFSET) % EMBED_PRIME - EMBED_HALF
            raw = v.sum(axis=0)  # int64: |v| < 2^31, dl < 2^32 rows
            n2 = sum(int(x) * int(x) for x in raw)  # exact integer
            if n2 > 0:
                out[i] = raw.astype(np.float64) / math.sqrt(float(n2))
        return out


register_embedder(HashProjectionEmbedder.model_name, HashProjectionEmbedder)


def embed_text(
    docs: DataFrame,
    model_name: str = "hash-projection",
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
    **model_kwargs,
) -> DataFrame:
    """Batch text embedding: (id, embedding array<double>) via ONE
    Arrow-batched pandas_udf — the dense twin of the lexical tokenizer
    UDF surface (SURVEY §2.9). The embedder instance is memoized in a
    MODULE-LEVEL cache keyed on (model_name, kwargs): the module is
    imported once per python worker process, so a heavy model loads once
    per worker and is reused across every task/batch that worker runs —
    a closure-captured cache would be re-deserialized empty with EVERY
    task (review finding r4) and reload weights per task. model_kwargs
    values must be hashable. Output feeds build_ann_index /
    build_ivf_index / build_ivfpq_index unchanged."""
    key_kwargs = tuple(sorted(model_kwargs.items()))

    @F.pandas_udf("array<double>")
    def emb_udf(texts: pd.Series) -> pd.Series:
        emb = _worker_embedder(model_name, key_kwargs)
        mat = emb.extract_text_feature(texts.tolist())
        return pd.Series(list(mat))

    return docs.select(F.col(id_col), emb_udf(F.col(text_col)).alias(out_col))


# per-python-worker embedder instances (see embed_text docstring)
_WORKER_EMBEDDERS: dict[tuple, BaseEmbedder] = {}


def _worker_embedder(model_name: str, key_kwargs: tuple) -> BaseEmbedder:
    key = (model_name, key_kwargs)
    emb = _WORKER_EMBEDDERS.get(key)
    if emb is None:
        emb = _WORKER_EMBEDDERS[key] = create_embedder(
            model_name, **dict(key_kwargs)
        )
    return emb
