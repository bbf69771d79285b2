"""Deterministic subword hash-projection embedder (broadcast-weights).

Stand-in for the reference's downloadable embedding models (BPEmb / sBERT,
``load_data/word_embeddings.py:17-45``), which cannot be fetched in this
environment. Mirrors the *plumbing* honestly:

* a fixed weight matrix (rows = hashed subword buckets) is generated once
  from a seed, broadcast to executors, and looked up per subword — the same
  broadcast-model-weights execution pattern a real BPEmb/sBERT matrix needs;
* ``embed(word)`` = mean of the word's subword-bucket rows, exactly like
  the reference's ``model.embed(word).mean(axis=0)``
  (``word_embeddings.py:17-34``);
* subwords are character n-grams of the padded word, so near-identical
  words (typos, abbreviations) share buckets and get high cosine — the
  property the semantic-soft-TFIDF threshold path relies on.

Fully deterministic: bucket index is a stable FNV-1a hash (not Python's
randomized ``hash``), weights come from a seeded ``numpy`` generator.
"""

from __future__ import annotations

import numpy as np

DEFAULT_DIM = 64
DEFAULT_BUCKETS = 1 << 15  # 32768 rows x 64 dims x f32 = 8 MiB broadcast
_FNV_OFFSET = 0xCBF29CE484222325
_FNV_PRIME = 0x100000001B3
_MASK = (1 << 64) - 1


def fnv1a(data: bytes) -> int:
    h = _FNV_OFFSET
    for b in data:
        h = ((h ^ b) * _FNV_PRIME) & _MASK
    return h


def build_weights(
    dim: int = DEFAULT_DIM, buckets: int = DEFAULT_BUCKETS, seed: int = 42
) -> np.ndarray:
    """The 'model': a seeded random projection matrix, unit-norm rows."""
    rng = np.random.default_rng(seed)
    w = rng.standard_normal((buckets, dim)).astype(np.float32)
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    return w


def subword_buckets(word: str, buckets: int, ngram: int = 3) -> list[int]:
    """Bucket ids of the char n-grams of '<word>' (boundary-padded)."""
    padded = f"<{word}>"
    if len(padded) <= ngram:
        return [fnv1a(padded.encode("utf-8")) % buckets]
    return [
        fnv1a(padded[i : i + ngram].encode("utf-8")) % buckets
        for i in range(len(padded) - ngram + 1)
    ]


class HashEmbedder:
    """Callable word -> np.ndarray[dim], cache-backed; picklable via its
    (dim, buckets, seed) spec so executors rebuild identical weights."""

    def __init__(self, dim: int = DEFAULT_DIM, buckets: int = DEFAULT_BUCKETS, seed: int = 42):
        self.dim = dim
        self.buckets = buckets
        self.seed = seed
        self.weights_path: str | None = None
        #: (st_mtime_ns, st_size) of the weights file at construction —
        #: part of cache_key so a long-lived app that overwrites the npz
        #: in place and builds a NEW embedder never hits per-token cache
        #: entries computed from the old matrix
        self.weights_file_id: tuple[int, int] | None = None
        self._weights: np.ndarray | None = None
        self._cache: dict[str, np.ndarray] = {}

    @classmethod
    def from_weights(cls, path: str) -> "HashEmbedder":
        """Build an embedder whose weight matrix is LOADED from an
        ``.npz`` file (key ``weights``, shape (buckets, dim)) instead of
        seeded-random — the swap-in seam for real BPEmb/sBERT subword
        matrices (reference ``word_embeddings.py:17-45``): dropping a
        converted model file here changes no code. The path travels in
        the pickled spec, so executors load the same file (local mode /
        shared storage; on a cluster ship it with ``--files`` or point
        at distributed storage)."""
        import os

        with np.load(path) as data:
            w = np.asarray(data["weights"], dtype=np.float32)
        if w.ndim != 2:
            raise ValueError(f"weights must be 2-D (buckets, dim), got {w.shape}")
        emb = cls(dim=int(w.shape[1]), buckets=int(w.shape[0]))
        emb.weights_path = str(path)
        st = os.stat(path)
        emb.weights_file_id = (st.st_mtime_ns, st.st_size)
        emb._weights = w
        return emb

    @property
    def weights(self) -> np.ndarray:
        if self._weights is None:
            if self.weights_path is not None:
                # executor-side lazy reload: verify the file is STILL the
                # one the driver constructed from (identity + shape) —
                # an in-place overwrite mid-job would otherwise make
                # workers embed with two different matrices in one job
                # (and poison the per-token cache under the stale key)
                import os

                if self.weights_file_id is not None:
                    st = os.stat(self.weights_path)
                    if (st.st_mtime_ns, st.st_size) != self.weights_file_id:
                        raise ValueError(
                            f"weights file {self.weights_path} changed since "
                            "the embedder was constructed (mtime/size "
                            "mismatch) — rebuild the embedder via "
                            "HashEmbedder.from_weights() instead of "
                            "overwriting the file mid-job"
                        )
                with np.load(self.weights_path) as data:
                    w = np.asarray(data["weights"], dtype=np.float32)
                if w.shape != (self.buckets, self.dim):
                    raise ValueError(
                        f"weights file {self.weights_path} has shape "
                        f"{w.shape}, embedder expects "
                        f"({self.buckets}, {self.dim})"
                    )
                self._weights = w
            else:
                self._weights = build_weights(self.dim, self.buckets, self.seed)
        return self._weights

    def __call__(self, word: str) -> np.ndarray:
        v = self._cache.get(word)
        if v is None:
            rows = subword_buckets(word, self.buckets)
            v = self.weights[rows].mean(axis=0)
            self._cache[word] = v
        return v

    def embed_text(self, text: str, tokens: list[str] | None = None) -> np.ndarray:
        """Mean of per-token embeddings (reference word-level models mean
        over tokens, ``word_embeddings.py:73-91``)."""
        from .tokenize import tokenize_name

        toks = tokens if tokens is not None else tokenize_name(text)
        if not toks:
            return np.zeros(self.dim, dtype=np.float32)
        return np.mean([self(t) for t in toks], axis=0)

    def cache_key(self):
        """Namespace for worker-level per-token caches: two embedder
        configs in one worker process must never share cache entries."""
        if self.weights_path is not None:
            # file identity (mtime+size at construction) namespaces the
            # cache across in-place overwrites of the same path
            return (
                "hashfile",
                self.weights_path,
                self.weights_file_id,
                self.dim,
                self.buckets,
            )
        return ("hash", self.dim, self.buckets, self.seed)

    def __getstate__(self):
        return {
            "dim": self.dim,
            "buckets": self.buckets,
            "seed": self.seed,
            "weights_path": self.weights_path,
            "weights_file_id": self.weights_file_id,
        }

    def __setstate__(self, state):
        path = state.pop("weights_path", None)
        file_id = state.pop("weights_file_id", None)
        self.__init__(**state)
        self.weights_path = path
        self.weights_file_id = file_id


class CharCountEmbedder:
    """a-z character-count vectors (dim 26), integer-valued.

    Deliberately simple: integer-valued float64 dot products and norms
    are EXACT, so an independent SQL engine reproduces the cosine
    bit-for-bit — this is the embedder the driver-contract semantic
    soft-TFIDF query uses so the whole kernel is oracle-verifiable
    (the hash-projection embedder above covers the broadcast-model
    plumbing, pytest-pinned). Anagrams/proportional count vectors hit
    cosine 1.0 — exactly the embedder-collision case the kernel's
    identical-term shortcut guard handles."""

    dim = 26
    _ALPHABET = "abcdefghijklmnopqrstuvwxyz"

    def __call__(self, word: str) -> np.ndarray:
        return np.array(
            [word.count(c) for c in self._ALPHABET], dtype=np.float64
        )

    def embed_text(self, text: str, tokens: list[str] | None = None) -> np.ndarray:
        from .tokenize import tokenize_name

        toks = tokens if tokens is not None else tokenize_name(text)
        if not toks:
            return np.zeros(self.dim, dtype=np.float64)
        return np.mean([self(t) for t in toks], axis=0)

    def cache_key(self):
        return ("charcount",)
