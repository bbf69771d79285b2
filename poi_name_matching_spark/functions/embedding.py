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

import hashlib
import os

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


def _file_identity(path: str) -> tuple[int, str]:
    """(size, sha256) of the file CONTENT — the staleness identity for
    file-backed embedders. Content-based (not mtime-based) so the same
    npz shipped to executors via ``SparkFiles`` (fresh copy, fresh
    mtime) or re-uploaded byte-identically still matches."""
    h = hashlib.sha256()
    size = 0
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
            size += len(chunk)
    return size, h.hexdigest()


def _resolve_weights_path(
    path: str, expected_id: tuple[int, str] | None = None
) -> str:
    """Executor-side path resolution: try the driver's absolute path
    (local mode / shared POSIX mount) AND the ``SparkFiles`` copy of the
    same basename (cluster mode with ``--files``/``spark.files``), and
    return the first candidate whose CONTENT identity matches
    ``expected_id``. Checking every candidate means a stale same-named
    file at the driver path on some executor host (leftover deploy, lagging
    NFS replica) cannot shadow a correctly shipped SparkFiles copy —
    shipping via ``--files`` stays robust. Only when no candidate
    matches does the mismatch fail loudly (in-place overwrite mid-job)."""
    candidates = []
    if os.path.exists(path):
        candidates.append(path)
    try:
        from pyspark import SparkFiles

        c = SparkFiles.get(os.path.basename(path))
        if os.path.exists(c) and c not in candidates:
            candidates.append(c)
    except Exception:
        pass
    if not candidates:
        raise FileNotFoundError(
            f"weights file {path!r} not found locally and not in SparkFiles; "
            "on a cluster ship it with --files (or spark.files) or place it "
            "on shared storage"
        )
    if expected_id is None:
        return candidates[0]
    for c in candidates:
        if _file_identity(c) == expected_id:
            return c
    raise ValueError(
        f"no copy of weights file {path!r} matches the content the "
        f"embedder was constructed from (checked: {candidates}; size/"
        "sha256 mismatch) — rebuild the embedder via from_weights() "
        "instead of overwriting the file mid-job"
    )


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
        #: (size, sha256) of the weights file CONTENT at construction —
        #: part of cache_key so a long-lived app that overwrites the npz
        #: in place and builds a NEW embedder never hits per-token cache
        #: entries computed from the old matrix. Content-based so
        #: SparkFiles copies (different path + mtime, same bytes) match.
        self.weights_file_id: tuple[int, str] | None = None
        self._weights: np.ndarray | None = None
        self._cache: dict[str, np.ndarray] = {}

    @classmethod
    def from_weights(cls, path: str) -> "HashEmbedder":
        """Build an embedder whose weight matrix is LOADED from an
        ``.npz`` file (key ``weights``, shape (buckets, dim)) instead of
        seeded-random — the swap-in seam for real BPEmb/sBERT subword
        matrices (reference ``word_embeddings.py:17-45``): dropping a
        converted model file here changes no code. The path travels in
        the pickled spec; executors load the driver path when it exists
        (local mode / shared POSIX mount) and otherwise fall back to the
        ``SparkFiles`` copy of the same basename — so on a cluster,
        ``spark-submit --files model.npz`` (or ``spark.files``) is the
        supported shipping route. Identity is verified by CONTENT
        (size + sha256), so the fresh-mtime SparkFiles copy matches and
        a different same-named file fails loudly."""
        with np.load(path) as data:
            w = np.asarray(data["weights"], dtype=np.float32)
        if w.ndim != 2:
            raise ValueError(f"weights must be 2-D (buckets, dim), got {w.shape}")
        emb = cls(dim=int(w.shape[1]), buckets=int(w.shape[0]))
        emb.weights_path = str(path)
        emb.weights_file_id = _file_identity(path)
        emb._weights = w
        return emb

    @property
    def weights(self) -> np.ndarray:
        if self._weights is None:
            if self.weights_path is not None:
                # executor-side lazy reload: resolve the file (driver
                # path or SparkFiles copy), then verify it is STILL the
                # one the driver constructed from (content identity +
                # shape) — an in-place overwrite mid-job would otherwise
                # make workers embed with two different matrices in one
                # job (and poison the per-token cache under a stale key)
                path = _resolve_weights_path(
                    self.weights_path, self.weights_file_id
                )
                with np.load(path) as data:
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
            # content identity (size+sha256 at construction) namespaces
            # the cache across in-place overwrites of the same path
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


class VocabEmbedder:
    """Word-level vocabulary embedder: exact token → vector lookup over a
    finite vocabulary, mean-pooled per text — the execution shape of the
    reference's word2vec / glove / fasttext models (``load_data/
    word_embeddings.py:73-136``: per-token ``model.get_vector`` then
    ``.mean(axis=0)``).

    Built from an ``.npz`` file with keys ``vocab`` (unicode array, V) and
    ``weights`` (V × dim float32) — the same file seam as
    :meth:`HashEmbedder.from_weights`, so a matrix exported from gensim
    (or trained in-Spark via :func:`..word2vec.train_word2vec`) drops in
    with no code change. Pickles carry only (path, content identity);
    executors lazily reload and verify by content hash.

    OOV policy: the reference calls gensim's ``get_vector``, which RAISES
    on unknown tokens (the reference never handles it). We default to
    skipping OOV tokens in the mean (``embed_text``) and returning zeros
    from ``__call__`` — the standard production choice; when every token
    is in-vocab (e.g. the model was trained on the same corpus) the two
    semantics coincide exactly."""

    def __init__(self, weights_path: str):
        self.weights_path = str(weights_path)
        self.weights_file_id: tuple[int, str] | None = None
        self._index: dict[str, int] | None = None
        self._weights: np.ndarray | None = None
        self._zero: np.ndarray | None = None

    @classmethod
    def from_weights(cls, path: str) -> "VocabEmbedder":
        emb = cls(path)
        emb.weights_file_id = _file_identity(path)
        emb._load(path)
        return emb

    def _load(self, path: str) -> None:
        with np.load(path, allow_pickle=False) as data:
            vocab = np.asarray(data["vocab"])
            w = np.asarray(data["weights"], dtype=np.float32)
        if w.ndim != 2 or len(vocab) != w.shape[0]:
            raise ValueError(
                f"vocab ({len(vocab)}) and weights {w.shape} disagree — "
                "expected weights (V, dim) with V == len(vocab)"
            )
        self._index = {str(t): i for i, t in enumerate(vocab)}
        self._weights = w
        self._zero = np.zeros(w.shape[1], dtype=np.float32)

    def _ensure_loaded(self) -> None:
        if self._weights is None:
            self._load(
                _resolve_weights_path(self.weights_path, self.weights_file_id)
            )

    @property
    def dim(self) -> int:
        self._ensure_loaded()
        return int(self._weights.shape[1])

    def __call__(self, word: str) -> np.ndarray:
        self._ensure_loaded()
        i = self._index.get(word)
        return self._zero if i is None else self._weights[i]

    def embed_text(self, text: str, tokens: list[str] | None = None) -> np.ndarray:
        from .tokenize import tokenize_name

        self._ensure_loaded()
        toks = tokens if tokens is not None else tokenize_name(text)
        rows = [self._index[t] for t in toks if t in self._index]
        if not rows:
            return self._zero
        # same float32 accumulation as np.ndarray.mean over looked-up rows
        return self._weights[rows].mean(axis=0)

    def cache_key(self):
        return ("vocabfile", self.weights_path, self.weights_file_id)

    def __getstate__(self):
        return {
            "weights_path": self.weights_path,
            "weights_file_id": self.weights_file_id,
        }

    def __setstate__(self, state):
        self.__init__(state["weights_path"])
        self.weights_file_id = state["weights_file_id"]


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
