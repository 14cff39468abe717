"""Vectorized text/scalar function library.

Reference analog: the named string-transform registry
(``multiomics_kg/download/utils/annotation_transforms.py:27-278``), the
``clean_text`` sanitizer (``multiomics_kg/utils/curie_utils.py:38-53``) and the
fingerprint/token utilities the reference lacks but a 100 TB training-data
pipeline needs (token counting, shingling, MinHash, SimHash, rolling hashes).

All functions here operate on whole Arrow arrays / numpy object arrays —
never call them in a Python per-row loop from a hot ``map_batches`` stage.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ------------------------------------------------------------------ sanitize

def clean_text(arr: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    """Sanitizer pass (curie_utils.py:38-53 analog): ``'`` → ``^``, ``|`` → ``,``.

    Parquet needs no CSV escaping, but the sanitizer is kept as an output-
    parity conformance knob for the batch-writer contract.
    """
    out = pc.replace_substring(arr, "'", "^")
    return pc.replace_substring(out, "|", ",")


def normalize_ws_lower(arr: pa.Array | pa.ChunkedArray):
    """Lowercase + collapse runs of whitespace to single spaces + trim."""
    out = pc.utf8_lower(arr)
    out = pc.replace_substring_regex(out, r"\s+", " ")
    return pc.utf8_trim_whitespace(out)


# -------------------------------------------------------------- fingerprints

def md5_hex(texts: list[str | None]) -> list[str | None]:
    """Per-string md5 hexdigest — matches DuckDB ``md5()`` exactly."""
    return [
        None if t is None else hashlib.md5(t.encode("utf-8")).hexdigest()
        for t in texts
    ]


_ROLL_MOD = (1 << 61) - 1
_ROLL_BASE = 257


def rolling_fingerprint(text: str) -> int:
    """Polynomial rolling hash over bytes mod 2^61-1 (document fingerprint)."""
    h = 0
    for b in text.encode("utf-8"):
        h = (h * _ROLL_BASE + b) % _ROLL_MOD
    return h


# ----------------------------------------------------------- token utilities

def whitespace_tokens(text: str) -> list[str]:
    return text.split()


def shingles(tokens: list[str], k: int = 3) -> list[str]:
    """k-token shingles joined with single spaces; empty if fewer than k."""
    if len(tokens) < k:
        return []
    return [" ".join(tokens[i : i + k]) for i in range(len(tokens) - k + 1)]


def shingle_explode(
    texts: pa.Array | pa.ChunkedArray, k: int = 3
) -> tuple[np.ndarray, pa.Array]:
    """Vectorized batch-wide shingle explode: ``(doc_idx, shingle)`` arrays
    for every k-token shingle of every normalized doc in the batch.

    Semantics match ``shingles(normalize_ws_lower(t).split(" "), k)`` per doc
    (docs with <k tokens emit nothing; nulls → empty), but the whole batch is
    one Arrow pass: ``split_pattern`` for tokens, k zero-copy slices of the
    flat token values joined with ``binary_join_element_wise``, and a numpy
    ``searchsorted`` over the list offsets to drop windows that straddle doc
    boundaries. No per-doc Python loop. Shingles are NOT de-duplicated per
    doc — callers take mins/sets downstream, which multiset emission does
    not affect."""
    norm = normalize_ws_lower(pc.fill_null(texts, ""))
    toks = pc.split_pattern(norm, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    vals = toks.values
    n = len(vals)
    m = n - k + 1
    if m <= 0:
        return np.empty(0, np.int64), pa.array([], pa.string())
    sh = pc.binary_join_element_wise(*[vals.slice(i, m) for i in range(k)], " ")
    starts = np.arange(m, dtype=np.int64)
    doc_of = np.searchsorted(offsets, starts, side="right") - 1
    valid = starts + k <= offsets[doc_of + 1]
    return doc_of[valid], sh.filter(pa.array(valid))


# -------------------------------------------------------------------- minhash

def minhash_signature(shingle_set: list[str], num_hashes: int) -> list[str]:
    """MinHash signature using ``min(md5(f"{seed}:{shingle}"))`` per seed.

    md5-hex min under lexicographic order is deterministic and — by design —
    reproducible in DuckDB SQL (``min(md5(seed || ':' || shingle))``), which
    gives the LSH stage a true SQL oracle.
    """
    sig = []
    for seed in range(num_hashes):
        best = None
        pre = f"{seed}:"
        for sh in shingle_set:
            h = hashlib.md5((pre + sh).encode("utf-8")).hexdigest()
            if best is None or h < best:
                best = h
        sig.append(best if best is not None else "")
    return sig


def lsh_bands(signature: list[str], band_size: int) -> list[str]:
    """Band hashes: md5 of the '|'-joined minhashes in each band."""
    out = []
    for b in range(0, len(signature), band_size):
        out.append(hashlib.md5("|".join(signature[b : b + band_size]).encode()).hexdigest())
    return out


# -------------------------------------------------------------------- simhash

def _token_hash64(token: str) -> int:
    return int.from_bytes(hashlib.md5(token.encode("utf-8")).digest()[:8], "big")


def simhash64(tokens: list[str]) -> int:
    """64-bit SimHash over token md5 hashes (near-dup sketch)."""
    if not tokens:
        return 0
    hs = np.array([_token_hash64(t) for t in tokens], dtype=np.uint64)
    shifts = np.arange(64, dtype=np.uint64)
    bits = (hs[:, None] >> shifts[None, :]) & np.uint64(1)
    v = (2 * bits.astype(np.int64) - 1).sum(axis=0)
    out = 0
    for i in range(64):
        if v[i] > 0:
            out |= 1 << i
    return out


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


# ----------------------------------------------------------------- stopwords

STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def stopword_ratio(tokens: list[str]) -> float:
    if not tokens:
        return 0.0
    sw = set(STOPWORDS)
    return sum(1 for t in tokens if t in sw) / len(tokens)
