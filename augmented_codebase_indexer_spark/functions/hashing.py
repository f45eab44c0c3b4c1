"""Deterministic hashing primitives shared by the oracle and the Spark UDFs.

* ``hash_embedding`` — SHA-256-derived embedding, same text → same vector.
  A clean-room analog of the reference's hermetic test embedder
  (``infrastructure/fakes.py:295-360``): same role (deterministic stand-in
  for an embedding API), different construction (counter-suffixed SHA-256
  blocks → little-endian uint32 → [-1, 1], L2-normalized).
* ``minhash_signature`` / ``lsh_band_keys`` — MinHash over character
  shingles + banded LSH keys, the broadcast candidate index that replaces
  the reference's Qdrant ANN store (north_star).
* ``simhash64`` — 64-bit SimHash over tokens for near-dup detection.
* ``rolling_fingerprint`` — polynomial rolling hash document fingerprint.

All are pure functions of their inputs (no uuid4 / wall clock — cf. the
nondeterministic ``chunker/models.py:29`` the survey flags as a bug not to
replicate).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

# ---------------------------------------------------------------------------
# deterministic hash embedding (fakes.py:295-360 analog)
# ---------------------------------------------------------------------------


def hash_embedding(text: str, dim: int = 64) -> list[float]:
    """SHA-256 stream → floats in [-1, 1], L2-normalized; deterministic."""
    out = np.empty(dim, dtype=np.float64)
    counter = 0
    produced = 0
    seed = text.encode("utf-8", errors="replace")
    while produced < dim:
        block = hashlib.sha256(seed + struct.pack("<I", counter)).digest()
        # 8 uint32 per block → 8 floats in [-1, 1]
        vals = np.frombuffer(block, dtype="<u4").astype(np.float64)
        vals = vals / 2147483647.5 - 1.0
        take = min(dim - produced, vals.shape[0])
        out[produced : produced + take] = vals[:take]
        produced += take
        counter += 1
    norm = float(np.sqrt((out * out).sum()))
    if norm > 0:
        out = out / norm
    return [float(x) for x in out]


# ---------------------------------------------------------------------------
# character shingles + MinHash + banded LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1
_MAXH = 1 << 32


def _shingles(text: str, k: int = 3) -> set[int]:
    s = text.lower()
    if len(s) < k:
        return {hash32(s)} if s else set()
    return {hash32(s[i : i + k]) for i in range(len(s) - k + 1)}


def hash32(s: str) -> int:
    """Stable 32-bit hash (md5-based; Python's hash() is salted → banned)."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "little")


def _perm_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)
    return a, b


_PERM_CACHE: dict[tuple[int, int], tuple[np.ndarray, np.ndarray]] = {}


def minhash_signature(text: str, num_perm: int = 32, k: int = 3, seed: int = 1) -> list[int]:
    """MinHash signature over k-char shingles. Empty text → all-max sentinel."""
    key = (num_perm, seed)
    if key not in _PERM_CACHE:
        _PERM_CACHE[key] = _perm_params(num_perm, seed)
    a, b = _PERM_CACHE[key]
    sh = _shingles(text, k)
    if not sh:
        return [int(_MAXH - 1)] * num_perm
    hv = np.array(sorted(sh), dtype=np.uint64)
    # (a * x + b) mod p mod 2^32, min over shingles, per permutation
    phv = (np.outer(a, hv) + b[:, None]) % _MERSENNE % _MAXH
    return [int(x) for x in phv.min(axis=1)]


def lsh_band_keys(signature: list[int], bands: int) -> list[str]:
    """Split a signature into `bands` contiguous bands; key = band-index +
    hash of the band's values. Two texts collide on a band key iff that
    band of their signatures matches exactly."""
    n = len(signature)
    rows = n // bands
    keys = []
    for bi in range(bands):
        band = signature[bi * rows : (bi + 1) * rows]
        digest = hashlib.md5(
            (str(bi) + ":" + ",".join(map(str, band))).encode()
        ).hexdigest()[:16]
        keys.append(f"{bi}:{digest}")
    return keys


def jaccard_shingles(a: str, b: str, k: int = 3) -> float:
    sa, sb = _shingles(a, k), _shingles(b, k)
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(text: str) -> int:
    """64-bit SimHash over whitespace tokens (weights = term frequency)."""
    acc = np.zeros(64, dtype=np.int64)
    shifts = np.arange(64, dtype=np.uint64)
    for tok in text.lower().split():
        h = np.uint64(
            int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "little")
        )
        bits = (np.right_shift(h, shifts) & np.uint64(1)).astype(np.int64)
        acc += np.where(bits == 1, 1, -1)
    out = 0
    for i in range(64):
        if acc[i] > 0:
            out |= 1 << i
    # return as signed 64-bit so it fits Spark LongType
    if out >= 1 << 63:
        out -= 1 << 64
    return out


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


# ---------------------------------------------------------------------------
# rolling-hash document fingerprint (winnowing-style)
# ---------------------------------------------------------------------------


def rolling_fingerprint(text: str, window: int = 8, keep: int = 16) -> list[int]:
    """Polynomial rolling hash over a char window; keep the `keep` smallest
    distinct hashes (a deterministic sketch usable as a document signature).

    Definition shared verbatim with the SQL form (``sqlhash.fingerprint_expr``,
    evaluated identically by Spark and the DuckDB oracle): window hashes are
    the base-1000003 polynomial fold mod 2^32; texts shorter than the window
    take a single fold padded with char code 0 (== SQL ascii('') = 0)."""
    s = text.lower()
    n = len(s)
    if n == 0:
        return []
    base, mod = 1_000_003, _MAXH
    if n < window:
        h = 0
        for i in range(window):
            h = (h * base + (ord(s[i]) if i < n else 0)) % mod
        return [h]
    h = 0
    pw = pow(base, window - 1, mod)
    seen: set[int] = set()
    for i, ch in enumerate(s):
        if i >= window:
            h = (h - ord(s[i - window]) * pw) % mod
        h = (h * base + ord(ch)) % mod
        if i >= window - 1:
            seen.add(h)
    return sorted(seen)[:keep]


# ---------------------------------------------------------------------------
# pure-Python mirrors of the SQL-portable sketches (functions/sqlhash.py) —
# used by property tests to pin the Spark expressions to an independent
# implementation. Definitions MUST stay in lockstep with sqlhash.py.
# ---------------------------------------------------------------------------


def h60(s: str) -> int:
    """First 15 hex digits of md5 as a 60-bit int (sqlhash.h60_expr)."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


def minhash16(text: str) -> list[int]:
    """16-permutation MinHash over word 3-gram shingles (sqlhash mirror)."""
    from .sqlhash import NUM_PERM, P31, PERM_A, PERM_B

    toks = text.split(" ")
    if len(toks) < 3:
        grams = [text]
    else:
        grams = [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]
    hs = [h60(g) % P31 for g in grams]
    return [min((PERM_A[i] * h + PERM_B[i]) % P31 for h in hs) for i in range(NUM_PERM)]


def minhash_est_jaccard(sig_a: list[int], sig_b: list[int]) -> float:
    """Standard MinHash Jaccard estimator: fraction of matching minima."""
    return sum(1 for x, y in zip(sig_a, sig_b) if x == y) / len(sig_a)


def simhash60(text: str) -> int:
    """60-bit SimHash over whitespace tokens with H60 token hashes
    (sqlhash.simhash60_expr mirror); None for empty/blank text."""
    toks = [t for t in text.lower().split(" ") if t]
    if not toks:
        return None
    votes = [0] * 60
    for t in toks:
        h = h60(t)
        for i in range(60):
            votes[i] += 1 if (h >> i) & 1 else -1
    out = 0
    for i in range(60):
        if votes[i] > 0:
            out |= 1 << i
    return out
