"""Pure-python XXH64 (public algorithm, Yann Collet) — the independent
witness implementation for Spark's xxhash64(seed=42) builtin, used by
gen_witness.py to precompute token-hash fixture columns so the DuckDB
oracle can replay xxhash64-based pipelines as plain data joins."""
M = (1 << 64) - 1
P1, P2, P3, P4, P5 = (0x9E3779B185EBCA87, 0xC2B2AE3D27D4EB4F,
                      0x165667B19E3779F9, 0x85EBCA77C2B2AE63,
                      0x27D4EB2F165667C5)

def _rotl(x, r):
    return ((x << r) | (x >> (64 - r))) & M

def _round(acc, inp):
    acc = (acc + inp * P2) & M
    return (_rotl(acc, 31) * P1) & M

def _merge(acc, val):
    acc ^= _round(0, val)
    return ((acc * P1) + P4) & M

def xxh64(data: bytes, seed: int = 42) -> int:
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while i <= n - 32:
            v1 = _round(v1, int.from_bytes(data[i:i+8], 'little')); i += 8
            v2 = _round(v2, int.from_bytes(data[i:i+8], 'little')); i += 8
            v3 = _round(v3, int.from_bytes(data[i:i+8], 'little')); i += 8
            v4 = _round(v4, int.from_bytes(data[i:i+8], 'little')); i += 8
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        h = _merge(h, v1); h = _merge(h, v2); h = _merge(h, v3); h = _merge(h, v4)
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while i <= n - 8:
        h ^= _round(0, int.from_bytes(data[i:i+8], 'little'))
        h = ((_rotl(h, 27) * P1) + P4) & M
        i += 8
    if i <= n - 4:
        h ^= (int.from_bytes(data[i:i+4], 'little') * P1) & M
        h = ((_rotl(h, 23) * P2) + P3) & M
        i += 4
    while i < n:
        h ^= (data[i] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        i += 1
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h

def xxh64_signed(data: bytes, seed: int = 42) -> int:
    """Spark's LongType view of the hash (two's complement)."""
    h = xxh64(data, seed)
    return h - (1 << 64) if h >= (1 << 63) else h
