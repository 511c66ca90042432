"""Optional native (C) kernels, compiled on first use with the system
compiler and loaded via ctypes. Pure-speed helpers for the hottest
inner loops; every caller has a numpy fallback, so absence of a
compiler degrades gracefully.

Why: the numpy TokenMinHash makes ``num_hashes`` full passes over the
shingle-hash array (memory-streaming). The C kernel computes all hash
minima in ONE pass (8 splitmix64 evaluations per element ≈ 80 ALU ops
per 8 bytes read), which turns a bandwidth-bound loop into a
compute-bound one — the property that lets the stage scale with cores
on bandwidth-limited hosts.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile

_C_SRC = r"""
#include <stdint.h>

static inline uint64_t splitmix64(uint64_t z) {
    z += 0x9E3779B97F4A7C15ULL;
    z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
    z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
    return z ^ (z >> 31);
}

/* all-hash minima in a single pass over the shingle array.
   w: shingle window hashes (nw elements; positions where a window
      crosses a row boundary are pre-marked in `boundary`)
   offsets: row start positions in flat-token space (nrows+1); the
      window array index space is the same, truncated at nw
   seeds: nh seed values
   out: nrows x nh row-major minima (pre-filled by caller is NOT
      required; initialized here to UINT64_MAX) */
void token_minhash(const uint64_t *w, int64_t nw,
                   const uint8_t *boundary,
                   const int64_t *offsets, int64_t nrows,
                   const uint64_t *seeds, int32_t nh,
                   uint64_t *out) {
    for (int64_t r = 0; r < nrows; ++r) {
        uint64_t *row_out = out + r * nh;
        for (int32_t h = 0; h < nh; ++h) row_out[h] = UINT64_MAX;
        int64_t s = offsets[r];
        int64_t e = offsets[r + 1];
        if (e > nw) e = nw;
        for (int64_t i = s; i < e; ++i) {
            if (boundary[i]) continue;
            uint64_t base = w[i];
            for (int32_t h = 0; h < nh; ++h) {
                uint64_t v = splitmix64(base ^ seeds[h]);
                if (v < row_out[h]) row_out[h] = v;
            }
        }
    }
}

/* fully-fused token minhash: window hashes computed inline from the
   raw int32 token buffer — ONE read pass over the tokens, no
   intermediate window array. k (ngram) up to 8. */
void token_minhash_fused(const int32_t *tokens, const int64_t *offsets,
                         int64_t nrows, int32_t k,
                         const uint64_t *mults,  /* k position multipliers */
                         const uint64_t *seeds, int32_t nh,
                         uint64_t *out) {
    for (int64_t r = 0; r < nrows; ++r) {
        uint64_t *row_out = out + r * nh;
        for (int32_t h = 0; h < nh; ++h) row_out[h] = UINT64_MAX;
        int64_t s = offsets[r], e = offsets[r + 1];
        if (e - s < k) continue;
        for (int64_t i = s; i + k <= e; ++i) {
            uint64_t w = (uint64_t)(uint32_t)tokens[i];
            for (int32_t j = 1; j < k; ++j)
                w ^= (uint64_t)(uint32_t)tokens[i + j] * mults[j];
            for (int32_t h = 0; h < nh; ++h) {
                uint64_t v = splitmix64(w ^ seeds[h]);
                if (v < row_out[h]) row_out[h] = v;
            }
        }
    }
}

/* FNV-1a over utf8 strings given arrow offsets+data buffers */
void fnv1a_batch(const uint8_t *data, const int32_t *offsets, int64_t n,
                 uint64_t *out) {
    for (int64_t r = 0; r < n; ++r) {
        uint64_t hsh = 14695981039346656037ULL;
        for (int32_t i = offsets[r]; i < offsets[r + 1]; ++i) {
            hsh = (hsh ^ data[i]) * 1099511628211ULL;
        }
        out[r] = hsh;
    }
}
"""

_lib = None
_tried = False


def _build() -> "ctypes.CDLL | None":
    digest = hashlib.sha1(_C_SRC.encode()).hexdigest()[:12]
    cache = os.path.join(tempfile.gettempdir(), "vector_ray_native")
    os.makedirs(cache, exist_ok=True)
    so_path = os.path.join(cache, f"kernels_{digest}.so")
    if not os.path.exists(so_path):
        c_path = os.path.join(cache, f"kernels_{digest}.c")
        with open(c_path, "w") as f:
            f.write(_C_SRC)
        try:
            subprocess.run(
                ["cc", "-O3", "-shared", "-fPIC", "-o", so_path + ".tmp", c_path],
                check=True,
                capture_output=True,
                timeout=60,
            )
            os.replace(so_path + ".tmp", so_path)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(so_path)
    except OSError:
        return None
    lib.token_minhash.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.token_minhash.restype = None
    lib.fnv1a_batch.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p]
    lib.fnv1a_batch.restype = None
    lib.token_minhash_fused.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_void_p,
    ]
    lib.token_minhash_fused.restype = None
    return lib


def get_lib():
    """The compiled kernel library, or None if unavailable."""
    global _lib, _tried
    if not _tried:
        _tried = True
        _lib = _build()
    return _lib
