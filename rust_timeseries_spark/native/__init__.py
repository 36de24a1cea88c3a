"""On-demand-compiled native kernels (ctypes) with pure-Python fallback.

``kernels.c`` holds bit/byte-identical C versions of the engine's two
measured CPU ceilings (codec bit-packing, ACD(1,1) ψ/∂ψ recursions).
On first import this module compiles it with the system C compiler into
a cache directory keyed by the source hash, so:

* repeated imports (driver + every Python UDF worker process on the
  same host) reuse one compiled artifact — the O_EXCL+rename dance
  below makes concurrent first-compiles race-safe;
* on a multi-node cluster each executor host compiles once on first
  task; no build step, no wheels, no network;
* if no compiler is present (or the compile fails for any reason) the
  module degrades to ``HAVE_NATIVE = False`` and every caller keeps
  using the pure-Python implementation it already has.

The build deliberately uses ``-O2 -ffp-contract=off`` and NO
``-ffast-math``: the float kernels must execute the exact IEEE op
sequence of the Python code (FMA contraction or reassociation would
change last-bit rounding and break the engine's bit-parity contract).
``RTS_NATIVE_DISABLE=1`` in the environment skips native entirely
(used by tests to exercise the fallback).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import shutil
import subprocess
import tempfile

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "kernels.c")

_CFLAGS = ["-O2", "-fPIC", "-shared", "-ffp-contract=off", "-fwrapv"]

HAVE_NATIVE = False
_lib = None


def _cache_dir() -> str:
    """Per-uid, 0700 cache directory. The .so here is CDLL-loaded into
    the process, so the directory must not be spoofable by another
    local user: the default path embeds the uid, is created 0700, and
    is validated (owned by us, not group/world-writable) before use —
    a pre-planted world-writable /tmp/rts_native cannot be hijacked."""
    uid = os.getuid() if hasattr(os, "getuid") else 0
    base = os.environ.get(
        "RTS_NATIVE_CACHE", os.path.join(tempfile.gettempdir(), f"rts_native_{uid}")
    )
    os.makedirs(base, mode=0o700, exist_ok=True)
    st = os.stat(base)
    if (hasattr(os, "getuid") and st.st_uid != os.getuid()) or (st.st_mode & 0o022):
        raise OSError(f"refusing unsafe native cache dir {base!r} "
                      "(not owned by this uid, or group/world-writable)")
    return base


def _read_source() -> bytes | None:
    try:
        with open(_SRC, "rb") as f:
            return f.read()
    except OSError:
        # package imported from a --py-files zip: the .c ships inside it
        try:
            import pkgutil

            return pkgutil.get_data(__package__, "kernels.c")
        except Exception:  # noqa: BLE001
            return None


def _compile() -> ctypes.CDLL | None:
    if os.environ.get("RTS_NATIVE_DISABLE") == "1":
        return None
    src = _read_source()
    if src is None:
        return None
    tag = hashlib.sha256(src + b"|" + " ".join(_CFLAGS).encode()).hexdigest()[:16]
    try:
        cache = _cache_dir()
    except OSError:
        return None
    so_path = os.path.join(cache, f"kernels_{tag}.so")
    if not os.path.exists(so_path):
        cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
        if cc is None:
            return None
        # compile from a materialized copy (the package path may live
        # inside a zip); the tag makes the copy content-addressed
        c_path = os.path.join(cache, f"kernels_{tag}.c")
        tmp = so_path + f".tmp.{os.getpid()}"
        try:
            if not os.path.exists(c_path):
                c_tmp = c_path + f".tmp.{os.getpid()}"
                with open(c_tmp, "wb") as f:
                    f.write(src)
                os.rename(c_tmp, c_path)
            subprocess.run(
                [cc, *_CFLAGS, "-o", tmp, c_path],
                check=True, capture_output=True, timeout=120,
            )
            os.rename(tmp, so_path)  # atomic: concurrent compilers converge
        except (subprocess.SubprocessError, OSError):
            try:
                os.unlink(tmp)
            except OSError:
                pass
            if not os.path.exists(so_path):
                return None
    try:
        return ctypes.CDLL(so_path)
    except OSError:
        return None


_lib = _compile()

if _lib is not None:
    _i64 = ctypes.c_int64
    _dbl = ctypes.c_double
    _p_i64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    _p_u64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")
    _p_f64 = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    _p_u8 = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")

    _lib.rts_encode_dod_int64.restype = _i64
    _lib.rts_encode_dod_int64.argtypes = [_p_i64, _i64, _p_u8]
    _lib.rts_decode_dod_int64.restype = _i64
    _lib.rts_decode_dod_int64.argtypes = [ctypes.c_char_p, _i64, _p_i64]
    _lib.rts_blob_count.restype = _i64
    _lib.rts_blob_count.argtypes = [ctypes.c_char_p, _i64]
    _lib.rts_encode_gorilla_f64.restype = _i64
    _lib.rts_encode_gorilla_f64.argtypes = [_p_u64, _i64, _p_u8]
    _lib.rts_decode_gorilla_f64.restype = _i64
    _lib.rts_decode_gorilla_f64.argtypes = [ctypes.c_char_p, _i64, _p_u64]
    _lib.rts_psi11.restype = None
    _lib.rts_psi11.argtypes = [_p_f64, _i64, _dbl, _dbl, _dbl, _dbl, _dbl, _dbl, _dbl, _p_f64]
    _lib.rts_dpsi11.restype = None
    _lib.rts_dpsi11.argtypes = [
        _p_f64, _i64, _p_f64, _dbl, _dbl, _dbl, _dbl, ctypes.c_int, _dbl, _p_f64,
    ]
    HAVE_NATIVE = True


def encode_dod_int64(values: np.ndarray) -> bytes:
    v = np.ascontiguousarray(values, dtype=np.int64)
    out = np.empty(20 + 9 * len(v), dtype=np.uint8)
    n = _lib.rts_encode_dod_int64(v, len(v), out)
    return out[:n].tobytes()


def _checked_count(blob: bytes) -> int:
    """Header count with the same failure mode as the Python BitReader
    (IndexError on truncation) plus an allocation-bomb guard: a blob
    encodes at least one bit per value, so count can never exceed the
    bit length."""
    n = _lib.rts_blob_count(blob, len(blob))
    if n < 0 or n > 8 * len(blob):
        raise IndexError("truncated or corrupt blob header")
    return n


def decode_dod_int64(blob: bytes) -> np.ndarray:
    blob = bytes(blob)  # BinaryType columns collect as bytearray
    n = _checked_count(blob)
    out = np.empty(n, dtype=np.int64)
    if _lib.rts_decode_dod_int64(blob, len(blob), out) < 0:
        raise IndexError("truncated delta-of-delta blob")
    return out


def encode_gorilla_f64(values: np.ndarray) -> bytes:
    bits = np.ascontiguousarray(
        np.asarray(values, dtype=np.float64).view(np.uint64)
    )
    out = np.empty(20 + 10 * len(bits), dtype=np.uint8)
    n = _lib.rts_encode_gorilla_f64(bits, len(bits), out)
    return out[:n].tobytes()


def decode_gorilla_f64(blob: bytes) -> np.ndarray:
    blob = bytes(blob)
    n = _checked_count(blob)
    out = np.empty(n, dtype=np.uint64)
    if _lib.rts_decode_gorilla_f64(blob, len(blob), out) < 0:
        raise IndexError("truncated Gorilla blob")
    return out.view(np.float64)


def psi11(
    x: np.ndarray, omega: float, a0: float, b0: float,
    psi0: float, di0: float, gmin: float, gmax: float,
) -> np.ndarray:
    x = np.ascontiguousarray(x, dtype=np.float64)
    out = np.empty(len(x), dtype=np.float64)
    _lib.rts_psi11(x, len(x), omega, a0, b0, psi0, di0, gmin, gmax, out)
    return out


def dpsi11(
    x: np.ndarray, psi_buf: np.ndarray, omega: float, a0: float, b0: float,
    denom: float, uncond: bool, di0: float, deriv: np.ndarray,
) -> None:
    """Fills deriv rows 1..n in place; deriv is the (n+1)×3 C-contiguous
    array whose row 0 the caller pre-seeded."""
    x = np.ascontiguousarray(x, dtype=np.float64)
    _lib.rts_dpsi11(
        x, len(x), np.ascontiguousarray(psi_buf, dtype=np.float64),
        omega, a0, b0, denom, int(uncond), di0, deriv,
    )
