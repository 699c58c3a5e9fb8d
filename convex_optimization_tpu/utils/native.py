"""ctypes bindings for the native host runtime (native/co_native.cpp).

Build-on-first-use with g++ (cached as a .so next to the source); every
entry point has a NumPy fallback so the framework works without a
toolchain.  See native/co_native.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "co_native.cpp")
_SO = os.path.join(_REPO_ROOT, "native", "co_native.so")

_lib = None
_lock = threading.Lock()
_build_failed = False

# ABI version the bindings below were written against; must match
# co_version() in native/co_native.cpp.  Checked at load time so a stale
# cached .so (older build, or one corrupted by a concurrent compile) forces
# ONE rebuild instead of permanently disabling the native path via an
# AttributeError on a missing symbol (ADVICE r3).
_EXPECTED_VERSION = 7


def _host_buildinfo() -> str:
    """Host signature the .so must have been built on.  -march=native
    binaries from ANOTHER host can SIGILL (uncatchable) inside the
    certified polish path, so a mismatch forces a rebuild rather than a
    crash."""
    u = os.uname()
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = line.strip()
                    break
    except OSError:
        pass
    return f"{u.machine}|{u.nodename}|{flags}"


def _build(want: str, info_path: str) -> None:
    """Compile to a temp path and os.replace() into place: concurrent
    builders can never leave a half-written .so at the canonical path
    (the replace is atomic; the loser's intact .so simply wins), and the
    fresh inode means a later CDLL never resolves to a stale dlopen
    cache entry."""
    tmp = f"{_SO}.tmp.{os.getpid()}"
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-std=c++17", "-pthread", _SRC, "-o", tmp],
            check=True, capture_output=True,
        )
        os.replace(tmp, _SO)
    finally:
        try:
            os.unlink(tmp)
        except OSError:
            pass
    with open(info_path, "w") as f:
        f.write(want)


def _load():
    """Build (if stale or foreign-built) and load the native library;
    None on failure."""
    global _lib, _build_failed
    if _lib is not None or _build_failed:
        return _lib
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            info_path = _SO + ".buildinfo"
            want = _host_buildinfo()
            have = None
            try:
                with open(info_path) as f:
                    have = f.read()
            except OSError:
                pass
            lib = None
            for attempt in range(2):
                if (not os.path.exists(_SO)
                        or os.path.getmtime(_SO) < os.path.getmtime(_SRC)
                        or have != want or attempt > 0):
                    _build(want, info_path)
                load_path = _SO
                if attempt > 0:
                    # dlopen caches by path STRING within a process, so
                    # re-CDLL'ing _SO after the rebuild would return the
                    # stale handle; load the fresh build via a unique
                    # temp name (the mapping survives the unlink below)
                    import shutil

                    load_path = f"{_SO}.reload.{os.getpid()}"
                    shutil.copy2(_SO, load_path)
                lib = ctypes.CDLL(load_path)
                if load_path is not _SO:
                    try:
                        os.unlink(load_path)
                    except OSError:
                        pass
                try:
                    lib.co_version.restype = ctypes.c_int
                    stale = lib.co_version() != _EXPECTED_VERSION
                except AttributeError:
                    stale = True  # pre-versioning or truncated .so
                if not stale:
                    break
                if attempt > 0:
                    raise RuntimeError(
                        f"co_native.so version mismatch persists after "
                        f"rebuild (want {_EXPECTED_VERSION})")
            lib.co_gaussian_fill.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_uint64, ctypes.c_int,
            ]
            lib.co_write_matrix.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.co_write_matrix.restype = ctypes.c_int
            lib.co_read_matrix_shape.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_int64)]
            lib.co_read_matrix_shape.restype = ctypes.c_int
            lib.co_read_matrix.argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int64, ctypes.c_int64,
            ]
            lib.co_read_matrix.restype = ctypes.c_int
            lib.co_cd64_sweeps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_double,
                ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ]
            lib.co_cd64_group_sweeps.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double), ctypes.c_double,
                ctypes.c_double, ctypes.c_int,
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.co_gather_cols.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
                ctypes.c_int, ctypes.c_void_p,
            ]
            lib.co_atr_mixed.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.c_double, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.co_ax_sparse.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            lib.co_group_power_l.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
                ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_double),
                ctypes.POINTER(ctypes.c_double),
            ]
            _lib = lib
        except Exception:
            if os.environ.get("CO_NATIVE_DEBUG"):
                import traceback

                traceback.print_exc()
            _build_failed = True
    return _lib


def have_native() -> bool:
    return _load() is not None


def gaussian(shape, seed: int, *, nthreads: int | None = None) -> np.ndarray:
    """Standard-normal f32 array; native multi-threaded path with numpy
    fallback.  Deterministic in seed (and independent of nthreads)."""
    size = int(np.prod(shape))
    lib = _load()
    if lib is None:
        return np.random.default_rng(seed).standard_normal(
            size).astype(np.float32).reshape(shape)
    out = np.empty(size, dtype=np.float32)
    if nthreads is None:
        nthreads = os.cpu_count() or 1
    lib.co_gaussian_fill(
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        size, ctypes.c_uint64(seed), nthreads,
    )
    return out.reshape(shape)


def write_matrix(path: str, arr: np.ndarray) -> None:
    arr = np.ascontiguousarray(arr, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr.reshape(1, -1)
    lib = _load()
    if lib is None:
        np.save(path + ".npy", arr)
        os.replace(path + ".npy", path)
        return
    rc = lib.co_write_matrix(
        path.encode(), arr.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        arr.shape[0], arr.shape[1],
    )
    if rc != 0:
        raise IOError(f"co_write_matrix({path}) failed with {rc}")


def cd64_sweeps(As32: np.ndarray, xs: np.ndarray, r: np.ndarray,
                col_sq: np.ndarray, lam1: float, lam2: float,
                nonneg: bool, sweeps: int) -> bool:
    """Run ``sweeps`` cyclic CD sweeps natively (GIL released), updating
    ``xs`` and ``r`` in place.  Returns False (caller must run the NumPy
    path) when the library is unavailable or the slab layout is wrong.

    Requires: As32 f32 column-major (F-contiguous), xs/r/col_sq f64
    contiguous — exactly how solvers/polish.py stores the compacted
    support slab."""
    lib = _load()
    if (lib is None
            or not As32.flags.f_contiguous or As32.dtype != np.float32
            or xs.dtype != np.float64 or not xs.flags.c_contiguous
            or r.dtype != np.float64 or not r.flags.c_contiguous
            or col_sq.dtype != np.float64
            or not col_sq.flags.c_contiguous):
        return False
    m, width = As32.shape
    lib.co_cd64_sweeps(
        As32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m), ctypes.c_int64(width),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        col_sq.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(lam1), ctypes.c_double(lam2),
        ctypes.c_int(1 if nonneg else 0), ctypes.c_int(sweeps),
    )
    return True


def cd64_group_sweeps(As32: np.ndarray, gsize: int, xs: np.ndarray,
                      r: np.ndarray, L: np.ndarray, w: np.ndarray,
                      lam1: float, lam2: float, sweeps: int) -> bool:
    """Group analog of cd64_sweeps: ``sweeps`` Gauss-Seidel passes over
    contiguous gsize-wide groups, natively (GIL released), updating ``xs``
    and ``r`` in place.  Returns False when unavailable / wrong layout."""
    lib = _load()
    if (lib is None
            or not As32.flags.f_contiguous or As32.dtype != np.float32
            or xs.dtype != np.float64 or not xs.flags.c_contiguous
            or r.dtype != np.float64 or not r.flags.c_contiguous
            or L.dtype != np.float64 or not L.flags.c_contiguous
            or w.dtype != np.float64 or not w.flags.c_contiguous
            or As32.shape[1] % gsize != 0):
        return False
    m, width = As32.shape
    scratch = np.empty(2 * gsize, np.float64)
    lib.co_cd64_group_sweeps(
        As32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m), ctypes.c_int64(width), ctypes.c_int64(gsize),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        L.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(lam1), ctypes.c_double(lam2),
        ctypes.c_int(sweeps),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return True


def gather_cols(A: np.ndarray, idx: np.ndarray, dtype) -> np.ndarray | None:
    """F-ordered column gather (+ optional f64 cast) from an f32
    column-major matrix, one GIL-released call; None when the native
    library is unavailable or the layout/dtype is unsupported."""
    lib = _load()
    dtype = np.dtype(dtype)
    if (lib is None or A.dtype != np.float32 or not A.flags.f_contiguous
            or dtype not in (np.float32, np.float64)):
        return None
    m = A.shape[0]
    idx64 = np.ascontiguousarray(idx, np.int64)
    # bounds check BEFORE the foreign call: the C gather dereferences
    # unconditionally, so a stale index would read adjacent heap memory
    # (silent garbage certificate) where NumPy raises IndexError
    if len(idx64) and (int(idx64.min()) < 0
                       or int(idx64.max()) >= A.shape[1]):
        raise IndexError(
            f"gather_cols: index out of range for {A.shape[1]} columns")
    # np.zeros, not empty: calloc-backed pages fault at full speed while
    # fresh THP pages stall mid-gather (measured round 1 — see
    # solvers/polish.py _gather_cols)
    out = np.zeros((m, len(idx64)), dtype, order="F")
    lib.co_gather_cols(
        A.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m),
        idx64.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(len(idx64)),
        ctypes.c_int(1 if dtype == np.float64 else 0),
        out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def _f32_slab_ok(lib, As32, *vecs) -> bool:
    return (lib is not None and As32.dtype == np.float32
            and As32.flags.f_contiguous
            and all(v is None or (v.dtype == np.float64
                                  and v.flags.c_contiguous) for v in vecs))


def atr_mixed(As32: np.ndarray, r: np.ndarray, lam2: float,
              xs: np.ndarray | None) -> np.ndarray | None:
    """z = -(As^T r) - lam2*xs in f64, GIL-released; None → NumPy path."""
    lib = _load()
    if not _f32_slab_ok(lib, As32, r, xs):
        return None
    m, width = As32.shape
    z = np.empty(width, np.float64)
    xs_p = (xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
            if xs is not None else None)
    lib.co_atr_mixed(
        As32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m), ctypes.c_int64(width),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_double(lam2), xs_p,
        z.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return z


def ax_sparse(As32: np.ndarray, xs: np.ndarray,
              b: np.ndarray) -> np.ndarray | None:
    """r = As xs - b in f64 streaming only nonzero columns, GIL-released;
    None → NumPy path."""
    lib = _load()
    if not _f32_slab_ok(lib, As32, xs, b):
        return None
    m, width = As32.shape
    r = np.empty(m, np.float64)
    lib.co_ax_sparse(
        As32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m), ctypes.c_int64(width),
        xs.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        r.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return r


def group_power_l(As32: np.ndarray, gsize: int, iters: int, safety: float,
                  lam2: float) -> np.ndarray | None:
    """Per-group block Lipschitz (safety * lam_max(Ag^T Ag) + lam2) via
    GIL-released power iterations; None → NumPy path."""
    lib = _load()
    if (lib is None or As32.dtype != np.float32
            or not As32.flags.f_contiguous
            or As32.shape[1] % gsize != 0):
        return None
    m, width = As32.shape
    ng = width // gsize
    L = np.empty(ng, np.float64)
    scratch = np.empty(gsize + m, np.float64)
    lib.co_group_power_l(
        As32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int64(m), ctypes.c_int64(width), ctypes.c_int64(gsize),
        ctypes.c_int(iters), ctypes.c_double(safety),
        ctypes.c_double(lam2),
        L.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        scratch.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    return L


def read_matrix(path: str) -> np.ndarray:
    lib = _load()
    if lib is None:
        return np.load(path)
    shape = (ctypes.c_int64 * 2)()
    rc = lib.co_read_matrix_shape(path.encode(), shape)
    if rc != 0:
        # fallback store wrote .npy content under this name
        try:
            return np.load(path)
        except Exception:
            raise IOError(f"co_read_matrix_shape({path}) failed with {rc}")
    rows, cols = shape[0], shape[1]
    out = np.empty((rows, cols), dtype=np.float32)
    rc = lib.co_read_matrix(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        rows, cols,
    )
    if rc != 0:
        raise IOError(f"co_read_matrix({path}) failed with {rc}")
    return out
