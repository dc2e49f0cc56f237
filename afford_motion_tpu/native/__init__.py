"""ctypes bindings to the native IO core (native/am_io.cpp).

The reference's host data path rides torch's native DataLoader workers
(reference: datasets/base.py get_dataloader + torch.utils.data); here the
equivalent is libam_io.so: .npy headers parsed in C++, payloads pread into
caller-owned numpy buffers, and whole batches fanned across a C++ thread
pool with the GIL released (ctypes releases it for the call's duration).
``stack_load_npy`` preads every file's payload directly into rows of ONE
contiguous batch array — the collate happens inside the read.

The library is built on demand (``make -C native``) and cached; every entry
point falls back to ``np.load`` when the toolchain or build is unavailable,
when ``AM_NATIVE=0``, or for files the fast path doesn't cover (npz, object
arrays, fortran order).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Sequence

import numpy as np

_REPO_ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "build", "libam_io.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("AM_NATIVE", "1") == "0":
            return None
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        i64p = ctypes.POINTER(ctypes.c_int64)
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.am_npy_header.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, i64p, i32p, i32p, i64p, i64p]
        lib.am_npy_header.restype = ctypes.c_int
        lib.am_pread_file.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p]
        lib.am_pread_file.restype = ctypes.c_int
        lib.am_batch_pread.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), i64p, i64p,
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_int]
        lib.am_batch_pread.restype = ctypes.c_int
        lib.am_batch_header.argtypes = [
            ctypes.c_int, ctypes.POINTER(ctypes.c_char_p), ctypes.c_char_p,
            i64p, i32p, i32p, i64p, i64p, ctypes.c_int]
        lib.am_batch_header.restype = ctypes.c_int
        lib.am_npy_header_at.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, i64p, i32p,
            i32p, i64p, i64p]
        lib.am_npy_header_at.restype = ctypes.c_int
        lib.am_npz_index.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, i64p, ctypes.c_int]
        lib.am_npz_index.restype = ctypes.c_int
        _lib = lib
        return _lib


def available() -> bool:
    return _load_lib() is not None


def _default_threads(n: int) -> int:
    # reads are I/O-bound, not CPU-bound: keep a minimum of 4 in flight
    return max(1, min(n, max(4, (os.cpu_count() or 1) * 2), 16))


def _header(lib, path: str, base: int = 0):
    """-> (dtype, shape, data_offset) or None if the fast path can't serve."""
    descr = ctypes.create_string_buffer(16)
    shape = (ctypes.c_int64 * 8)()
    ndim = ctypes.c_int32()
    fortran = ctypes.c_int32()
    off = ctypes.c_int64()
    nbytes = ctypes.c_int64()
    rc = lib.am_npy_header_at(
        path.encode(), base, descr, shape, ctypes.byref(ndim),
        ctypes.byref(fortran), ctypes.byref(off), ctypes.byref(nbytes))
    if rc != 0 or fortran.value:
        return None
    try:
        dt = np.dtype(descr.value.decode())
    except TypeError:
        return None
    if dt.hasobject:
        return None
    shp = tuple(shape[i] for i in range(ndim.value))
    expect = int(np.prod(shp, dtype=np.int64)) * dt.itemsize
    if expect > nbytes.value:
        return None
    return dt, shp, off.value


def load_npy(path: str | os.PathLike) -> np.ndarray:
    """np.load for a single .npy file via the native reader (fallback:
    np.load)."""
    path = os.fspath(path)
    lib = _load_lib()
    if lib is None or not path.endswith(".npy"):
        return np.load(path)
    h = _header(lib, path)
    if h is None:
        return np.load(path)
    dt, shp, off = h
    out = np.empty(shp, dtype=dt)
    rc = lib.am_pread_file(path.encode(), off, out.nbytes,
                           out.ctypes.data_as(ctypes.c_void_p))
    if rc != 0:
        return np.load(path)
    return out


class NpzView:
    """Lazy .npz mapping over the native reader: members are read only on
    access (np.load's NpzFile semantics, minus the zipfile/Python-parse
    overhead — the common ``npz['dist']`` pattern reads ONE member)."""

    def __init__(self, path: str, members):
        self._path = path
        self._members = members  # name (no .npy suffix) -> npy base offset

    @property
    def files(self):
        return list(self._members)

    def keys(self):
        return self._members.keys()

    def __contains__(self, name):
        return name in self._members

    def __iter__(self):
        return iter(self._members)

    def __len__(self):
        return len(self._members)

    def __getitem__(self, name) -> np.ndarray:
        base = self._members[name]
        lib = _load_lib()
        h = _header(lib, self._path, base)
        if h is None:
            return np.load(self._path)[name]
        dt, shp, off = h
        out = np.empty(shp, dtype=dt)
        rc = lib.am_pread_file(self._path.encode(), off, out.nbytes,
                               out.ctypes.data_as(ctypes.c_void_p))
        if rc != 0:
            return np.load(self._path)[name]
        return out

    def get(self, name, default=None):
        return self[name] if name in self._members else default

    # context-manager compat with np.load(...) as f
    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def close(self):
        pass


def load_npz(path: str | os.PathLike):
    """np.load for a .npz via the native zip index (fallback: np.load for
    compressed members / parse failures)."""
    path = os.fspath(path)
    lib = _load_lib()
    if lib is None:
        return np.load(path)
    max_n = 256
    names = ctypes.create_string_buffer(80 * max_n)
    offs = (ctypes.c_int64 * max_n)()
    n = lib.am_npz_index(path.encode(), names, offs, max_n)
    if n <= 0:
        return np.load(path)
    members = {}
    for i in range(n):
        raw = names.raw[80 * i: 80 * (i + 1)].split(b"\0", 1)[0].decode()
        if offs[i] < 0:  # compressed member -> whole-file fallback
            return np.load(path)
        members[raw[:-4] if raw.endswith(".npy") else raw] = offs[i]
    return NpzView(path, members)


def load(path: str | os.PathLike, **kwargs):
    """Drop-in np.load: .npy/.npz ride the native path, everything else
    (pickle, mmap_mode, file objects) goes straight to numpy."""
    if kwargs or not isinstance(path, (str, os.PathLike)):
        return np.load(path, **kwargs)
    p = os.fspath(path)
    if p.endswith(".npz"):
        return load_npz(p)
    if not p.endswith(".npy"):
        return np.load(path)
    return load_npy(path)


def batch_load_npy(paths: Sequence[str], nthreads: int = 0) -> List[np.ndarray]:
    """Read many .npy files in one parallel native call (GIL released)."""
    paths = [os.fspath(p) for p in paths]
    lib = _load_lib()
    if lib is None or not paths:
        return [np.load(p) for p in paths]
    n = len(paths)
    nthreads = nthreads or _default_threads(n)
    hs = _batch_headers(lib, paths, nthreads)
    if hs is None:
        return [np.load(p) for p in paths]
    outs = [np.empty(shp, dtype=dt) for dt, shp, _ in hs]
    rc = _batch_pread(
        lib, paths, [h[2] for h in hs], [o.nbytes for o in outs],
        [o.ctypes.data_as(ctypes.c_void_p) for o in outs], nthreads)
    if rc != 0:
        return [np.load(p) for p in paths]
    return outs


def stack_load_npy(paths: Sequence[str], nthreads: int = 0) -> np.ndarray:
    """Read N same-shape .npy files straight into one (N, *shape) array —
    the parallel reads ARE the collate (no per-item intermediates)."""
    paths = [os.fspath(p) for p in paths]
    lib = _load_lib()
    if lib is None or not paths:
        return np.stack([np.load(p) for p in paths])
    n = len(paths)
    nthreads = nthreads or _default_threads(n)
    hs = _batch_headers(lib, paths, nthreads)
    if hs is None or len({(h[0], h[1]) for h in hs}) != 1:
        return np.stack([np.load(p) for p in paths])
    dt, shp, _ = hs[0]
    out = np.empty((n,) + shp, dtype=dt)
    row = out.nbytes // n if n else 0
    base = out.ctypes.data
    rc = _batch_pread(
        lib, paths, [h[2] for h in hs], [row] * n,
        [ctypes.c_void_p(base + i * row) for i in range(n)], nthreads)
    if rc != 0:
        return np.stack([np.load(p) for p in paths])
    return out


def _batch_headers(lib, paths: List[str], nthreads: int):
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    descrs = ctypes.create_string_buffer(16 * n)
    shapes = (ctypes.c_int64 * (8 * n))()
    ndims = (ctypes.c_int32 * n)()
    fortrans = (ctypes.c_int32 * n)()
    offs = (ctypes.c_int64 * n)()
    nbytes = (ctypes.c_int64 * n)()
    rc = lib.am_batch_header(n, c_paths, descrs, shapes, ndims, fortrans,
                             offs, nbytes, nthreads)
    if rc != 0:
        return None
    out = []
    for i in range(n):
        if fortrans[i]:
            return None
        raw = descrs.raw[16 * i: 16 * (i + 1)].split(b"\0", 1)[0]
        try:
            dt = np.dtype(raw.decode())
        except TypeError:
            return None
        if dt.hasobject:
            return None
        shp = tuple(shapes[8 * i + d] for d in range(ndims[i]))
        if int(np.prod(shp, dtype=np.int64)) * dt.itemsize > nbytes[i]:
            return None
        out.append((dt, shp, offs[i]))
    return out


def _batch_pread(lib, paths, offsets, sizes, ptrs, nthreads) -> int:
    n = len(paths)
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    c_offs = (ctypes.c_int64 * n)(*offsets)
    c_sizes = (ctypes.c_int64 * n)(*[int(s) for s in sizes])
    c_ptrs = (ctypes.c_void_p * n)(
        *[p if isinstance(p, (int, type(None))) else
          ctypes.cast(p, ctypes.c_void_p).value for p in ptrs])
    return lib.am_batch_pread(n, c_paths, c_offs, c_sizes, c_ptrs, nthreads)
