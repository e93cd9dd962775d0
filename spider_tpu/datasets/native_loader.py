"""ctypes bindings for the native threaded tar-shard reader
(native/tarreader.cpp). Drop-in fast path for TarShardSource: the tar walk
and prefetch queue run in C++ threads off the GIL; Python only decodes."""

from __future__ import annotations

import ctypes
import glob
import os
import subprocess
from typing import Dict, Iterator, List, Optional

_LIB_PATH = os.path.join(os.path.dirname(__file__), "..", "..", "native",
                         "libspidertar.so")
_lib = None


class _TrMember(ctypes.Structure):
    _fields_ = [("ext", ctypes.c_char_p),
                ("data", ctypes.POINTER(ctypes.c_uint8)),
                ("size", ctypes.c_uint64),
                ("key", ctypes.c_char_p)]


def _build_library() -> str:
    src_dir = os.path.dirname(os.path.abspath(_LIB_PATH))
    subprocess.run(["sh", os.path.join(src_dir, "build.sh")], check=True,
                   capture_output=True)
    return os.path.abspath(_LIB_PATH)


def load_library(build_if_missing: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    path = os.path.abspath(_LIB_PATH)
    if not os.path.exists(path):
        if not build_if_missing:
            raise FileNotFoundError(path)
        _build_library()
    lib = ctypes.CDLL(path)
    lib.tr_open.restype = ctypes.c_void_p
    lib.tr_open.argtypes = [ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
                            ctypes.c_int, ctypes.c_int, ctypes.c_int]
    lib.tr_next.restype = ctypes.c_int
    lib.tr_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(_TrMember),
                            ctypes.c_int]
    lib.tr_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


class NativeTarSource:
    """Iterates webdataset-style samples {ext: bytes, '__key__': str} from
    tar shards using the C++ reader. API-compatible with TarShardSource for
    the byte-level contract (decoding happens in the dataset transform)."""

    MAX_MEMBERS = 64

    def __init__(self, pattern, n_threads: int = 2, queue_capacity: int = 64,
                 loop: bool = False, decode: bool = True):
        self.shards = sorted(glob.glob(pattern)) if isinstance(pattern, str) \
            else list(pattern)
        if not self.shards:
            raise FileNotFoundError(f"no shards match {pattern}")
        self.n_threads = n_threads
        self.queue_capacity = queue_capacity
        self.loop = loop
        self.decode = decode

    def __iter__(self) -> Iterator[Dict]:
        from spider_tpu.datasets.backends import _decode_member

        lib = load_library()
        arr = (ctypes.c_char_p * len(self.shards))(
            *[s.encode() for s in self.shards])
        handle = lib.tr_open(arr, len(self.shards), self.n_threads,
                             self.queue_capacity, int(self.loop))
        members = (_TrMember * self.MAX_MEMBERS)()
        try:
            while True:
                n = lib.tr_next(handle, members, self.MAX_MEMBERS)
                if n < 0:
                    raise RuntimeError(
                        "native tar reader: shard parse error (malformed "
                        f"size field or truncated member) in {self.shards}")
                if n == 0:
                    break
                sample: Dict = {}
                for i in range(n):
                    m = members[i]
                    data = ctypes.string_at(m.data, m.size)
                    ext = m.ext.decode()
                    sample["__key__"] = m.key.decode()
                    if self.decode:
                        decoded = _decode_member(f"x.{ext}", data)
                        if decoded is not None:
                            sample[ext] = decoded
                    else:
                        sample[ext] = data
                if len(sample) > 1:
                    yield sample
        finally:
            lib.tr_close(handle)
