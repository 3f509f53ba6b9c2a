"""Native governance core vs hashlib/numpy oracles (auto-builds with g++)."""

import hashlib
import os

import numpy as np
import pytest

from mmrs_tpu.govern import native
from mmrs_tpu.govern.hashing import packed_hamming


def test_native_builds():
    lib = native.load_library()
    if lib is None:
        pytest.skip("no toolchain — fallbacks cover the API")


def test_md5_buffer_matches_hashlib():
    for data in [b"", b"abc", b"x" * 1000, os.urandom(70)]:
        assert native.md5_buffer(data) == hashlib.md5(data).hexdigest()


def test_md5_files_threaded(tmp_path):
    paths = []
    expected = []
    rng = np.random.default_rng(0)
    for i in range(32):
        p = tmp_path / f"f{i}.bin"
        data = rng.integers(0, 256, rng.integers(0, 5000), dtype=np.uint8).tobytes()
        p.write_bytes(data)
        paths.append(str(p))
        expected.append(hashlib.md5(data).hexdigest())
    paths.append(str(tmp_path / "missing.bin"))

    hexes, ok = native.md5_files(paths, threads=4)
    assert hexes[:32] == expected
    assert ok[:32].all() and not ok[32]
    assert hexes[32] == ""


def _rand_hashes(h, n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 2**63, (h, n), dtype=np.uint64)


def test_hamming_first_match_matches_oracle():
    hashes = _rand_hashes(3, 200, seed=1)
    hashes[0, 150] = hashes[0, 3]          # kind-0 dup
    hashes[1, 180] = hashes[1, 150] ^ np.uint64(0b111)  # within 5 of 150 on kind 1

    out = native.hamming_first_match(hashes, threshold=5)

    # oracle
    exp = np.full(200, -1, np.int64)
    for i in range(200):
        for j in range(i):
            if any(bin(int(hashes[k, i] ^ hashes[k, j])).count("1") <= 5
                   for k in range(3)):
                exp[i] = j
                break
    np.testing.assert_array_equal(out, exp)
    assert out[150] == 3 and out[180] == 150


def test_hamming_cross_any_matches_oracle():
    a = _rand_hashes(2, 50, seed=2)
    b = _rand_hashes(2, 80, seed=3)
    a[0, 10] = b[0, 40]
    out = native.hamming_cross_any(a, b, threshold=0)
    exp = np.full(50, -1, np.int64)
    for i in range(50):
        for j in range(80):
            if any(int(a[k, i]) == int(b[k, j]) for k in range(2)):
                exp[i] = j
                break
    np.testing.assert_array_equal(out, exp)
    assert out[10] == 40


def test_md5_files_non_utf8_filename(tmp_path):
    """Surrogate-escaped (non-UTF8) filenames must hash, not abort the
    batch (str.encode raised; os.fsencode round-trips)."""
    import hashlib

    from mmrs_tpu.govern.native import md5_files

    good = tmp_path / "ok.jpg"
    good.write_bytes(b"hello")
    weird = os.fsdecode(bytes(tmp_path) + b"/img_\xff.jpg")
    with open(weird, "wb") as f:
        f.write(b"world")
    hexes, ok = md5_files([str(good), weird])
    assert ok.all()
    assert hexes[0] == hashlib.md5(b"hello").hexdigest()
    assert hexes[1] == hashlib.md5(b"world").hexdigest()
