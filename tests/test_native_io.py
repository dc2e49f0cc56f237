"""Native IO core (native/am_io.cpp via afford_motion_tpu.native): header
parsing, single/batch/stacked reads vs np.load ground truth, and the
fallback paths (npz, pickled objects, AM_NATIVE=0)."""
import os

import numpy as np
import pytest

from afford_motion_tpu import native as nio

pytestmark = pytest.mark.skipif(
    not nio.available(), reason="native lib unavailable (no g++ / build failed)"
)


@pytest.fixture
def npy_zoo(tmp_path):
    rng = np.random.default_rng(0)
    cases = [
        ((196, 263), np.float32),
        ((8192, 3), np.float32),
        ((100,), np.int16),
        ((3, 4, 5, 6), np.float64),
        ((7,), np.int64),
        ((2, 2), np.uint8),
        ((0, 5), np.float32),  # empty payload
        ((), np.float32),      # 0-d scalar
    ]
    out = []
    for i, (shape, dt) in enumerate(cases):
        a = (rng.normal(size=shape) * 100).astype(dt)
        p = tmp_path / f"{i}.npy"
        np.save(p, a)
        out.append((str(p), a))
    return out


def test_single_roundtrip(npy_zoo):
    for p, a in npy_zoo:
        b = nio.load_npy(p)
        assert b.dtype == a.dtype and b.shape == a.shape
        assert np.array_equal(b, a)


def test_batch_matches_loop(npy_zoo):
    outs = nio.batch_load_npy([p for p, _ in npy_zoo])
    for (p, a), b in zip(npy_zoo, outs):
        assert np.array_equal(a, b), p


def test_stack_collates_contiguously(tmp_path):
    rng = np.random.default_rng(1)
    paths, arrs = [], []
    for i in range(16):
        a = rng.normal(size=(24, 66)).astype(np.float32)
        p = tmp_path / f"s{i}.npy"
        np.save(p, a)
        paths.append(str(p))
        arrs.append(a)
    st = nio.stack_load_npy(paths)
    assert st.shape == (16, 24, 66) and st.flags["C_CONTIGUOUS"]
    assert np.array_equal(st, np.stack(arrs))


def test_stack_falls_back_on_mixed_shapes(tmp_path):
    np.save(tmp_path / "a.npy", np.zeros((3, 2), np.float32))
    np.save(tmp_path / "b.npy", np.ones((4, 2), np.float32))
    with pytest.raises(ValueError):  # same error np.stack raises
        nio.stack_load_npy([str(tmp_path / "a.npy"), str(tmp_path / "b.npy")])


def test_load_dispatches_npz_and_pickle(tmp_path):
    np.savez(tmp_path / "z.npz", x=np.arange(3.0))
    z = nio.load(str(tmp_path / "z.npz"))
    assert np.array_equal(z["x"], np.arange(3.0))

    obj = np.array([{"a": 1}], dtype=object)
    np.save(tmp_path / "o.npy", obj, allow_pickle=True)
    o = nio.load(str(tmp_path / "o.npy"), allow_pickle=True)
    assert o[0]["a"] == 1

    # object .npy WITHOUT allow_pickle: native path must defer to numpy's
    # error, not crash
    with pytest.raises(ValueError):
        nio.load(str(tmp_path / "o.npy"))


def test_load_accepts_file_objects(tmp_path):
    np.save(tmp_path / "f.npy", np.ones(4, np.float32))
    with open(tmp_path / "f.npy", "rb") as f:
        assert np.array_equal(nio.load(f), np.ones(4, np.float32))


def test_missing_file_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        nio.load_npy(str(tmp_path / "nope.npy"))


def test_fortran_order_falls_back(tmp_path):
    a = np.asfortranarray(np.arange(12, dtype=np.float32).reshape(3, 4))
    np.save(tmp_path / "f.npy", a)
    b = nio.load_npy(str(tmp_path / "f.npy"))
    assert np.array_equal(a, b)


def test_npy_v2_header(tmp_path):
    # a huge dtype-field-free header doesn't occur naturally; force v2 via
    # numpy's format module
    from numpy.lib import format as npf

    a = np.arange(10, dtype=np.int32)
    with open(tmp_path / "v2.npy", "wb") as f:
        npf.write_array(f, a, version=(2, 0))
    b = nio.load_npy(str(tmp_path / "v2.npy"))
    assert np.array_equal(a, b)


class TestNpzView:
    def test_roundtrip_all_members(self, tmp_path):
        rng = np.random.default_rng(0)
        p = tmp_path / "a.npz"
        np.savez(p, points=rng.normal(size=(128, 3)).astype(np.float32),
                 dist=rng.normal(size=(128, 22)).astype(np.float32),
                 mask=np.arange(10) > 4,
                 idx=rng.integers(0, 100, size=(5,)).astype(np.int16))
        z, ref = nio.load(str(p)), np.load(p)
        assert sorted(z.files) == sorted(ref.files)
        for k in ref.files:
            assert np.array_equal(z[k], ref[k]), k
        assert "points" in z and z.get("nope") is None
        with nio.load(str(p)) as f:
            f["points"]

    def test_compressed_falls_back(self, tmp_path):
        p = tmp_path / "c.npz"
        np.savez_compressed(p, x=np.ones(100))
        z = nio.load(str(p))
        assert np.array_equal(z["x"], np.ones(100))

    def test_missing_member_raises(self, tmp_path):
        p = tmp_path / "a.npz"
        np.savez(p, x=np.ones(3))
        with pytest.raises(KeyError):
            nio.load(str(p))["y"]

    def test_not_a_zip_raises_like_numpy(self, tmp_path):
        p = tmp_path / "junk.npz"
        p.write_bytes(b"this is not a zip file at all")
        with pytest.raises(Exception):
            nio.load(str(p))["x"]
