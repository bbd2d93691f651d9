"""Native archive + batch loader tests.

The native C++ reader is compiled on demand (g++ baked in the image);
every test checks native results against the pure-Python fallback path.
"""

import numpy as np
import pytest

from beer_tpu import io as bio


@pytest.fixture
def archive_path(rng, tmp_path):
    utts = {
        f"utt{i:03d}": rng.normal(size=(int(rng.integers(5, 40)), 13)).astype(
            np.float32
        )
        for i in range(17)
    }
    path = tmp_path / "feats.bar"
    bio.write_archive(path, utts)
    return path, utts


def test_native_compiles():
    assert bio._load_native() is not None, "native archive lib failed to build"


def test_roundtrip_native_and_python(archive_path):
    path, utts = archive_path
    native = bio.Archive(path, prefer_native=True)
    pure = bio.Archive(path, prefer_native=False)
    assert native.native and not pure.native
    assert native.keys == list(utts.keys()) == pure.keys
    for i, key in enumerate(native.keys):
        np.testing.assert_array_equal(native[i], utts[key])
        np.testing.assert_array_equal(pure[i], utts[key])


def test_padded_batch_matches_fallback(archive_path):
    path, _ = archive_path
    native = bio.Archive(path, prefer_native=True)
    pure = bio.Archive(path, prefer_native=False)
    idx = [3, 0, 16, 7]
    out_n, mask_n = native.padded_batch(idx)
    out_p, mask_p = pure.padded_batch(idx)
    np.testing.assert_array_equal(out_n, out_p)
    np.testing.assert_array_equal(mask_n, mask_p)
    # mask structure
    np.testing.assert_array_equal(mask_n.sum(1), native.lengths[idx])
    # padding is zero
    assert (out_n[mask_n == 0.0] == 0).all()


def test_batch_loader_covers_epoch(archive_path):
    path, utts = archive_path
    archive = bio.Archive(path)
    loader = bio.BatchLoader(archive, batch_size=5, seed=1)
    total = 0
    for data, mask in loader:
        assert data.shape[0] <= 5 and data.shape[2] == 13
        total += int((mask.sum(1) > 0).sum())
    assert total == len(utts)


def test_convert_npz(archive_path, tmp_path, rng):
    npz = tmp_path / "f.npz"
    utts = {"a": rng.normal(size=(7, 4)).astype(np.float32),
            "b": rng.normal(size=(3, 4)).astype(np.float32)}
    np.savez(npz, **utts)
    bar = tmp_path / "f.bar"
    bio.convert_npz(npz, bar)
    archive = bio.Archive(bar)
    np.testing.assert_array_equal(archive[0], utts["a"])
    np.testing.assert_array_equal(archive[1], utts["b"])


def test_batch_loader_buckets(archive_path):
    """Length bucketing: epoch coverage, per-bucket shapes, exact content."""
    path, utts = archive_path
    archive = bio.Archive(path)
    loader = bio.BatchLoader(archive, batch_size=4, seed=1, buckets=3,
                             pad_multiple=8)
    assert len(loader.bucket_indices) >= 2  # 17 utts, 3 quantile buckets
    seen = []
    shapes = set()
    for data, mask in loader:
        shapes.add(data.shape[1])
        for b in range(data.shape[0]):
            n = int(mask[b].sum())
            # match the batch row back to its utterance by content
            for k, v in utts.items():
                if v.shape[0] == n and np.allclose(data[b, :n], v):
                    seen.append(k)
                    break
    assert sorted(seen) == sorted(utts.keys())
    # more than one distinct padded length, all multiples of 8 (or the cap)
    assert len(shapes) >= 2
    lengths = np.array([v.shape[0] for v in utts.values()])
    assert max(shapes) <= -(-int(lengths.max()) // 8) * 8
    # short buckets pad less than the corpus max
    assert min(shapes) < int(lengths.max())


def test_archive_geometry(archive_path, tmp_path):
    """Geometry (n, t_max, dim, total) from metadata only — bar and npz."""
    path, utts = archive_path
    lengths = [v.shape[0] for v in utts.values()]
    want = (len(utts), max(lengths), 13, sum(lengths))
    assert bio.archive_geometry(path) == want
    npz = tmp_path / "feats.npz"
    np.savez(npz, **utts)
    assert bio.archive_geometry(npz) == want
