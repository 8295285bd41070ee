"""Native C++ IO runtime tests: PNG decode bit-exactness vs PIL,
PIL-equivalent antialiased resize, and the async ticketed prefetcher."""

import numpy as np
import pytest

from ode_vio_tpu.data import native_loader as nl
from ode_vio_tpu.data.kitti import load_images
from ode_vio_tpu.data.synthetic import make_kitti_tree


@pytest.fixture(scope="module")
def png_paths(tmp_path_factory):
    root = make_kitti_tree(tmp_path_factory.mktemp("imgs"), seqs=("00",),
                           n_frames=10, img_hw=(48, 80))
    return sorted((root / "sequences/00/image_2").glob("*.png"))


@pytest.fixture(scope="module")
def native_ok():
    if not nl.is_available():
        pytest.skip(f"native build unavailable: {nl.build_error()}")


class TestDecode:
    def test_bit_exact_vs_pil(self, png_paths, native_ok):
        ours = nl.decode_batch(png_paths, (48, 80), threads=2)
        pil = load_images(png_paths)
        assert ours.shape == (10, 48, 80, 3)
        np.testing.assert_array_equal(ours, pil.astype(np.float32))

    def test_antialiased_downscale_matches_pil(self, png_paths, native_ok):
        ours = nl.decode_batch(png_paths, (24, 40), threads=2)
        pil = load_images(png_paths, size_hw=(24, 40))
        # PIL quantises the horizontal pass to uint8; agree to quant noise
        assert np.abs(ours - pil).max() < 0.01

    def test_upscale(self, png_paths, native_ok):
        ours = nl.decode_batch(png_paths[:2], (96, 160), threads=1)
        pil = load_images(png_paths[:2], size_hw=(96, 160))
        assert np.abs(ours - pil).mean() < 0.01

    def test_missing_file_raises(self, native_ok, tmp_path):
        with pytest.raises(IOError):
            nl.decode_batch([tmp_path / "nope.png"], (8, 8))


class TestPrefetcher:
    def test_overlapped_tickets(self, png_paths, native_ok):
        pf = nl.Prefetcher((48, 80), threads=2)
        try:
            pf.submit(10, png_paths[:3])
            pf.submit(11, png_paths[3:7])
            b = pf.get(11)
            a = pf.get(10)  # out-of-order retrieval
        finally:
            pf.close()
        pil = load_images(png_paths)
        np.testing.assert_array_equal(a, pil[:3].astype(np.float32))
        np.testing.assert_array_equal(b, pil[3:7].astype(np.float32))

    def test_fallback_without_native(self, png_paths, monkeypatch):
        monkeypatch.setattr(nl, "_get_lib", lambda: None)
        out = nl.decode_batch(png_paths[:2], (48, 80))
        assert out.shape == (2, 48, 80, 3)
        pf = nl.Prefetcher((48, 80))
        pf.submit(1, png_paths[:2])
        assert pf.get(1).shape == (2, 48, 80, 3)
