"""Async prefetching loader tests: batch equivalence with the synchronous
path, augmentation hook, error propagation."""

import numpy as np
import pytest

from ode_vio_tpu.data import transforms as T
from ode_vio_tpu.data.kitti import BoundarySafeBatchSampler, KittiDataset, collate
from ode_vio_tpu.data.loader import PrefetchingLoader
from ode_vio_tpu.data.synthetic import make_kitti_tree


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = make_kitti_tree(tmp_path_factory.mktemp("kitti_ld"), seqs=("00",),
                           n_frames=20, img_hw=(32, 64))
    ds = KittiDataset(root, sequence_length=4, train_seqs=["00"])
    return root, ds


def test_matches_synchronous_path(setup):
    _, ds = setup
    sampler = BoundarySafeBatchSampler(len(ds), 4, shuffle=False,
                                       drop_last=True)
    loader = PrefetchingLoader(ds, sampler, (32, 64), prefetch_depth=2)
    async_batches = list(loader)

    ds_sync = KittiDataset(
        ds.samples[0].img_paths[0].parents[2].parent, sequence_length=4,
        train_seqs=["00"], transform=T.Compose([T.Center()]),
    )
    for k, idx in enumerate(BoundarySafeBatchSampler(len(ds), 4,
                                                     shuffle=False,
                                                     drop_last=True)):
        sync = collate([ds_sync[i] for i in idx])
        for a, b in zip(async_batches[k], sync):
            np.testing.assert_allclose(a, b, atol=1e-6)


def test_len_and_shapes(setup):
    _, ds = setup
    sampler = BoundarySafeBatchSampler(len(ds), 4, shuffle=True, seed=0,
                                       drop_last=True)
    loader = PrefetchingLoader(ds, sampler, (32, 64))
    assert len(loader) == len(sampler)
    imgs, imus, gts, ts = next(iter(loader))
    assert imgs.shape == (4, 4, 32, 64, 3)
    assert imus.shape == (4, 31, 6)
    assert gts.shape == (4, 3, 6)
    assert ts.shape == (4, 4)
    assert imgs.dtype == np.float32


def test_applies_augmentation(setup):
    _, ds = setup
    sampler = BoundarySafeBatchSampler(len(ds), 4, shuffle=False,
                                       drop_last=True)
    flip = T.RandomHorizontalFlip(p=1.1, rng=np.random.default_rng(0))
    loader = PrefetchingLoader(ds, sampler, (32, 64), transform=flip)
    plain = PrefetchingLoader(ds, sampler, (32, 64))
    a = next(iter(loader))[0]
    b = next(iter(plain))[0]
    np.testing.assert_allclose(a, b[:, :, :, ::-1, :], atol=1e-6)


def test_native_resize_in_pipeline(setup):
    """Decoding at a smaller target resolution produces correct shapes."""
    _, ds = setup
    sampler = BoundarySafeBatchSampler(len(ds), 2, shuffle=False,
                                       drop_last=True)
    loader = PrefetchingLoader(ds, sampler, (16, 32))
    imgs = next(iter(loader))[0]
    assert imgs.shape == (2, 4, 16, 32, 3)
    assert -0.5 <= imgs.min() and imgs.max() <= 0.5
