"""Dataset-pipeline tests on a synthetic CUB-format fixture
(SURVEY §4 item (c))."""
import numpy as np
import pytest

from gan_codes_tpu.config import DataConfig
from gan_codes_tpu.data import CUBDataset, DataLoader, make_synthetic_cub


@pytest.fixture(scope="module")
def cub_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("cub")
    info = make_synthetic_cub(str(root), n_train=8, n_test=4, image_size=32)
    return info


def _cfg(root, size=32):
    return DataConfig(data_dir=root, image_size=size)


class TestDataset:
    def test_splits_and_vocab(self, cub_root):
        tr = CUBDataset(_cfg(cub_root["root"]), "train")
        te = CUBDataset(_cfg(cub_root["root"]), "test")
        assert len(tr) == 8 and len(te) == 4
        assert tr.n_words == cub_root["n_words"]
        assert tr.word2code["bird"] == 3 or "bird" in tr.word2code

    def test_item_shapes_and_ranges(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        image, caption, cap_len, name = ds[0]
        assert image.shape == (32, 32, 3) and image.dtype == np.uint8
        assert caption.shape == (18,)
        assert 1 <= cap_len <= 18
        # pad is zeros beyond cap_len when caption is short
        if cap_len < 18:
            assert (caption[cap_len:] == 0).all()

    def test_long_caption_sorted_subsample(self, cub_root):
        """Captions longer than 18 tokens are randomly subsampled but keep
        original order (`objects/dataset.py:106-110`)."""
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        rng = np.random.default_rng(0)
        # find a long caption in the fixture
        long_idx = next(i for i, c in enumerate(ds.captions) if len(c) > 18)
        padded, cap_len = ds._encode_caption(long_idx, rng)
        assert cap_len == 18
        original = ds.captions[long_idx]
        # the first cap_len tokens must be a subsequence of the original
        # caption (pad zeros beyond cap_len are not original tokens)
        it = iter(original)
        assert all(tok in it for tok in padded.tolist()[:cap_len])
        assert len(padded) == 18

    def test_caption_determinism_per_seed(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        a = ds.random_caption(0, np.random.default_rng(5))
        b = ds.random_caption(0, np.random.default_rng(5))
        np.testing.assert_array_equal(a[0], b[0])
        assert a[1] == b[1]


class TestLoader:
    def test_batches_drop_last(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        loader = DataLoader(ds, batch_size=3, seed=1)
        batches = list(loader)
        assert len(batches) == 2  # 8 // 3
        for b in batches:
            assert b.images.shape == (3, 32, 32, 3)
            assert b.images.dtype == np.uint8
            assert b.captions.shape == (3, 18)
            assert b.cap_lens.shape == (3,)
            assert len(b.file_names) == 3

    def test_keep_last_partial_batch(self, cub_root):
        """drop_last=False with n % batch_size != 0 yields a short final
        batch (regression: per-item seed reshape used to require equal-size
        batches and raised ValueError)."""
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        loader = DataLoader(ds, batch_size=3, drop_last=False, seed=1)
        batches = list(loader)
        assert [b.images.shape[0] for b in batches] == [3, 3, 2]
        assert len(loader) == 3

    def test_shuffle_reproducible(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        names1 = [b.file_names for b in DataLoader(ds, 4, seed=7)]
        names2 = [b.file_names for b in DataLoader(ds, 4, seed=7)]
        assert names1 == names2

    def test_no_shuffle_order(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "test", augment=False)
        loader = DataLoader(ds, 4, shuffle=False)
        batch = next(iter(loader))
        assert batch.file_names == ds.file_names[:4]

    def test_set_epoch_pins_order(self, cub_root):
        """Epoch-keyed shuffling: the same (seed, epoch) yields byte-identical
        batches regardless of iteration history, so a resumed run replays
        exactly the epochs an uninterrupted run would see."""
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        a = DataLoader(ds, 4, seed=7)
        epoch0 = [(b.file_names, b.images.copy()) for b in a]
        epoch1 = [(b.file_names, b.images.copy()) for b in a]  # auto-advance

        b_loader = DataLoader(ds, 4, seed=7)
        b_loader.set_epoch(1)
        resumed1 = [(b.file_names, b.images.copy()) for b in b_loader]

        assert epoch0 != epoch1  # different epochs reshuffle
        assert [n for n, _ in epoch1] == [n for n, _ in resumed1]
        for (_, x), (_, y) in zip(epoch1, resumed1):
            np.testing.assert_array_equal(x, y)  # incl. augment seeds


class TestLoaderCleanup:
    def test_abandoned_iterator_does_not_leak_producer(self, cub_root):
        """Closing a loader iterator early (the per-epoch eval pattern:
        break after eval_max_batches) must terminate the producer thread —
        it may be blocked in q.put on the bounded prefetch queue."""
        import threading
        import time
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        loader = DataLoader(ds, 1, seed=0, prefetch=1)  # 8 batches, tiny queue
        before = threading.active_count()
        it = iter(loader)
        next(it)
        it.close()  # GeneratorExit -> finally: stop + drain + join
        for _ in range(100):
            if threading.active_count() <= before:
                break
            time.sleep(0.05)
        assert threading.active_count() <= before


class TestShardedLoader:
    def test_shards_are_disjoint_and_cover(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        seen = []
        for shard in range(2):
            loader = DataLoader(ds, 2, seed=9, shard_id=shard, num_shards=2)
            for b in loader:
                seen.extend(b.file_names)
        assert len(seen) == len(set(seen)) == 8  # disjoint, full coverage

    def test_shard_len(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        assert len(DataLoader(ds, 2, num_shards=2)) == 2  # 8/2 shards / bs2

    def test_uneven_shards_equalized(self, cub_root):
        """num_shards=3 over n=8: every shard truncates to floor(8/3)=2
        items, so EVERY host yields the same batch count. Unequal counts
        would deadlock the lockstep GSPMD step under multi-host DP (the host
        with an extra batch enters a collective no peer joins)."""
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        seen_counts = set()
        for shard in range(3):
            loader = DataLoader(ds, 2, seed=3, shard_id=shard, num_shards=3)
            batches = list(loader)
            assert len(batches) == len(loader)
            assert all(b.images.shape[0] == 2 for b in batches)
            seen_counts.add(len(batches))
        assert seen_counts == {1}  # identical batch count on every host

        # drop_last=False likewise must not reintroduce a shard-size skew
        seen_counts = {
            len(list(DataLoader(ds, 2, seed=3, shard_id=s, num_shards=3,
                                drop_last=False)))
            for s in range(3)}
        assert seen_counts == {1}

    def test_bad_shard_id(self, cub_root):
        ds = CUBDataset(_cfg(cub_root["root"]), "train")
        with pytest.raises(ValueError):
            DataLoader(ds, 2, shard_id=2, num_shards=2)
